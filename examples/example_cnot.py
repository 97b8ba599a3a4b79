"""CNOT gate optimization on two coupled transmons.

The reference quality anchor (tests/python/test_example_cnot.py in
LLNL/Quandary): T=200 ns, infidelity ~1e-4 class in <= 200 L-BFGS
iterations.
"""

import numpy as np

from quandary_tpu import Quandary

freq01 = [4.80595, 4.8601]
favg = sum(freq01) / len(freq01)

unitary = np.identity(4)
unitary[2, 2] = 0.0
unitary[3, 3] = 0.0
unitary[2, 3] = 1.0
unitary[3, 2] = 1.0

quandary = Quandary(
    freq01=freq01,
    Jkl=[0.005],
    rotfreq=[favg, favg],
    T=200.0,
    targetgate=unitary,
    rand_seed=1234,
    verbose=True,
)

t, pt, qt, infidelity, expectedEnergy, population = quandary.optimize(
    datadir="./run_cnot")
print(f"\nCNOT infidelity: {infidelity:.3e}")

# Optional plotting:
# from quandary_tpu.plots import plot_pulse, plot_expectedEnergy
# plot_pulse(quandary.Ne, t, pt, qt)
# plot_expectedEnergy(quandary.Ne, t, expectedEnergy)
