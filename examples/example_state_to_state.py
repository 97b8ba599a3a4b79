"""State-to-state transfer: drive |0> to (|0>+|1>)/sqrt(2) on a transmon
with one guard level (reference: tests/python/test_example_state_to_state)."""

import numpy as np

from quandary_tpu import Quandary

quandary = Quandary(
    Ne=[2],
    Ng=[1],
    freq01=[4.10595],
    selfkerr=[0.2198],
    maxctrl_MHz=4.0,
    initialcondition=[1.0, 0.0],
    targetstate=[1.0 / np.sqrt(2), 1.0 / np.sqrt(2)],
    T=50.0,
    tol_infidelity=1e-5,
    rand_seed=4321,
)

t, pt, qt, infidelity, energy, population = quandary.optimize(
    datadir="./run_s2s")
print(f"\nfinal infidelity: {infidelity:.3e}")
