"""Open-system dynamics: qubit reset under T1/T2 with Lindblad's master
equation, and unconditional pure-state preparation with the ensemble initial
state + Jmeasure objective (user_guide.md sec. state preparation)."""

from quandary_tpu import Quandary

# Forward simulation: decay of |1><1| under T1/T2
q = Quandary(
    Ne=[2],
    freq01=[4.1],
    selfkerr=[0.2198],
    T1=[40.0],
    T2=[20.0],
    T=60.0,
    initialcondition="pure, 1",
    optim_target="pure, 0",
    costfunction="Jfrobenius",
    randomize_init_ctrl=False,
    initctrl_MHz=0.0,
)
t, pt, qt, infid, energy, population = q.simulate(datadir="./run_reset")
print("final ground population:", population[0][0][0][-1])

# Optimization: drive toward the ground state faster than free decay
q2 = Quandary(
    Ne=[2],
    freq01=[4.1],
    selfkerr=[0.2198],
    T1=[40.0],
    T2=[20.0],
    T=30.0,
    initialcondition="pure, 1",
    optim_target="pure, 0",
    costfunction="Jfrobenius",
    rand_seed=99,
    maxiter=50,
)
t, pt, qt, infid, energy, population = q2.optimize(datadir="./run_reset_opt")
print("optimized reset infidelity:", infid)
