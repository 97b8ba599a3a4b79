"""End-to-end optimization: the minimum slice — single-qubit state transfer
|0> -> |1> (SURVEY.md section 7 stage 2-4), and a fast 2-qubit gate test."""

import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models import gates
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.optim.driver import build_bounds, run_optimization
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def test_state_to_state_transfer():
    freq01 = [4.10595]
    model = build_standard_model(
        nlevels=[2], freq01_ghz=freq01, rotfreq_ghz=freq01, selfkerr_ghz=[0.2198],
    )
    T, ntime = 100.0, 1000
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=20, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,),
        enforce_bc=False,
    )
    setup = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(2 * np.pi * freq01[0],),
        initcond_type="pure", pure_levels=(0,),
        target_type="pure", pure_target_levels=(1,),
        objective_type="Jfrobenius",
        gamma_tik=1e-8,
    )
    prob = Problem(setup)
    rng = np.random.default_rng(1234)
    x0 = rng.uniform(-1, 1, setup.nparams) * 0.005
    lb, ub = build_bounds(setup.oscillators, [[1.0]])
    res = run_optimization(prob, x0, lb, ub, maxiter=100, inftol=1e-4,
                           fatol=1e-6, verbose=False)
    assert res.objective < 1e-4, (res.objective, res.reason)


def test_two_qubit_cnot_progress():
    """A short CNOT optimization must reduce the infidelity substantially."""
    Ne = [2, 2]
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=Ne, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[],
    )
    T, ntime = 120.0, 1200
    # carrier frequencies: 0 and the J-coupling detuning resonances
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=20, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * (freq01[1 - k] - freq01[k])),
        ) for k in range(2)
    )
    V = gates.assemble_gate(gates.cnot(), Ne, Ne, [0.0, 0.0], T)
    setup = Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        oscillators=oscs, ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis", target_type="gate", target_gate_full=V,
        objective_type="Jtrace", gamma_tik=1e-4,
    )
    prob = Problem(setup)
    rng = np.random.default_rng(1234)
    x0 = rng.uniform(-1, 1, setup.nparams) * (0.01 / np.sqrt(2) / 2 * 2 * np.pi)
    lb, ub = build_bounds(setup.oscillators, [[0.03], [0.03]])
    res = run_optimization(prob, x0, lb, ub, maxiter=40, inftol=1e-3,
                           verbose=False)
    first_cost = res.history[0].cost
    assert res.history[-1].cost < 0.2 * first_cost, \
        (first_cost, res.history[-1].cost, res.reason)


def test_checkpoint_resume(tmp_path):
    """Optimizer state checkpoint/resume: resuming from a checkpoint must
    continue productively (objective keeps decreasing)."""
    from quandary_tpu.optim.lbfgsb import load_state, minimize_lbfgsb, save_state

    freq01 = [4.10595]
    model = build_standard_model(
        nlevels=[2], freq01_ghz=freq01, rotfreq_ghz=freq01, selfkerr_ghz=[0.2198])
    T, ntime = 100.0, 500
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=15, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,))
    setup = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(2 * np.pi * freq01[0],),
        initcond_type="pure", pure_levels=(0,),
        target_type="pure", pure_target_levels=(1,),
        objective_type="Jfrobenius", gamma_tik=1e-8)
    prob = Problem(setup)
    import jax
    vg = prob.build_value_and_grad()

    def fg(x):
        (f, aux), g = vg(jnp.asarray(x), jnp.zeros(setup.nparams))
        return float(f), np.asarray(g, dtype=np.float64), aux

    rng = np.random.default_rng(7)
    x0 = rng.uniform(-1, 1, setup.nparams) * 0.005
    lb, ub = build_bounds(setup.oscillators, [[1.0]])
    ckpt = str(tmp_path / "opt.npz")
    res1 = minimize_lbfgsb(fg, x0, lb, ub, maxiter=5,
                           checkpoint_path=ckpt, checkpoint_every=1)
    state = load_state(ckpt)
    assert state["it"] >= 1
    res2 = minimize_lbfgsb(fg, x0, lb, ub, maxiter=10, resume_state=state)
    assert res2.f <= res1.f + 1e-12


def test_build_ensemble_sweeps_matches_percall():
    """The pipelined throughput probe (scan of vmapped value_and_grad inside
    one jit) must equal the sum of per-call ensemble results."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _build_problem

    problem, setup = _build_problem(ntime=10, T=1.0)
    rng = np.random.default_rng(2)
    n, E = 3, 4
    Ps = jnp.asarray(rng.normal(size=(n, E, setup.nparams)) * 0.02,
                     dtype=jnp.float32)
    ref = jnp.zeros((setup.nparams,), jnp.float32)

    total = float(problem.build_ensemble_sweeps()(Ps, ref))

    evg = problem.build_ensemble_value_and_grad()
    want = 0.0
    for i in range(n):
        (J, _), g = evg(Ps[i], ref)
        want += float(jnp.sum(J) + jnp.sum(g))
    np.testing.assert_allclose(total, want, rtol=5e-5)
