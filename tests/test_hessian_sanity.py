"""AD Hessian vs FD Hessian + symmetry (TEST_FD_HESS analog), and the
physics sanity checks (SANITY_CHECK analog)."""

import jax.numpy as jnp
import numpy as np

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.optim.hessian import fd_hessian, hessian, hessian_eigen
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.sanity import (check_density_trajectory,
                                       check_state_trajectory, is_unitary)
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _small_problem(lindblad=False):
    T, ntime = 2.0, 12
    model = build_standard_model(
        nlevels=[2], freq01_ghz=[4.1], rotfreq_ghz=[4.08], selfkerr_ghz=[0.2],
        decay_time=[40.0] if lindblad else [], dephase_time=[30.0] if lindblad else [],
        lindblad=lindblad)
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=3, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,))
    setup = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(1.0,),
        initcond_type="pure", pure_levels=(0,),
        target_type="pure", pure_target_levels=(1,),
        objective_type="Jfrobenius", gamma_tik=1e-4)
    return Problem(setup), setup


def test_hessian_fd_and_symmetry():
    prob, setup = _small_problem()
    rng = np.random.default_rng(0)
    params = rng.normal(size=setup.nparams) * 0.02
    H = hessian(prob, params)
    assert np.abs(H - H.T).max() < 1e-9          # symmetry (main.cpp TEST_FD_HESS)
    Hfd = fd_hessian(prob, params, eps=1e-5)
    assert np.abs(H - Hfd).max() < 1e-5 * max(1.0, np.abs(H).max())
    w, V = hessian_eigen(prob, params)
    assert w.shape == (setup.nparams,)
    assert np.all(np.diff(w) >= 0)


def test_sanity_checks():
    import jax.numpy as jnp

    prob, setup = _small_problem()
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)
    traj = np.asarray(prob.propagate_trajectory(params))
    res = check_state_trajectory(traj)
    assert res["ok"], res

    prob2, setup2 = _small_problem(lindblad=True)
    traj2 = np.asarray(prob2.propagate_trajectory(
        jnp.asarray(rng.normal(size=setup2.nparams) * 0.02)))
    res2 = check_density_trajectory(traj2[:, 0])
    assert res2["ok"], res2

    from quandary_tpu.models import gates
    assert is_unitary(gates.qft(5))
    assert not is_unitary(np.ones((3, 3)))


def test_stage_truncation_estimate_flags_large_amplitudes():
    """The runtime stage-solve health check (the reference's GMRES-residual
    warning analog, timestepper.cpp:612-614): accurate at physical control
    amplitudes, flagged when the amplitudes push (dt/2)*||H(t)|| toward the
    Neumann radius. Validated against the TRUE truncation error: the norm
    drift of the propagated trajectory (IMR is exactly norm-preserving, so
    any drift IS stage-solve error)."""
    from quandary_tpu.utils.sanity import (check_state_trajectory,
                                           stage_truncation_estimate)

    prob, setup = _small_problem()
    rng = np.random.default_rng(3)
    small = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)
    est = stage_truncation_estimate(prob, small)
    assert est["supported"] and est["ok"], est
    assert check_state_trajectory(
        np.asarray(prob.propagate_trajectory(small)))["ok"]

    big = small * 400.0        # ~GHz-class amplitudes: u -> O(1)
    est_big = stage_truncation_estimate(prob, big)
    assert est_big["supported"] and not est_big["ok"], est_big
    drift = check_state_trajectory(
        np.asarray(prob.propagate_trajectory(big)))["norm_drift"]
    assert drift > 1e-4, (drift, est_big)   # the bound flags a REAL error


def test_run_optimization_warns_on_underresolved_stage_solve():
    import warnings

    from quandary_tpu.optim.driver import run_optimization

    prob, setup = _small_problem()
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=setup.nparams) * 8.0    # unphysical amplitudes
    lb, ub = x0 - 1e-12, x0 + 1e-12              # pin the "optimum" there
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        run_optimization(prob, x0, lb, ub, maxiter=1, verbose=False)
    assert any("under-resolved" in str(x.message) for x in w), \
        [str(x.message) for x in w]
