"""Forward-solver correctness: IMR/IMR4/IMR8 against the exact propagator.

For a time-INDEPENDENT Hamiltonian the exact solution is psi(T) =
expm(-i H T) psi(0); the IMR family must converge to it at the scheme's
order. This pins the RHS sign/unit conventions independently of the
reference's golden files.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.rhs import DenseEngine
from quandary_tpu.ops.steppers import make_step_fn, stage_midpoint_times
from quandary_tpu.ops import solvers
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl, build_control_plan
from quandary_tpu.models.controls import eval_controls


def _propagate_const(model, T, ntime, timestepper="IMR", iters=20):
    engine = DenseEngine(model)
    dt = T / ntime
    step = make_step_fn(engine.rhs, dt, timestepper, iters)
    K = model.K
    ts = stage_midpoint_times(ntime, dt, timestepper)
    nst = ts.shape[1]
    # constant zero controls
    C = np.zeros((ntime, nst, K))
    C[:, :, 0] = 1.0
    x0 = jnp.eye(model.N, dtype=jnp.complex128)  # propagate full unitary
    xT, _ = solvers.propagate(step, x0, jnp.asarray(C))
    return np.asarray(xT)


def test_imr_matches_expm_drift_only():
    model = build_standard_model(
        nlevels=[3, 2], freq01_ghz=[4.1, 5.0], rotfreq_ghz=[4.0, 4.9],
        selfkerr_ghz=[0.22, 0.1], crosskerr_ghz=[0.01], jkl_ghz=[],
    )
    T, ntime = 1.0, 2000
    U = _propagate_const(model, T, ntime)
    H = np.asarray(model.stack[0])
    Uex = expm(-1j * H * T)
    # psi columns: our batch is rows, x0=I so xT[b] = U @ e_b -> xT.T = U
    err = np.abs(U.T - Uex).max()
    assert err < 1e-7, err


@pytest.mark.parametrize("stepper,order", [("IMR", 2), ("IMR4", 4), ("IMR8", 6)])
def test_convergence_order(stepper, order):
    model = build_standard_model(
        nlevels=[4], freq01_ghz=[4.1], rotfreq_ghz=[3.0], selfkerr_ghz=[0.3],
    )
    T = 1.0
    H = np.asarray(model.stack[0])
    Uex = expm(-1j * H * T)
    steps = {"IMR": (64, 128), "IMR4": (16, 32), "IMR8": (4, 8)}[stepper]
    errs = []
    for ntime in steps:
        U = _propagate_const(model, T, ntime, stepper, iters=40).T
        errs.append(np.abs(U - Uex).max())
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.7, (errs, rate)


def test_time_dependent_control_vs_scipy():
    """Driven qubit: compare against dense scipy integration of the ODE."""
    from scipy.integrate import solve_ivp

    model = build_standard_model(
        nlevels=[2], freq01_ghz=[4.5], rotfreq_ghz=[4.48], selfkerr_ghz=[0.0],
    )
    N = model.N
    T, ntime = 10.0, 4000
    dt = T / ntime

    # one spline segment, one carrier
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=10, tstart=0.0, tstop=T),),
        carrier_freqs=(2 * np.pi * 0.02,),
    )
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=osc.nparams) * 0.02)

    ts_mid = stage_midpoint_times(ntime, dt, "IMR")
    plan = build_control_plan([osc], ts_mid.reshape(-1))
    p, q = eval_controls(plan, params)
    C = model.coeff_rows(p, q, plan.ts).reshape(ntime, 1, model.K)

    engine = DenseEngine(model)
    step = make_step_fn(engine.rhs, dt, "IMR", 20)
    x0 = jnp.array([[1.0, 0.0]], dtype=jnp.complex128)
    xT, _ = solvers.propagate(step, x0, C)

    # scipy reference using the same control functions evaluated continuously
    plan_dense = build_control_plan([osc], np.linspace(0, T, 40001))
    pd, qd = eval_controls(plan_dense, params)
    pd, qd = np.asarray(pd)[:, 0], np.asarray(qd)[:, 0]
    tgrid = np.asarray(plan_dense.ts)
    stack = np.asarray(model.stack)

    def rhs(t, y):
        pv = np.interp(t, tgrid, pd)
        qv = np.interp(t, tgrid, qd)
        H = stack[0] + pv * stack[1] + qv * stack[2]
        psi = y[:N] + 1j * y[N:]
        d = -1j * H @ psi
        return np.concatenate([d.real, d.imag])

    y0 = np.array([1.0, 0.0, 0.0, 0.0])
    sol = solve_ivp(rhs, (0, T), y0, rtol=1e-11, atol=1e-12, dense_output=True)
    psi_ref = sol.y[:N, -1] + 1j * sol.y[N:, -1]
    err = np.abs(np.asarray(xT)[0] - psi_ref).max()
    assert err < 1e-5, err


def test_gmres_matches_neumann():
    """The GMRES stage solve must agree with the converged Neumann solve in
    the non-stiff regime."""
    from quandary_tpu.ops.steppers import make_step_fn

    model = build_standard_model(
        nlevels=[3, 2], freq01_ghz=[4.1, 5.0], rotfreq_ghz=[4.0, 4.9],
        selfkerr_ghz=[0.22, 0.1], crosskerr_ghz=[0.01], jkl_ghz=[0.002],
    )
    engine = DenseEngine(model)
    dt = 0.02
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=model.K))
    c = c.at[0].set(1.0)
    x = jnp.asarray(rng.normal(size=(2, model.N)) + 1j * rng.normal(size=(2, model.N)))
    sn = make_step_fn(engine.rhs, dt, "IMR", 25, "neumann")
    sg = make_step_fn(engine.rhs, dt, "IMR", 25, "gmres")
    yn = np.asarray(sn(x, c[None]))
    yg = np.asarray(sg(x, c[None]))
    assert np.abs(yn - yg).max() < 1e-9, np.abs(yn - yg).max()


def test_multi_segment_controls():
    """Two control segments on disjoint windows: the first-match-wins window
    semantics (oscillator.cpp:296-323) and parameter offsets."""
    from quandary_tpu.problem import Problem, Setup

    T, ntime = 8.0, 60
    model = build_standard_model(
        nlevels=[2], freq01_ghz=[4.1], rotfreq_ghz=[4.09], selfkerr_ghz=[0.2])
    osc = OscillatorControl(
        segments=(
            ControlSegment("spline", nsplines=4, tstart=0.0, tstop=T / 2),
            ControlSegment("spline0", nsplines=6, tstart=T / 2, tstop=T),
        ),
        carrier_freqs=(0.0,))
    assert osc.nparams == 2 * 4 + 2 * 6
    setup = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(1.0,),
        initcond_type="pure", pure_levels=(0,),
        target_type="pure", pure_target_levels=(1,),
        objective_type="Jfrobenius", time_parallel=False)
    prob = Problem(setup)
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.05)

    from quandary_tpu.models.controls import eval_controls
    p, q = eval_controls(prob.plan_out, params)
    p = np.asarray(p)[:, 0]
    # first-half values come from the quadratic spline (smooth), second half
    # piecewise constant: exact repeats within knots
    second = p[ntime // 2 + 2:]
    rep = np.mean(np.abs(np.diff(second)) < 1e-14)
    assert rep > 0.5, rep

    # gradient flows through BOTH segments
    import jax
    (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(params, params)
    g = np.asarray(g)
    assert np.abs(g[:8]).max() > 0 and np.abs(g[8:]).max() > 0


def test_file_hamiltonian_gradient():
    """AD gradient through a user-specified (file-style) Hamiltonian model
    verified by central differences."""
    import jax
    from quandary_tpu.models.hamiltonian import build_file_model
    from quandary_tpu.problem import Problem, Setup

    rng = np.random.default_rng(5)
    N = 4
    Hs = rng.normal(size=(N, N))
    Hsys = (Hs + Hs.T) * 0.3
    A = np.diag(np.sqrt(np.arange(1, N)), 1)
    model = build_file_model(
        nlevels=[N], Hsys_radns=Hsys, Hc_re=[A + A.T], Hc_im=[A - A.T])
    T, ntime = 4.0, 50
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=5, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,))
    setup = Setup(
        model=model, nessential=(N,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(1.0,),
        initcond_type="pure", pure_levels=(1,),
        target_type="pure", pure_target_levels=(0,),
        objective_type="Jfrobenius", gamma_tik=1e-5)
    prob = Problem(setup)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)
    (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(params, params)
    g = np.asarray(g)
    obj = prob.build_objective()
    eps = 1e-6
    for i in [0, 3, 7]:
        e = np.zeros(setup.nparams)
        e[i] = eps
        fd = (float(obj(params + e, params)[0]) - float(obj(params - e, params)[0])) / (2 * eps)
        assert abs(fd - g[i]) < 1e-6 + 1e-5 * abs(fd), (i, fd, g[i])
