"""Strong-Wolfe line search option for the projected L-BFGS
(counterpart of TAO BQNLS's default More-Thuente search,
optimproblem.cpp:177-189)."""

import numpy as np
import pytest

from quandary_tpu.optim.lbfgsb import minimize_lbfgsb


def _rosenbrock(x):
    f = 100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
    g = np.array([
        -400.0 * x[0] * (x[1] - x[0] ** 2) - 2.0 * (1 - x[0]),
        200.0 * (x[1] - x[0] ** 2),
    ])
    return f, g, {}


def test_rosenbrock_unconstrained_box_wolfe():
    # Armijo-only backtracking rejects most curvature pairs on Rosenbrock's
    # valley and crawls; the curvature condition makes L-BFGS quadratic here.
    lb = np.full(2, -10.0)
    ub = np.full(2, 10.0)
    res = minimize_lbfgsb(_rosenbrock, np.array([-1.2, 1.0]), lb, ub,
                          maxiter=200, gatol=1e-8, grtol=0.0,
                          linesearch="wolfe")
    assert np.allclose(res.x, [1.0, 1.0], atol=1e-5), res
    assert "converged" in res.converged_reason
    assert res.niter < 80


def test_rosenbrock_active_bounds_wolfe():
    # optimum clipped by the box: solution sits on the bound x0 <= 0.5
    lb = np.array([-10.0, -10.0])
    ub = np.array([0.5, 10.0])
    res = minimize_lbfgsb(_rosenbrock, np.array([-1.2, 1.0]), lb, ub,
                          maxiter=300, gatol=1e-7, grtol=0.0,
                          linesearch="wolfe")
    assert abs(res.x[0] - 0.5) < 1e-6
    assert abs(res.x[1] - 0.25) < 1e-4


def test_wolfe_fewer_or_equal_iters_on_quartic():
    # steep anisotropic quartic where unit steps overshoot: the curvature
    # condition should keep the iteration count competitive with Armijo
    A = np.diag([1.0, 30.0, 900.0])

    def fun(x):
        q = A @ x
        f = 0.5 * x @ q + 0.05 * np.sum(x ** 4)
        g = q + 0.2 * x ** 3
        return f, g, {}

    lb = np.full(3, -50.0)
    ub = np.full(3, 50.0)
    x0 = np.array([10.0, 10.0, 10.0])
    res_w = minimize_lbfgsb(fun, x0, lb, ub, maxiter=200, gatol=1e-9,
                            grtol=0.0, linesearch="wolfe")
    res_a = minimize_lbfgsb(fun, x0, lb, ub, maxiter=200, gatol=1e-9,
                            grtol=0.0, linesearch="armijo")
    assert np.linalg.norm(res_w.x) < 1e-6
    assert np.linalg.norm(res_a.x) < 1e-6
    assert res_w.niter <= res_a.niter + 10


def test_wolfe_on_quantum_problem():
    import jax.numpy as jnp

    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.optim.driver import build_bounds, run_optimization
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 20.0, 120
    model = build_standard_model(
        nlevels=[2], freq01_ghz=[4.1], rotfreq_ghz=[4.1], selfkerr_ghz=[0.2])
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=8, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,))
    setup = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(2 * np.pi * 4.1,),
        initcond_type="pure", pure_levels=(0,),
        target_type="pure", pure_target_levels=(1,),
        objective_type="Jfrobenius", gamma_tik=1e-5)
    prob = Problem(setup)
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=setup.nparams) * 0.01
    lb, ub = build_bounds(setup.oscillators, [[0.02]])
    res = run_optimization(prob, p0, lb, ub, maxiter=60, inftol=1e-4,
                           verbose=False, linesearch="wolfe")
    assert res.infidelity < 1e-3, (res.infidelity, res.reason)
