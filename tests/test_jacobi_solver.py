"""Jacobi-preconditioned Neumann stage solve: must equal the converged plain
Neumann solve in the non-stiff regime and converge where plain Neumann
diverges (stiff Kerr diagonal)."""

import jax.numpy as jnp
import numpy as np

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.rhs import DenseEngine
from quandary_tpu.ops.steppers import make_step_fn


def test_jacobi_matches_neumann_nonstiff():
    model = build_standard_model(
        nlevels=[3, 2], freq01_ghz=[4.1, 5.0], rotfreq_ghz=[4.0, 4.9],
        selfkerr_ghz=[0.22, 0.1], crosskerr_ghz=[0.01], jkl_ghz=[0.002],
        decay_time=[40.0, 50.0], dephase_time=[30.0, 20.0], lindblad=True,
    )
    engine = DenseEngine(model)
    dt = 0.02
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=model.K)).at[0].set(1.0)
    N = model.N
    x = jnp.asarray(rng.normal(size=(2, N, N)) + 1j * rng.normal(size=(2, N, N)))
    sn = make_step_fn(engine.rhs, dt, "IMR", 30, "neumann")
    sj = make_step_fn(engine.rhs, dt, "IMR", 30, "jacobi", gen_diag=engine.gen_diag())
    yn = np.asarray(sn(x, c[None]))
    yj = np.asarray(sj(x, c[None]))
    assert np.abs(yn - yj).max() < 1e-10


def test_jacobi_converges_where_neumann_diverges():
    """Stiff Kerr diagonal (dt/2*lambda >> 1): plain Neumann blows up,
    Jacobi-preconditioned converges; verify against a direct dense solve."""
    model = build_standard_model(
        nlevels=[8], freq01_ghz=[4.1], rotfreq_ghz=[4.1], selfkerr_ghz=[2.0],
    )
    engine = DenseEngine(model)
    dt = 0.5                     # dt/2 * lambda_max ~ 175: savage
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.normal(size=model.K) * 0.05).at[0].set(1.0)
    x = jnp.asarray(rng.normal(size=(1, 8)) + 1j * rng.normal(size=(1, 8)))

    sj = make_step_fn(engine.rhs, dt, "IMR", 30, "jacobi", gen_diag=engine.gen_diag())
    yj = np.asarray(sj(x, c[None]))

    # direct dense reference: (I - dt/2 M) k = M x ; y = x + dt k
    H = np.asarray(model.stack[0] + c[1] * model.stack[1] + c[2] * model.stack[2])
    M = -1j * H
    b = (np.asarray(x)[0]) @ M.T
    k = np.linalg.solve(np.eye(8) - dt / 2 * M, b)
    y_ref = np.asarray(x)[0] + dt * k
    assert np.abs(yj[0] - y_ref).max() < 1e-9, np.abs(yj[0] - y_ref).max()

    sn = make_step_fn(engine.rhs, dt, "IMR", 30, "neumann")
    yn = np.asarray(sn(x, c[None]))
    assert not np.isfinite(yn).all() or np.abs(yn).max() > 1e6


def test_stiffness_guard_switches_at_accuracy_not_convergence():
    """Moderately stiff steps (dt/2*|H_diag| ~ 0.7, INSIDE the plain-Neumann
    convergence radius) must still select the Jacobi solve: the truncated
    series leaves ~u^(iters+1) relative error per step, which compounds
    exponentially over the horizon in the stiffest (guard-corner Kerr) mode
    while the essential-subspace fidelity looks sane. Regression for the
    bench flagship config, where plain Neumann at 8 iters inflated the
    penalty integrals to ~1e23 over 1221 steps."""
    import dataclasses
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import jax

    from bench import build_problem
    from quandary_tpu.problem import Problem

    _, setup0 = build_problem(pallas=False)
    short = dataclasses.replace(setup0, ntime=400)   # same dt, shorter horizon
    problem = Problem(short)
    assert problem.linsolver == "jacobi"

    params = jnp.asarray(np.random.default_rng(1234).uniform(
        -1, 1, short.nparams) * 0.005, dtype=jnp.float32)
    J, aux = jax.jit(problem.objective)(params, params)
    assert float(J) < 10.0, float(J)
    assert float(aux["obj_penal_dpdm"]) < 1.0

    # the raw plain-Neumann stepper at the same iteration count visibly
    # amplifies the stiffest mode on this config (norm growth ~4%/step),
    # while the jacobi stepper conserves the norm — the guard cannot be
    # bypassed through Problem (it overrides even an explicit 'neumann'
    # on stiff configs), so exercise the steppers directly
    from quandary_tpu.ops.steppers import make_step_fn

    eng = problem.engine
    x0 = jnp.zeros((1, problem.N), dtype=jnp.complex128
                   ).at[0, problem.N - 1].set(1.0)   # guard-corner state
    c = jnp.zeros((1, eng.stack.shape[0]), dtype=jnp.float64).at[0, 0].set(1.0)

    def norm_after(solver):
        step = make_step_fn(eng.rhs, short.dt, "IMR", short.linsolve_iters,
                            solver, gen_diag=eng.gen_diag())
        x, _ = jax.lax.scan(lambda x, _: (step(x, c), None), x0, None,
                            length=400)
        return float(jnp.linalg.norm(x))

    assert norm_after("neumann") > 1e3
    assert abs(norm_after("jacobi") - 1.0) < 1e-8


def test_time_parallel_jacobi_matches_sequential():
    """The matrix-form Jacobi recursion in the time-parallel propagator must
    reproduce the sequential jacobi scan exactly (same truncated iteration,
    products reassociated)."""
    import dataclasses
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import jax

    from bench import build_problem
    from quandary_tpu.problem import Problem

    _, setup0 = build_problem(pallas=False)
    short = dataclasses.replace(setup0, ntime=60, dtype=jnp.complex128)
    ptp = Problem(dataclasses.replace(short, time_parallel=True))
    pseq = Problem(dataclasses.replace(short, time_parallel=False))
    assert ptp.time_parallel and not pseq.time_parallel
    assert ptp.linsolver == "jacobi" and pseq.linsolver == "jacobi"

    params = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, short.nparams) * 0.01, dtype=jnp.float64)
    Jt, _ = jax.jit(ptp.objective)(params, params)
    Js, _ = jax.jit(pseq.objective)(params, params)
    assert abs(float(Jt) - float(Js)) < 1e-9, (float(Jt), float(Js))
