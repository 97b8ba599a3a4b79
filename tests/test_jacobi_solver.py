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
