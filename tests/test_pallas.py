"""Fused Pallas propagation kernel vs the XLA scan path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.pallas_kernels import pallas_propagate_dense
from quandary_tpu.ops.rhs import DenseEngine
from quandary_tpu.ops.steppers import make_step_fn, stage_midpoint_times
from quandary_tpu.ops import solvers


def test_pallas_propagate_matches_scan():
    model = build_standard_model(
        nlevels=[3, 2], freq01_ghz=[4.1, 5.0], rotfreq_ghz=[4.05, 4.95],
        selfkerr_ghz=[0.2, 0.15], jkl_ghz=[0.01], crosskerr_ghz=[0.002],
    )
    T, ntime = 2.0, 40
    dt = T / ntime
    rng = np.random.default_rng(0)
    K = model.K
    ts = stage_midpoint_times(ntime, dt, "IMR")
    C = rng.normal(size=(ntime, K)).astype(np.float32) * 0.05
    C[:, 0] = 1.0
    B = 5
    x0 = (rng.normal(size=(B, model.N)) + 1j * rng.normal(size=(B, model.N)))
    x0 = jnp.asarray(x0, dtype=jnp.complex64)

    # XLA scan reference (same f32 precision class)
    engine = DenseEngine(model, dtype=jnp.complex64)
    step = make_step_fn(engine.rhs, dt, "IMR", 10, "neumann")
    xT_scan, _ = solvers.propagate(step, x0, jnp.asarray(C)[:, None, :],
                                   remat=False)

    xT_pallas = pallas_propagate_dense(model.stack, C, x0, dt, iters=10,
                                       interpret=True)
    err = np.abs(np.asarray(xT_pallas) - np.asarray(xT_scan)).max()
    assert err < 1e-5, err
