"""Multi-device mesh sharding on the virtual 8-device CPU mesh: the sharded
objective/gradient must equal the unsharded one, and the driver's
dryrun_multichip must pass."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")


def test_sharded_objective_matches_unsharded():
    from __graft_entry__ import _build_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    prob_ref, setup = _build_problem(ntime=12, T=2.0, lindblad=True,
                                     dtype=jnp.complex128)
    params = jnp.asarray(np.random.default_rng(0).normal(size=setup.nparams) * 0.02)
    (J_ref, aux_ref), g_ref = jax.value_and_grad(
        prob_ref.objective, has_aux=True)(params, params)

    for (ni, nh) in [(8, 1), (4, 2), (2, 2)]:
        prob, setup2 = _build_problem(ntime=12, T=2.0, lindblad=True,
                                      dtype=jnp.complex128)
        mesh = make_mesh(ni, nh)
        shard_problem(prob, mesh, shard_hilbert=(nh > 1))
        with mesh:
            (J, aux), g = jax.jit(jax.value_and_grad(
                prob.objective, has_aux=True))(params, params)
        assert abs(float(J) - float(J_ref)) < 1e-10, (ni, nh)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-12)


def test_sharded_grouped_matches_unsharded():
    """Hilbert-axis sharding for the GroupedEngine (the large-N flagship):
    the (B, m1, m2) state sharded on m1 over 'hilbert' must reproduce the
    unsharded objective and gradient exactly — X @ H_R^T and the diagonal
    cross-Kerr mask are local, H_L @ X and the cross-JC products gather the
    state over 'hilbert' (parallel/mesh.py)."""
    from __graft_entry__ import _build_grouped_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    prob_ref, setup = _build_grouped_problem(dtype=jnp.complex128)
    params = jnp.asarray(
        np.random.default_rng(3).normal(size=setup.nparams) * 0.02)
    (J_ref, aux_ref), g_ref = jax.value_and_grad(
        prob_ref.objective, has_aux=True)(params, params)

    for (ni, nh) in [(4, 2), (2, 4), (1, 8)]:
        prob, _ = _build_grouped_problem(dtype=jnp.complex128)
        mesh = make_mesh(ni, nh)
        shard_problem(prob, mesh, shard_hilbert=True)
        with mesh:
            (J, aux), g = jax.jit(jax.value_and_grad(
                prob.objective, has_aux=True))(params, params)
        assert abs(float(J) - float(J_ref)) < 1e-10, (ni, nh)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-12)


def test_sharded_grouped_wrapped_value_and_grad():
    """The composed path: shard_problem THEN build_value_and_grad — the
    threaded big arrays must be materialized with mesh shardings
    (_wrap_with_data mesh placement) and match the unsharded result."""
    from __graft_entry__ import _build_grouped_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    prob_ref, setup = _build_grouped_problem(dtype=jnp.complex128)
    params = jnp.asarray(
        np.random.default_rng(5).normal(size=setup.nparams) * 0.02)
    (J_ref, _), g_ref = jax.value_and_grad(
        prob_ref.objective, has_aux=True)(params, params)

    prob, _ = _build_grouped_problem(dtype=jnp.complex128)
    mesh = make_mesh(4, 2)
    shard_problem(prob, mesh, shard_hilbert=True)
    with mesh:
        vg = prob.build_value_and_grad()
        (J, _), g = vg(params, params)
    assert abs(float(J) - float(J_ref)) < 1e-10
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dryrun_multichip(8)
    dryrun_multichip(2)
