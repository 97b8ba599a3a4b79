"""Fused multi-step Pallas path: the chunked step/VJP kernels must reproduce
plain reverse-mode AD of the identical truncated-Neumann IMR math (interpret
mode on CPU), including gradients flowing through the state HISTORY output
(integral penalties)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.ops.pallas_adjoint import make_pallas_propagate, plane_args


def _random_hermitian_stack(rng, K, N):
    stack = np.zeros((K, N, N), dtype=np.complex128)
    for k in range(K):
        A = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
        stack[k] = (A + A.conj().T) / 2.0
    return stack


def _reference_propagate(stack, dt, iters):
    """Pure-jnp replica of the kernel math (same truncation), returning the
    full history, for ground-truth AD."""
    S = jnp.asarray(stack.astype(np.complex64))

    def step(x, c):
        H = jnp.tensordot(c.astype(jnp.complex64), S, axes=1)

        def matvec(v):
            return -1j * (v @ H.T)

        b = matvec(x)
        k = b
        for _ in range(iters):
            k = b + (dt / 2.0) * matvec(k)
        return x + dt * k

    def prop(x0, C):
        def body(x, c):
            x = step(x, c)
            return x, x

        xT, hist = jax.lax.scan(body, x0, C)
        return xT, hist

    return prop


@pytest.mark.parametrize("N,B,ntime", [(6, 3, 19), (12, 5, 8)])
def test_gradient_matches_plain_ad(N, B, ntime):
    """ntime=19 > chunk length 16 exercises multi-chunk scanning AND the
    chunk-remainder (identity-step padding) path; ntime=8 stays single-chunk."""
    rng = np.random.default_rng(7)
    K, dt, iters = 4, 0.02, 8
    stack = _random_hermitian_stack(rng, K, N)
    C = rng.normal(size=(ntime, K)).astype(np.float64) * 0.7
    x0 = rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
    x0 = (x0 / np.linalg.norm(x0, axis=1, keepdims=True)).astype(np.complex64)
    tgt = rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
    tgt = jnp.asarray(tgt.astype(np.complex64))
    w = jnp.asarray(rng.normal(size=(ntime,)).astype(np.float32))

    prop = make_pallas_propagate(stack, dt, iters, interpret=True)
    Sr, Si = plane_args(stack)
    Sr, Si = jnp.asarray(Sr), jnp.asarray(Si)

    def full_loss(xT, hist):
        ov = jnp.sum(jnp.conj(tgt) * xT, axis=1)
        # history-dependent term: weighted norm-in-window integral
        hw = jnp.sum(w[:, None, None] * jnp.abs(hist) ** 2)
        return jnp.sum(jnp.abs(ov) ** 2) + 0.25 * hw

    def loss_pl(C, x0):
        xT, hist = prop(Sr, Si, jnp.asarray(x0), C)
        return full_loss(xT, hist)

    ref_prop = _reference_propagate(stack, dt, iters)

    def loss_ref(C, x0):
        xT, hist = ref_prop(jnp.asarray(x0), C.astype(jnp.float32))
        return full_loss(xT, hist)

    Cj = jnp.asarray(C)
    v_pl, (gC_pl, gx_pl) = jax.value_and_grad(loss_pl, argnums=(0, 1))(Cj, x0)
    v_rf, (gC_rf, gx_rf) = jax.value_and_grad(loss_ref, argnums=(0, 1))(Cj, x0)

    assert abs(float(v_pl) - float(v_rf)) < 1e-5 * max(1.0, abs(float(v_rf)))
    gC_pl, gC_rf = np.asarray(gC_pl), np.asarray(gC_rf)
    gx_pl, gx_rf = np.asarray(gx_pl), np.asarray(gx_rf)
    scale = max(np.abs(gC_rf).max(), 1e-12)
    assert np.abs(gC_pl - gC_rf).max() < 2e-4 * scale, \
        np.abs(gC_pl - gC_rf).max() / scale
    sx = max(np.abs(gx_rf).max(), 1e-12)
    assert np.abs(gx_pl - gx_rf).max() < 2e-4 * sx


def test_vmap_over_candidates():
    """The ensemble axis: vmap(value_and_grad) over control candidates."""
    rng = np.random.default_rng(0)
    K, N, B, ntime = 3, 6, 2, 5
    stack = _random_hermitian_stack(rng, K, N)
    prop = make_pallas_propagate(stack, 0.02, 6, interpret=True)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    x0 = jnp.asarray((rng.normal(size=(B, N))
                      + 1j * rng.normal(size=(B, N))).astype(np.complex64))
    Cs = jnp.asarray(rng.normal(size=(4, ntime, K)).astype(np.float32))

    def loss(C):
        xT, hist = prop(Sr, Si, x0, C)
        return (jnp.sum(jnp.abs(xT) ** 2 * jnp.arange(N)[None, :])
                + 0.1 * jnp.sum(jnp.abs(hist[:, :, -1]) ** 2))

    v, g = jax.vmap(jax.value_and_grad(loss))(Cs)
    assert v.shape == (4,) and g.shape == Cs.shape
    assert np.isfinite(np.asarray(v)).all()
    # per-candidate results match unbatched evaluation
    v0, g0 = jax.value_and_grad(loss)(Cs[2])
    assert abs(float(v[2]) - float(v0)) < 1e-5
    assert np.abs(np.asarray(g[2] - g0)).max() < 1e-5


def test_problem_objective_parity_pallas():
    """Problem with pallas=True (interpret) must match pallas=False on value
    and gradient, including guard-leakage and dpdm penalties."""
    import dataclasses

    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 2.0, 10
    model = build_standard_model(
        nlevels=[3, 3], freq01_ghz=[4.1, 4.9], rotfreq_ghz=[4.1, 4.9],
        selfkerr_ghz=[0.22, 0.23], crosskerr_ghz=[0.01], jkl_ghz=[0.004])
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=4, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0,)) for _ in range(2))
    base = Setup(
        model=model, nessential=(2, 2), ntime=ntime, dt=T / ntime,
        linsolve_iters=8,
        oscillators=oscs, ground_freqs_radns=(4.1, 4.9),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1, 1), objective_type="Jfrobenius",
        gamma_tik=1e-4, gamma_penalty=0.1, gamma_penalty_dpdm=0.02,
        dtype=jnp.complex64, time_parallel=False)

    rng = np.random.default_rng(2)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.02,
                         dtype=jnp.float64)
    ref = jnp.zeros_like(params)

    outs = {}
    for flag in (False, True):
        prob = Problem(dataclasses.replace(base, pallas=flag))
        assert prob.use_pallas == flag
        (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
            params, ref)
        outs[flag] = (float(J), np.asarray(g))

    J0, g0 = outs[False]
    J1, g1 = outs[True]
    assert abs(J1 - J0) < 5e-6 * max(1.0, abs(J0))
    assert np.abs(g1 - g0).max() < 5e-5 * max(np.abs(g0).max(), 1e-12)
