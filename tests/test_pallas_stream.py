"""Grid-streamed fused Pallas path (ops/pallas_stream.py): one launch per
direction, H planes pipelined, state carried in a revisited VMEM block.
Interpret-mode checks on CPU: parity with the chunked kernels, parity with
plain AD for the Jacobi-preconditioned solve (stiff systems), vmap over
candidates, and Problem-level objective/gradient parity with the scan path
on a stiff configuration where the fused path previously disabled itself."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.ops import pallas_stream
from quandary_tpu.ops.pallas_adjoint import make_pallas_propagate, plane_args
from quandary_tpu.ops.pallas_stream import make_stream_propagate
from quandary_tpu.ops.steppers import jacobi_neumann_solve


@pytest.fixture(autouse=True)
def _exact_f32_kernels(monkeypatch):
    """Structural-parity tests pin the kernels at exact-f32 matmuls; the
    shipping default is the 3-pass bf16 emulation ('high'), whose error
    bound is characterized separately in test_high_precision_error_bound."""
    monkeypatch.setattr(pallas_stream, "_PRECISION_MODE", "highest")


def _random_hermitian_stack(rng, K, N, stiff=0.0):
    stack = np.zeros((K, N, N), dtype=np.complex128)
    for k in range(K):
        A = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
        stack[k] = (A + A.conj().T) / 2.0
    if stiff:
        stack[0] += np.diag(rng.uniform(stiff / 3.0, stiff, N))
    return stack


def _loss_pair(rng, B, N, ntime):
    tgt = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
           ).astype(np.complex64)
    wt = rng.uniform(0.1, 1.0, ntime).astype(np.float32)

    def loss(xT, hist):
        ov = jnp.sum(jnp.conj(jnp.asarray(tgt)) * xT, axis=1)
        hw = jnp.sum(jnp.asarray(wt)[:, None, None] * jnp.abs(hist) ** 2)
        return jnp.sum(jnp.abs(ov) ** 2) + 0.25 * hw

    return loss


@pytest.mark.parametrize("ntime,iters", [(1, 8), (7, 8), (19, 8), (7, 3)])
def test_stream_matches_chunked(ntime, iters):
    """Neumann variant: bit-identical math to the chunked kernels for any
    ntime (no chunk-padding special case exists in the streamed form).
    iters=3 also exercises the stored-iterate backward path (iters <= 4
    stores the forward stage iterates instead of replaying them)."""
    rng = np.random.default_rng(7)
    K, N, B, dt = 4, 12, 3, 0.02
    stack = _random_hermitian_stack(rng, K, N)
    C = jnp.asarray(rng.normal(size=(ntime, K)) * 0.7)
    x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
          ).astype(np.complex64)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    loss = _loss_pair(rng, B, N, ntime)

    chunk = make_pallas_propagate(stack, dt, iters, interpret=True)
    stream = make_stream_propagate(stack, dt, iters, interpret=True)

    def f(prop):
        def g(C, x0):
            xT, hist = prop(Sr, Si, jnp.asarray(x0), C)
            return loss(xT, hist)
        return g

    v0, g0 = jax.value_and_grad(f(chunk), argnums=(0, 1))(C, x0)
    v1, g1 = jax.value_and_grad(f(stream), argnums=(0, 1))(C, x0)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    for a, b in zip(g0, g1):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6 * max(
            np.abs(np.asarray(a)).max(), 1e-12)


def test_stream_jacobi_matches_scan_ad():
    """Jacobi variant on a STIFF diagonal (dt/2*|d| up to ~1, where plain
    Neumann diverges): gradients must match plain AD through the identical
    jacobi_neumann_solve recursion."""
    rng = np.random.default_rng(1)
    K, N, B, ntime, dt, iters = 4, 12, 2, 11, 0.05, 8
    stack = _random_hermitian_stack(rng, K, N, stiff=40.0)
    gen_diag = (-1j * np.diagonal(stack[0])).astype(np.complex64)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
          ).astype(np.complex64)
    C = np.asarray(rng.normal(size=(ntime, K)) * 0.3, dtype=np.float32)
    C[:, 0] = 1.0
    loss = _loss_pair(rng, B, N, ntime)

    S = jnp.asarray(stack.astype(np.complex64))
    d = jnp.asarray(gen_diag)[None]

    def f_scan(C_, x0_):
        def step(x, c):
            H = jnp.tensordot(c.astype(jnp.complex64), S, axes=1)
            mv = lambda v: -1j * (v @ H.T)
            k = jacobi_neumann_solve(mv, d, mv(x), dt / 2.0, iters)
            x = x + dt * k
            return x, x
        xT, hist = jax.lax.scan(step, jnp.asarray(x0_), jnp.asarray(C_))
        return loss(xT, hist)

    prop = make_stream_propagate(stack, dt, iters, gen_diag=gen_diag,
                                 linsolver="jacobi", interpret=True)

    def f_stream(C_, x0_):
        xT, hist = prop(Sr, Si, jnp.asarray(x0_), jnp.asarray(C_))
        return loss(xT, hist)

    Cj = jnp.asarray(C)
    v0, g0 = jax.value_and_grad(f_scan, argnums=(0, 1))(Cj, x0)
    v1, g1 = jax.value_and_grad(f_stream, argnums=(0, 1))(Cj, x0)
    assert float(v0) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 5e-5 * max(np.abs(a).max(), 1e-12)


def test_stream_vmap_over_candidates():
    """vmap prepends a parallel grid axis; program_id must keep indexing the
    user step axis (carry init per candidate)."""
    rng = np.random.default_rng(0)
    K, N, B, ntime = 3, 6, 2, 5
    stack = _random_hermitian_stack(rng, K, N)
    prop = make_stream_propagate(stack, 0.02, 6, interpret=True)
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
    v0, g0 = jax.value_and_grad(loss)(Cs[2])
    assert abs(float(v[2]) - float(v0)) < 1e-5
    assert np.abs(np.asarray(g[2] - g0)).max() < 1e-5


def test_stream_split_matches_scan_split():
    """Split variant: the in-kernel diagonally-split stepper must match the
    scan-path split stepper (steppers.make_step_fn linsolver='split') on
    value and gradient, on a STIFF diagonal."""
    from quandary_tpu.ops.steppers import make_step_fn

    rng = np.random.default_rng(3)
    K, N, B, ntime, dt, iters = 4, 12, 2, 11, 0.05, 4
    stack = _random_hermitian_stack(rng, K, N, stiff=40.0)
    gen_diag = (-1j * np.diagonal(stack[0])).astype(np.complex128)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
          ).astype(np.complex64)
    C = np.asarray(rng.normal(size=(ntime, K)) * 0.3, dtype=np.float32)
    C[:, 0] = 1.0
    loss = _loss_pair(rng, B, N, ntime)

    S = jnp.asarray(stack.astype(np.complex64))
    step = make_step_fn(lambda c, x: -1j * (x @ jnp.tensordot(
        c.astype(jnp.complex64), S, axes=1).T), dt, "IMR",
        linsolve_iters=iters, linsolver="split", gen_diag=gen_diag)

    def f_scan(C_, x0_):
        def body(x, c):
            x = step(x, c[None])
            return x, x
        xT, hist = jax.lax.scan(body, jnp.asarray(x0_), jnp.asarray(C_))
        return loss(xT, hist)

    prop = make_stream_propagate(stack, dt, iters, gen_diag=gen_diag,
                                 linsolver="split", interpret=True)

    def f_stream(C_, x0_):
        xT, hist = prop(Sr, Si, jnp.asarray(x0_), jnp.asarray(C_))
        return loss(xT, hist)

    Cj = jnp.asarray(C)
    v0, g0 = jax.value_and_grad(f_scan, argnums=(0, 1))(Cj, x0)
    v1, g1 = jax.value_and_grad(f_stream, argnums=(0, 1))(Cj, x0)
    assert float(v0) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 5e-5 * max(np.abs(a).max(), 1e-12)


def test_problem_split_pallas_parity():
    """Explicit linsolver='split' on a dense problem keeps the fused path
    eligible and matches the scan path on value and gradient."""
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 4.0, 12
    model = build_standard_model(
        nlevels=[4], freq01_ghz=[4.1], rotfreq_ghz=[0.0],
        selfkerr_ghz=[0.25], crosskerr_ghz=[], jkl_ghz=[])
    oscs = (OscillatorControl(
        segments=(ControlSegment("spline", nsplines=4, tstart=0.0,
                                 tstop=T),),
        carrier_freqs=(0.0,)),)
    base = Setup(
        model=model, nessential=(3,), ntime=ntime, dt=T / ntime,
        linsolve_iters=4, linsolver="split",
        oscillators=oscs, ground_freqs_radns=(4.1 * 2 * np.pi,),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1,), objective_type="Jfrobenius",
        gamma_tik=1e-4, gamma_penalty=0.1,
        dtype=jnp.complex64, time_parallel=False)

    rng = np.random.default_rng(2)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.02,
                         dtype=jnp.float64)
    ref = jnp.zeros_like(params)

    outs = {}
    for flag in (False, True):
        prob = Problem(dataclasses.replace(base, pallas=flag))
        assert prob.linsolver == "split"
        assert prob.use_pallas == flag
        (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
            params, ref)
        outs[flag] = (float(J), np.asarray(g))

    J0, g0 = outs[False]
    J1, g1 = outs[True]
    assert abs(J1 - J0) < 5e-6 * max(1.0, abs(J0))
    assert np.abs(g1 - g0).max() < 5e-5 * max(np.abs(g0).max(), 1e-12)


def test_problem_lindblad_pallas_parity():
    """Open systems run fused (streamed kernels on the vectorized
    pseudo-Hamiltonian H' = i*L): value and gradient must match the scan
    path on a decaying + dephasing two-level+guard system."""
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 4.0, 10
    model = build_standard_model(
        nlevels=[3], freq01_ghz=[4.1], rotfreq_ghz=[4.1],
        selfkerr_ghz=[0.22], crosskerr_ghz=[], jkl_ghz=[],
        decay_time=[100.0], dephase_time=[50.0], lindblad=True)
    oscs = (OscillatorControl(
        segments=(ControlSegment("spline", nsplines=4, tstart=0.0,
                                 tstop=T),),
        carrier_freqs=(0.0,)),)
    base = Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        linsolve_iters=8,
        oscillators=oscs, ground_freqs_radns=(4.1 * 2 * np.pi,),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1,), objective_type="Jtrace",
        gamma_tik=1e-4, gamma_penalty=0.1,
        dtype=jnp.complex64, time_parallel=False)

    rng = np.random.default_rng(4)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.02,
                         dtype=jnp.float64)
    ref = jnp.zeros_like(params)

    outs = {}
    for flag in (False, True):
        prob = Problem(dataclasses.replace(base, pallas=flag))
        assert prob.lindblad
        assert prob.use_pallas == flag
        (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
            params, ref)
        outs[flag] = (float(J), np.asarray(g), float(aux["fidelity"]))

    J0, g0, f0 = outs[False]
    J1, g1, f1 = outs[True]
    assert abs(J1 - J0) < 5e-6 * max(1.0, abs(J0))
    assert abs(f1 - f0) < 5e-6
    assert np.abs(g1 - g0).max() < 5e-5 * max(np.abs(g0).max(), 1e-12)


def test_high_precision_error_bound(monkeypatch):
    """The default in-kernel precision ('high', 3-pass bf16 hi/lo split)
    stays within ~1e-4 relative of the exact-f32 kernels on value and
    gradient over a multi-step propagation — accurate enough for
    optimization (measured 2.7e-5 gradient error on the 1221-step CNOT
    flagship, scripts/perf/pallas_precision_check.py)."""
    rng = np.random.default_rng(5)
    K, N, B, ntime, dt, iters = 4, 12, 3, 25, 0.02, 8
    stack = _random_hermitian_stack(rng, K, N)
    C = jnp.asarray(rng.normal(size=(ntime, K)) * 0.7)
    x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
          ).astype(np.complex64)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    loss = _loss_pair(rng, B, N, ntime)

    outs = {}
    for mode in ("highest", "high"):
        monkeypatch.setattr(pallas_stream, "_PRECISION_MODE", mode)
        prop = make_stream_propagate(stack, dt, iters, interpret=True)

        def f(C_, x0_, prop=prop):
            xT, hist = prop(Sr, Si, jnp.asarray(x0_), C_)
            return loss(xT, hist)

        v, g = jax.value_and_grad(f, argnums=(0, 1))(C, x0)
        outs[mode] = (float(v), [np.asarray(a) for a in g])

    v0, g0 = outs["highest"]
    v1, g1 = outs["high"]
    assert abs(v1 - v0) < 2e-4 * abs(v0)
    for a, b in zip(g0, g1):
        assert np.abs(a - b).max() < 5e-4 * max(np.abs(a).max(), 1e-12)


def test_problem_parity_at_default_high_precision(monkeypatch):
    """End-to-end objective/gradient parity at the SHIPPING default
    in-kernel precision ('high', 3-pass bf16 hi/lo emulation) — no
    fixture override. Regressions in the hi/lo split path (operand
    pre-decomposition, dropped al@bl term bookkeeping) must be caught at
    the configuration users actually run, not only at exact-f32. Bound:
    the characterized ~1.5e-5/product error compounding over ntime=14
    steps stays well under 2e-4 relative on value and 1e-3 on gradient."""
    import os
    monkeypatch.setattr(pallas_stream, "_PRECISION_MODE",
                        os.environ.get("QTPU_PALLAS_PRECISION", "high"))
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 4.0, 14
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=[3, 3], freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[])
    oscs = tuple(OscillatorControl(
        segments=(ControlSegment("spline", nsplines=4, tstart=0.0,
                                 tstop=T),),
        carrier_freqs=(0.0, 2 * np.pi * (freq01[1 - k] - freq01[k]),))
        for k in range(2))
    base = Setup(
        model=model, nessential=(2, 2), ntime=ntime, dt=T / ntime,
        linsolve_iters=8,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1, 0), objective_type="Jtrace",
        gamma_tik=1e-4, gamma_penalty=0.1, gamma_penalty_energy=0.1,
        dtype=jnp.complex64, time_parallel=False)

    rng = np.random.default_rng(11)
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
    assert abs(J1 - J0) < 2e-4 * max(1.0, abs(J0))
    assert np.abs(g1 - g0).max() < 1e-3 * max(np.abs(g0).max(), 1e-12)


def test_problem_stiff_jacobi_pallas_parity():
    """A stiff config (large self-Kerr at coarse dt triggers the Jacobi
    stage solve) must (a) remain pallas-eligible under the streamed kernels
    and (b) match the scan path on value and gradient."""
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 4.0, 12
    model = build_standard_model(
        nlevels=[4], freq01_ghz=[4.1], rotfreq_ghz=[0.0],  # lab-frame-ish:
        selfkerr_ghz=[0.25], crosskerr_ghz=[], jkl_ghz=[])  # stiff diagonal
    oscs = (OscillatorControl(
        segments=(ControlSegment("spline", nsplines=4, tstart=0.0,
                                 tstop=T),),
        carrier_freqs=(0.0,)),)
    base = Setup(
        model=model, nessential=(3,), ntime=ntime, dt=T / ntime,
        linsolve_iters=10,
        oscillators=oscs, ground_freqs_radns=(4.1 * 2 * np.pi,),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1,), objective_type="Jfrobenius",
        gamma_tik=1e-4, gamma_penalty=0.1,
        dtype=jnp.complex64, time_parallel=False)

    probe = Problem(dataclasses.replace(base, pallas=False))
    assert probe.linsolver == "jacobi", \
        "config not stiff enough to exercise the jacobi gate"

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


def test_stack_cotangents_fd():
    """The custom VJP's operator-stack cotangents (previously silently
    zero) must match finite differences — needed when the stack is
    parameter-dependent (Hamiltonian calibration, sampled-model
    ensembles)."""
    rng = np.random.default_rng(9)
    K, N, B, ntime, dt, iters = 3, 8, 2, 7, 0.03, 5
    stack = _random_hermitian_stack(rng, K, N)
    C = jnp.asarray(rng.normal(size=(ntime, K)).astype(np.float32) * 0.5)
    x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
          ).astype(np.complex64)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    loss = _loss_pair(rng, B, N, ntime)

    prop = make_stream_propagate(stack, dt, iters, interpret=True)

    def f(Sr_, Si_):
        xT, hist = prop(Sr_, Si_, jnp.asarray(x0), C)
        return loss(xT, hist)

    gSr, gSi = jax.grad(f, argnums=(0, 1))(Sr, Si)
    assert float(jnp.abs(gSr).max()) > 0.0
    eps = 1e-3
    for arr, g, name in ((Sr, gSr, "Sr"), (Si, gSi, "Si")):
        for _ in range(3):
            k = rng.integers(K)
            i, j = rng.integers(N), rng.integers(N)
            e = jnp.zeros_like(arr).at[k, i, j].set(eps)
            fd = (float(f(*(arr + e, Si) if name == "Sr" else (Sr, arr + e)))
                  - float(f(*(arr - e, Si) if name == "Sr"
                            else (Sr, arr - e)))) / (2 * eps)
            got = float(g[k, i, j])
            assert abs(got - fd) < 2e-2 * max(1.0, abs(fd)), \
                (name, k, i, j, got, fd)


def test_streamk_matches_stream_all_solvers():
    """make_streamk_propagate (in-kernel plane contraction, coefficient
    cotangents emitted directly) must reproduce make_stream_propagate for
    every solver mode: values bit-exact, gradients to f32 reduction-order
    rounding. The streamK path never materializes the (ntime, P, P) plane
    arrays in HBM — it exists to kill that glue (the dominant cost of the
    open-system fused path, PERF.md)."""
    from quandary_tpu.ops.pallas_adjoint import plane_args
    from quandary_tpu.ops.pallas_stream import (make_stream_propagate,
                                                make_streamk_propagate)

    rng = np.random.default_rng(0)
    K, N, B, ntime = 4, 12, 3, 9
    stack = (rng.normal(size=(K, N, N))
             + 1j * rng.normal(size=(K, N, N))).astype(np.complex64)
    Sr, Si = plane_args(stack)
    x0 = (rng.normal(size=(B, N))
          + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    C = rng.normal(size=(ntime, K)).astype(np.float32) * 0.3
    gen_diag = (-1j * np.diag(stack[0])).astype(np.complex128)

    for solver in ("neumann", "jacobi", "split"):
        p1 = make_stream_propagate(stack, 0.01, 3, gen_diag=gen_diag,
                                   linsolver=solver, interpret=True)
        p2 = make_streamk_propagate(stack, 0.01, 3, gen_diag=gen_diag,
                                    linsolver=solver, interpret=True)

        def loss(f):
            def g(C_):
                xT, hist = f(jnp.asarray(Sr), jnp.asarray(Si),
                             jnp.asarray(x0), C_)
                return (jnp.sum(jnp.abs(xT) ** 2)
                        + 0.1 * jnp.sum(jnp.abs(hist) ** 2))
            return g

        v1, g1 = jax.value_and_grad(loss(p1))(jnp.asarray(C))
        v2, g2 = jax.value_and_grad(loss(p2))(jnp.asarray(C))
        # the in-kernel contraction sums the K slots in a different order
        # than the XLA tensordot -> 1-ulp f32 plane differences
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6,
                                   err_msg=solver)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=0, atol=2e-6 * float(
                                       jnp.abs(g1).max()),
                                   err_msg=solver)


def test_streamk_problem_parity_closed_and_lindblad():
    """Full objective/gradient parity of pallas_mode='streamk' against
    'stream' through Problem, closed AND open (vec(rho) pseudo-Hamiltonian)
    systems."""
    import dataclasses

    from __graft_entry__ import _build_problem
    from quandary_tpu.problem import Problem

    for lind in (False, True):
        prob0, setup = _build_problem(ntime=12, T=2.0, lindblad=lind)
        pS = Problem(dataclasses.replace(setup, pallas=True,
                                         pallas_mode="stream"))
        pK = Problem(dataclasses.replace(setup, pallas=True,
                                         pallas_mode="streamk"))
        assert pS.use_pallas and pK.use_pallas
        rng = np.random.default_rng(3)
        params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02,
                             jnp.float32)
        (JS, _), gS = jax.jit(jax.value_and_grad(
            pS.objective, has_aux=True))(params, params)
        (JK, _), gK = jax.jit(jax.value_and_grad(
            pK.objective, has_aux=True))(params, params)
        assert float(JS) == float(JK), lind
        # stream and streamK contract the same planes in different
        # orders; the f32 rounding spread is host-dependent (measured
        # 6.2e-7 of max on an avx512 host where 5e-7 was green) — use
        # the same 2e-6 envelope as the per-solver parity test above
        np.testing.assert_allclose(
            np.asarray(gK), np.asarray(gS), rtol=0,
            atol=2e-6 * float(jnp.abs(gS).max()), err_msg=str(lind))


def test_streamk_stack_cotangents_are_zero_by_contract():
    """The streamK vjp returns ZERO stack cotangents by documented design
    (the plane cotangents are never materialized). This test pins that the
    zeros are the declared contract — anyone differentiating the stacks
    must use make_stream_propagate — while the C gradient stays exact."""
    from quandary_tpu.ops.pallas_adjoint import plane_args
    from quandary_tpu.ops.pallas_stream import (make_stream_propagate,
                                                make_streamk_propagate)

    rng = np.random.default_rng(1)
    K, N, B, ntime = 3, 8, 2, 6
    stack = (rng.normal(size=(K, N, N))
             + 1j * rng.normal(size=(K, N, N))).astype(np.complex64)
    Sr, Si = plane_args(stack)
    x0 = (rng.normal(size=(B, N))
          + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    C = rng.normal(size=(ntime, K)).astype(np.float32) * 0.3

    pK = make_streamk_propagate(stack, 0.01, 3, linsolver="neumann",
                                interpret=True)
    pS = make_stream_propagate(stack, 0.01, 3, linsolver="neumann",
                               interpret=True)

    def loss(f, Sr_, Si_):
        xT, hist = f(Sr_, Si_, jnp.asarray(x0), jnp.asarray(C))
        return jnp.sum(jnp.abs(xT) ** 2)

    gK = jax.grad(loss, argnums=(1, 2))(pK, jnp.asarray(Sr),
                                        jnp.asarray(Si))
    gS = jax.grad(loss, argnums=(1, 2))(pS, jnp.asarray(Sr),
                                        jnp.asarray(Si))
    assert float(jnp.abs(gK[0]).max()) == 0.0
    assert float(jnp.abs(gK[1]).max()) == 0.0
    assert float(jnp.abs(gS[0]).max()) > 0.0   # the stream path has them


@pytest.mark.parametrize("solver", ["neumann", "jacobi", "split"])
def test_packed_matches_streamk_per_candidate(solver):
    """make_streamk_packed_propagate (G candidates lane-packed into one
    kernel program via block-diagonal planes) must reproduce the unpacked
    streamK kernel per candidate: final states, histories, and the Cg/x0
    gradients. G=5 at N=12 exercises NG=60 < P=128 padding."""
    from quandary_tpu.ops.pallas_adjoint import plane_args
    from quandary_tpu.ops.pallas_stream import (
        make_streamk_packed_propagate, make_streamk_propagate)

    rng = np.random.default_rng(7)
    K, N, B, dt, ntime, iters, G = 4, 12, 3, 0.02, 9, 3, 5
    stack = (rng.normal(size=(K, N, N))
             + 1j * rng.normal(size=(K, N, N))).astype(np.complex64)
    gen_diag = (-1j * np.diag(stack[0])).astype(np.complex128)
    x0 = (rng.normal(size=(B, N))
          + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    Cg = jnp.asarray(rng.normal(size=(ntime, G, K)) * 0.3, jnp.float32)
    Sr, Si = map(jnp.asarray, plane_args(stack))
    tgt = (rng.normal(size=(G, B, N))
           + 1j * rng.normal(size=(G, B, N))).astype(np.complex64)
    wt = jnp.asarray(rng.uniform(0.1, 1.0, ntime).astype(np.float32))

    sk = make_streamk_propagate(stack, dt, iters, gen_diag=gen_diag,
                                linsolver=solver, interpret=True)
    pk = make_streamk_packed_propagate(stack, dt, iters, gen_diag=gen_diag,
                                       linsolver=solver, group=G,
                                       interpret=True)

    def loss_packed(Cg_, x0_):
        xT, hist = pk(Sr, Si, jnp.asarray(x0_), Cg_)
        ov = jnp.sum(jnp.conj(jnp.asarray(tgt)) * xT, axis=-1)
        return (jnp.sum(jnp.abs(ov) ** 2)
                + 0.25 * jnp.sum(wt[:, None, None, None]
                                 * jnp.abs(hist) ** 2))

    def loss_unpacked(Cg_, x0_):
        tot = 0.0
        outs = []
        for g in range(G):
            xT, hist = sk(Sr, Si, jnp.asarray(x0_), Cg_[:, g, :])
            ov = jnp.sum(jnp.conj(jnp.asarray(tgt)[g]) * xT, axis=-1)
            tot = (tot + jnp.sum(jnp.abs(ov) ** 2)
                   + 0.25 * jnp.sum(wt[:, None, None] * jnp.abs(hist) ** 2))
            outs.append((xT, hist))
        return tot, outs

    _, outs = loss_unpacked(Cg, x0)
    xTp, histp = pk(Sr, Si, jnp.asarray(x0), Cg)
    for g in range(G):
        np.testing.assert_allclose(np.asarray(xTp[g]),
                                   np.asarray(outs[g][0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(histp[:, g]),
                                   np.asarray(outs[g][1]), atol=1e-6)

    v1, g1 = jax.value_and_grad(loss_packed, argnums=(0, 1))(Cg, x0)
    v0, g0 = jax.value_and_grad(
        lambda c, x: loss_unpacked(c, x)[0], argnums=(0, 1))(Cg, x0)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6)
    for a, b in zip(g0, g1):
        sc = max(float(jnp.abs(a).max()), 1e-30)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-5 * sc)


@pytest.mark.parametrize("lind", [False, True])
def test_packed_ensemble_problem_parity(lind):
    """Problem._ensemble_vg with pack_group > 1 (lane-packed group kernel)
    must reproduce the per-candidate vmapped value_and_grad: J, gradients,
    and every aux column, for closed AND open (vec(rho)) systems."""
    import dataclasses

    from __graft_entry__ import _build_problem
    from quandary_tpu.problem import Problem

    _, setup = _build_problem(ntime=12, T=2.0, lindblad=lind)
    pK = Problem(dataclasses.replace(setup, pallas=True,
                                     pallas_mode="streamk"))
    assert pK.use_pallas and pK.pack_group > 1
    rng = np.random.default_rng(3)
    E = 2 * pK.pack_group
    Ps = jnp.asarray(rng.normal(size=(E, setup.nparams)) * 0.02, jnp.float32)
    params = jnp.zeros((setup.nparams,), jnp.float32)

    base = jax.vmap(jax.value_and_grad(pK.objective, has_aux=True),
                    in_axes=(0, None))
    (J0, aux0), g0 = jax.jit(base)(Ps, params)
    (J1, aux1), g1 = jax.jit(pK._ensemble_vg())(Ps, params)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J0), rtol=5e-6)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=0,
        atol=5e-6 * float(jnp.abs(g0).max()))
    for k in aux0:
        np.testing.assert_allclose(np.asarray(aux1[k]), np.asarray(aux0[k]),
                                   rtol=1e-5, atol=1e-8, err_msg=k)


@pytest.mark.parametrize("ntime", [13, 16])
def test_packed_tc_blocking_edges(ntime):
    """Tc-blocking edges: prime ntime (13 -> Tc=1, unamortized fallback)
    and maximal blocking (16 -> Tc=8). Values and gradients must match the
    unpacked streamK kernel per candidate."""
    from quandary_tpu.ops.pallas_adjoint import plane_args
    from quandary_tpu.ops.pallas_stream import (
        make_streamk_packed_propagate, make_streamk_propagate)

    rng = np.random.default_rng(3)
    K, N, B, dt, iters, G = 3, 8, 2, 0.02, 2, 4
    stack = (rng.normal(size=(K, N, N))
             + 1j * rng.normal(size=(K, N, N))).astype(np.complex64)
    gen_diag = (-1j * np.diag(stack[0])).astype(np.complex128)
    x0 = (rng.normal(size=(B, N))
          + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    Cg = jnp.asarray(rng.normal(size=(ntime, G, K)) * 0.3, jnp.float32)
    Sr, Si = map(jnp.asarray, plane_args(stack))

    sk = make_streamk_propagate(stack, dt, iters, gen_diag=gen_diag,
                                linsolver="split", interpret=True)
    pk = make_streamk_packed_propagate(stack, dt, iters, gen_diag=gen_diag,
                                       linsolver="split", group=G,
                                       interpret=True)

    def loss_p(Cg_):
        xT, hist = pk(Sr, Si, jnp.asarray(x0), Cg_)
        return jnp.sum(jnp.abs(xT) ** 2) + 0.1 * jnp.sum(jnp.abs(hist) ** 2)

    v1, g1 = jax.value_and_grad(loss_p)(Cg)
    tot = 0.0
    gs = []
    for g in range(G):
        def loss_u(c):
            xT, hist = sk(Sr, Si, jnp.asarray(x0), c)
            return (jnp.sum(jnp.abs(xT) ** 2)
                    + 0.1 * jnp.sum(jnp.abs(hist) ** 2))
        v, gu = jax.value_and_grad(loss_u)(Cg[:, g, :])
        tot += float(v)
        gs.append(np.asarray(gu))
    assert float(v1) == pytest.approx(tot, rel=1e-6)
    g0 = np.stack(gs, axis=1)
    np.testing.assert_allclose(np.asarray(g1), g0, rtol=0,
                               atol=2e-5 * np.abs(g0).max())


@pytest.mark.parametrize("solver", ["neumann", "split"])
def test_stacked_matvec_matches_default_exactly(solver, monkeypatch):
    """QTPU_PALLAS_STACKED_MATVEC=1 applies each H-plane dot to the
    row-stacked [vr; vi] operand (2 MXU issues per matvec instead of 4).
    Row results are independent and the bf16 split is elementwise, so the
    packed kernel's outputs and Cg/x0 gradients must match the default
    form to float-roundoff exactly (prepared for on-chip A/B during the
    round-5 relay outage; see pallas_stream._stacked_matvec)."""
    from quandary_tpu.ops.pallas_adjoint import plane_args
    from quandary_tpu.ops.pallas_stream import make_streamk_packed_propagate

    rng = np.random.default_rng(23)
    K, N, B, dt, ntime, iters, G = 3, 8, 2, 0.02, 6, 3, 4
    stack = _random_hermitian_stack(rng, K, N)
    gen_diag = (-1j * np.diag(stack[0])).astype(np.complex128)
    x0 = (rng.normal(size=(B, N))
          + 1j * rng.normal(size=(B, N))).astype(np.complex64)
    Cg = jnp.asarray(rng.normal(size=(ntime, G, K)) * 0.3, jnp.float32)
    Sr, Si = map(jnp.asarray, plane_args(stack))

    def run(stacked):
        monkeypatch.setenv("QTPU_PALLAS_STACKED_MATVEC",
                           "1" if stacked else "0")
        pk = make_streamk_packed_propagate(
            stack, dt, iters, gen_diag=gen_diag, linsolver=solver,
            group=G, interpret=True)

        def loss(Cg_, x0_):
            xT, hist = pk(Sr, Si, x0_, Cg_)
            return (jnp.sum(jnp.abs(xT) ** 2)
                    + 0.1 * jnp.sum(jnp.abs(hist) ** 2)), (xT, hist)

        (v, (xT, hist)), (gC, gx) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(Cg, jnp.asarray(x0))
        return v, xT, hist, gC, gx

    v0, xT0, h0, gC0, gx0 = run(False)
    v1, xT1, h1, gC1, gx1 = run(True)
    assert float(v0) == pytest.approx(float(v1), rel=1e-6, abs=1e-9)
    for a, b, tol in ((xT0, xT1, 1e-6), (h0, h1, 1e-6),
                      (gC0, gC1, 2e-6), (gx0, gx1, 2e-6)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0,
            atol=tol * max(float(np.abs(np.asarray(a)).max()), 1e-30))
