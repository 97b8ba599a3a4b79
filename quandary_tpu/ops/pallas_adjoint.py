"""Trainable Pallas propagation: multi-step fused IMR kernels with a
hand-derived VJP, so a full gradient sweep costs ~2*ntime/Tc kernel launches
instead of ~4*iters*ntime XLA ops (or 2*ntime single-step launches).

Forward: one kernel integrates Tc consecutive IMR steps with the state and
all Tc Hamiltonian planes resident in VMEM, writing the per-step state
history (small: (Tc, B, P)) alongside the final state. The stored history
makes every state-dependent penalty a single vectorized XLA op outside the
kernel — the storeFWD strategy of the reference (timestepper.cpp, storeFWD)
with the storage cost paid at f32 plane precision.

Backward: one kernel per chunk replays the truncated-Neumann iterates from
the stored pre-step states and applies the exact real-arithmetic transpose
of the computed step, consuming per-step cotangent injections (the
penalties' contribution, computed by XLA from the history cotangent) and
emitting per-step Hamiltonian-plane cotangents. The coefficient gradient is
ONE batched contraction of those planes against the operator stack — the
discrete-adjoint analog of the reference's grad += lambda^T (dRHS/dc) x
accumulation (optimproblem.cpp evalGradF).

The public contract is simply

    propagate(Sr, Si, x0, C) -> (xT, history)

with `history` the complex (ntime, B, N) post-step states; callers express
penalties as ordinary jnp functions of `history` (and x0) and AD routes
their cotangents through the kernels automatically. f32/complex64-plane
arithmetic, IMR (2nd order), closed systems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from .pallas_kernels import _HAVE_PLTPU, _round_up

if _HAVE_PLTPU:  # pragma: no branch
    from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    # HIGHEST: f32 multi-pass — the default single bf16 pass (~4e-3 relative
    # per product) compounds fatally over ntime sequential steps.
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _chunk_len(P: int, Bp: int, budget_bytes: int = 5 << 20) -> int:
    """Steps per kernel launch. The binding constraint is the BACKWARD
    kernel: 4 chunk-sized (tc, P, P) plane arrays (H in, H-bar out) plus
    state/injection rows, and Mosaic's scoped-vmem accounting runs ~2.5x the
    naive operand footprint — hence the conservative budget against the
    16 MB VMEM limit."""
    per_step = 4 * (4 * P * P + 6 * Bp * P)
    return max(1, min(16, budget_bytes // per_step))


def _multistep_kernel(Hr_ref, Hi_ref, xr_ref, xi_ref,
                      our_ref, oui_ref, hr_ref, hi_ref,
                      *, dt: float, iters: int, tc: int):
    """Integrate tc IMR steps; write the post-step state history."""
    xr = xr_ref[:]
    xi = xi_ref[:]
    half = dt / 2.0
    for t in range(tc):
        Hr = Hr_ref[t]
        Hi = Hi_ref[t]

        def matvec(vr, vi, Hr=Hr, Hi=Hi):
            ar = _dot(vr, Hr.T) - _dot(vi, Hi.T)
            ai = _dot(vr, Hi.T) + _dot(vi, Hr.T)
            return ai, -ar

        br, bi = matvec(xr, xi)
        kr, ki = br, bi
        for _ in range(iters):
            mr, mi = matvec(kr, ki)
            kr = br + half * mr
            ki = bi + half * mi
        xr = xr + dt * kr
        xi = xi + dt * ki
        hr_ref[t] = xr
        hi_ref[t] = xi
    our_ref[:] = xr
    oui_ref[:] = xi


def _multistep_vjp_kernel(Hr_ref, Hi_ref, xpr_ref, xpi_ref, jr_ref, ji_ref,
                          gr_ref, gi_ref,
                          gor_ref, goi_ref, Hbr_ref, Hbi_ref,
                          *, dt: float, iters: int, tc: int):
    """Exact transpose of tc computed steps.

    xp*_ref hold the PRE-step states of each step in the chunk; j*_ref the
    per-step cotangent injections at the post-step states (penalty terms).
    Matvec T(v) = -i H v in planes; its real transpose is
    T^t(u) = (u Hi - .. , u Hr + ..) — see the derivation in git history /
    tests (no Hermiticity assumption).
    """
    gr = gr_ref[:]
    gi = gi_ref[:]
    a = dt / 2.0
    for t in range(tc - 1, -1, -1):
        gr = gr + jr_ref[t]
        gi = gi + ji_ref[t]
        Hr = Hr_ref[t]
        Hi = Hi_ref[t]
        xpr = xpr_ref[t]
        xpi = xpi_ref[t]

        def T(vr, vi, Hr=Hr, Hi=Hi):
            ar = _dot(vr, Hr.T) - _dot(vi, Hi.T)
            ai = _dot(vr, Hi.T) + _dot(vi, Hr.T)
            return ai, -ar

        def Tt(ur, ui, Hr=Hr, Hi=Hi):
            return (_dot(ur, Hi) - _dot(ui, Hr),
                    _dot(ur, Hr) + _dot(ui, Hi))

        # replay the forward Neumann iterates k_0..k_{iters-1}
        br, bi = T(xpr, xpi)
        ks = [(br, bi)]
        kr, ki = br, bi
        for _ in range(iters - 1):
            mr, mi = T(kr, ki)
            kr = br + a * mr
            ki = bi + a * mi
            ks.append((kr, ki))

        # transpose of: b = T(xp); k_j = b + a T(k_{j-1}); x = xp + dt k_N
        kbr = dt * gr
        kbi = dt * gi
        bbr = jnp.zeros_like(gr)
        bbi = jnp.zeros_like(gi)
        Hbr = jnp.zeros_like(Hr)
        Hbi = jnp.zeros_like(Hi)

        def acc_H(Hbr, Hbi, cr, ci, ur, ui):
            Hbr = Hbr + (_dot(ui.T, cr).T - _dot(ur.T, ci).T)
            Hbi = Hbi + (_dot(ur.T, cr).T + _dot(ui.T, ci).T)
            return Hbr, Hbi

        for j in range(iters, 0, -1):
            bbr = bbr + kbr
            bbi = bbi + kbi
            ur, ui = ks[j - 1]
            Hbr, Hbi = acc_H(Hbr, Hbi, a * kbr, a * kbi, ur, ui)
            kbr, kbi = Tt(a * kbr, a * kbi)
        bbr = bbr + kbr
        bbi = bbi + kbi
        Hbr, Hbi = acc_H(Hbr, Hbi, bbr, bbi, xpr, xpi)
        tr, ti = Tt(bbr, bbi)
        gr = gr + tr
        gi = gi + ti
        Hbr_ref[t] = Hbr
        Hbi_ref[t] = Hbi
    gor_ref[:] = gr
    goi_ref[:] = gi


def make_pallas_propagate(stack, dt: float, iters: int = 10,
                          interpret: bool = False):
    """Build propagate(Sr, Si, x0, C) -> (xT, history), differentiable in x0
    and C via the fused multi-step kernels above.

    stack: (K, N, N) complex operator stack — only its shape/padding is used
    here; pass the padded planes from `plane_args(stack)` as Sr, Si (device-
    resident). C: (ntime, K) real coefficient rows at the step midpoints.
    history: complex (ntime, B, N) post-step states — express state
    penalties as jnp functions of it; their gradients flow automatically.
    """
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    P = _round_up(N, 128)
    dt = float(dt)
    iters = int(iters)

    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}

    def _pack(x0):
        B = x0.shape[0]
        Bp = _round_up(B, 8)
        xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.real(x0).astype(jnp.float32))
        xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.imag(x0).astype(jnp.float32))
        return xr, xi

    def _unpack_hist(hr, hi, B, dtype):
        # (ntime, Bp, P) planes -> (ntime, B, N) complex
        return (hr[:, :B, :N] + 1j * hi[:, :B, :N]).astype(dtype)

    def _calls(Bp, tc):
        fwd_kern = functools.partial(_multistep_kernel, dt=dt, iters=iters,
                                     tc=tc)
        fwd = pl.pallas_call(
            fwd_kern,
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2
            + (jax.ShapeDtypeStruct((tc, Bp, P), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(**vmem)] * 4,
            out_specs=(pl.BlockSpec(**vmem),) * 4,
            interpret=interpret)
        bwd_kern = functools.partial(_multistep_vjp_kernel, dt=dt,
                                     iters=iters, tc=tc)
        bwd = pl.pallas_call(
            bwd_kern,
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2
            + (jax.ShapeDtypeStruct((tc, P, P), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(**vmem)] * 8,
            out_specs=(pl.BlockSpec(**vmem),) * 4,
            interpret=interpret)
        return fwd, bwd

    def _plan(ntime, Bp):
        tc = min(_chunk_len(P, Bp), ntime)
        n_chunks = -(-ntime // tc)
        return tc, n_chunks, n_chunks * tc - ntime

    def _h_chunks(C, ntime, tc, pad, Sr, Si):
        Cf = C.astype(jnp.float32)
        if pad:
            # zero rows are exact identity steps (H = 0 -> x' = x)
            Cf = jnp.concatenate(
                [Cf, jnp.zeros((pad, Cf.shape[1]), jnp.float32)])
        Hr = jnp.tensordot(Cf, Sr, axes=1).reshape(-1, tc, P, P)
        Hi = jnp.tensordot(Cf, Si, axes=1).reshape(-1, tc, P, P)
        return Hr, Hi

    def _run_forward(Sr, Si, x0, C):
        B, dtype = x0.shape[0], x0.dtype
        ntime = C.shape[0]
        xr, xi = _pack(x0)
        Bp = xr.shape[0]
        tc, n_chunks, pad = _plan(ntime, Bp)
        Hr_c, Hi_c = _h_chunks(C, ntime, tc, pad, Sr, Si)
        fwd_call, _ = _calls(Bp, tc)

        def body(carry, H):
            xr, xi = carry
            xr, xi, hr, hi = fwd_call(H[0], H[1], xr, xi)
            return (xr, xi), (hr, hi)

        (xr, xi), (hr, hi) = jax.lax.scan(body, (xr, xi), (Hr_c, Hi_c))
        hr = hr.reshape(-1, Bp, P)[:ntime]
        hi = hi.reshape(-1, Bp, P)[:ntime]
        xT = (xr[:B, :N] + 1j * xi[:B, :N]).astype(dtype)
        return xT, _unpack_hist(hr, hi, B, dtype), (hr, hi)

    @jax.custom_vjp
    def propagate(Sr, Si, x0, C):
        xT, hist, _ = _run_forward(Sr, Si, x0, C)
        return xT, hist

    def fwd2(Sr, Si, x0, C):
        xT, hist, planes = _run_forward(Sr, Si, x0, C)
        x0p = _pack(x0)
        return (xT, hist), (Sr, Si, C, jnp.zeros_like(x0), planes, x0p)

    def bwd2(res, cots):
        Sr, Si, C, x0_proto, (hr, hi), (x0r, x0i) = res
        xT_bar, hist_bar = cots
        B, dtype = x0_proto.shape[0], x0_proto.dtype
        ntime = C.shape[0]
        Bp = hr.shape[1]
        tc, n_chunks, pad = _plan(ntime, Bp)
        Hr_c, Hi_c = _h_chunks(C, ntime, tc, pad, Sr, Si)
        _, bwd_call = _calls(Bp, tc)

        # per-step cotangent injections from the history cotangent
        _, h_vjp = jax.vjp(lambda a, b: _unpack_hist(a, b, B, dtype), hr, hi)
        jr, ji = h_vjp(hist_bar)
        if pad:
            z = jnp.zeros((pad, Bp, P), jnp.float32)
            jr = jnp.concatenate([jr, z])
            ji = jnp.concatenate([ji, z])
        jr_c = jr.reshape(n_chunks, tc, Bp, P)
        ji_c = ji.reshape(n_chunks, tc, Bp, P)

        # pre-step states: pre[t] = hist[t-1], pre[0] = x0
        pre_r = jnp.concatenate([x0r[None], hr[:-1]])
        pre_i = jnp.concatenate([x0i[None], hi[:-1]])
        if pad:
            # padded identity steps start from the final state (irrelevant:
            # their H-bar rows are discarded)
            zpr = jnp.broadcast_to(hr[-1], (pad, Bp, P))
            pre_r = jnp.concatenate([pre_r, zpr])
            pre_i = jnp.concatenate([pre_i, jnp.broadcast_to(hi[-1],
                                                             (pad, Bp, P))])
        pre_r = pre_r.reshape(n_chunks, tc, Bp, P)
        pre_i = pre_i.reshape(n_chunks, tc, Bp, P)

        # incoming cotangent of the FINAL state (plane form)
        def unpack_xT(a, b):
            return (a[:B, :N] + 1j * b[:B, :N]).astype(dtype)

        _, u_vjp = jax.vjp(unpack_xT, hr[-1], hi[-1])
        gr, gi = u_vjp(xT_bar)

        def body(carry, inp):
            gr, gi = carry
            Hr, Hi, pr, pi, jjr, jji = inp
            gr, gi, Hbr, Hbi = bwd_call(Hr, Hi, pr, pi, jjr, jji, gr, gi)
            return (gr, gi), (Hbr, Hbi)

        (gr, gi), (Hbr, Hbi) = jax.lax.scan(
            body, (gr, gi), (Hr_c, Hi_c, pre_r, pre_i, jr_c, ji_c),
            reverse=True)
        Hbr = Hbr.reshape(-1, P, P)[:ntime]
        Hbi = Hbi.reshape(-1, P, P)[:ntime]

        _, pk_vjp = jax.vjp(_pack, x0_proto)
        (x0_bar,) = pk_vjp((gr, gi))
        C_bar = (jnp.einsum("npq,kpq->nk", Hbr, Sr)
                 + jnp.einsum("npq,kpq->nk", Hbi, Si)).astype(C.dtype)
        # operator-stack cotangents: Hr(n) = sum_k C[n,k] Sr[k], so
        # dL/dSr[k] = sum_n C[n,k] Hb(n) — needed when the stack itself is
        # parameter-dependent (Hamiltonian calibration, sampled-model
        # ensembles); previously silently zero
        Cf = C.astype(jnp.float32)
        Sr_bar = jnp.einsum("nk,npq->kpq", Cf, Hbr).astype(Sr.dtype)
        Si_bar = jnp.einsum("nk,npq->kpq", Cf, Hbi).astype(Si.dtype)
        return Sr_bar, Si_bar, x0_bar, C_bar

    propagate.defvjp(fwd2, bwd2)
    return propagate


def plane_args(stack):
    """Padded f32 re/im planes of the operator stack, for make_pallas_propagate."""
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    P = _round_up(N, 128)
    Sr = np.zeros((K, P, P), dtype=np.float32)
    Si = np.zeros((K, P, P), dtype=np.float32)
    Sr[:, :N, :N] = stack.real
    Si[:, :N, :N] = stack.imag
    return Sr, Si
