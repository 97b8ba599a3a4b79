"""Trainable Pallas propagation: fused IMR step kernels with a hand-derived
reversible VJP, so the whole gradient sweep (forward + adjoint) runs as one
kernel launch per time step.

The forward kernel is `pallas_kernels._step_kernel` (state and Hamiltonian
planes resident in VMEM, all matmuls on the MXU). The backward pass is a
SECOND fused kernel per step that

1. reconstructs the pre-step state by running the same scheme with -dt
   (the IMR time symmetry the reference exploits in solveAdjointODE,
   timestepper.cpp:229-231 — no stored trajectory, O(1) state memory),
2. recomputes the truncated-Neumann iterates k_j from the reconstructed
   state (iters matvecs),
3. runs the exact real-arithmetic transpose of the computed step:
   reverse sweep over the Neumann recursion, emitting the state cotangent
   and the per-step Hamiltonian-plane cotangent (outer-product GEMMs).

The Hamiltonian-plane cotangents of all steps are contracted against the
operator stack with ONE batched GEMM at the end (the mirror image of the
forward pre-assembly `H_n = C[n] . stack`), which is where the coefficient
gradient C_bar comes from — the discrete-adjoint analog of the reference's
grad += lambda^T (dRHS/dc) x accumulation (optimproblem.cpp evalGradF).

Exactness: the VJP is the exact transpose of the *computed* forward step;
the only approximation is the -dt state reconstruction (error at the
Neumann truncation order, identical to ops/reversible.py). Closed systems
only — dissipative dynamics are not stably reversible.

f32/complex64 only (TPU-native planes). IMR (2nd order) steps.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from .pallas_kernels import _HAVE_PLTPU, _round_up, _step_kernel

if _HAVE_PLTPU:  # pragma: no branch
    from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _step_vjp_kernel(Hr_ref, Hi_ref, xr_ref, xi_ref, gr_ref, gi_ref,
                     xpr_ref, xpi_ref, gpr_ref, gpi_ref, Hbr_ref, Hbi_ref,
                     *, dt: float, iters: int):
    """Fused backward step: (post-step state, incoming cotangent) ->
    (reconstructed pre-step state, outgoing cotangent, H-plane cotangents).

    Matvec T(v) = -i H v in planes: T(vr, vi) = (ai, -ar) with
    ar = vr Hr^T - vi Hi^T, ai = vr Hi^T + vi Hr^T. Its real transpose is
    T^t(ur, ui) = (ur Hi - ui Hr, ur Hr + ui Hi), derived mechanically from
    the real inner product — no Hermiticity assumption needed.
    """
    Hr = Hr_ref[:]
    Hi = Hi_ref[:]
    xr = xr_ref[:]
    xi = xi_ref[:]
    gr = gr_ref[:]
    gi = gi_ref[:]
    a = dt / 2.0

    def T(vr, vi):
        ar = _dot(vr, Hr.T) - _dot(vi, Hi.T)
        ai = _dot(vr, Hi.T) + _dot(vi, Hr.T)
        return ai, -ar

    def Tt(ur, ui):
        return (_dot(ur, Hi) - _dot(ui, Hr),
                _dot(ur, Hr) + _dot(ui, Hi))

    # 1) reconstruct pre-step state: the same scheme with -dt
    br, bi = T(xr, xi)
    kr, ki = br, bi
    for _ in range(iters):
        mr, mi = T(kr, ki)
        kr = br - a * mr
        ki = bi - a * mi
    xpr = xr - dt * kr
    xpi = xi - dt * ki

    # 2) recompute the forward Neumann iterates k_0..k_{iters-1} from xp
    br, bi = T(xpr, xpi)
    ks = [(br, bi)]
    kr, ki = br, bi
    for _ in range(iters - 1):
        mr, mi = T(kr, ki)
        kr = br + a * mr
        ki = bi + a * mi
        ks.append((kr, ki))

    # 3) exact transpose of: b = T(xp); k_j = b + a T(k_{j-1}); x = xp + dt k_N
    kbr = dt * gr
    kbi = dt * gi
    bbr = jnp.zeros_like(gr)
    bbi = jnp.zeros_like(gi)
    Hbr = jnp.zeros_like(Hr)
    Hbi = jnp.zeros_like(Hi)

    def acc_H(Hbr, Hbi, cr, ci, ur, ui):
        # cotangent (cr, ci) applied through T at primal input (ur, ui):
        # Hbr += -ci^T ur + cr^T ui ; Hbi += cr^T ur + ci^T ui
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

    xpr_ref[:] = xpr
    xpi_ref[:] = xpi
    gpr_ref[:] = gr + tr
    gpi_ref[:] = gi + ti
    Hbr_ref[:] = Hbr
    Hbi_ref[:] = Hbi


def make_pallas_propagate(stack, dt: float, iters: int = 10,
                          penalty_fn: Optional[Callable] = None,
                          obs_fn: Optional[Callable] = None,
                          hist_penalty_fn: Optional[Callable] = None,
                          interpret: bool = False):
    """Build propagate(Sr, Si, x0, C, extras) -> (xT, pen_sum), differentiable
    in x0 and C via the fused kernels above.

    stack: (K, N, N) complex operator stack (only its SHAPE and padding are
    baked in here; the actual planes are passed as arguments Sr, Si so they
    can live device-resident — use `plane_args(stack)` to produce them).
    C: (ntime, K) real coefficient rows at step midpoints. penalty_fn(x,
    extra) -> pytree of per-step penalty contributions at post-step states
    (same contract as ops/reversible.make_reversible_propagate).

    History-dependent penalties (e.g. the population-second-derivative dpdm
    penalty, optimproblem.cpp evalF's penalty_dpdm integral) can't be
    expressed per step: obs_fn(x) -> low-dim per-step observable (e.g.
    populations) and hist_penalty_fn(obs_hist, x0, extras) -> penalty pytree
    over the STACKED (ntime, ...) observables. The forward pass stores only
    the observables (not the states); the backward pass computes the
    observable cotangents with one vectorized VJP of hist_penalty_fn, then
    injects them step-by-step during the reverse sweep. With both kinds
    active the returned pen_sum is {**per_step, **hist}.
    """
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    P = _round_up(N, 128)
    dt = float(dt)
    iters = int(iters)

    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}

    def _pen(x, extra):
        if penalty_fn is None:
            return ()
        return penalty_fn(x, extra)

    def _pack(x0):
        B = x0.shape[0]
        Bp = _round_up(B, 8)
        xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.real(x0).astype(jnp.float32))
        xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.imag(x0).astype(jnp.float32))
        return xr, xi

    def _unpack(xr, xi, B, dtype):
        return (xr[:B, :N] + 1j * xi[:B, :N]).astype(dtype)

    def _fwd_call(Bp):
        kern = functools.partial(_step_kernel, dt=dt, iters=iters)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(**vmem)] * 4,
            out_specs=(pl.BlockSpec(**vmem),) * 2,
            interpret=interpret)

    def _bwd_call(Bp):
        kern = functools.partial(_step_vjp_kernel, dt=dt, iters=iters)
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 4
            + (jax.ShapeDtypeStruct((P, P), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(**vmem)] * 6,
            out_specs=(pl.BlockSpec(**vmem),) * 6,
            interpret=interpret)

    has_hist = obs_fn is not None and hist_penalty_fn is not None

    def _run_forward(Sr, Si, x0, C, extras):
        B, dtype = x0.shape[0], x0.dtype
        Hr_all = jnp.tensordot(C.astype(jnp.float32), Sr, axes=1)
        Hi_all = jnp.tensordot(C.astype(jnp.float32), Si, axes=1)
        xr, xi = _pack(x0)
        call = _fwd_call(xr.shape[0])

        def body(carry, H):
            xr, xi = carry
            Hr, Hi, extra = H
            xr, xi = call(Hr, Hi, xr, xi)
            x = _unpack(xr, xi, B, dtype)
            obs = obs_fn(x) if has_hist else ()
            return (xr, xi), (_pen(x, extra), obs)

        (xr, xi), (pens, obs_hist) = jax.lax.scan(
            body, (xr, xi), (Hr_all, Hi_all, extras))
        pen_sum = jax.tree.map(lambda p: jnp.sum(p, axis=0), pens)
        if has_hist:
            pen_hist = hist_penalty_fn(obs_hist, x0, extras)
            if isinstance(pen_sum, dict) and isinstance(pen_hist, dict):
                pen_sum = {**pen_sum, **pen_hist}
            elif pen_sum == ():
                pen_sum = pen_hist
            else:
                pen_sum = (pen_sum, pen_hist)
        return _unpack(xr, xi, B, dtype), pen_sum, obs_hist

    @jax.custom_vjp
    def propagate(Sr, Si, x0, C, extras):
        xT, pen_sum, _ = _run_forward(Sr, Si, x0, C, extras)
        return xT, pen_sum

    def fwd(Sr, Si, x0, C, extras):
        xT, pen_sum, obs_hist = _run_forward(Sr, Si, x0, C, extras)
        return (xT, pen_sum), (Sr, Si, xT, C, extras, x0, obs_hist)

    def bwd(res, cots):
        Sr, Si, xT, C, extras, x0, obs_hist = res
        xT_bar, pen_bar = cots
        B, dtype = xT.shape[0], xT.dtype

        Hr_all = jnp.tensordot(C.astype(jnp.float32), Sr, axes=1)
        Hi_all = jnp.tensordot(C.astype(jnp.float32), Si, axes=1)
        xr, xi = _pack(xT)
        Bp = xr.shape[0]
        call = _bwd_call(Bp)

        # split the penalty cotangent into per-step and history parts
        pen_bar_step, pen_bar_hist, obs_bar, x0_hist_bar = pen_bar, (), None, None
        if has_hist:
            hist_shape = jax.eval_shape(
                lambda oh, x0_: hist_penalty_fn(oh, x0_, extras), obs_hist, x0)
            if isinstance(pen_bar, dict) and isinstance(hist_shape, dict):
                hk = set(hist_shape.keys())
                pen_bar_hist = {k: v for k, v in pen_bar.items() if k in hk}
                pen_bar_step = {k: v for k, v in pen_bar.items() if k not in hk}
            elif penalty_fn is None:
                pen_bar_hist, pen_bar_step = pen_bar, ()
            else:
                pen_bar_step, pen_bar_hist = pen_bar
            _, h_vjp = jax.vjp(
                lambda oh, x0_: hist_penalty_fn(oh, x0_, extras), obs_hist, x0)
            obs_bar, x0_hist_bar = h_vjp(pen_bar_hist)

        # incoming plane cotangents of the padded final state
        _, un_vjp = jax.vjp(lambda a, b: _unpack(a, b, B, dtype), xr, xi)
        gr, gi = un_vjp(xT_bar)

        def body(carry, inp):
            xr, xi, gr, gi = carry
            Hr, Hi, extra, ob = inp
            if penalty_fn is not None:
                # cotangent of the per-step penalty at the post-step state
                _, p_vjp = jax.vjp(
                    lambda a, b: _pen(_unpack(a, b, B, dtype), extra), xr, xi)
                pgr, pgi = p_vjp(pen_bar_step)
                gr = gr + pgr
                gi = gi + pgi
            if has_hist:
                # cotangent of this step's observable contribution
                _, o_vjp = jax.vjp(
                    lambda a, b: obs_fn(_unpack(a, b, B, dtype)), xr, xi)
                ogr, ogi = o_vjp(ob)
                gr = gr + ogr
                gi = gi + ogi
            xr, xi, gr, gi, Hbr, Hbi = call(Hr, Hi, xr, xi, gr, gi)
            return (xr, xi, gr, gi), (Hbr, Hbi)

        (xr0, xi0, gr, gi), (Hbr_all, Hbi_all) = jax.lax.scan(
            body, (xr, xi, gr, gi),
            (Hr_all, Hi_all, extras, obs_bar if has_hist else Hr_all[:, :1, :1]),
            reverse=True)

        # chain the plane cotangents back to x0 and C
        _, pk_vjp = jax.vjp(_pack, jnp.zeros_like(x0))
        (x0_bar,) = pk_vjp((gr, gi))
        if x0_hist_bar is not None:
            x0_bar = x0_bar + x0_hist_bar
        C_bar = (jnp.einsum("npq,kpq->nk", Hbr_all, Sr)
                 + jnp.einsum("npq,kpq->nk", Hbi_all, Si)).astype(C.dtype)

        def _zero(x):
            if jnp.issubdtype(x.dtype, jnp.floating) or \
                    jnp.issubdtype(x.dtype, jnp.complexfloating):
                return jnp.zeros_like(x)
            return np.zeros(x.shape, dtype=jax.dtypes.float0)

        return (jnp.zeros_like(Sr), jnp.zeros_like(Si), x0_bar, C_bar,
                jax.tree.map(_zero, extras))

    propagate.defvjp(fwd, bwd)
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
