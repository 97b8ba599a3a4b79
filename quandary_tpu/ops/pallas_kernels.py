"""Pallas TPU kernels: fully-fused dense propagation.

`pallas_propagate_dense` runs the ENTIRE IMR time loop inside ONE kernel:
the operator stack, the state batch and every Neumann iterate stay resident
in VMEM for all `ntime` steps — zero HBM round-trips between steps, zero
per-step dispatch overhead. This is the speed-of-light formulation for the
small-N regime (N_pad = 128/256) where the XLA scan path is dominated by
per-op latencies: total HBM traffic is one read of (stack, coefficients,
x0) and one write of xT.

Complex arithmetic is explicit re/im f32 planes (TPU MXU native). The
Hamiltonian H(t) = sum_k c_k(t) O_k is re-assembled per step from the VMEM
stack with one small contraction; each Neumann iterate is two (B, P) x
(P, P) matmul pairs.

VMEM budget: stack 2*K*P^2*4B (e.g. K=21, P=128: 2.7 MB) + states + C rows.

The kernel is forward-only (simulation / fidelity evaluation / line-search
probes); training uses the XLA scan/associative-scan paths whose AD is the
discrete adjoint. Numerical parity with the scan path is tested in
interpret mode and on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
try:  # pltpu is importable on CPU too (for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _step_kernel(Hr_ref, Hi_ref, xr_ref, xi_ref, our_ref, oui_ref,
                 *, dt: float, iters: int):
    """One fused IMR step: b = Mx; k <- b + dt/2 M k (iters times);
    x <- x + dt k. Everything resident in VMEM, all matmuls on the MXU."""
    Hr = Hr_ref[:]
    Hi = Hi_ref[:]
    xr = xr_ref[:]
    xi = xi_ref[:]
    half = dt / 2.0

    def matvec(vr, vi):
        # y = -i H v with v as rows: Hv -> v @ H^T ; -i(ar + i ai) = ai - i ar
        # HIGHEST: full-f32 matmul passes (the default single bf16 pass
        # compounds ~4e-3 relative error per product over ntime steps)
        dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        ar = dot(vr, Hr.T) - dot(vi, Hi.T)
        ai = dot(vr, Hi.T) + dot(vi, Hr.T)
        return ai, -ar

    br, bi = matvec(xr, xi)
    kr, ki = br, bi
    for _ in range(iters):
        mr, mi = matvec(kr, ki)
        kr = br + half * mr
        ki = bi + half * mi
    our_ref[:] = xr + dt * kr
    oui_ref[:] = xi + dt * ki


def pallas_propagate_dense(stack, C, x0, dt: float, iters: int = 10,
                           interpret: bool = False):
    """Propagate x0 (B, N) complex through all IMR steps.

    The per-step Hamiltonians H(t_n + dt/2) = sum_k C[n,k] O_k for ALL steps
    are assembled with one batched contraction (MXU), then a `lax.scan`
    drives the fused Pallas step kernel — one kernel launch per step instead
    of ~4*(iters+1) XLA ops.

    stack: (K, N, N) complex operator stack (numpy or jax);
    C: (ntime, K) real coefficient rows at the step midpoints (IMR).
    Returns xT (B, N) complex. N and B are padded to the f32 tile (8, 128);
    the padding is exact (zero rows/columns do not couple).
    """
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    C = jnp.asarray(C, dtype=jnp.float32)
    x0 = jnp.asarray(x0)
    B = x0.shape[0]

    P = _round_up(N, 128)
    Bp = _round_up(B, 8)
    Sr = np.zeros((K, P, P), dtype=np.float32)
    Si = np.zeros((K, P, P), dtype=np.float32)
    Sr[:, :N, :N] = stack.real
    Si[:, :N, :N] = stack.imag
    xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(jnp.real(x0).astype(jnp.float32))
    xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(jnp.imag(x0).astype(jnp.float32))

    # all per-step Hamiltonian planes at once: (ntime, P, P)
    Hr_all = jnp.tensordot(C, jnp.asarray(Sr), axes=1)
    Hi_all = jnp.tensordot(C, jnp.asarray(Si), axes=1)

    kern = functools.partial(_step_kernel, dt=float(dt), iters=int(iters))
    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, P), jnp.float32)),
        in_specs=[pl.BlockSpec(**vmem)] * 4,
        out_specs=(pl.BlockSpec(**vmem), pl.BlockSpec(**vmem)),
        interpret=interpret,
    )

    def scan_step(carry, H):
        xr, xi = carry
        Hr, Hi = H
        xr, xi = call(Hr, Hi, xr, xi)
        return (xr, xi), None

    (xr, xi), _ = jax.lax.scan(scan_step, (xr, xi), (Hr_all, Hi_all))
    return (xr[:B, :N] + 1j * xi[:B, :N]).astype(x0.dtype)
