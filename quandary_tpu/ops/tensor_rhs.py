"""Tensor (matrix-free) RHS engine: per-axis contractions for large N.

The reference's matrix-free kernels (mastereq.cpp:1280-3240) iterate scalar
stencils over all multi-indices and are template-instantiated per level count
(limited to 2..5 oscillators). Here the state is an actual rank-Q (or 2Q for
Lindblad) tensor and every Hamiltonian term is a small (n_k x n_k) matrix
contracted along one axis — XLA lowers these to batched GEMMs, any Q works,
and the cost is O(N * sum_k n_k) per RHS application, memory-bandwidth bound
exactly like the reference's stencils but vectorized and batchable.

Diagonal terms (detuning, Kerr, cross-Kerr, the diagonal Lindblad pieces)
are folded into broadcastable per-axis level vectors, so nothing of size N
beyond the states themselves is materialized for the open system.

Sharding: contractions along axis k touch only that axis; sharding any OTHER
tensor axis over the 'hilbert' mesh axis keeps every contraction local and
XLA partitions the elementwise diagonal work for free. (This is the answer
to the reference's open problem of parallelizing the matfree solver,
user_guide.md:363 — shard the largest axes, contract locally.)

Coefficient layout matches the dense engine:
    c = [1, p_0..p_{Q-1}, q_0..q_{Q-1}, cos(eta t).., sin(eta t)..]
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.operators import coupling_pairs, lowering


@dataclasses.dataclass(frozen=True)
class StructuredModel:
    """Closed-form standard-model parameters (all rad/ns) for the tensor
    engine — the structural counterpart of HamiltonianModel's dense stack."""
    dims: Tuple[int, ...]
    detune: Tuple[float, ...]
    selfkerr: Tuple[float, ...]
    crosskerr: Tuple[float, ...]        # per (k<l) pair, len Q(Q-1)/2
    jkl: Tuple[float, ...]              # per (k<l) pair (only nonzero used)
    etas: Tuple[float, ...]             # per NONZERO jkl pair
    jc_pairs: Tuple[Tuple[int, int], ...]
    gamma_decay: Tuple[float, ...]      # 1/T1 per oscillator (0 = off)
    gamma_dephase: Tuple[float, ...]    # 1/T2 per oscillator
    lindblad: bool

    @property
    def n_osc(self) -> int:
        return len(self.dims)

    @property
    def N(self) -> int:
        return int(np.prod(self.dims, dtype=np.int64))

    @property
    def n_jc(self) -> int:
        return len(self.jc_pairs)

    @property
    def K(self) -> int:
        return 1 + 2 * self.n_osc + 2 * self.n_jc

    def coeff_rows(self, p, q, ts):
        nt = p.shape[0]
        cols = [jnp.ones((nt, 1), dtype=p.dtype), p, q]
        if self.n_jc > 0:
            phase = jnp.asarray(ts)[:, None] * jnp.asarray(self.etas)[None, :]
            cols.append(jnp.cos(phase))
            cols.append(jnp.sin(phase))
        return jnp.concatenate(cols, axis=1)


def build_structured_model(
    *,
    nlevels: Sequence[int],
    freq01_ghz: Sequence[float],
    rotfreq_ghz: Sequence[float],
    selfkerr_ghz: Sequence[float],
    crosskerr_ghz: Sequence[float] = (),
    jkl_ghz: Sequence[float] = (),
    decay_time: Sequence[float] = (),
    dephase_time: Sequence[float] = (),
    lindblad: bool = False,
) -> StructuredModel:
    dims = tuple(int(n) for n in nlevels)
    Q = len(dims)
    twopi = 2.0 * np.pi
    pairs = coupling_pairs(Q)
    ck = (list(crosskerr_ghz) + [0.0] * len(pairs))[: len(pairs)]
    jj = (list(jkl_ghz) + [0.0] * len(pairs))[: len(pairs)]
    rot = list(rotfreq_ghz)
    jc_pairs = []
    etas = []
    jvals = []
    for idkl, (k, l) in enumerate(pairs):
        if abs(jj[idkl]) > 1e-14:
            jc_pairs.append((k, l))
            jvals.append(twopi * jj[idkl])
            etas.append(twopi * (rot[k] - rot[l]))
    T1 = list(decay_time) + [0.0] * Q
    T2 = list(dephase_time) + [0.0] * Q
    g1 = tuple((1.0 / t if (lindblad and t > 1e-14) else 0.0) for t in T1[:Q])
    g2 = tuple((1.0 / t if (lindblad and t > 1e-14) else 0.0) for t in T2[:Q])
    return StructuredModel(
        dims=dims,
        detune=tuple(twopi * (f - r) for f, r in zip(freq01_ghz, rot)),
        selfkerr=tuple(twopi * x for x in selfkerr_ghz),
        crosskerr=tuple(twopi * x for x in ck),
        jkl=tuple(jvals),
        etas=tuple(etas),
        jc_pairs=tuple(jc_pairs),
        gamma_decay=g1,
        gamma_dephase=g2,
        lindblad=lindblad,
    )


def _lmul(M, x, axis):
    """Contract tensor axis `axis` (0-based including batch at 0) with M from
    the left: out[..., i, ...] = sum_j M[i, j] x[..., j, ...]."""
    xt = jnp.moveaxis(x, axis, -1)
    y = xt @ M.T
    return jnp.moveaxis(y, -1, axis)


def _rmul(M, x, axis):
    """Right multiplication along a column axis:
    out[..., j, ...] = sum_l x[..., l, ...] M[l, j]."""
    xt = jnp.moveaxis(x, axis, -1)
    y = xt @ M
    return jnp.moveaxis(y, -1, axis)


class TensorEngine:
    """rhs(c, x) with x flat (B, N) [Schroedinger] or (B, N, N) [Lindblad]."""

    def __init__(self, model: StructuredModel, dtype=jnp.complex128):
        self.model = model
        self.dtype = dtype
        self.lindblad = model.lindblad
        self.dims = model.dims
        self.N = model.N
        Q = model.n_osc
        self.Q = Q

        # small per-oscillator operators — host-side numpy; jit embeds them
        # as constants without device round trips (see DenseEngine note)
        ndt = np.complex64 if dtype == jnp.complex64 else np.complex128
        self.a = [lowering(d).astype(ndt) for d in model.dims]
        self.apad = [self.a[k] + self.a[k].T for k in range(Q)]       # a+a^dag
        self.amad = [self.a[k] - self.a[k].T for k in range(Q)]       # a-a^dag
        # per-oscillator level vectors (float)
        rdt = np.float64 if dtype == jnp.complex128 else np.float32
        self.levels = [np.arange(d, dtype=rdt) for d in model.dims]

        # Hamiltonian diagonal per-axis decomposition:
        # Hdiag = sum_k f_k(n_k) - sum_{k<l} xi_kl n_k n_l, with
        # f_k(n) = detune_k n - xi_k/2 n(n-1)
        self.fk = [model.detune[k] * self.levels[k]
                   - model.selfkerr[k] / 2.0 * self.levels[k] * (self.levels[k] - 1.0)
                   for k in range(Q)]
        self.ck_pairs = [(idx, kl) for idx, kl in enumerate(coupling_pairs(Q))
                         if idx < len(model.crosskerr)
                         and abs(model.crosskerr[idx]) > 1e-14]

    def gen_diag(self):
        """Elementwise generator diagonal (numpy, state-shaped): see
        DenseEngine.gen_diag. Includes ALL elementwise dissipator terms
        (the gamma2 jump n rho n is diagonal in this sense)."""
        from ..utils.operators import drift_diagonal
        m = self.model
        d = drift_diagonal(m.dims, m.detune, m.selfkerr, m.crosskerr)
        ndt = np.complex64 if self.dtype == jnp.complex64 else np.complex128
        if not self.lindblad:
            return (-1j * d).astype(ndt)
        N = self.N
        out = (-1j * (d[:, None] - d[None, :])).astype(np.complex128)
        levels = [np.asarray(lv, dtype=np.float64) for lv in self.levels]
        # per-oscillator level of every flat index
        idx = np.arange(N)
        for k in range(self.Q):
            post = int(np.prod(m.dims[k + 1:])) if k + 1 < self.Q else 1
            nk = (idx // post) % m.dims[k]
            nr = nk[:, None].astype(float)
            nc = nk[None, :].astype(float)
            g1, g2 = m.gamma_decay[k], m.gamma_dephase[k]
            if g1 > 0:
                out = out - (g1 / 2.0) * (nr + nc)
            if g2 > 0:
                out = out + g2 * (nr * nc - 0.5 * nr * nr - 0.5 * nc * nc)
        return out.astype(ndt)

    # -- diagonal of H applied elementwise on the row (or sole) index group --
    def _bshape(self, axis_group_offset, k, ndim):
        """Broadcast shape for the level vector of oscillator k living at
        tensor axis (axis_group_offset + k) of an ndim-rank state."""
        shape = [1] * ndim
        shape[axis_group_offset + k] = self.dims[k]
        return shape

    def _hdiag_mul(self, x, offset):
        """H_diag as broadcasted elementwise multiply on the index group
        starting at `offset` (1 for rows; 1+Q for Lindblad columns)."""
        ndim = x.ndim
        y = jnp.zeros_like(x)
        for k in range(self.Q):
            y = y + x * self.fk[k].reshape(self._bshape(offset, k, ndim)).astype(x.dtype)
        for idx, (k, l) in self.ck_pairs:
            nk = self.levels[k].reshape(self._bshape(offset, k, ndim))
            nl = self.levels[l].reshape(self._bshape(offset, l, ndim))
            y = y - self.model.crosskerr[idx] * x * (nk * nl).astype(x.dtype)
        return y

    def _apply_H(self, c, x, offset, mul):
        """H(t) x with contractions via `mul` (_lmul rows / _rmul cols)."""
        Q = self.Q
        y = self._hdiag_mul(x, offset)
        for k in range(Q):
            pk = c[1 + k].astype(self.dtype)
            qk = c[1 + Q + k].astype(self.dtype)
            y = y + pk * mul(self.apad[k], x, offset + k)
            y = y + (1j * qk) * mul(self.amad[k], x, offset + k)
        for j, (k, l) in enumerate(self.model.jc_pairs):
            J = self.model.jkl[j]
            z = J * (c[1 + 2 * Q + j] + 1j * c[1 + 2 * Q + self.model.n_jc + j])
            z = z.astype(self.dtype)
            # z * a_k^dag a_l + conj(z) * a_k a_l^dag
            t1 = mul(self.a[k].T, mul(self.a[l], x, offset + l), offset + k)
            t2 = mul(self.a[k], mul(self.a[l].T, x, offset + l), offset + k)
            y = y + z * t1 + jnp.conj(z) * t2
        return y

    def rhs(self, c, x):
        if not self.lindblad:
            xt = x.reshape((x.shape[0],) + self.dims)
            y = -1j * self._apply_H(c, xt, 1, _lmul)
            return y.reshape(x.shape)

        Q = self.Q
        xt = x.reshape((x.shape[0],) + self.dims + self.dims)
        ndim = xt.ndim
        # -i (H rho - rho H)
        y = -1j * (self._apply_H(c, xt, 1, _lmul)
                   - self._apply_H(c, xt, 1 + Q, _rmul))
        # dissipators (all diagonal except the decay jump a rho a^dag)
        for k in range(Q):
            g1 = self.model.gamma_decay[k]
            g2 = self.model.gamma_dephase[k]
            if g1 > 0.0 or g2 > 0.0:
                nr = self.levels[k].reshape(self._bshape(1, k, ndim))
                nc = self.levels[k].reshape(self._bshape(1 + Q, k, ndim))
                if g1 > 0.0:
                    y = y - (g1 / 2.0) * xt * (nr + nc).astype(self.dtype)
                    jump = _rmul(self.a[k].T, _lmul(self.a[k], xt, 1 + k), 1 + Q + k)
                    y = y + g1 * jump
                if g2 > 0.0:
                    y = y + g2 * xt * (nr * nc - 0.5 * nr * nr - 0.5 * nc * nc).astype(self.dtype)
        return y.reshape(x.shape)
