"""Grid-streamed Pallas propagation: the whole time loop is ONE kernel
launch per direction, with the per-step Hamiltonian planes streamed
HBM->VMEM by the Mosaic pipeline (automatically double-buffered) while the
state (forward) / adjoint (backward) is carried across grid steps in a
revisited VMEM block.

This removes both limits of the chunked multi-step path
(ops/pallas_adjoint.py): the VMEM cap on steps-per-launch (all Tc planes
had to be resident, capping Tc at ~16 for P=128) and the per-launch
dispatch overhead between chunks (ntime/Tc launches -> 1). Per-step HBM
traffic is 2 f32 planes in (~128 KB at P=128), overlapped with the
Neumann iterates' MXU work by the pipeline.

Carry mechanics: the final-state output block has a CONSTANT index map, so
Mosaic keeps it resident in VMEM across every grid step and flushes it to
HBM once at the end; the kernel reads it as the incoming state and writes
the stepped state back (initialized from the x0 operand at program_id 0).
`pl.program_id` indexes USER grid axes only (vmapped batch axes are
excluded by the lowering), so the ensemble path — `jax.vmap` over control
candidates, which prepends a parallel grid axis — works unchanged.

Two stage-solve variants, matching ops/steppers.py exactly:

* neumann — k <- b + a T(k) (timestepper.cpp:697-727 semantics);
* jacobi  — k <- Minv*(b + a(T(k) - d*k)), the Jacobi-preconditioned
  iteration of steppers.jacobi_neumann_solve with the STATIC drift
  diagonal d (time-independent in the rotating frame) and
  Minv = 1/(1 - a d) precomputed on the host. This lifts the fused path's
  stiff-system exclusion: problems where plain Neumann diverges run fused.

The backward kernel applies the exact real-arithmetic transpose of the
computed forward step (the reference's discrete adjoint, evolveBWD,
timestepper.cpp:631-694), replaying the stage iterates from the stored
pre-step states and emitting per-step Hamiltonian-plane cotangents; the
coefficient gradient is one batched contraction outside the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from .pallas_kernels import _HAVE_PLTPU, _round_up

if _HAVE_PLTPU:  # pragma: no branch
    from jax.experimental.pallas import tpu as pltpu


# In-kernel matmul precision. TPU matmuls on f32 operands default to ONE
# bf16 MXU pass (~8-bit mantissa, ~4e-3 relative error per product) — over
# a 1000+-step sequential integrator that accumulates to ~3% gradient error
# (measured: scripts/perf/pallas_precision_check.py), too noisy even for
# quasi-Newton optimization. 'highest' = full f32 emulation (6 passes,
# gradient error ~2e-6). 'high' = 3-pass bf16 hi/lo split (~1.5e-5 relative
# per product) at HALF the MXU work — Mosaic rejects lax.Precision.HIGH
# inside kernels, so it is emulated explicitly below. Default 'high';
# override via QTPU_PALLAS_PRECISION for A/B or full-f32 validation runs.
import os as _os

_PRECISION_MODE = _os.environ.get("QTPU_PALLAS_PRECISION", "high")


def _stacked_matvec() -> bool:
    """Sublane-stacked matvecs: apply each H-plane dot to the row-stacked
    [vr; vi] (2Bp, P) operand, halving MXU issues per matvec (4 -> 2 dots
    per T/Tt application). Row results are independent and the bf16 hi/lo
    split is elementwise, so the math is IDENTICAL to the unstacked form —
    only the issue count changes. The round-4 sublane-occupancy probe
    measured 8 vs 16 occupied sublane rows at the same per-issue cost
    (docs/performance.md), which is exactly the capacity this exploits.
    Measured on the v5e (round 5, E=128 flagship, 3 repeats):
    4085-4092 -> 4273-4299 sweeps/s (+4.6-5.2%), and BIT-EXACT on chip
    (J and gradient identical to the default form). Default ON;
    QTPU_PALLAS_STACKED_MATVEC=0 restores the 4-dot form for A/B."""
    return _os.environ.get("QTPU_PALLAS_STACKED_MATVEC", "1") == "1"


def _bf16_pair(a):
    """bf16 hi/lo decomposition of an f32 operand (16 mantissa bits)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def _dot_bf16(x, y):
    # explicit DEFAULT: the package sets the global default matmul
    # precision to 'highest', which Mosaic rejects on bf16 operands
    # ("Bad lhs type")
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _prep_rhs(b):
    """Pre-decompose a (reused) RHS operand for _dot: in 'high' mode the
    bf16 hi/lo split is computed ONCE per kernel step instead of once per
    dot — the per-dot conversion of the (P, P) Hamiltonian planes is
    otherwise ~10% of the step's VPU work."""
    if _PRECISION_MODE == "high":
        return _bf16_pair(b)
    return b


def _dot(a, b):
    """a @ b with controlled precision. b may be a raw f32 array or a
    _prep_rhs pre-decomposed (hi, lo) pair ('high' mode)."""
    if _PRECISION_MODE == "high":
        # 3-pass bf16 emulation of an f32 matmul: a = ah + al with ah, al
        # bf16 (16 mantissa bits total), drop the al@bl term (~2^-16 rel.)
        ah, al = _bf16_pair(a)
        bh, bl = b if isinstance(b, tuple) else _bf16_pair(b)
        return _dot_bf16(ah, bh) + (_dot_bf16(ah, bl) + _dot_bf16(al, bh))
    if isinstance(b, tuple):
        raise TypeError("pre-decomposed operand outside 'high' mode")
    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[_PRECISION_MODE]
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _cparams(est_operand_bytes=None, semantics=("arbitrary",)):
    """CompilerParams for the streamed kernels. Mosaic's DEFAULT scoped-vmem
    limit is far below the chip's physical VMEM (128 MiB on v4/v5): kernels
    whose estimated operand footprint exceeds the conservative default ask
    for the physical limit explicitly, which is what admits mid-size Hilbert
    spaces (P = 512/768/1024 operator stacks) to the fused path. The
    estimate is the caller's sum of resident + double-buffered block bytes;
    Mosaic's own accounting (~2.5x operands, measured round 1) decides the
    real feasibility at compile time — an infeasible kernel fails to build
    loudly and the caller falls back to the scan engine. `semantics` must
    match the kernel's grid rank (the rho kernel passes its 2-axis form)."""
    if not _HAVE_PLTPU:
        return {}
    kw = {"dimension_semantics": tuple(semantics)}
    if est_operand_bytes is not None and est_operand_bytes > 10 * (1 << 20):
        kw["vmem_limit_bytes"] = 128 * (1 << 20)
    return {"compiler_params": pltpu.CompilerParams(**kw)}


def _jacobi_planes(gen_diag, dt: float, N: int, P: int):
    """f32 (1, P) planes of d and Minv = 1/(1 - (dt/2) d), host-computed in
    f64. Padded entries get d = 0, Minv = 1 (identity on the padding)."""
    d = np.zeros((P,), np.complex128)
    d[:N] = np.asarray(gen_diag, dtype=np.complex128).reshape(-1)
    minv = 1.0 / (1.0 - 0.5 * dt * d)
    return (d.real.astype(np.float32)[None], d.imag.astype(np.float32)[None],
            minv.real.astype(np.float32)[None],
            minv.imag.astype(np.float32)[None])


def _split_planes(gen_diag, dt: float, N: int, P: int):
    """f32 (1, P) planes of the exact half-step diagonal propagator
    E = exp((dt/2) d), host-computed in f64 (unit modulus entry-by-entry for
    skew generators). Padded entries get E = 1 (identity)."""
    d = np.zeros((P,), np.complex128)
    d[:N] = np.asarray(gen_diag, dtype=np.complex128).reshape(-1)
    E = np.exp(0.5 * dt * d)
    return (E.real.astype(np.float32)[None], E.imag.astype(np.float32)[None])


def lindblad_prime_stack(stack, Ls):
    """(K, N^2, N^2) pseudo-Hamiltonian stack H' such that the streamed
    kernels — which integrate dv/dt = -i H'(c) v — propagate the VECTORIZED
    Lindblad equation: with the column-major vec(rho) generator
    L(c) = -i A + i conj(B) + jump (ops/propagator.lindblad_superop_builder),
    set H' = i L, i.e. per slot  H'_j = I (x) O_j - conj(O_j) (x) I  and
    slot 0 += i * sum_l conj(L_l) (x) L_l. H' is NOT Hermitian (dissipation)
    — the kernels never assume Hermiticity (the backward kernel applies the
    exact real transpose)."""
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    eye = np.eye(N)
    Hp = np.stack([np.kron(eye, O) - np.kron(np.conj(O), eye)
                   for O in stack]).astype(np.complex128)
    if Ls is not None:
        Hp[0] += 1j * sum(np.kron(np.conj(np.asarray(L)), np.asarray(L))
                          for L in Ls)
    return Hp.astype(stack.dtype)


def _fwd_body(HrT_v, HiT_v, x0r_ref, x0i_ref,
              xr_ref, xi_ref, hr_ref, hi_ref, ks_refs=None,
              *, dt, iters, jac, split):
    """One forward step of the streamed grid. HrT_v/HiT_v: the TRANSPOSED
    H planes of this step as VALUES (loaded from a streamed plane block, or
    contracted in-kernel from the stacks by the streamK caller). jac: None
    for plain Neumann, or the (dr, di, mr, mi) plane tuple for the Jacobi
    solve. split: None, or the (er, ei) rows of the exact half-step
    diagonal propagator — the diagonally-split stepper (H planes carry the
    OFF-DIAGONAL remainder, diag zeroed outside the kernel; see
    steppers.make_step_fn). ks_refs: optional (ksr_ref, ksi_ref) blocks of
    shape (1, iters*Bp, P) receiving the stage iterates k_0..k_{iters-1} so
    the backward kernel can skip its replay entirely."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        xr_ref[:] = x0r_ref[:]
        xi_ref[:] = x0i_ref[:]

    Bp = xr_ref.shape[0]

    def store_k(j, kr, ki):
        if ks_refs is not None and j < iters:
            ks_refs[0][0, j * Bp:(j + 1) * Bp, :] = kr
            ks_refs[1][0, j * Bp:(j + 1) * Bp, :] = ki

    xr, xi = _fwd_step(HrT_v, HiT_v, xr_ref[:], xi_ref[:], store_k,
                       dt=dt, iters=iters, jac=jac, split=split)
    xr_ref[:] = xr
    xi_ref[:] = xi
    hr_ref[0] = xr
    hi_ref[0] = xi


def _stage_fwd(matvec, xr, xi, store_k, *, dt, iters, jac, split):
    """One forward IMR step for an ARBITRARY linear generator: `matvec` is
    T(v) applied to the value pair (vr, vi) — rows x planes for the
    streamed kernels, two-sided matrix products for the density-matrix
    kernel (ops/pallas_rho.py). The Neumann/Jacobi stage recursion and the
    split-stepper rotations are generator-agnostic elementwise/matvec
    algebra; jac/split planes broadcast against the state shape."""
    a = dt / 2.0
    if split is not None:
        er, ei_ = split
        xr, xi = er * xr - ei_ * xi, er * xi + ei_ * xr
    br, bi = matvec(xr, xi)
    if jac is None:
        kr, ki = br, bi
        store_k(0, kr, ki)
        for j in range(iters):
            mr, mi = matvec(kr, ki)
            kr = br + a * mr
            ki = bi + a * mi
            store_k(j + 1, kr, ki)
    else:
        dr, di_, mr_, mi_ = jac

        def W(vr, vi):  # elementwise complex multiply by Minv
            return mr_ * vr - mi_ * vi, mi_ * vr + mr_ * vi

        kr, ki = W(br, bi)
        store_k(0, kr, ki)
        for j in range(iters):
            tr, ti = matvec(kr, ki)
            ur = tr - (dr * kr - di_ * ki)
            ui = ti - (dr * ki + di_ * kr)
            kr, ki = W(br + a * ur, bi + a * ui)
            store_k(j + 1, kr, ki)
    xr = xr + dt * kr
    xi = xi + dt * ki
    if split is not None:
        xr, xi = er * xr - ei_ * xi, er * xi + ei_ * xr
    return xr, xi


def _fwd_step(HrT_v, HiT_v, xr, xi, store_k, *, dt, iters, jac, split):
    """Pure math of one forward step on carried VALUES (xr, xi) -> new
    values; stage iterates go to store_k(j, kr, ki). Shared by the
    1-step-per-grid-step bodies and the Tc-blocked packed body."""
    HrT = _prep_rhs(HrT_v)
    HiT = _prep_rhs(HiT_v)

    if _stacked_matvec():
        def matvec(vr, vi):  # T(v) = -i H v on the row-stacked [vr; vi]
            Bp = vr.shape[0]
            z = jnp.concatenate([vr, vi], axis=0)
            zr = _dot(z, HrT)
            zi = _dot(z, HiT)
            ar = zr[:Bp] - zi[Bp:]
            ai = zi[:Bp] + zr[Bp:]
            return ai, -ar
    else:
        def matvec(vr, vi):  # T(v) = -i H v, rows: v @ H^T in planes
            ar = _dot(vr, HrT) - _dot(vi, HiT)
            ai = _dot(vr, HiT) + _dot(vi, HrT)
            return ai, -ar

    return _stage_fwd(matvec, xr, xi, store_k,
                      dt=dt, iters=iters, jac=jac, split=split)


def _bwd_body(Hr, Hi, xpr_ref, xpi_ref, jr_ref, ji_ref,
              gTr_ref, gTi_ref, x0r_ref, x0i_ref,
              gr_ref, gi_ref, emit_Hb,
              ks_refs=None, *, nsteps, dt, iters, jac, split, HT=None):
    """Exact real-arithmetic transpose of one computed step (the grid runs
    steps in REVERSE order via the index maps). Hr/Hi: this step's H planes
    as VALUES. emit_Hb(Hbr, Hbi): caller-provided sink for the accumulated
    H-plane cotangent of the step (written to a per-step plane block by the
    streaming caller; contracted against the stacks in-kernel by the
    streamK caller). For the split stepper the rotation transposes to its
    inverse (E^T = E^{-1}): state cotangent AND pre-step state move into
    the rotated frame, the plain-Neumann transpose chain runs there, and
    the outgoing cotangent rotates back. ks_refs: optional forward-stored
    stage iterates k_0..k_{iters-1} ((1, iters*Bp, P) blocks) — when
    present, the replay is skipped. HT: optional (HrT, HiT) TRANSPOSED
    plane values (contracted from transposed stacks by the packed caller)
    — skips two in-body (P, P) VPU transposes per step."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        gr_ref[:] = gTr_ref[:]
        gi_ref[:] = gTi_ref[:]

    # pre-step state: the SHIFTED history block hist[t-1] (index map
    # n-2-i, clamped); at the last grid step (t = 0) it is x0 — selected
    # here instead of materializing a concatenated [x0; hist[:-1]] copy of
    # the whole history in HBM
    first = i == nsteps - 1
    xpr = jnp.where(first, x0r_ref[:], xpr_ref[0])
    xpi = jnp.where(first, x0i_ref[:], xpi_ref[0])
    gr = gr_ref[:] + jr_ref[0]
    gi = gi_ref[:] + ji_ref[0]

    Bp = gr.shape[0]
    ks_vals = None
    if ks_refs is not None:
        ks_vals = [(ks_refs[0][0, j * Bp:(j + 1) * Bp, :],
                    ks_refs[1][0, j * Bp:(j + 1) * Bp, :])
                   for j in range(iters)]

    outr, outi = _bwd_step(Hr, Hi, HT, xpr, xpi, gr, gi, ks_vals, emit_Hb,
                           dt=dt, iters=iters, jac=jac, split=split)
    gr_ref[:] = outr
    gi_ref[:] = outi


def _stage_bwd(T, Tt, xpr, xpi, gr, gi, ks_vals, acc_pair,
               *, dt, iters, jac, split):
    """Exact real-arithmetic transpose of one _stage_fwd step for an
    ARBITRARY linear generator: T/Tt apply the generator and its real
    transpose to value pairs. The incoming cotangent (gr, gi) must
    already include this step's history injection; (xpr, xpi) is the
    pre-step state. Every (cotangent-at-T's-output, value-at-T's-input)
    pair is handed to acc_pair(cr, ci, ur, ui) — the caller maps pairs to
    its parameter cotangents (H-plane outer products for the streamed
    kernels, left/right Heff products for the density-matrix kernel).
    Returns the outgoing state cotangent."""
    if split is not None:
        er, ei_ = split

        def rot_m(vr, vi):      # rotation by the NEGATED angle (E^T)
            return er * vr + ei_ * vi, er * vi - ei_ * vr

        gr, gi = rot_m(gr, gi)
        xpr, xpi = er * xpr - ei_ * xpi, er * xpi + ei_ * xpr
    a = dt / 2.0

    bbr = jnp.zeros_like(gr)
    bbi = jnp.zeros_like(gi)
    kbr = dt * gr
    kbi = dt * gi

    if jac is None:
        if ks_vals is not None:
            ks = ks_vals            # forward-stored iterates: no replay
        else:
            # replay the Neumann iterates k_0..k_{iters-1}
            br, bi = T(xpr, xpi)
            ks = [(br, bi)]
            kr, ki = br, bi
            for _ in range(iters - 1):
                mr, mi = T(kr, ki)
                kr = br + a * mr
                ki = bi + a * mi
                ks.append((kr, ki))
        # transpose of k_j = b + a T(k_{j-1}), j = iters..1; k_0 = b
        for j in range(iters, 0, -1):
            bbr = bbr + kbr
            bbi = bbi + kbi
            ur, ui = ks[j - 1]
            acc_pair(a * kbr, a * kbi, ur, ui)
            kbr, kbi = Tt(a * kbr, a * kbi)
        bbr = bbr + kbr
        bbi = bbi + kbi
    else:
        dr, di_, mr_, mi_ = jac

        def W(vr, vi):
            return mr_ * vr - mi_ * vi, mi_ * vr + mr_ * vi

        def Wt(ur, ui):  # transpose of W = multiply by conj(Minv)
            return mr_ * ur + mi_ * ui, mr_ * ui - mi_ * ur

        def Dt(ur, ui):  # transpose of v -> d*v = multiply by conj(d)
            return dr * ur + di_ * ui, dr * ui - di_ * ur

        if ks_vals is not None:
            ks = ks_vals            # forward-stored iterates: no replay
        else:
            # replay k_0..k_{iters-1} of the Jacobi iteration
            br, bi = T(xpr, xpi)
            kr, ki = W(br, bi)
            ks = [(kr, ki)]
            for _ in range(iters - 1):
                tr, ti = T(kr, ki)
                ur = tr - (dr * kr - di_ * ki)
                ui = ti - (dr * ki + di_ * kr)
                kr, ki = W(br + a * ur, bi + a * ui)
                ks.append((kr, ki))
        # transpose of k_j = W(b + a(T(k_{j-1}) - d k_{j-1})), j = iters..1
        for j in range(iters, 0, -1):
            ur, ui = Wt(kbr, kbi)
            bbr = bbr + ur
            bbi = bbi + ui
            pr, pi_ = ks[j - 1]
            acc_pair(a * ur, a * ui, pr, pi_)
            t1r, t1i = Tt(a * ur, a * ui)
            d1r, d1i = Dt(a * ur, a * ui)
            kbr = t1r - d1r
            kbi = t1i - d1i
        # k_0 = W(b)
        ur, ui = Wt(kbr, kbi)
        bbr = bbr + ur
        bbi = bbi + ui

    # b = T(x_pre): route b-bar into the pre-state and the parameters
    acc_pair(bbr, bbi, xpr, xpi)
    tr, ti = Tt(bbr, bbi)
    outr, outi = gr + tr, gi + ti
    if split is not None:
        outr, outi = rot_m(outr, outi)   # leading rotation's transpose
    return outr, outi


def _bwd_step(Hr, Hi, HT, xpr, xpi, gr, gi, ks_vals, emit_Hb,
              *, dt, iters, jac, split):
    """Pure math of one adjoint step on VALUES: incoming cotangent
    (gr, gi) (already including this step's history injection), pre-step
    state (xpr, xpi), optional forward-stored stage iterates ks_vals ->
    outgoing cotangent; the step's H-plane cotangent goes to emit_Hb.
    Shared by the 1-step bodies and the Tc-blocked packed body."""
    if HT is not None:
        HrT = _prep_rhs(HT[0])
        HiT = _prep_rhs(HT[1])
    else:
        HrT = _prep_rhs(Hr.T)
        HiT = _prep_rhs(Hi.T)
    Hrp = _prep_rhs(Hr)
    Hip = _prep_rhs(Hi)

    if _stacked_matvec():
        def T(vr, vi):        # row-stacked form: 2 dots instead of 4
            Bp = vr.shape[0]
            z = jnp.concatenate([vr, vi], axis=0)
            zr = _dot(z, HrT)
            zi = _dot(z, HiT)
            return zi[:Bp] + zr[Bp:], -(zr[:Bp] - zi[Bp:])

        def Tt(ur, ui):       # real transpose of T (no Hermiticity)
            Bp = ur.shape[0]
            z = jnp.concatenate([ur, ui], axis=0)
            zr = _dot(z, Hrp)
            zi = _dot(z, Hip)
            return zi[:Bp] - zr[Bp:], zr[:Bp] + zi[Bp:]
    else:
        def T(vr, vi):
            ar = _dot(vr, HrT) - _dot(vi, HiT)
            ai = _dot(vr, HiT) + _dot(vi, HrT)
            return ai, -ar

        def Tt(ur, ui):  # real transpose of T (no Hermiticity assumption)
            return (_dot(ur, Hip) - _dot(ui, Hrp),
                    _dot(ur, Hrp) + _dot(ui, Hip))

    # H-plane cotangent pairs (c at T's output, u at T's input). The
    # per-pair outer products sum as ONE block matmul over the row-stacked
    # pairs (sum_j u_j^T c_j = [u_1; ...]^T [c_1; ...]) — 4 dots for the
    # whole step instead of 4 per pair, on the instruction-bound small-N
    # regime.
    accs = []

    def acc_pair(cr, ci, ur, ui):
        accs.append((cr, ci, ur, ui))

    outr, outi = _stage_bwd(T, Tt, xpr, xpi, gr, gi, ks_vals, acc_pair,
                            dt=dt, iters=iters, jac=jac, split=split)
    Cr = jnp.concatenate([p[0] for p in accs], axis=0)
    Ci = jnp.concatenate([p[1] for p in accs], axis=0)
    UrT = jnp.concatenate([p[2] for p in accs], axis=0).T
    UiT = jnp.concatenate([p[3] for p in accs], axis=0).T
    emit_Hb((_dot(UiT, Cr) - _dot(UrT, Ci)).T,
            (_dot(UrT, Cr) + _dot(UiT, Ci)).T)
    return outr, outi


def make_stream_propagate(stack, dt: float, iters: int = 10,
                          gen_diag=None, linsolver: str = "neumann",
                          interpret: bool = False, store_iters=None):
    """Build propagate(Sr, Si, x0, C) -> (xT, history) on the streamed
    kernels, differentiable in x0 and C — the same contract as
    pallas_adjoint.make_pallas_propagate (history is the complex
    (ntime, B, N) post-step states; penalties are jnp functions of it).

    linsolver='jacobi' requires gen_diag (the static elementwise generator
    diagonal) and matches steppers.jacobi_neumann_solve bit-for-bit in
    structure (same recursion, f32 planes).
    """
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    P = _round_up(N, 128)
    dt = float(dt)
    iters = int(iters)
    jac_np = split_np = diag_sub = None
    if linsolver == "jacobi":
        if gen_diag is None:
            raise ValueError("jacobi streamed solve requires gen_diag")
        jac_np = _jacobi_planes(gen_diag, dt, N, P)
    elif linsolver == "split":
        if gen_diag is None:
            raise ValueError("split streamed stepper requires gen_diag")
        split_np = _split_planes(gen_diag, dt, N, P)
        # the kernel's H planes carry the OFF-DIAGONAL remainder: subtract
        # the (time-independent) generator diagonal outside the kernel.
        # gen_diag = -i h with h the H diagonal -> H planes lose diag(h).
        d = np.zeros((P,), np.complex128)
        d[:N] = np.asarray(gen_diag, dtype=np.complex128).reshape(-1)
        h = 1j * d      # H_diag = i * gen_diag
        diag_sub = (np.diag(h.real).astype(np.float32),
                    np.diag(h.imag).astype(np.float32))
    elif linsolver != "neumann":
        raise ValueError(f"streamed pallas supports neumann/jacobi/split, "
                         f"got {linsolver!r}")
    n_rows = 4 if jac_np is not None else (2 if split_np is not None else 0)
    # Store the forward stage iterates so the backward kernel skips its
    # replay entirely (saves `iters` matvecs per backward step). HBM cost is
    # iters x (Bp, P) f32 planes per step per direction — cheap at the small
    # iteration counts the split/neumann paths use, prohibitive at large
    # ones, hence the cap.
    # Forward-stored stage iterates let the backward skip its replay
    # (saves `iters` matvecs per backward step) at an HBM cost of
    # iters x (Bp, P) f32 planes per step per direction — cheap for the
    # small-batch flagships, prohibitive for gate-class batches at
    # mid-size N (the caller gates on the computed byte count and passes
    # store_iters=False there).
    if store_iters is None:
        store_iters = iters <= 4
    store_iters = bool(store_iters) and iters <= 4

    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}

    def _est(Bp, planes_blocks):
        """Operand-footprint estimate (bytes): `planes_blocks` streamed
        (P, P) blocks (double-buffered) + per-step state/history/iterate
        blocks + the resident carry."""
        it = iters + 1 if store_iters else 0
        return 4 * (2 * planes_blocks * P * P
                    + (16 + 4 * it) * Bp * P)

    def _row_args():
        rows = jac_np if jac_np is not None else split_np
        return tuple(jnp.asarray(p) for p in rows) if rows else ()

    def _pack(x0):
        B = x0.shape[0]
        Bp = _round_up(B, 8)
        xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.real(x0).astype(jnp.float32))
        xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.imag(x0).astype(jnp.float32))
        return xr, xi

    def _unpack_hist(hr, hi, B, dtype):
        return (hr[:, :B, :N] + 1j * hi[:, :B, :N]).astype(dtype)

    def _h_planes(C, Sr, Si):
        Cf = C.astype(jnp.float32)
        Hr = jnp.tensordot(Cf, Sr, axes=1)
        Hi = jnp.tensordot(Cf, Si, axes=1)
        if diag_sub is not None:
            Hr = Hr - jnp.asarray(diag_sub[0])[None]
            Hi = Hi - jnp.asarray(diag_sub[1])[None]
        return Hr, Hi

    def _split_rows(refs):
        """(body refs tail) -> (jac, split) tuples per the solver mode."""
        if jac_np is not None:
            dr, di_, mr_, mi_ = refs
            return (dr[:], di_[:], mr_[:], mi_[:]), None
        if split_np is not None:
            er, ei_ = refs
            return None, (er[:], ei_[:])
        return None, None

    def _fwd_call(nsteps, Bp):
        plane = pl.BlockSpec((1, P, P), lambda i: (i, 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [plane, plane, full, full] + [row] * n_rows

        def body(*refs):
            Hr_ref, Hi_ref, x0r, x0i = refs[:4]
            jac, split = _split_rows(refs[4:4 + n_rows])
            outs = refs[4 + n_rows:]
            xr, xi, hr, hi = outs[:4]
            ks_refs = outs[4:6] if store_iters else None
            _fwd_body(Hr_ref[0].T, Hi_ref[0].T, x0r, x0i, xr, xi, hr, hi,
                      ks_refs, dt=dt, iters=iters, jac=jac, split=split)

        hist_spec = pl.BlockSpec((1, Bp, P), lambda i: (i, 0, 0), **vmem)
        out_shape = (jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2 \
            + (jax.ShapeDtypeStruct((nsteps, Bp, P), jnp.float32),) * 2
        out_specs = (full, full, hist_spec, hist_spec)
        if store_iters:
            ks_spec = pl.BlockSpec((1, iters * Bp, P),
                                   lambda i: (i, 0, 0), **vmem)
            out_shape = out_shape + (jax.ShapeDtypeStruct(
                (nsteps, iters * Bp, P), jnp.float32),) * 2
            out_specs = out_specs + (ks_spec, ks_spec)
        return pl.pallas_call(
            body,
            grid=(nsteps,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            **_cparams(_est(Bp, 2)))

    def _bwd_call(nsteps, Bp):
        rev3 = pl.BlockSpec((1, P, P), lambda i, n=nsteps: (n - 1 - i, 0, 0),
                            **vmem)
        revs = pl.BlockSpec((1, Bp, P),
                            lambda i, n=nsteps: (n - 1 - i, 0, 0), **vmem)
        # pre-step states: hist shifted by one (clamped at block 0; the
        # i = n-1 read is overridden by x0 in the body)
        revp = pl.BlockSpec(
            (1, Bp, P),
            lambda i, n=nsteps: (jnp.maximum(n - 2 - i, 0), 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [rev3, rev3, revp, revp, revs, revs, full, full,
                    full, full] + [row] * n_rows
        if store_iters:
            revks = pl.BlockSpec((1, iters * Bp, P),
                                 lambda i, n=nsteps: (n - 1 - i, 0, 0),
                                 **vmem)
            in_specs += [revks, revks]

        def body(*refs):
            Hr_ref, Hi_ref, xpr, xpi, jr, ji, gTr, gTi, x0r, x0i = refs[:10]
            jac, split = _split_rows(refs[10:10 + n_rows])
            rest = refs[10 + n_rows:]
            ks_refs = rest[:2] if store_iters else None
            gr, gi, Hbr, Hbi = rest[2:] if store_iters else rest

            def emit_Hb(br, bi):
                Hbr[0] = br
                Hbi[0] = bi

            _bwd_body(Hr_ref[0], Hi_ref[0], xpr, xpi, jr, ji, gTr, gTi,
                      x0r, x0i, gr, gi, emit_Hb, ks_refs, nsteps=nsteps,
                      dt=dt, iters=iters, jac=jac, split=split)

        return pl.pallas_call(
            body,
            grid=(nsteps,),
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2
            + (jax.ShapeDtypeStruct((nsteps, P, P), jnp.float32),) * 2,
            in_specs=in_specs,
            out_specs=(full, full, rev3, rev3),
            interpret=interpret,
            **_cparams(_est(Bp, 4)))

    def _run_forward(Sr, Si, x0, C):
        B, dtype = x0.shape[0], x0.dtype
        ntime = C.shape[0]
        xr0, xi0 = _pack(x0)
        Bp = xr0.shape[0]
        Hr, Hi = _h_planes(C, Sr, Si)
        args = (Hr, Hi, xr0, xi0) + _row_args()
        outs = _fwd_call(ntime, Bp)(*args)
        xr, xi, hr, hi = outs[:4]
        ks = outs[4:6] if store_iters else None
        xT = (xr[:B, :N] + 1j * xi[:B, :N]).astype(dtype)
        return xT, _unpack_hist(hr, hi, B, dtype), (hr, hi), ks

    @jax.custom_vjp
    def propagate(Sr, Si, x0, C):
        xT, hist, _, _ = _run_forward(Sr, Si, x0, C)
        return xT, hist

    def fwd2(Sr, Si, x0, C):
        xT, hist, planes, ks = _run_forward(Sr, Si, x0, C)
        x0p = _pack(x0)
        return (xT, hist), (Sr, Si, C, jnp.zeros_like(x0), planes, x0p, ks)

    def bwd2(res, cots):
        Sr, Si, C, x0_proto, (hr, hi), (x0r, x0i), ks = res
        xT_bar, hist_bar = cots
        B, dtype = x0_proto.shape[0], x0_proto.dtype
        ntime = C.shape[0]
        Bp = hr.shape[1]
        Hr, Hi = _h_planes(C, Sr, Si)

        # per-step cotangent injections from the history cotangent
        _, h_vjp = jax.vjp(lambda a, b: _unpack_hist(a, b, B, dtype), hr, hi)
        jr, ji = h_vjp(hist_bar)

        # incoming cotangent of the FINAL state (plane form)
        def unpack_xT(a, b):
            return (a[:B, :N] + 1j * b[:B, :N]).astype(dtype)

        _, u_vjp = jax.vjp(unpack_xT, hr[-1], hi[-1])
        gTr, gTi = u_vjp(xT_bar)

        args = (Hr, Hi, hr, hi, jr, ji, gTr, gTi, x0r, x0i) + _row_args()
        if store_iters:
            args = args + tuple(ks)
        gr, gi, Hbr, Hbi = _bwd_call(ntime, Bp)(*args)

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


def make_streamk_propagate(stack, dt: float, iters: int = 10,
                           gen_diag=None, linsolver: str = "neumann",
                           interpret: bool = False, store_iters=None,
                           real_io: bool = False):
    """STREAM-K variant of make_stream_propagate: the per-step Hamiltonian
    planes are contracted IN-KERNEL from the (K, P, P) operator stacks
    (VMEM-resident, constant index map) and the (ntime, Kp) coefficient
    rows — the (ntime, P, P) plane arrays are never materialized in HBM.

    Why: the plane arrays are the fused path's dominant XLA glue. Per
    gradient sweep the streaming path builds 2 forward plane arrays and
    writes + re-contracts 2 cotangent plane arrays: ~4*ntime*P^2*4 bytes of
    HBM each way (CNOT flagship P=128: ~320 MB/sweep; open-system CNOT
    P=256: ~1.3 GB/sweep — the main reason the open fused path measured 30x
    slower than closed, VERDICT round 2). Here the forward kernel reads
    (1, Kp) coefficients per step and does K VPU multiply-adds over (P, P);
    the backward contracts the step's plane cotangent against the stacks
    in-kernel and emits (1, Kp) coefficient cotangents — per-step HBM
    traffic drops from O(P^2) to O(K).

    Contract: propagate(Sr, Si, x0, C) -> (xT, hist), differentiable in x0
    and C. LIMITATION (documented, enforced by zeros): cotangents w.r.t.
    the operator stacks Sr/Si are NOT computed (they would need the
    per-step plane cotangents this kernel exists to avoid materializing).
    Control optimization never differentiates the stacks (they are
    threaded as constants by Problem._wrap_with_data); Hamiltonian
    calibration should use make_stream_propagate.
    """
    stack = np.asarray(stack)
    K, N, _ = stack.shape
    P = _round_up(N, 128)
    dt = float(dt)
    iters = int(iters)
    jac_np = split_np = None
    diag_slot = None
    if linsolver == "jacobi":
        if gen_diag is None:
            raise ValueError("jacobi streamed solve requires gen_diag")
        jac_np = _jacobi_planes(gen_diag, dt, N, P)
    elif linsolver == "split":
        if gen_diag is None:
            raise ValueError("split streamed stepper requires gen_diag")
        split_np = _split_planes(gen_diag, dt, N, P)
        # the diagonal subtraction folds into the contraction as an extra
        # stack slot with coefficient -1 (H planes carry the off-diagonal
        # remainder)
        d = np.zeros((P,), np.complex128)
        d[:N] = np.asarray(gen_diag, dtype=np.complex128).reshape(-1)
        h = 1j * d
        diag_slot = (np.diag(h.real).astype(np.float32),
                     np.diag(h.imag).astype(np.float32))
    elif linsolver != "neumann":
        raise ValueError(f"streamK pallas supports neumann/jacobi/split, "
                         f"got {linsolver!r}")
    Ke = K + (1 if diag_slot is not None else 0)
    Kp = _round_up(Ke, 128)
    n_rows = 4 if jac_np is not None else (2 if split_np is not None else 0)
    # Forward-stored stage iterates let the backward skip its replay
    # (saves `iters` matvecs per backward step) at an HBM cost of
    # iters x (Bp, P) f32 planes per step per direction — cheap for the
    # small-batch flagships, prohibitive for gate-class batches at
    # mid-size N (the caller gates on the computed byte count and passes
    # store_iters=False there).
    if store_iters is None:
        store_iters = iters <= 4
    store_iters = bool(store_iters) and iters <= 4

    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}

    def _est(Bp):
        """Operand-footprint estimate (bytes): 2 VMEM-resident (Ke, P, P)
        stacks + double-buffered per-step state/history/iterate blocks —
        the term that grows with P and admits mid-size Hilbert spaces
        (closed N up to ~1024) once the Mosaic limit is raised."""
        it = iters + 1 if store_iters else 0
        return 4 * (2 * Ke * P * P + (16 + 4 * it) * Bp * P)

    def _row_args():
        rows = jac_np if jac_np is not None else split_np
        return tuple(jnp.asarray(p) for p in rows) if rows else ()

    def _pack(x0):
        """Complex (B, N) state batch — or, with real_io, an (xr, xi)
        f32 pair — into padded (Bp, P) f32 planes. real_io keeps the
        whole device program complex-free (TPU has no native complex
        type; the complex ops otherwise appear only in this glue)."""
        if real_io:
            x0r, x0i = x0
            B = x0r.shape[0]
            Bp = _round_up(B, 8)
            xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
                x0r.astype(jnp.float32))
            xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
                x0i.astype(jnp.float32))
            return xr, xi
        B = x0.shape[0]
        Bp = _round_up(B, 8)
        xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.real(x0).astype(jnp.float32))
        xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :N].set(
            jnp.imag(x0).astype(jnp.float32))
        return xr, xi

    def _unpack_hist(hr, hi, B, dtype):
        if real_io:
            return (hr[:, :B, :N], hi[:, :B, :N])
        return (hr[:, :B, :N] + 1j * hi[:, :B, :N]).astype(dtype)

    def _ext_stacks(Sr, Si):
        """(Ke, P, P) extended stacks (+ transposes) and the (ntime, Kp)
        padded coefficient rows builder."""
        if diag_slot is not None:
            Sr = jnp.concatenate(
                [Sr, -jnp.asarray(diag_slot[0])[None]], axis=0)
            Si = jnp.concatenate(
                [Si, -jnp.asarray(diag_slot[1])[None]], axis=0)
        return Sr, Si, jnp.swapaxes(Sr, -1, -2), jnp.swapaxes(Si, -1, -2)

    def _pad_C(C):
        # 3-D (ntime, 1, Kp): Mosaic requires the last two BLOCK dims to be
        # (divisible by 8, divisible by 128) or equal to the array dims; a
        # (1, Kp) block of a 2-D (ntime, Kp) array violates the first
        ntime = C.shape[0]
        Cp = jnp.zeros((ntime, 1, Kp), jnp.float32)
        Cp = Cp.at[:, 0, :K].set(C.astype(jnp.float32))
        if diag_slot is not None:
            Cp = Cp.at[:, 0, K].set(1.0)
        return Cp

    def _contract(c_ref, Sa_ref, Sb_ref):
        """(Hr, Hi) = sum_k c[k] * (Sa[k], Sb[k]) — K static, unrolled."""
        Hr = c_ref[0, 0, 0] * Sa_ref[0]
        Hi = c_ref[0, 0, 0] * Sb_ref[0]
        for k in range(1, Ke):
            Hr = Hr + c_ref[0, 0, k] * Sa_ref[k]
            Hi = Hi + c_ref[0, 0, k] * Sb_ref[k]
        return Hr, Hi

    def _split_rows(refs):
        if jac_np is not None:
            dr, di_, mr_, mi_ = refs
            return (dr[:], di_[:], mr_[:], mi_[:]), None
        if split_np is not None:
            er, ei_ = refs
            return None, (er[:], ei_[:])
        return None, None

    stack_spec_shape = (Ke, P, P)

    def _fwd_call(nsteps, Bp):
        const3 = pl.BlockSpec(stack_spec_shape, lambda i: (0, 0, 0), **vmem)
        crow = pl.BlockSpec((1, 1, Kp), lambda i: (i, 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [const3, const3, crow, full, full] + [row] * n_rows

        def body(*refs):
            SrT_ref, SiT_ref, c_ref, x0r, x0i = refs[:5]
            jac, split = _split_rows(refs[5:5 + n_rows])
            outs = refs[5 + n_rows:]
            xr, xi, hr, hi = outs[:4]
            ks_refs = outs[4:6] if store_iters else None
            HrT, HiT = _contract(c_ref, SrT_ref, SiT_ref)
            _fwd_body(HrT, HiT, x0r, x0i, xr, xi, hr, hi, ks_refs,
                      dt=dt, iters=iters, jac=jac, split=split)

        hist_spec = pl.BlockSpec((1, Bp, P), lambda i: (i, 0, 0), **vmem)
        out_shape = (jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2 \
            + (jax.ShapeDtypeStruct((nsteps, Bp, P), jnp.float32),) * 2
        out_specs = (full, full, hist_spec, hist_spec)
        if store_iters:
            ks_spec = pl.BlockSpec((1, iters * Bp, P),
                                   lambda i: (i, 0, 0), **vmem)
            out_shape = out_shape + (jax.ShapeDtypeStruct(
                (nsteps, iters * Bp, P), jnp.float32),) * 2
            out_specs = out_specs + (ks_spec, ks_spec)
        return pl.pallas_call(
            body,
            grid=(nsteps,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            **_cparams(_est(Bp)))

    def _bwd_call(nsteps, Bp):
        const3 = pl.BlockSpec(stack_spec_shape, lambda i: (0, 0, 0), **vmem)
        crow_rev = pl.BlockSpec((1, 1, Kp),
                                lambda i, n=nsteps: (n - 1 - i, 0, 0),
                                **vmem)
        revs = pl.BlockSpec((1, Bp, P),
                            lambda i, n=nsteps: (n - 1 - i, 0, 0), **vmem)
        revp = pl.BlockSpec(
            (1, Bp, P),
            lambda i, n=nsteps: (jnp.maximum(n - 2 - i, 0), 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [const3, const3, crow_rev, revp, revp, revs, revs,
                    full, full, full, full] + [row] * n_rows
        if store_iters:
            revks = pl.BlockSpec((1, iters * Bp, P),
                                 lambda i, n=nsteps: (n - 1 - i, 0, 0),
                                 **vmem)
            in_specs += [revks, revks]

        def body(*refs):
            (Sr_ref, Si_ref, c_ref, xpr, xpi, jr, ji, gTr, gTi,
             x0r, x0i) = refs[:11]
            jac, split = _split_rows(refs[11:11 + n_rows])
            rest = refs[11 + n_rows:]
            ks_refs = rest[:2] if store_iters else None
            gr, gi, Cb = rest[2:] if store_iters else rest
            # contract the step's planes from the UNtransposed stacks
            # (T uses H^T -> in-body .T of these; Tt uses H directly)
            Hr, Hi = _contract(c_ref, Sr_ref, Si_ref)

            def emit_Hb(br, bi):
                # coefficient cotangents in-kernel: Cb[k] = <br, Sr[k]> +
                # <bi, Si[k]> — K (P,P) reductions replace the O(P^2)
                # plane-cotangent write + XLA einsum. The row is assembled
                # with iota-selects (Mosaic has no scatter lowering).
                vals = [jnp.sum(br * Sr_ref[k]) + jnp.sum(bi * Si_ref[k])
                        for k in range(Ke)]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Kp), 2)
                rowv = jnp.zeros((1, 1, Kp), jnp.float32)
                for k in range(Ke):
                    rowv = rowv + jnp.where(lane == k, vals[k], 0.0)
                Cb[...] = rowv

            _bwd_body(Hr, Hi, xpr, xpi, jr, ji, gTr, gTi,
                      x0r, x0i, gr, gi, emit_Hb, ks_refs, nsteps=nsteps,
                      dt=dt, iters=iters, jac=jac, split=split)

        crow_out = pl.BlockSpec((1, 1, Kp),
                                lambda i, n=nsteps: (n - 1 - i, 0, 0),
                                **vmem)
        return pl.pallas_call(
            body,
            grid=(nsteps,),
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2
            + (jax.ShapeDtypeStruct((nsteps, 1, Kp), jnp.float32),),
            in_specs=in_specs,
            out_specs=(full, full, crow_out),
            interpret=interpret,
            **_cparams(_est(Bp)))

    def _meta(x0):
        if real_io:
            return x0[0].shape[0], jnp.float32
        return x0.shape[0], x0.dtype

    def _run_forward(Sr, Si, x0, C):
        B, dtype = _meta(x0)
        ntime = C.shape[0]
        xr0, xi0 = _pack(x0)
        Bp = xr0.shape[0]
        _, _, SrT, SiT = _ext_stacks(Sr, Si)
        args = (SrT, SiT, _pad_C(C), xr0, xi0) + _row_args()
        outs = _fwd_call(ntime, Bp)(*args)
        xr, xi, hr, hi = outs[:4]
        ks = outs[4:6] if store_iters else None
        if real_io:
            xT = (xr[:B, :N], xi[:B, :N])
        else:
            xT = (xr[:B, :N] + 1j * xi[:B, :N]).astype(dtype)
        return xT, _unpack_hist(hr, hi, B, dtype), (hr, hi), ks

    @jax.custom_vjp
    def propagate(Sr, Si, x0, C):
        xT, hist, _, _ = _run_forward(Sr, Si, x0, C)
        return xT, hist

    def fwd2(Sr, Si, x0, C):
        xT, hist, planes, ks = _run_forward(Sr, Si, x0, C)
        x0p = _pack(x0)
        x0_proto = jax.tree.map(jnp.zeros_like, x0)
        return (xT, hist), (Sr, Si, C, x0_proto, planes, x0p, ks)

    def bwd2(res, cots):
        Sr, Si, C, x0_proto, (hr, hi), (x0r, x0i), ks = res
        xT_bar, hist_bar = cots
        B, dtype = _meta(x0_proto)
        ntime = C.shape[0]
        Bp = hr.shape[1]
        Sre, Sie, _, _ = _ext_stacks(Sr, Si)

        _, h_vjp = jax.vjp(lambda a, b: _unpack_hist(a, b, B, dtype), hr, hi)
        jr, ji = h_vjp(hist_bar)

        def unpack_xT(a, b):
            if real_io:
                return (a[:B, :N], b[:B, :N])
            return (a[:B, :N] + 1j * b[:B, :N]).astype(dtype)

        _, u_vjp = jax.vjp(unpack_xT, hr[-1], hi[-1])
        gTr, gTi = u_vjp(xT_bar)

        args = (Sre, Sie, _pad_C(C), hr, hi, jr, ji, gTr, gTi,
                x0r, x0i) + _row_args()
        if store_iters:
            args = args + tuple(ks)
        gr, gi, Cb = _bwd_call(ntime, Bp)(*args)

        _, pk_vjp = jax.vjp(_pack, x0_proto)
        (x0_bar,) = pk_vjp((gr, gi))
        C_bar = Cb[:, 0, :K].astype(C.dtype)
        # stack cotangents intentionally zero — see builder docstring
        return (jnp.zeros_like(Sr), jnp.zeros_like(Si), x0_bar, C_bar)

    propagate.defvjp(fwd2, bwd2)
    return propagate


def packed_group_size(dim: int) -> int:
    """Number of candidates the packed streamK kernel fits into one 128-lane
    tile at state dimension `dim` (1 when packing buys nothing)."""
    return max(1, 128 // int(dim))


def tc_for(nsteps: int) -> int:
    """Sub-steps per grid step of the Tc-blocked packed kernels: the
    per-grid-step machinery costs ~0.36 us on the v5e (measured; the step
    math hides under it), so amortize it over Tc sub-steps. Largest
    convenient divisor wins; prime ntime falls back to 1 (correct, just
    unamortized)."""
    return next(t for t in (8, 7, 6, 5, 4, 3, 2, 1) if nsteps % t == 0)


def make_streamk_packed_propagate(stack, dt: float, iters: int = 10,
                                  gen_diag=None, linsolver: str = "neumann",
                                  group: int = None, interpret: bool = False,
                                  per_block_stacks: bool = False,
                                  store_iters=None, real_io: bool = False):
    """LANE-PACKED streamK: G control candidates propagate through ONE
    kernel program by packing their states into disjoint N-lane segments of
    the 128-lane tile and their Hamiltonians into the matching diagonal
    blocks of the (P, P) planes.

    Why: at the flagship's N=16 the plain kernels pad the state to P=128
    lanes, so every MXU issue carries 16/128 useful lanes and every VPU
    plane op serves one candidate. The per-candidate planes are independent,
    but a BLOCK-DIAGONAL plane H = diag(H_0..H_{G-1}) applies each
    candidate's Hamiltonian to its own lane segment in the SAME
    (Bp, P) @ (P, P) dot — G = floor(128/N) candidates per issue (8 at
    N=16), cutting per-candidate MXU issues, VPU plane contractions, and
    history HBM traffic by G.

    Mechanics (all consequences of the block structure):
    * operator stacks expand to I_G (x) S_k (still (Ke, P, P) VMEM — same
      footprint as unpacked);
    * per-step coefficients become (Ke, P) lane rows r_k with
      r_k[g*N + i] = c[n, g, k]; the in-kernel contraction
      H = sum_k r_k[None, :] * T_k is exact because T_k is zero off-block,
      and the same COLUMN broadcast also builds H^T (within a block the
      row and column coefficients agree);
    * the backward emits per-lane cotangent rows (column sums of
      Hb * T_k); the per-candidate coefficient cotangent is their
      block-segment sum, done outside in XLA.

    Contract: propagate(Sr, Si, x0, Cg) -> (xT, hist) with Cg (ntime, G, K)
    — one coefficient row per candidate — x0 (B, N) SHARED across the
    group (the ensemble semantics: same initial conditions, different
    controls), xT (G, B, N), hist (ntime, G, B, N). Differentiable in x0
    and Cg; stack cotangents are zero by the same contract (and for the
    same reason) as make_streamk_propagate.

    per_block_stacks=True: each lane block gets its OWN operator stack —
    Sr/Si become (G, K, n, n) and gen_diag (G, N) — so the group can hold
    G different SYSTEM REALIZATIONS under one (shared or per-block)
    control: robust/sampled-Hamiltonian ensembles run all samples in one
    kernel program (optim/robust.py)."""
    stack = np.asarray(stack)
    if per_block_stacks:
        Gs, K, N, _ = stack.shape
        if group is not None and int(group) != Gs:
            raise ValueError(f"group={group} != stack blocks {Gs}")
        group = Gs
    else:
        K, N, _ = stack.shape
    G = int(group) if group is not None else packed_group_size(N)
    if G < 1:
        raise ValueError(f"group must be >= 1, got {G}")
    NG = G * N
    P = _round_up(NG, 128)
    dt = float(dt)
    iters = int(iters)
    jac_np = split_np = None
    diag_slot = None
    # per-block tiling of the (time-independent) generator diagonal:
    # shared-stack groups repeat one drift G times; per-block groups
    # concatenate each realization's own diagonal
    gd_tiled = None
    if gen_diag is not None:
        gd = np.asarray(gen_diag, dtype=np.complex128)
        if per_block_stacks:
            if gd.reshape(-1).shape[0] != NG:
                raise ValueError(
                    f"per-block gen_diag must have G*N = {NG} entries")
            gd_tiled = gd.reshape(-1)
        else:
            gd_tiled = np.tile(gd.reshape(-1), G)
    if linsolver == "jacobi":
        if gen_diag is None:
            raise ValueError("jacobi streamed solve requires gen_diag")
        jac_np = _jacobi_planes(gd_tiled, dt, NG, P)
    elif linsolver == "split":
        if gen_diag is None:
            raise ValueError("split streamed stepper requires gen_diag")
        split_np = _split_planes(gd_tiled, dt, NG, P)
        d = np.zeros((P,), np.complex128)
        d[:NG] = gd_tiled
        h = 1j * d
        # diag(h) is diagonal, so its I_G-block form is just the tiled diag
        diag_slot = (np.diag(h.real).astype(np.float32),
                     np.diag(h.imag).astype(np.float32))
    elif linsolver != "neumann":
        raise ValueError(f"packed streamK supports neumann/jacobi/split, "
                         f"got {linsolver!r}")
    Ke = K + (1 if diag_slot is not None else 0)
    n_rows = 4 if jac_np is not None else (2 if split_np is not None else 0)
    # Forward-stored stage iterates let the backward skip its replay
    # (saves `iters` matvecs per backward step) at an HBM cost of
    # iters x (Bp, P) f32 planes per step per direction — cheap for the
    # small-batch flagships, prohibitive for gate-class batches at
    # mid-size N (the caller gates on the computed byte count and passes
    # store_iters=False there).
    if store_iters is None:
        store_iters = iters <= 4
    store_iters = bool(store_iters) and iters <= 4

    vmem = {} if not _HAVE_PLTPU else {"memory_space": pltpu.VMEM}

    def _est(Bp, nstacks, Tc):
        """Operand-footprint estimate (bytes): `nstacks` VMEM-resident
        (Ke, P, P) stacks + double-buffered (Tc, ...) blocks."""
        it = iters + 1 if store_iters else 0
        return 4 * (nstacks * Ke * P * P
                    + Tc * 2 * ((4 + 2 * it) * Bp * P + 2 * Ke * P)
                    + 6 * Bp * P)

    def _row_args():
        rows = jac_np if jac_np is not None else split_np
        return tuple(jnp.asarray(p) for p in rows) if rows else ()

    def _pack(x0):
        """(B, N) complex — or, with real_io, an (xr, xi) f32 pair —
        -> (Bp, P) f32 planes, x0 tiled into each of the G lane blocks
        (real_io keeps the device program complex-free)."""
        if real_io:
            x0r, x0i = x0
        else:
            x0r = jnp.real(x0)
            x0i = jnp.imag(x0)
        B = x0r.shape[0]
        Bp = _round_up(B, 8)
        xr = jnp.zeros((Bp, P), jnp.float32).at[:B, :NG].set(
            jnp.tile(x0r.astype(jnp.float32), (1, G)))
        xi = jnp.zeros((Bp, P), jnp.float32).at[:B, :NG].set(
            jnp.tile(x0i.astype(jnp.float32), (1, G)))
        return xr, xi

    def _unpack_hist(hr, hi, B, dtype):
        # (T, Bp, P) -> (T, G, B, N): lane block g is candidate g
        if real_io:
            return tuple(
                h[:, :B, :NG].reshape(h.shape[0], B, G, N)
                .transpose(0, 2, 1, 3) for h in (hr, hi))
        h = (hr[:, :B, :NG] + 1j * hi[:, :B, :NG]).astype(dtype)
        return h.reshape(h.shape[0], B, G, N).transpose(0, 2, 1, 3)

    def _unpack_xT(a, b, B, dtype):
        if real_io:
            return tuple(x[:B, :NG].reshape(B, G, N).swapaxes(0, 1)
                         for x in (a, b))
        x = (a[:B, :NG] + 1j * b[:B, :NG]).astype(dtype)
        return x.reshape(B, G, N).swapaxes(0, 1)

    def _expand_stacks(Sr, Si):
        """Operator planes (K, n, n) with n >= N (plane_args pads to 128;
        only the [:N, :N] block is meaningful) -> block-diagonal (Ke, P, P)
        = I_G (x) S_k (+ the split-diagonal slot), plus transposes. With
        per_block_stacks, input is (G, K, n, n) and block g of slot k is
        S[g, k] (different realization per block)."""
        eyeG = jnp.eye(G, dtype=Sr.dtype)

        def ex(S):
            if per_block_stacks:
                Sg = jnp.zeros((K, P, P), S.dtype)
                for g in range(G):
                    Sg = Sg.at[:, g * N:(g + 1) * N, g * N:(g + 1) * N].set(
                        S[g, :, :N, :N])
                return Sg
            Sg = jax.vmap(lambda s: jnp.kron(eyeG, s))(S[:, :N, :N])
            if NG < P:
                Sg = jnp.pad(Sg, ((0, 0), (0, P - NG), (0, P - NG)))
            return Sg

        Srg, Sig = ex(Sr), ex(Si)
        if diag_slot is not None:
            Srg = jnp.concatenate(
                [Srg, -jnp.asarray(diag_slot[0])[None]], axis=0)
            Sig = jnp.concatenate(
                [Sig, -jnp.asarray(diag_slot[1])[None]], axis=0)
        return Srg, Sig, jnp.swapaxes(Srg, -1, -2), jnp.swapaxes(Sig, -1, -2)

    def _rows_C(Cg):
        """(ntime, G, K) -> (ntime, Ke, P) per-lane coefficient rows:
        rows[n, k, g*N + i] = Cg[n, g, k]; the split-diagonal slot gets
        coefficient 1 on every occupied lane."""
        ntime = Cg.shape[0]
        base = jnp.swapaxes(Cg.astype(jnp.float32), 1, 2)   # (ntime, K, G)
        rep = jnp.repeat(base, N, axis=2)                   # (ntime, K, NG)
        Rp = jnp.zeros((ntime, Ke, P), jnp.float32)
        Rp = Rp.at[:, :K, :NG].set(rep)
        if diag_slot is not None:
            Rp = Rp.at[:, K, :NG].set(1.0)
        return Rp

    def _contract(r_ref, Sa_ref, Sb_ref, row=0):
        """H = sum_k r_k (column-broadcast) * S_k for sub-step `row` of the
        (Tc, Ke, P) coefficient block. Valid for BOTH the plane and its
        transpose: T_k is zero off-block and r_k is constant within a
        block, so row- and column-broadcast agree where T_k != 0. Rows are
        kept (1, P)-shaped (lane vectors) for the Mosaic lowering."""
        Hr = r_ref[row, 0:1] * Sa_ref[0]
        Hi = r_ref[row, 0:1] * Sb_ref[0]
        for k in range(1, Ke):
            Hr = Hr + r_ref[row, k:k + 1] * Sa_ref[k]
            Hi = Hi + r_ref[row, k:k + 1] * Sb_ref[k]
        return Hr, Hi

    _tc_for = tc_for

    def _split_rows(refs):
        if jac_np is not None:
            dr, di_, mr_, mi_ = refs
            return (dr[:], di_[:], mr_[:], mi_[:]), None
        if split_np is not None:
            er, ei_ = refs
            return None, (er[:], ei_[:])
        return None, None

    stack_spec_shape = (Ke, P, P)

    def _fwd_call(nsteps, Bp):
        Tc = _tc_for(nsteps)
        n1 = nsteps // Tc
        const3 = pl.BlockSpec(stack_spec_shape, lambda i: (0, 0, 0), **vmem)
        crow = pl.BlockSpec((Tc, Ke, P), lambda i: (i, 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [const3, const3, crow, full, full] + [row] * n_rows

        def body(*refs):
            SrT_ref, SiT_ref, r_ref, x0r, x0i = refs[:5]
            jac, split = _split_rows(refs[5:5 + n_rows])
            outs = refs[5 + n_rows:]
            xr_ref, xi_ref, hr, hi = outs[:4]
            ks_refs = outs[4:6] if store_iters else None
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                xr_ref[:] = x0r[:]
                xi_ref[:] = x0i[:]

            xr = xr_ref[:]
            xi = xi_ref[:]
            for j in range(Tc):
                HrT, HiT = _contract(r_ref, SrT_ref, SiT_ref, row=j)

                def store_k(jj, kr, ki, _j=j):
                    if ks_refs is not None and jj < iters:
                        ks_refs[0][_j, jj * Bp:(jj + 1) * Bp, :] = kr
                        ks_refs[1][_j, jj * Bp:(jj + 1) * Bp, :] = ki

                xr, xi = _fwd_step(HrT, HiT, xr, xi, store_k,
                                   dt=dt, iters=iters, jac=jac, split=split)
                hr[j] = xr
                hi[j] = xi
            xr_ref[:] = xr
            xi_ref[:] = xi

        hist_spec = pl.BlockSpec((Tc, Bp, P), lambda i: (i, 0, 0), **vmem)
        out_shape = (jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2 \
            + (jax.ShapeDtypeStruct((nsteps, Bp, P), jnp.float32),) * 2
        out_specs = (full, full, hist_spec, hist_spec)
        if store_iters:
            ks_spec = pl.BlockSpec((Tc, iters * Bp, P),
                                   lambda i: (i, 0, 0), **vmem)
            out_shape = out_shape + (jax.ShapeDtypeStruct(
                (nsteps, iters * Bp, P), jnp.float32),) * 2
            out_specs = out_specs + (ks_spec, ks_spec)
        return pl.pallas_call(
            body,
            grid=(n1,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            **_cparams(_est(Bp, 2, Tc)))

    def _bwd_call(nsteps, Bp):
        Tc = _tc_for(nsteps)
        n1 = nsteps // Tc
        const3 = pl.BlockSpec(stack_spec_shape, lambda i: (0, 0, 0), **vmem)
        crow_rev = pl.BlockSpec((Tc, Ke, P),
                                lambda i, n=n1: (n - 1 - i, 0, 0),
                                **vmem)
        revs = pl.BlockSpec((Tc, Bp, P),
                            lambda i, n=n1: (n - 1 - i, 0, 0), **vmem)
        # previous-history block: in-block sub-steps read their pre-step
        # state from the CURRENT block (row j-1); sub-step 0 reads the last
        # row of the PREVIOUS block (clamped; overridden by x0 at the
        # global first step)
        revp = pl.BlockSpec(
            (Tc, Bp, P),
            lambda i, n=n1: (jnp.maximum(n - 2 - i, 0), 0, 0), **vmem)
        full = pl.BlockSpec((Bp, P), lambda i: (0, 0), **vmem)
        row = pl.BlockSpec((1, P), lambda i: (0, 0), **vmem)
        in_specs = [const3, const3, const3, const3, crow_rev,
                    revs, revs, revp, revp, revs, revs,
                    full, full, full, full] + [row] * n_rows
        if store_iters:
            revks = pl.BlockSpec((Tc, iters * Bp, P),
                                 lambda i, n=n1: (n - 1 - i, 0, 0),
                                 **vmem)
            in_specs += [revks, revks]

        def body(*refs):
            (Sr_ref, Si_ref, SrT_ref, SiT_ref, r_ref, hcr, hci, hpr, hpi,
             jr, ji, gTr, gTi, x0r, x0i) = refs[:15]
            jac, split = _split_rows(refs[15:15 + n_rows])
            rest = refs[15 + n_rows:]
            ks_refs = rest[:2] if store_iters else None
            gr_ref, gi_ref, Rb = rest[2:] if store_iters else rest
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                gr_ref[:] = gTr[:]
                gi_ref[:] = gTi[:]

            first_block = i == n1 - 1
            gr = gr_ref[:]
            gi = gi_ref[:]
            for j in range(Tc - 1, -1, -1):
                Hr, Hi = _contract(r_ref, Sr_ref, Si_ref, row=j)
                # transposed planes contracted from the VMEM-resident
                # transposed stacks (no in-body (P, P) VPU transposes)
                HT = _contract(r_ref, SrT_ref, SiT_ref, row=j)
                if j > 0:
                    xpr = hcr[j - 1]
                    xpi = hci[j - 1]
                else:
                    xpr = jnp.where(first_block, x0r[:], hpr[Tc - 1])
                    xpi = jnp.where(first_block, x0i[:], hpi[Tc - 1])
                g2r = gr + jr[j]
                g2i = gi + ji[j]
                ks_vals = None
                if ks_refs is not None:
                    ks_vals = [(ks_refs[0][j, jj * Bp:(jj + 1) * Bp, :],
                                ks_refs[1][j, jj * Bp:(jj + 1) * Bp, :])
                               for jj in range(iters)]

                def emit_Hb(br, bi, _j=j):
                    # per-lane cotangent rows: s_k[l] = sum_i Hb[i,l]
                    # T_k[i,l] (column sums of the masked plane cotangent);
                    # the per-candidate coefficient cotangent is the
                    # block-segment sum of s_k, done outside in XLA
                    parts = [jnp.sum(br * Sr_ref[k] + bi * Si_ref[k],
                                     axis=0, keepdims=True)
                             for k in range(Ke)]
                    Rb[_j] = jnp.concatenate(parts, axis=0)

                gr, gi = _bwd_step(Hr, Hi, HT, xpr, xpi, g2r, g2i, ks_vals,
                                   emit_Hb, dt=dt, iters=iters, jac=jac,
                                   split=split)
            gr_ref[:] = gr
            gi_ref[:] = gi

        crow_out = pl.BlockSpec((Tc, Ke, P),
                                lambda i, n=n1: (n - 1 - i, 0, 0),
                                **vmem)
        return pl.pallas_call(
            body,
            grid=(n1,),
            out_shape=(jax.ShapeDtypeStruct((Bp, P), jnp.float32),) * 2
            + (jax.ShapeDtypeStruct((nsteps, Ke, P), jnp.float32),),
            in_specs=in_specs,
            out_specs=(full, full, crow_out),
            interpret=interpret,
            **_cparams(_est(Bp, 4, Tc)))

    def _meta(x0):
        if real_io:
            return x0[0].shape[0], jnp.float32
        return x0.shape[0], x0.dtype

    def _run_forward(Sr, Si, x0, Cg):
        B, dtype = _meta(x0)
        ntime = Cg.shape[0]
        xr0, xi0 = _pack(x0)
        Bp = xr0.shape[0]
        _, _, SrT, SiT = _expand_stacks(Sr, Si)
        args = (SrT, SiT, _rows_C(Cg), xr0, xi0) + _row_args()
        outs = _fwd_call(ntime, Bp)(*args)
        xr, xi, hr, hi = outs[:4]
        ks = outs[4:6] if store_iters else None
        xT = _unpack_xT(xr, xi, B, dtype)
        return xT, _unpack_hist(hr, hi, B, dtype), (hr, hi), ks

    @jax.custom_vjp
    def propagate(Sr, Si, x0, Cg):
        xT, hist, _, _ = _run_forward(Sr, Si, x0, Cg)
        return xT, hist

    def fwd2(Sr, Si, x0, Cg):
        xT, hist, planes, ks = _run_forward(Sr, Si, x0, Cg)
        x0p = _pack(x0)
        x0_proto = jax.tree.map(jnp.zeros_like, x0)
        return (xT, hist), (Sr, Si, Cg, x0_proto, planes, x0p, ks)

    def bwd2(res, cots):
        Sr, Si, Cg, x0_proto, (hr, hi), (x0r, x0i), ks = res
        xT_bar, hist_bar = cots
        B, dtype = _meta(x0_proto)
        ntime = Cg.shape[0]
        Bp = hr.shape[1]
        Sre, Sie, SreT, SieT = _expand_stacks(Sr, Si)

        _, h_vjp = jax.vjp(lambda a, b: _unpack_hist(a, b, B, dtype), hr, hi)
        jr, ji = h_vjp(hist_bar)

        _, u_vjp = jax.vjp(lambda a, b: _unpack_xT(a, b, B, dtype),
                           hr[-1], hi[-1])
        gTr, gTi = u_vjp(xT_bar)

        args = (Sre, Sie, SreT, SieT, _rows_C(Cg), hr, hi, hr, hi,
                jr, ji, gTr, gTi, x0r, x0i) + _row_args()
        if store_iters:
            args = args + tuple(ks)
        gr, gi, Rb = _bwd_call(ntime, Bp)(*args)

        _, pk_vjp = jax.vjp(_pack, x0_proto)
        (x0_bar,) = pk_vjp((gr, gi))
        # rows -> per-candidate coefficients: block-segment sums
        Cg_bar = Rb[:, :K, :NG].reshape(ntime, K, G, N).sum(-1
                  ).swapaxes(1, 2).astype(Cg.dtype)
        # stack cotangents intentionally zero — see builder docstring
        return (jnp.zeros_like(Sr), jnp.zeros_like(Si), x0_bar, Cg_bar)

    propagate.defvjp(fwd2, bwd2)
    return propagate
