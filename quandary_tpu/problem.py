"""Problem assembly: from a resolved setup to differentiable objective /
simulation functions.

This module is the TPU-native counterpart of the reference call stack
main.cpp -> OptimProblem::evalF/evalGradF -> TimeStepper::solveODE ->
MasterEq::assemble_RHS (SURVEY.md section 3.1). The entire multi-initial-
condition objective — forward propagation of the whole batch, final-time cost,
fidelity, all four penalty integrals and both regularizers — is ONE pure
function of the control parameter vector. `jax.value_and_grad` of it is the
discrete adjoint (including the Schroedinger two-phase coupling through
|sum_i overlap_i|^2 that the reference handles with a second adjoint loop,
optimproblem.cpp:494-519 — here it falls out of AD automatically).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.controls import (
    control_variation_penalty,
    eval_controls,
    eval_controls_labframe,
)
from .models.hamiltonian import HamiltonianModel
from .models import initialconditions as ic
from .ops.rhs import DenseEngine
from .ops.steppers import make_step_fn, stage_midpoint_times
from .ops import solvers
from .utils.indexing import guard_mask
from .utils.splines import ControlEvalPlan, OscillatorControl, build_control_plan


def pack_vmem_budget_bytes() -> int:
    """Operand-footprint budget for admitting the packed streamK builder.

    Mosaic's scoped-vmem accounting runs ~2.5x the raw operand footprint
    (measured, PERF.md), so the budget is sized well under the physical
    VMEM. Default 12 MiB is calibrated for the 128 MiB VMEM of v4/v5
    parts; other generations scale proportionally when the runtime
    exposes a core count/VMEM hint. Override with QTPU_PACK_VMEM_MB for
    hardware where the heuristic mis-gates (too eager -> Mosaic
    allocation failure on build, which falls back loudly; too shy ->
    unpacked kernels, only slower)."""
    import os
    env = os.environ.get("QTPU_PACK_VMEM_MB")
    if env:
        return int(float(env) * (1 << 20))
    try:
        import jax as _jax
        kind = _jax.devices()[0].device_kind.lower()
        # v2/v3 cores have 16 MiB VMEM vs 128 MiB on v4+: scale the
        # budget by the same 8x so the gate tracks the hardware.
        if "v2" in kind or "v3" in kind:
            return int(1.5 * (1 << 20))
    except Exception:  # noqa: BLE001 - no backend yet / cpu-only
        pass
    return 12 * (1 << 20)


def fused_vmem_budget_bytes() -> int:
    """Operand budget for the plain (unpacked) streamK builder's resident
    operator stacks — the admission bound for mid-size Hilbert spaces on
    the fused path. The stacks are single-buffered (constant index maps),
    so unlike the packed builder's 12 MiB gate this budget can approach
    the physical 128 MiB VMEM; 80 MiB leaves room for the double-buffered
    per-step blocks and Mosaic's own scratch. Override with
    QTPU_FUSED_VMEM_MB (an over-eager value fails loudly at kernel build;
    a shy one falls back to the XLA scan engines, only slower)."""
    import os
    env = os.environ.get("QTPU_FUSED_VMEM_MB")
    if env:
        return int(float(env) * (1 << 20))
    try:
        import jax as _jax
        kind = _jax.devices()[0].device_kind.lower()
        if "v2" in kind or "v3" in kind:
            return 10 * (1 << 20)
    except Exception:  # noqa: BLE001 - no backend yet / cpu-only
        pass
    return 80 * (1 << 20)


def _relay_retry(fn, attempts: int = 7):
    """Run a device-touching thunk with exponential backoff: remote-attached
    devices (TPU behind a relay tunnel) transiently reject requests under
    load/rapid sequences; a wait and retry recovers. Only runtime/backend
    errors are retried — programming errors (TypeError/ValueError/...)
    surface immediately instead of being re-run for two minutes."""
    import time

    def _transient(e: Exception) -> bool:
        name = type(e).__name__
        return isinstance(e, (OSError, RuntimeError)) or \
            "RuntimeError" in name or "XlaRuntime" in name

    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - relay errors are opaque
            if a == attempts - 1 or not _transient(e):
                raise
            time.sleep(2.0 ** a)


def _put_retry(piece, attempts: int = 7):
    return _relay_retry(lambda: jax.device_put(piece), attempts)


def _sparse_device_put(v: np.ndarray, density_thresh: float = 0.01,
                       max_nnz: int = 1 << 16):
    """Materialize a sparse host array on device by scattering its nonzeros
    from a tiny embedded (indices, values) pair — e.g. basis/pure initial
    state batches and permutation-gate target batches, which are one-hot at
    any dimension. Returns None when the array is too dense."""
    flat = np.ascontiguousarray(v).reshape(-1)
    nz = np.flatnonzero(flat)
    if nz.size > density_thresh * flat.size or nz.size > max_nnz:
        return None
    vals = flat[nz]

    def build():
        return jnp.zeros(flat.shape, v.dtype).at[jnp.asarray(nz)].set(
            jnp.asarray(vals)).reshape(v.shape)

    return _relay_retry(jax.jit(build))


def _chunked_device_put(v: np.ndarray, max_bytes: int = 128 << 20):
    """device_put that splits arrays larger than `max_bytes` into flat chunks
    transferred separately (with retry) and reassembled on device, bounding
    the size of any single transfer message."""
    if v.nbytes <= max_bytes:
        return _put_retry(v)
    flat = np.ascontiguousarray(v).reshape(-1)
    n_chunks = -(-v.nbytes // max_bytes)
    # assemble in place with a donated buffer: a single wide concatenate of
    # all pieces is one more oversized request, and non-donated updates would
    # copy the full buffer per piece
    # no donation: a rejected donated call can consume the buffer, making a
    # retry unsafe; at this chunk size the copy per update is negligible
    upd = jax.jit(lambda b, p, i: jax.lax.dynamic_update_slice(b, p, (i,)))
    buf = _relay_retry(lambda: jax.jit(lambda: jnp.zeros(flat.shape,
                                                         flat.dtype))())
    off = 0
    for piece in np.array_split(flat, n_chunks):
        p = _put_retry(piece)
        buf = _relay_retry(lambda: upd(buf, p, off))
        off += piece.size
    return buf.reshape(v.shape)


@dataclasses.dataclass
class Setup:
    """Fully-resolved problem specification in internal units (rad/ns, ns)."""
    model: HamiltonianModel
    nessential: Tuple[int, ...]
    ntime: int
    dt: float
    timestepper: str = "IMR"
    linsolve_iters: int = 20
    linsolver: str = "neumann"

    oscillators: Tuple[OscillatorControl, ...] = ()
    pipulses: Optional[tuple] = None           # per-osc list of (t0, t1, amp)
    ground_freqs_radns: Tuple[float, ...] = ()

    initcond_type: str = "basis"
    initcond_ids: Tuple[int, ...] = ()
    pure_levels: Optional[Tuple[int, ...]] = None
    initial_state_ess: Optional[np.ndarray] = None   # for initcond 'file'

    target_type: str = "none"                  # 'gate' | 'pure' | 'file' | 'none'
    target_gate_full: Optional[np.ndarray] = None    # assembled full-dim V
    target_state_full: Optional[np.ndarray] = None   # full-dim target (file)
    target_batch: Optional[np.ndarray] = None        # precomputed (B, ...) targets
    pure_target_levels: Optional[Tuple[int, ...]] = None

    objective_type: str = "Jtrace"
    obj_weights: Optional[np.ndarray] = None   # un-normalized; filled/normalized here

    gamma_tik: float = 1e-4
    gamma_tik_interpolate: bool = False
    gamma_penalty: float = 0.0                 # leakage / weighted-J
    penalty_param: float = 0.0                 # 'a' of the weighted-J window
    gamma_penalty_dpdm: float = 0.0
    gamma_penalty_energy: float = 0.0
    gamma_penalty_variation: float = 0.0

    dtype: object = jnp.complex128
    # Adjoint mode for the sequential-scan path: 'remat' stores one state
    # per step and recomputes in-step work (storeFWD analog); 'reversible'
    # recomputes states by backward integration (O(1) state memory, closed
    # systems with IMR-family steppers only); 'auto' picks reversible when
    # legal. (ops/reversible.py)
    adjoint: str = "auto"
    # Fused Pallas step kernels (ops/pallas_kernels.py, ops/pallas_adjoint.py):
    # 'auto' enables the fully-fused VMEM-resident IMR propagation — with the
    # hand-derived reversible VJP for training — on TPU backends for dense
    # complex64 closed systems with plain-Neumann stage solves; True forces
    # (interpret mode off-TPU, for tests); False disables.
    pallas: object = "auto"
    # Kernel form for the fused path: 'stream' (default) launches ONE
    # grid-over-steps kernel per direction with the Hamiltonian planes
    # pipelined HBM->VMEM (ops/pallas_stream.py — no steps-per-launch VMEM
    # cap, supports the Jacobi-preconditioned stage solve for stiff
    # systems); 'chunk' keeps the Tc-steps-per-launch kernels
    # (ops/pallas_adjoint.py) as a cross-check path.
    # 'streamk' (default): grid-streamed kernels with IN-KERNEL plane
    # contraction — the (ntime, P, P) Hamiltonian plane arrays never hit
    # HBM (measured: closed E=32 flagship 286 -> 342 sweeps/s, guarded
    # open CNOT 41 -> 47). 'stream': planes materialized by XLA and
    # streamed per step (needed when the operator STACKS themselves are
    # differentiated, e.g. Hamiltonian calibration — streamk returns zero
    # stack cotangents by documented contract). 'chunk': Tc-steps-per-
    # launch cross-check path.
    pallas_mode: str = "streamk"
    # Fused state form for OPEN systems: 'auto' uses the vectorized
    # superoperator kernels while their (Ke, P, P) stacks fit VMEM
    # (P = roundup(N^2, 128)) and falls over to the density-matrix-form
    # kernel (ops/pallas_rho.py, (N, N) matrix state, two-sided matmuls)
    # for mid-size N; 'rho' forces the matrix form, 'superop' forbids it.
    pallas_rho: str = "auto"
    # Time-parallel propagation (ops/propagator.py): 'auto' enables it for
    # small dense systems where ntime * dim^2 fits comfortably in memory;
    # True forces, False disables (sequential lax.scan).
    time_parallel: object = "auto"
    time_parallel_budget: int = 1 << 27        # max ntime * dim^2 elements
    # RHS engine: 'auto' picks dense (HamiltonianModel) / tensor
    # (StructuredModel) / grouped (large Schroedinger StructuredModel);
    # 'tensor' | 'grouped' force a StructuredModel engine explicitly.
    engine: str = "auto"

    @property
    def total_time(self) -> float:
        return self.ntime * self.dt

    @property
    def nparams(self) -> int:
        return sum(o.nparams for o in self.oscillators)


class Problem:
    """Device-ready problem: precomputed plans, state batches and closures."""

    def __init__(self, setup: Setup):
        # every entry point funnels through here: wire the persistent XLA
        # compile cache so cold processes reuse prior compiles (the
        # reference binary has zero compile latency to match)
        from .utils.cache import enable_persistent_cache
        enable_persistent_cache()
        self.setup = setup
        model = setup.model
        self.model = model
        self.lindblad = model.lindblad
        self.dims = model.dims
        self.N = model.N
        s = setup

        # canonicalize against the runtime x64 state: with jax_enable_x64
        # off, a requested f64 silently truncates to f32 anyway — declare
        # what actually runs instead of warning on every zeros()
        self.rdtype = (jnp.float64
                       if s.dtype == jnp.complex128 and jax.config.jax_enable_x64
                       else jnp.float32)

        # --- engine: dense operator stack (HamiltonianModel) or matrix-free
        # per-axis contractions (StructuredModel) ---
        from .ops.tensor_rhs import StructuredModel, TensorEngine
        if isinstance(model, StructuredModel):
            use_grouped = (s.engine == "grouped" or (
                s.engine == "auto" and not model.lindblad
                and model.N >= 1 << 15))
            use_grouped_lind = (model.lindblad and len(model.dims) >= 2 and (
                s.engine == "grouped" or (
                    s.engine == "auto" and model.N >= 1 << 9)))
            if use_grouped and not model.lindblad and len(model.dims) >= 2:
                # large Schroedinger systems: matricized big-GEMM engine
                from .ops.grouped_rhs import GroupedEngine
                self.engine = GroupedEngine(model, dtype=s.dtype)
            elif use_grouped_lind:
                # large open systems: group GEMMs on the rank-4 rho view
                from .ops.grouped_lindblad import GroupedLindbladEngine
                self.engine = GroupedLindbladEngine(model, dtype=s.dtype)
            else:
                self.engine = TensorEngine(model, dtype=s.dtype)
        else:
            self.engine = DenseEngine(model, dtype=s.dtype)

        # --- time grids and control plans ---
        ntime, dt = s.ntime, s.dt
        self.ts_mid = stage_midpoint_times(ntime, dt, s.timestepper)  # (ntime, nstages)
        self.nstages = self.ts_mid.shape[1]
        self.plan_mid = build_control_plan(s.oscillators, self.ts_mid.reshape(-1))
        self.ts_stop = (np.arange(1, ntime + 1)) * dt
        self.plan_stop = build_control_plan(s.oscillators, self.ts_stop)
        self.ts_out = np.arange(ntime + 1) * dt
        self.plan_out = build_control_plan(s.oscillators, self.ts_out)

        # --- initial conditions ---
        osc_ids = s.initcond_ids if len(s.initcond_ids) > 0 else tuple(range(model.n_osc))
        x0_np, initids = ic.build_initial_states(
            s.initcond_type, model.dims, s.nessential, osc_ids, self.lindblad,
            pure_levels=s.pure_levels, from_file_state=s.initial_state_ess,
        )
        self.initids = initids
        self.ninit = x0_np.shape[0]
        # All static data is kept host-side (numpy): closed-over numpy arrays
        # are embedded as compile-time constants directly from host memory,
        # whereas device arrays would be fetched back at every jit trace —
        # prohibitively slow on a remote-TPU tunnel. The sharded multi-chip
        # path replaces these with device_put arrays (parallel/mesh.py).
        npdt = np.complex64 if s.dtype == jnp.complex64 else np.complex128
        self.x0 = x0_np.astype(npdt)

        # --- objective weights (optimproblem.cpp:71-91) ---
        w = np.asarray(s.obj_weights if s.obj_weights is not None else [1.0], dtype=float)
        if w.size < self.ninit:
            w = np.concatenate([w, np.full(self.ninit - w.size, w[-1])])
        w = w[: self.ninit]
        w = w / w.sum()
        self.nprdtype = np.float32 if self.rdtype == jnp.float32 else np.float64
        self.weights = w.astype(self.nprdtype)

        # --- targets ---
        self.pure_target_id = None
        self.target = None          # (B, ...) target batch for gate/file targets
        if s.target_batch is not None:
            self.target = np.asarray(s.target_batch).astype(npdt)
        elif s.target_type == "gate" and s.target_gate_full is not None:
            V = np.asarray(s.target_gate_full, dtype=np.complex128)
            if self.lindblad:
                tgt = np.einsum("ij,bjk,lk->bil", V, x0_np, V.conj())
            else:
                tgt = np.einsum("ij,bj->bi", V, x0_np)
            self.target = tgt.astype(npdt)
        elif s.target_type in ("file", "state") \
                and s.target_state_full is not None:
            # 'state' is the direct-array spelling of the reference's
            # file-based fixed target (optimtarget.cpp:701)
            t1 = np.asarray(s.target_state_full, dtype=np.complex128)
            if self.lindblad and t1.ndim == 1:
                t1 = np.outer(t1, t1.conj())
            tgt = np.broadcast_to(t1, (self.ninit,) + t1.shape)
            self.target = np.ascontiguousarray(tgt).astype(npdt)
        elif s.target_type == "pure":
            levels = s.pure_target_levels or tuple([0] * model.n_osc)
            from .utils.indexing import flat_index
            self.pure_target_id = flat_index(levels, model.dims)
        elif s.target_type not in ("none", None):
            # an unrecognized target silently zeroing the objective cost
            # is exactly the failure mode that let XLA dead-code-eliminate
            # whole propagations in perf probes — refuse instead
            raise ValueError(
                f"target_type {s.target_type!r} provided without a usable "
                "target (expected gate/file/state/pure/none with the "
                "matching target_* field set)")

        # purity Tr(rho0^2) per initial condition (optimtarget.cpp:701-708)
        flat0 = x0_np.reshape(self.ninit, -1)
        self.purity = np.maximum(np.sum(np.abs(flat0) ** 2, axis=1),
                                 1e-300).astype(self.nprdtype)

        # --- penalty precomputations ---
        gmask = guard_mask(model.dims, s.nessential)
        self.has_guard = bool(gmask.any())
        self.guard_mask = gmask
        if s.penalty_param > 1e-13:
            a = s.penalty_param
            T = s.total_time
            self.jt_weight = ((1.0 / a) * np.exp(-(((self.ts_stop - T) / a) ** 2))
                              ).astype(self.nprdtype)
        else:
            self.jt_weight = None
        if self.pure_target_id is not None:
            self.measure_weights = np.abs(
                np.arange(self.N) - self.pure_target_id).astype(self.nprdtype)
        else:
            self.measure_weights = None

        # --- linear-solver stiffness guard. The plain Neumann stage solve
        # converges for u = dt/2 * ||M|| < 1, but what matters over a long
        # horizon is its truncation ERROR, ~u^(iters+1) per step: at u = 0.7
        # and 8 iters that is ~4e-2 per step, which compounds to e^50 over
        # ~1200 steps — the trajectory's stiffest (guard-corner Kerr) mode
        # explodes while the essential-subspace fidelity still looks sane.
        # So switch to the Jacobi-preconditioned iteration (exact elementwise
        # inverse of the stiff DIAGONAL; the remaining contraction is the
        # tiny off-diagonal coupling) as soon as u is large enough that the
        # truncated plain series is no longer accurate, not merely when it
        # stops converging. The reference side-steps this class of issue by
        # always running GMRES and warning at residual > 1e-3
        # (timestepper.cpp:612-614). ---
        self.linsolver = s.linsolver
        self.gen_diag = getattr(self.engine, "gen_diag", lambda: None)()
        lam = self._diag_scale_estimate()
        u_stiff = 0.5 * dt * lam
        # u^(iters+1) <= 1e-6/step keeps 10^4-step horizons below 1e-2 total
        u_ok = float(np.exp(np.log(1e-6) / (s.linsolve_iters + 1)))
        if self.linsolver == "neumann" and u_stiff > u_ok:
            from .ops.grouped_lindblad import GroupedLindbladEngine as _GLE
            from .ops.grouped_rhs import GroupedEngine as _GE_guard
            if isinstance(self.engine, (_GE_guard, _GLE)):
                # Grouped large-N engines: the diagonally-split stepper
                # integrates the stiff drift diagonal EXACTLY (elementwise
                # rotation; exact decay factors for the Lindblad diagonal)
                # and solves only the small off-diagonal remainder
                # — more accurate than IMR on the stiff modes AND ~3x fewer
                # solve iterations than the Jacobi-preconditioned path. Not
                # auto-selected for dense/tensor engines, whose goldens pin
                # plain-IMR discretization parity with the reference.
                self.linsolver = "split"
            elif self.gen_diag is not None:
                self.linsolver = "jacobi"
            elif u_stiff > 0.9:
                import warnings
                warnings.warn(
                    f"Stiff step: dt/2*|H_diag|max = {u_stiff:.2f} > 0.9; "
                    "switching the IMR stage solve to GMRES.")
                self.linsolver = "gmres"
            else:
                import warnings
                warnings.warn(
                    f"Stiff step: dt/2*|H_diag|max = {u_stiff:.2f} leaves "
                    f"~{u_stiff ** (s.linsolve_iters + 1):.1e} relative "
                    "truncation error per Neumann stage solve; consider more "
                    "linsolve_iters (no generator diagonal available for the "
                    "Jacobi-preconditioned solve).")
        # For the Lindblad matrix form the diag mask is (N, N); the flat
        # interface of Dense/Tensor engines takes x as (B, N, N) there.
        self.step_fn = make_step_fn(self.engine.rhs, dt, s.timestepper,
                                    s.linsolve_iters, self.linsolver,
                                    gen_diag=self.gen_diag)

        # --- fused Pallas path feasibility ---
        # The streamed kernels (ops/pallas_stream.py) also cover the
        # Jacobi-preconditioned stage solve, so stiff closed systems run
        # fused; the chunked cross-check path (ops/pallas_adjoint.py) is
        # plain-Neumann only.
        pallas_solvers = ("neumann", "jacobi", "split") \
            if s.pallas_mode in ("stream", "streamk") else ("neumann",)
        # Open systems run fused too (streamed kernels only): the state is
        # the column-major vec(rho) and the kernel integrates the pseudo-
        # Hamiltonian H' = i*L (pallas_stream.lindblad_prime_stack). Size
        # admission is VMEM/HBM-derived, not a fixed dimension cap:
        # streamk keeps two (Ke, P, P) f32 operator stacks VMEM-resident
        # (the term that grows with the Hilbert dimension), stream
        # materializes (ntime, P, P) plane arrays in HBM. Mid-size closed
        # systems (N up to ~1024) and open systems up to the stack budget
        # run fused; past it the scan engines take over.
        dim_flat = self.N * self.N if self.lindblad else self.N
        Ppad = -(-dim_flat // 128) * 128
        Ke_est = self.model.K + (1 if self.linsolver == "split" else 0)
        if s.pallas_mode == "streamk":
            size_ok = 2 * Ke_est * Ppad * Ppad * 4 <= fused_vmem_budget_bytes()
        elif s.pallas_mode == "stream":
            # forward 2 + backward 2 (ntime, P, P) f32 plane arrays live in
            # HBM simultaneously during the VJP
            size_ok = 6 * s.ntime * Ppad * Ppad * 4 <= 8 * (1 << 30)
        else:
            size_ok = dim_flat <= 1024
        # Mid-size open systems past the superop budget run the
        # density-matrix-form kernel instead (ops/pallas_rho.py): stacks
        # are (K, P_rho, P_rho) with P_rho = roundup(N, 128), so the VMEM
        # bound moves from N^2 to N; the history (stored forward states,
        # the reference's storeFWD) is the binding HBM term.
        Prho = -(-self.N // 128) * 128
        Hrho = max(8, -(-self.N // 8) * 8)
        njump = 0 if getattr(self.engine, "Ls", None) is None \
            else len(self.engine.Ls)
        rho_vmem = 4 * (4 * self.model.K + 4 * njump + 8) * Prho * Prho * 4
        rho_hist = 2 * self.ninit * s.ntime * Hrho * Prho * 4
        self.pallas_form = "superop"
        rho_ok = False
        want_rho = (s.pallas_rho == "rho"
                    or (s.pallas_rho == "auto" and not size_ok))
        if self.lindblad and want_rho and s.pallas_mode == "streamk":
            rho_ok = (rho_vmem <= fused_vmem_budget_bytes()
                      and 3 * rho_hist <= 8 * (1 << 30))
            if rho_ok:
                self.pallas_form = "rho"
        lind_fusable = (self.lindblad
                        and s.pallas_mode in ("stream", "streamk")
                        and (size_ok or rho_ok))
        pallas_ok = ((not self.lindblad or lind_fusable)
                     and (self.lindblad or size_ok)
                     and s.timestepper.upper() == "IMR"
                     and self.linsolver in pallas_solvers
                     and s.dtype == jnp.complex64
                     and isinstance(self.engine, DenseEngine))
        if s.pallas == "auto":
            self.use_pallas = pallas_ok and jax.default_backend() == "tpu"
        else:
            self.use_pallas = bool(s.pallas) and pallas_ok
        self._pallas_interpret = jax.default_backend() != "tpu"
        if self.use_pallas:
            from .ops.pallas_adjoint import plane_args
            eng = self.engine
            if self.lindblad and self.pallas_form == "superop":
                from .ops.pallas_stream import lindblad_prime_stack
                Hp = lindblad_prime_stack(eng.stack, eng.Ls)
                eng.pallas_Sr, eng.pallas_Si = plane_args(Hp)
            elif self.lindblad and self.pallas_form == "rho":
                # Lane-GROUP packing for the matrix form: G initial
                # density matrices ride one (P, P) tile as a
                # block-diagonal state, with the operators expanded to
                # I_G (x) S — each two-sided matmul then serves G inits
                # (the matrix-form analog of the packed streamK lane
                # trick; zero kernel changes, the kernel just sees a
                # G*N-dimensional system). G = largest divisor of ninit
                # that keeps G*N within one 128-lane tile.
                G = next(g for g in range(min(128 // self.N, self.ninit),
                                          0, -1) if self.ninit % g == 0)
                self._rho_group = G

                def _expand(M):
                    return np.kron(np.eye(G, dtype=M.dtype), np.asarray(M))

                stack_g = np.stack([_expand(S) for S in np.asarray(
                    eng.stack)])
                eng.pallas_Sr, eng.pallas_Si = plane_args(stack_g)
                self._rho_Ls = (None if eng.Ls is None else
                                [_expand(L) for L in np.asarray(eng.Ls)])
                if self.gen_diag is not None:
                    NG = G * self.N
                    gd = np.zeros((NG, NG), np.complex128)
                    for g in range(G):
                        gd[g * self.N:(g + 1) * self.N,
                           g * self.N:(g + 1) * self.N] = \
                            np.asarray(self.gen_diag)
                    self._rho_gen_diag = gd
                else:
                    self._rho_gen_diag = None
            else:
                # closed systems use the raw H_eff stack
                eng.pallas_Sr, eng.pallas_Si = plane_args(eng.stack)

        # --- real-glue eligibility (closed fused streamk paths) ---
        # With real_glue the jit program contains NO complex ops: the
        # kernels are f32-native and the objective tail runs on (re, im)
        # plane pairs (_assemble_objective_real). Disable with
        # QTPU_REAL_GLUE=0.
        import os as _os
        self.real_glue = (self.use_pallas
                          and s.pallas_mode == "streamk"
                          and _os.environ.get("QTPU_REAL_GLUE", "1") != "0")
        # Lindblad superop kernels work on the FLAT column-major vec(rho):
        # the real glue keeps that layout end-to-end (diagonals become the
        # strided j*(N+1) gather; the HS overlap is the same flat sum)
        self._real_flat = (self.real_glue and self.lindblad
                           and self.pallas_form == "superop")
        if self.real_glue:
            x0h = np.asarray(self.x0)
            th = None if self.target is None else np.asarray(self.target)
            if self._real_flat:
                x0h = x0h.transpose(0, 2, 1).reshape(self.ninit, -1)
                if th is not None:
                    th = th.transpose(0, 2, 1).reshape(self.ninit, -1)
            self._x0r = np.ascontiguousarray(x0h.real).astype(np.float32)
            self._x0i = np.ascontiguousarray(x0h.imag).astype(np.float32)
            if th is not None:
                self._tgtr = np.ascontiguousarray(th.real).astype(np.float32)
                self._tgti = np.ascontiguousarray(th.imag).astype(np.float32)
            else:
                self._tgtr = self._tgti = None
        else:
            self._x0r = self._x0i = self._tgtr = self._tgti = None

        # --- time-parallel feasibility (ops/propagator.py) ---
        dim_prop = self.N * self.N if self.lindblad else self.N
        feasible = (isinstance(self.engine, DenseEngine)
                    and self.linsolver in ("neumann", "jacobi")
                    and s.ntime * dim_prop * dim_prop <= s.time_parallel_budget)
        if s.time_parallel == "auto":
            # Building propagators costs O(dim^2) per step vs O(dim*B) for
            # the sequential scan: pay off when the batch is comparable to
            # the dimension, or when the problem is so small that the scan
            # is latency-bound anyway.
            profitable = dim_prop <= 64 or dim_prop <= 4 * self.ninit
            self.time_parallel = feasible and profitable
        else:
            self.time_parallel = bool(s.time_parallel) and feasible
        if self.use_pallas:
            # the fused kernel path owns propagation when enabled
            self.time_parallel = False
        if self.time_parallel and self.lindblad:
            from .ops.propagator import lindblad_superop_builder
            self._superop_builder = lindblad_superop_builder(
                jnp.asarray(self.engine.stack), self.engine.Ls)
        else:
            self._superop_builder = None

        # --- multi-device mesh (set by parallel.mesh.shard_problem) ---
        self.mesh = None
        self.shard_hilbert = False

    def state_sharding_spec(self, ndim: int = None):
        """PartitionSpec for a batched state array of rank `ndim` (defaults
        to x0's rank) on the ('init', 'hilbert') mesh — the engine-dependent
        layout documented in parallel/mesh.py."""
        from jax.sharding import PartitionSpec as P
        from .ops.grouped_rhs import GroupedEngine
        from .ops.tensor_rhs import TensorEngine
        ndim = ndim if ndim is not None else np.ndim(self.x0)
        tail = [None] * (ndim - 1)
        if self.shard_hilbert:
            if isinstance(self.engine, GroupedEngine) and ndim == 3:
                tail[0] = "hilbert"     # (B, m1, m2) planes: shard m1
            else:
                # flat (B, N) / Lindblad (B, N, N) — including the
                # TensorEngine (round 3): GSPMD propagates the flat-N
                # sharding through the (B, n1..nQ) reshape to the leading
                # tensor factor and inserts the collectives the per-axis
                # contractions need; sharded-vs-unsharded parity is pinned
                # in test_sharding.py (round-1's "no aligned shard axis"
                # replication was overly conservative)
                tail[-1] = "hilbert"
        return P("init", *tail)

    def _shard_state(self, x):
        """with_sharding_constraint pin for the propagating state when a mesh
        is configured — keeps GSPMD from re-replicating the carry inside
        scan/adjoint bodies."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding
        spec = self.state_sharding_spec(jnp.ndim(x))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _diag_scale_estimate(self) -> float:
        """Cheap host-side bound of the generator's dominant scale (rad/ns):
        max |diag(H_d)|. For Kerr-dominated transmon models the drift
        diagonal dominates the spectrum."""
        from .ops.tensor_rhs import StructuredModel
        m = self.model
        if isinstance(m, StructuredModel):
            from .utils.operators import drift_diagonal
            d = drift_diagonal(m.dims, m.detune, m.selfkerr, m.crosskerr)
            return float(np.abs(d).max())
        return float(np.abs(np.diagonal(self.engine.stack[0])).max())

    # ------------------------------------------------------------------
    # state functionals
    # ------------------------------------------------------------------

    @property
    def _srank(self):
        """Number of trailing state axes: 1 (psi) or 2 (rho)."""
        return 2 if self.lindblad else 1

    def _state_axes(self, x):
        return tuple(range(x.ndim - self._srank, x.ndim))

    def _diag(self, x):
        """Complex diagonal entries: psi components or rho_ii, (..., N)."""
        if self.lindblad:
            return jnp.diagonal(x, axis1=-2, axis2=-1)
        return x

    def overlaps(self, x):
        """Hilbert-Schmidt overlap <target_b, x_b> (optimtarget.cpp:343-408).
        Accepts any leading batch dims whose last is the init batch;
        returns complex (..., B)."""
        if self.target is not None:
            return jnp.sum(jnp.conj(jnp.asarray(self.target)) * x,
                           axis=self._state_axes(x))
        if self.pure_target_id is not None:
            d = self._diag(x)
            return d[..., self.pure_target_id]
        return jnp.zeros(x.shape[:-self._srank], dtype=x.dtype)

    def eval_J_parts(self, x):
        """Per-initial-condition raw objective values (J_re, J_im), (B,).

        JTRACE: purity-scaled HS overlap (Re scaled only, optimtarget.cpp:400-403).
        JFROBENIUS / JMEASURE: real scalars.
        """
        obj = self.setup.objective_type
        axes = self._state_axes(x)
        if obj == "Jtrace":
            ov = self.overlaps(x)
            return jnp.real(ov) / jnp.asarray(self.purity), jnp.imag(ov)
        if obj == "Jfrobenius":
            if self.target is not None:
                diff = x - jnp.asarray(self.target)
                J = 0.5 * jnp.sum(jnp.abs(diff) ** 2, axis=axes)
            else:
                # pure target e_m (e_m e_m^dag): 1/2 || x - E_m ||^2
                d = self._diag(x)
                m = self.pure_target_id
                norm2 = jnp.sum(jnp.abs(x) ** 2, axis=axes)
                J = 0.5 * (norm2 - 2.0 * jnp.real(d[..., m]) + 1.0)
            return J, jnp.zeros_like(J)
        if obj == "Jmeasure":
            pop = solvers.population_full(x, self.lindblad) if self.lindblad \
                else jnp.abs(x) ** 2
            J = pop @ jnp.asarray(self.measure_weights).astype(pop.dtype)
            return J, jnp.zeros_like(J)
        raise ValueError(obj)

    def finalize_J(self, J_re, J_im):
        """Scalar objective from (already weighted/summed) J parts
        (optimtarget.cpp:864-879)."""
        if self.setup.objective_type == "Jtrace":
            if self.lindblad:
                return 1.0 - J_re
            return 1.0 - (J_re ** 2 + J_im ** 2)
        return J_re

    def eval_J_per_state(self, x):
        """Per-state finalized J (used by the weighted-J penalty integral,
        timestepper.cpp:256-270, which applies finalizeJ per state)."""
        J_re, J_im = self.eval_J_parts(x)
        if self.setup.objective_type == "Jtrace":
            if self.lindblad:
                return 1.0 - J_re
            return 1.0 - (J_re ** 2 + J_im ** 2)
        return J_re

    # ------------------------------------------------------------------
    # REAL-GLUE objective tail (closed fused paths)
    #
    # The fused kernels compute in f32 (re, im) planes; the complex ops of
    # the default tail exist only as glue (pack/unpack, overlap, |.|^2).
    # With real_glue the whole device program is complex-free — TPU has no
    # native complex type (XLA lowers it to real pairs anyway, and the
    # axon relay intermittently rejects complex programs outright), and
    # the reference itself integrates the real-blocked x = [u; v] form
    # (user_guide.md:269-306). Same math, pinned by
    # test_real_glue_matches_complex.
    # ------------------------------------------------------------------

    @property
    def _x0_planes(self):
        return (self._x0r, self._x0i)

    @property
    def _target_planes(self):
        return (self._tgtr, self._tgti)

    @property
    def _real_srank(self):
        """State rank of the real-glue plane pairs: 1 for closed states
        AND for the flat vec(rho) superop layout, 2 for rho matrices."""
        if getattr(self, "_real_flat", False):
            return 1
        return self._srank

    def _diag_real(self, xr):
        """Diagonal entries of one plane: rho_ii for Lindblad states
        (strided gather in the flat vec layout), identity for closed."""
        if self.lindblad:
            if getattr(self, "_real_flat", False):
                idx = np.arange(self.N) * (self.N + 1)
                return xr[..., idx]
            return jnp.diagonal(xr, axis1=-2, axis2=-1)
        return xr

    def _overlaps_real(self, xr, xi):
        """Hilbert-Schmidt overlap <target, x> from f32 plane pairs
        ((..., B, N) closed / (..., B, N, N) Lindblad):
        conj(t)*x = (tr xr + ti xi) + i (tr xi - ti xr). Returns
        (Re (..., B), Im (..., B))."""
        axes = tuple(range(-self._real_srank, 0))
        if self.target is not None:
            tr = jnp.asarray(self._target_planes[0])
            ti = jnp.asarray(self._target_planes[1])
            re = jnp.sum(tr * xr + ti * xi, axis=axes)
            im = jnp.sum(tr * xi - ti * xr, axis=axes)
            return re, im
        if self.pure_target_id is not None:
            dr = self._diag_real(xr)
            di = self._diag_real(xi)
            return dr[..., self.pure_target_id], di[..., self.pure_target_id]
        z = jnp.zeros(xr.shape[:-self._real_srank], dtype=xr.dtype)
        return z, z

    def _eval_J_parts_real(self, xr, xi):
        """eval_J_parts on f32 plane pairs (closed or Lindblad states)."""
        obj = self.setup.objective_type
        axes = tuple(range(-self._real_srank, 0))
        if obj == "Jtrace":
            re, im = self._overlaps_real(xr, xi)
            return re / jnp.asarray(self.purity, dtype=xr.dtype), im
        if obj == "Jfrobenius":
            if self.target is not None:
                dr = xr - jnp.asarray(self._target_planes[0])
                di = xi - jnp.asarray(self._target_planes[1])
                J = 0.5 * jnp.sum(dr * dr + di * di, axis=axes)
            else:
                m = self.pure_target_id
                dm = self._diag_real(xr)[..., m]
                norm2 = jnp.sum(xr * xr + xi * xi, axis=axes)
                J = 0.5 * (norm2 - 2.0 * dm + 1.0)
            return J, jnp.zeros_like(J)
        if obj == "Jmeasure":
            if self.lindblad:
                pop = self._diag_real(xr)
            else:
                pop = xr * xr + xi * xi
            J = pop @ jnp.asarray(self.measure_weights).astype(pop.dtype)
            return J, jnp.zeros_like(J)
        raise ValueError(obj)

    def _history_penalties_real(self, hr, hi):
        """_history_penalties on f32 (T, B, ...) plane pairs."""
        s = self.setup
        pen_leak_b = pen_jt_b = pen_dpdm_b = None
        if self.has_guard and s.gamma_penalty > 1e-13:
            dr = self._diag_real(hr)
            di = self._diag_real(hi)
            leak_tb = jnp.sum((dr * dr + di * di)
                              * self.guard_mask[None, None, :], axis=-1)
            pen_leak_b = jnp.sum(leak_tb, axis=0) / s.ntime
        if self.jt_weight is not None and s.gamma_penalty > 1e-13:
            re, im = self._eval_J_parts_real(hr, hi)
            if s.objective_type == "Jtrace":
                Jtb = (1.0 - re) if self.lindblad \
                    else 1.0 - (re ** 2 + im ** 2)
            else:
                Jtb = re
            pen_jt_b = jnp.sum(jnp.asarray(self.jt_weight)[:, None] * Jtb,
                               axis=0) * s.dt
        if s.gamma_penalty_dpdm > 1e-13 and not self.lindblad:
            B = hr.shape[1]
            x0r, x0i = self._x0_planes
            pop0 = (jnp.asarray(x0r) ** 2
                    + jnp.asarray(x0i) ** 2).reshape(1, B, -1)
            popt = (hr * hr + hi * hi).reshape(hr.shape[0], B, -1)
            pop = jnp.concatenate([pop0, popt], axis=0)
            sec = pop[2:] - 2.0 * pop[1:-1] + pop[:-2]
            pen_dpdm_b = jnp.sum(sec * sec, axis=(0, 2)) / s.dt ** 4
        return pen_leak_b, pen_jt_b, pen_dpdm_b

    def _assemble_objective_real(self, params, params_ref, xTr, xTi,
                                 pen_leak_b, pen_jt_b, pen_dpdm_b,
                                 energy_int):
        """_assemble_objective on f32 final-state plane pairs (closed)."""
        s = self.setup
        w = jnp.asarray(self.weights)
        J_re_b, J_im_b = self._eval_J_parts_real(xTr, xTi)
        J_re = jnp.sum(w * J_re_b)
        J_im = jnp.sum(w * J_im_b)
        obj_cost = self.finalize_J(J_re, J_im)

        ov_re, ov_im = self._overlaps_real(xTr, xTi)
        fid_re = jnp.sum(ov_re) / self.ninit
        fid_im = jnp.sum(ov_im) / self.ninit
        fidelity = fid_re if self.lindblad else fid_re ** 2 + fid_im ** 2

        dx = params - params_ref if s.gamma_tik_interpolate else params
        obj_regul = 0.5 * s.gamma_tik * jnp.sum(dx * dx)

        obj_penal = jnp.zeros((), dtype=self.rdtype)
        if pen_leak_b is not None:
            obj_penal = obj_penal + s.gamma_penalty * jnp.sum(w * pen_leak_b)
        if pen_jt_b is not None:
            obj_penal = obj_penal + s.gamma_penalty * jnp.sum(w * pen_jt_b)
        obj_penal_dpdm = (s.gamma_penalty_dpdm * jnp.sum(w * pen_dpdm_b)
                          / s.ntime if pen_dpdm_b is not None
                          else jnp.zeros((), dtype=self.rdtype))
        obj_penal_energy = s.gamma_penalty_energy * energy_int
        if s.gamma_penalty_variation > 1e-13:
            obj_penal_variation = 0.5 * s.gamma_penalty_variation * \
                control_variation_penalty(self.plan_mid, params)
        else:
            obj_penal_variation = jnp.zeros((), dtype=self.rdtype)

        J = (obj_cost + obj_regul + obj_penal + obj_penal_dpdm
             + obj_penal_energy + obj_penal_variation)
        aux = {
            "obj_cost": obj_cost,
            "obj_regul": obj_regul,
            "obj_penal": obj_penal,
            "obj_penal_dpdm": obj_penal_dpdm,
            "obj_penal_energy": obj_penal_energy,
            "obj_penal_variation": obj_penal_variation,
            "fidelity": fidelity,
        }
        return J, aux

    # ------------------------------------------------------------------
    # coefficient rows from parameters
    # ------------------------------------------------------------------

    def coeff_rows_mid(self, params):
        p, q = eval_controls(self.plan_mid, params, self.setup.pipulses)
        C = self.model.coeff_rows(p, q, self.plan_mid.ts)
        return C.reshape(self.setup.ntime, self.nstages, self.model.K)

    # ------------------------------------------------------------------
    # objective
    # ------------------------------------------------------------------


    def _real_layout(self):
        """(dim, gen_diag) in the fused kernels' flat conventions for the
        real-glue path (no complex x0 materialization)."""
        if self._real_flat:
            gd = self.gen_diag
            if gd is not None:
                gd = np.asarray(gd).T.reshape(-1)
            return self.N * self.N, gd
        return self.N, self.gen_diag

    def _flat_state_layout(self):
        """The fused kernels' flat-state conventions, shared by every
        caller that feeds them (the scan-path pallas branch, the packed
        group objective, and the packed robust objective): flat dimension,
        the generator diagonal in that layout (column-major vec(rho) for
        Lindblad — the engine diag is in (N, N) matrix layout), and the
        packed initial-condition batch (B, dim)."""
        dim = self.N * self.N if self.lindblad else self.N
        gd = self.gen_diag
        if self.lindblad and gd is not None:
            gd = np.asarray(gd).T.reshape(-1)
        x0k = jnp.asarray(self.x0, dtype=self.setup.dtype)
        if self.lindblad:
            x0k = x0k.transpose(0, 2, 1).reshape(self.ninit, dim)
        return dim, gd, x0k

    def _unflatten_states(self, xT, hist):
        """Inverse of the vec(rho) flattening on kernel outputs: xT
        (..., dim) / hist (ntime, ..., dim) -> density-matrix layout
        (..., N, N) for Lindblad; identity for closed systems."""
        if not self.lindblad:
            return xT, hist
        N = self.N
        xT = xT.reshape(xT.shape[:-1] + (N, N)).swapaxes(-1, -2)
        hist = hist.reshape(hist.shape[:-1] + (N, N)).swapaxes(-1, -2)
        return xT, hist

    def objective(self, params, params_ref):
        """Full objective. Returns (J_total, aux) with every term and the
        fidelity, matching optimproblem.cpp:224-338 semantics. Dispatches to
        the time-parallel path (associative-scan propagators) when enabled."""
        if self.time_parallel:
            return self._objective_time_parallel(params, params_ref)
        return self._objective_scan(params, params_ref)

    def _energy_integral(self, params):
        s = self.setup
        if s.gamma_penalty_energy > 1e-13:
            p_stop, q_stop = eval_controls(self.plan_stop, params, s.pipulses)
            return jnp.sum(p_stop ** 2 + q_stop ** 2) / s.ntime
        return jnp.zeros((), dtype=self.rdtype)

    def _assemble_objective(self, params, params_ref, xT, pen_leak_b,
                            pen_jt_b, pen_dpdm_b, energy_int):
        """Common tail: final-time cost, fidelity, regularizers, totals."""
        s = self.setup
        w = jnp.asarray(self.weights)
        J_re_b, J_im_b = self.eval_J_parts(xT)
        J_re = jnp.sum(w * J_re_b)
        J_im = jnp.sum(w * J_im_b)
        obj_cost = self.finalize_J(J_re, J_im)

        ov = self.overlaps(xT)
        fid_re = jnp.sum(jnp.real(ov)) / self.ninit
        fid_im = jnp.sum(jnp.imag(ov)) / self.ninit
        fidelity = fid_re if self.lindblad else fid_re ** 2 + fid_im ** 2

        dx = params - params_ref if s.gamma_tik_interpolate else params
        obj_regul = 0.5 * s.gamma_tik * jnp.sum(dx * dx)

        obj_penal = jnp.zeros((), dtype=self.rdtype)
        if pen_leak_b is not None:
            obj_penal = obj_penal + s.gamma_penalty * jnp.sum(w * pen_leak_b)
        if pen_jt_b is not None:
            obj_penal = obj_penal + s.gamma_penalty * jnp.sum(w * pen_jt_b)
        obj_penal_dpdm = (s.gamma_penalty_dpdm * jnp.sum(w * pen_dpdm_b) / s.ntime
                          if pen_dpdm_b is not None
                          else jnp.zeros((), dtype=self.rdtype))
        obj_penal_energy = s.gamma_penalty_energy * energy_int
        if s.gamma_penalty_variation > 1e-13:
            obj_penal_variation = 0.5 * s.gamma_penalty_variation * \
                control_variation_penalty(self.plan_mid, params)
        else:
            obj_penal_variation = jnp.zeros((), dtype=self.rdtype)

        J = (obj_cost + obj_regul + obj_penal + obj_penal_dpdm
             + obj_penal_energy + obj_penal_variation)
        aux = {
            "obj_cost": obj_cost,
            "obj_regul": obj_regul,
            "obj_penal": obj_penal,
            "obj_penal_dpdm": obj_penal_dpdm,
            "obj_penal_energy": obj_penal_energy,
            "obj_penal_variation": obj_penal_variation,
            "fidelity": fidelity,
        }
        return J, aux

    def _all_states_time_parallel(self, params):
        """States after steps 1..ntime, shape (ntime, B, ...), computed with
        batched step matrices + associative-scan prefix products."""
        from .ops.propagator import (build_step_matrices_dense,
                                     prefix_propagators, propagate_states)
        s = self.setup
        C = self.coeff_rows_mid(params)
        stack = jnp.asarray(self.engine.stack)
        gd = self.gen_diag
        if gd is not None and self.lindblad:
            # superop uses COLUMN-major vec(rho); the engine diag is in
            # (N, N) matrix layout
            gd = jnp.asarray(gd).T.reshape(-1)
        S = build_step_matrices_dense(stack, C, s.dt, s.timestepper,
                                      s.linsolve_iters,
                                      lindblad_superop=self._superop_builder,
                                      gen_diag=gd, linsolver=self.linsolver)
        P = prefix_propagators(S)
        if self.lindblad:
            x0v = jnp.asarray(self.x0).transpose(0, 2, 1).reshape(self.ninit, -1)
            sv = propagate_states(P, x0v)
            return sv.reshape(s.ntime, self.ninit, self.N, self.N).swapaxes(-1, -2)
        return propagate_states(P, jnp.asarray(self.x0))

    def _history_penalties(self, states):
        """Vectorized integral penalties over a full state history
        (T, B, ...): guard leakage, weighted-J window, and the population
        second-difference (dpdm). One fused XLA op each — used by the
        time-parallel and fused-Pallas paths."""
        s = self.setup
        use_leak = self.has_guard and s.gamma_penalty > 1e-13
        use_jt = self.jt_weight is not None and s.gamma_penalty > 1e-13
        use_dpdm = s.gamma_penalty_dpdm > 1e-13 and not self.lindblad

        pen_leak_b = pen_jt_b = pen_dpdm_b = None
        if use_leak:
            if self.lindblad:
                d = jnp.diagonal(states, axis1=-2, axis2=-1)
            else:
                d = states
            leak_tb = jnp.sum((jnp.abs(d) ** 2) * self.guard_mask[None, None, :],
                              axis=-1)
            pen_leak_b = jnp.sum(leak_tb, axis=0) / s.ntime
        if use_jt:
            Jtb = self.eval_J_per_state(states)               # (T, B)
            pen_jt_b = jnp.sum(jnp.asarray(self.jt_weight)[:, None] * Jtb, axis=0) * s.dt
        if use_dpdm:
            B = self.ninit
            pop0 = jnp.abs(jnp.asarray(self.x0).reshape(1, B, -1)) ** 2
            popt = jnp.abs(states.reshape(states.shape[0], B, -1)) ** 2
            pop = jnp.concatenate([pop0, popt], axis=0)      # (T+1, B, dim)
            sec = pop[2:] - 2.0 * pop[1:-1] + pop[:-2]
            pen_dpdm_b = jnp.sum(sec * sec, axis=(0, 2)) / s.dt ** 4
        return pen_leak_b, pen_jt_b, pen_dpdm_b

    def _objective_time_parallel(self, params, params_ref):
        states = self._all_states_time_parallel(params)     # (T, B, ...)
        xT = states[-1]
        energy_int = self._energy_integral(params)
        pen_leak_b, pen_jt_b, pen_dpdm_b = self._history_penalties(states)
        return self._assemble_objective(params, params_ref, xT, pen_leak_b,
                                        pen_jt_b, pen_dpdm_b, energy_int)

    def _objective_scan(self, params, params_ref):
        s = self.setup
        C = self.coeff_rows_mid(params)
        energy_int = self._energy_integral(params)

        use_leak = self.has_guard and s.gamma_penalty > 1e-13
        use_jt = self.jt_weight is not None and s.gamma_penalty > 1e-13
        use_dpdm = s.gamma_penalty_dpdm > 1e-13 and not self.lindblad

        if self.use_pallas and self.pallas_form == "rho":
            # Density-matrix-form fused propagation (ops/pallas_rho.py):
            # mid-size open systems keep the (N, N) matrix state and the
            # generator is applied as two-sided matmuls — the superop
            # stacks would not fit VMEM at this N. G inits share each
            # tile block-diagonally (operators pre-expanded to I_G (x) S
            # at setup; see the gate in __init__).
            from .ops.pallas_rho import make_rho_propagate
            G, N = self._rho_group, self.N
            NG = G * N
            PG = -(-NG // 128) * 128
            HsG = max(8, -(-NG // 8) * 8)
            ks_bytes = (2 * s.ntime * s.linsolve_iters
                        * (self.ninit // G) * HsG * PG * 4)
            prop = make_rho_propagate(
                np.zeros((self.model.K, NG, NG), np.complex64),
                self._rho_Ls, s.dt, s.linsolve_iters,
                gen_diag=self._rho_gen_diag, linsolver=self.linsolver,
                interpret=self._pallas_interpret,
                store_iters=ks_bytes <= 1.5 * (1 << 30),
                real_io=self.real_glue)
            def group_pack(x):
                if G == 1:
                    return x
                xg = x.reshape(self.ninit // G, G, N, N)
                out = jnp.zeros((self.ninit // G, NG, NG), x.dtype)
                for g in range(G):
                    out = out.at[:, g * N:(g + 1) * N,
                                 g * N:(g + 1) * N].set(xg[:, g])
                return out

            def group_unpack(xT, hist):
                if G == 1:
                    return xT, hist
                xT = jnp.stack(
                    [xT[:, g * N:(g + 1) * N, g * N:(g + 1) * N]
                     for g in range(G)], axis=1).reshape(self.ninit, N, N)
                hist = jnp.stack(
                    [hist[:, :, g * N:(g + 1) * N, g * N:(g + 1) * N]
                     for g in range(G)], axis=2).reshape(
                         s.ntime, self.ninit, N, N)
                return xT, hist

            Srj = jnp.asarray(self.engine.pallas_Sr)
            Sij = jnp.asarray(self.engine.pallas_Si)
            if self.real_glue:
                x0p = (group_pack(jnp.asarray(self._x0r)),
                       group_pack(jnp.asarray(self._x0i)))
                (xTr, xTi), (hr, hi) = prop(Srj, Sij, x0p, C[:, 0, :])
                xTr, hr = group_unpack(xTr, hr)
                xTi, hi = group_unpack(xTi, hi)
                pl_b, pj_b, pd_b = self._history_penalties_real(hr, hi)
                return self._assemble_objective_real(
                    params, params_ref, xTr, xTi, pl_b, pj_b, pd_b,
                    energy_int)
            x0g = group_pack(jnp.asarray(self.x0, dtype=s.dtype))
            xT, hist = prop(Srj, Sij, x0g, C[:, 0, :])
            xT, hist = group_unpack(xT, hist)
            pen_leak_b, pen_jt_b, pen_dpdm_b = self._history_penalties(hist)
            return self._assemble_objective(
                params, params_ref, xT,
                pen_leak_b, pen_jt_b, pen_dpdm_b, energy_int)

        if self.use_pallas:
            # Fused Pallas propagation: state history stored (storeFWD
            # analog) so every integral penalty is one vectorized op whose
            # gradient flows through the hand-derived kernel VJP. 'stream'
            # = one grid-over-steps launch per direction with pipelined
            # H planes; 'chunk' = Tc steps per launch (cross-check).
            if self.real_glue:
                (dim, gd), x0k = self._real_layout(), None
            else:
                dim, gd, x0k = self._flat_state_layout()
            shape_proto = np.zeros((self.model.K, dim, dim), np.complex64)
            if s.pallas_mode in ("stream", "streamk"):
                # 'streamk' contracts the per-step H planes IN-KERNEL from
                # the operator stacks ((ntime, P, P) plane arrays never hit
                # HBM; backward emits (ntime, K) coefficient cotangents
                # directly) — see make_streamk_propagate. Stack cotangents
                # are zero on that path, which is sound here: pallas_Sr/Si
                # are threaded constants, never differentiated.
                from .ops.pallas_stream import (make_stream_propagate,
                                                make_streamk_propagate)
                if self.real_glue:
                    # complex-free program: f32 plane pairs end-to-end
                    prop = make_streamk_propagate(
                        shape_proto, s.dt, s.linsolve_iters,
                        gen_diag=gd, linsolver=self.linsolver,
                        interpret=self._pallas_interpret,
                        store_iters=self._store_iters_ok(dim),
                        real_io=True)
                    x0p = (jnp.asarray(self._x0_planes[0]),
                           jnp.asarray(self._x0_planes[1]))
                    (xTr, xTi), (hr, hi) = prop(
                        jnp.asarray(self.engine.pallas_Sr),
                        jnp.asarray(self.engine.pallas_Si), x0p, C[:, 0, :])
                    pl_b, pj_b, pd_b = self._history_penalties_real(hr, hi)
                    return self._assemble_objective_real(
                        params, params_ref, xTr, xTi,
                        pl_b, pj_b, pd_b, energy_int)
                builder = (make_streamk_propagate
                           if s.pallas_mode == "streamk"
                           else make_stream_propagate)
                prop = builder(
                    shape_proto, s.dt, s.linsolve_iters,
                    gen_diag=gd, linsolver=self.linsolver,
                    interpret=self._pallas_interpret,
                    store_iters=self._store_iters_ok(dim))
            else:
                from .ops.pallas_adjoint import make_pallas_propagate
                prop = make_pallas_propagate(
                    shape_proto, s.dt, s.linsolve_iters,
                    interpret=self._pallas_interpret)
            xT, hist = prop(jnp.asarray(self.engine.pallas_Sr),
                            jnp.asarray(self.engine.pallas_Si),
                            x0k, C[:, 0, :])
            xT, hist = self._unflatten_states(xT, hist)
            pen_leak_b, pen_jt_b, pen_dpdm_b = self._history_penalties(hist)
            return self._assemble_objective(
                params, params_ref, xT,
                pen_leak_b, pen_jt_b, pen_dpdm_b, energy_int)

        # Reversible O(1)-memory adjoint: closed systems, IMR family, no
        # multi-state penalties (dpdm needs a state history).
        use_reversible = (
            s.adjoint in ("auto", "reversible", "reversible-ad")
            and not self.lindblad and not use_dpdm
            and s.timestepper.upper() in ("IMR", "IMR4", "IMR8"))
        if use_reversible:
            from .ops.reversible import make_reversible_propagate
            _bwd_raw = make_step_fn(self.engine.rhs, -s.dt, s.timestepper,
                                    s.linsolve_iters, self.linsolver,
                                    gen_diag=self.gen_diag)
            # Inverse of a composed step applies the stages in REVERSE order
            # with negated dt; the gamma sequences are palindromic, but the
            # per-stage coefficient rows (midpoint times) are not — flip them.
            step_bwd = lambda x, c: _bwd_raw(x, c[::-1])

            def penalty_fn(x, extra):
                out = {}
                if use_leak:
                    d2 = jnp.abs(self._diag(x)) ** 2
                    out["leak"] = jnp.sum(
                        d2 * jnp.asarray(self.guard_mask)[None, :], axis=1) / s.ntime
                if use_jt:
                    out["jt"] = extra["wt"] * self.eval_J_per_state(x) * s.dt
                return out

            extras = {"wt": jnp.asarray(self.jt_weight)} if use_jt else {}
            use_pen = use_leak or use_jt

            from .ops.grouped_rhs import GroupedEngine as _GE
            real_grouped = (isinstance(self.engine, _GE)
                            and s.timestepper.upper() == "IMR"
                            and self.gen_diag is not None
                            and self.linsolver in ("neumann", "jacobi",
                                                   "split"))
            use_split = self.linsolver == "split"
            if real_grouped:
                # All-REAL grouped reversible adjoint: the state is carried
                # as f32/f64 (re, im) planes and every product in both the
                # forward step and its AD transpose is a real GEMM
                # (ops/grouped_rhs.make_real_imr_step). Cuts the adjoint
                # sweep cost vs differentiating the complex-arithmetic step.
                eng = self.engine
                B = self.ninit
                rdt = jnp.float32 if s.dtype == jnp.complex64 else jnp.float64

                def to_complex(x):
                    return jax.lax.complex(x[0], x[1]).reshape(
                        B, self.N).astype(s.dtype)

                pen_planes = (lambda x, extra: penalty_fn(to_complex(x), extra)) \
                    if use_pen else None
                if s.adjoint == "reversible-ad":
                    # generic reversible adjoint (AD through the unrolled
                    # stage solve) — kept as a cross-check path. The split
                    # step recomputes its rotation planes inside the scan
                    # body here (planes=None): precomputing them at this
                    # scope would leak outer tracers into the custom-VJP
                    # backward closure. Acceptable for a cross-check path;
                    # the production split adjoint (grouped_adjoint.py)
                    # computes the planes once per propagate/bwd trace.
                    from .ops.grouped_rhs import (make_real_imr_step,
                                                  make_real_split_step)
                    mk = make_real_split_step if use_split \
                        else make_real_imr_step
                    rstep_f = mk(eng, s.dt, s.linsolve_iters)
                    rstep_b = mk(eng, -s.dt, s.linsolve_iters)
                    prop = make_reversible_propagate(
                        lambda x, c: tuple(rstep_f(x[0], x[1], c[0])),
                        lambda x, c: tuple(rstep_b(x[0], x[1], c[0])),
                        pen_planes)
                else:
                    # hand-written solve-based adjoint: ~2x forward cost per
                    # step vs ~7x for AD (ops/grouped_adjoint.py; the
                    # reference's evolveBWD economics, timestepper.cpp:631-694)
                    from .ops.grouped_adjoint import make_grouped_adjoint_propagate
                    prop = make_grouped_adjoint_propagate(
                        eng, s.dt, s.linsolve_iters, pen_planes,
                        split=use_split)
                x0c = jnp.asarray(self.x0, dtype=s.dtype).reshape(
                    B, eng.m1, eng.m2)
                x0p = (self._shard_state(jnp.real(x0c).astype(rdt)),
                       self._shard_state(jnp.imag(x0c).astype(rdt)))
                xTp, pen = prop(x0p, C, extras)
                xT = to_complex(xTp)
            else:
                prop = make_reversible_propagate(
                    self.step_fn, step_bwd,
                    penalty_fn if use_pen else None)
                xT, pen = prop(self._shard_state(
                    jnp.asarray(self.x0, dtype=s.dtype)), C, extras)
            return self._assemble_objective(
                params, params_ref, xT,
                pen.get("leak") if use_pen else None,
                pen.get("jt") if use_pen else None,
                None, energy_int)

        B = self.ninit
        post_init = {}
        extras = {"n": jnp.arange(s.ntime)}
        if use_leak:
            post_init["leak"] = jnp.zeros((B,), dtype=self.rdtype)
        if use_jt:
            post_init["jt"] = jnp.zeros((B,), dtype=self.rdtype)
            extras["wt"] = self.jt_weight
        if use_dpdm:
            pop0 = jnp.abs(self.x0.reshape(B, -1)) ** 2
            post_init["dpdm"] = jnp.zeros((B,), dtype=self.rdtype)
            post_init["prev1"] = pop0
            post_init["prev2"] = pop0

        def post_fn(aux, x, ex):
            out = dict(aux)
            if use_leak:
                d2 = jnp.abs(self._diag(x)) ** 2            # (B, N)
                leak = jnp.sum(d2 * self.guard_mask[None, :], axis=1)
                out["leak"] = aux["leak"] + leak / s.ntime
            if use_jt:
                out["jt"] = aux["jt"] + ex["wt"] * self.eval_J_per_state(x) * s.dt
            if use_dpdm:
                cur = jnp.abs(x.reshape(B, -1)) ** 2
                sec = cur - 2.0 * aux["prev1"] + aux["prev2"]
                contrib = jnp.sum(sec * sec, axis=1) / s.dt ** 4
                out["dpdm"] = aux["dpdm"] + jnp.where(ex["n"] > 0, contrib, 0.0)
                out["prev1"] = cur
                out["prev2"] = aux["prev1"]
            return out

        x0 = self._shard_state(jnp.asarray(self.x0, dtype=s.dtype))
        if post_init:
            xT, acc = solvers.propagate(self.step_fn, x0, C, extras, post_fn, post_init)
        else:
            xT, acc = solvers.propagate(self.step_fn, x0, C)
            acc = {}

        return self._assemble_objective(
            params, params_ref, xT,
            acc.get("leak"), acc.get("jt"), acc.get("dpdm"), energy_int)

    def _store_iters_ok(self, dim_flat):
        """Whether the fused kernels may store their forward stage iterates
        in HBM (backward replay skipped): the blocks cost
        2 x ntime x iters x Bp x P f32 per direction, negligible for the
        small-batch flagships but multi-GiB for gate-class batches at
        mid-size N — past ~1.5 GiB the replay is the cheaper trade."""
        s = self.setup
        Bp = max(8, -(-self.ninit // 8) * 8)
        Ppad = -(-dim_flat // 128) * 128
        ks_bytes = 2 * s.ntime * s.linsolve_iters * Bp * Ppad * 4
        return ks_bytes <= 1.5 * (1 << 30)

    @property
    def pack_eligible(self):
        """Whether ensembles may route through the packed streamK builder.
        Beyond the fused-path conditions, the builder's VMEM working set
        must fit: FOUR (Ke, P, P) operator stacks (untransposed +
        transposed) resident in the backward, plus the per-grid-step
        streamed blocks — which scale with Bp and the worst-case Tc=8
        (history current+previous, cotangent injections, stage iterates,
        double-buffered by the Mosaic pipeline). The estimate uses the
        REAL padded P, so small states pack G = 128/dim candidates per
        tile while larger ones (e.g. the guarded open system's dim=256,
        small init batch) still qualify at G=1 for the Tc-blocked grid;
        large Lindblad initial-condition batches (Bp ~ N^2) that would
        exhaust VMEM fall back to the unpacked kernels."""
        s = self.setup
        dim = self.N * self.N if self.lindblad else self.N
        if not (self.use_pallas and s.pallas_mode == "streamk"
                and self.pallas_form == "superop" and self.nstages == 1):
            return False
        from .ops.pallas_stream import packed_group_size, tc_for
        G = packed_group_size(dim)
        P = -(-(G * dim) // 128) * 128
        Tc = tc_for(s.ntime)      # the Tc the builder will actually choose
        Bp = max(8, -(-self.ninit // 8) * 8)
        Ke = self.model.K + 1
        stacks_f32 = 4 * Ke * P * P
        # stage-iterate blocks exist only when the kernel stores them
        # (iters <= 4, pallas_stream store_iters)
        ks_rows = (2 * s.linsolve_iters * Bp
                   if s.linsolve_iters <= 4 and self._store_iters_ok(G * dim)
                   else 0)
        per_step_f32 = Tc * P * (4 * Bp + ks_rows + Ke)
        vmem_bytes = 4 * (stacks_f32 + 2 * per_step_f32)
        return vmem_bytes <= pack_vmem_budget_bytes()

    @property
    def pack_group(self):
        """Lane-packing group size of the packed streamK ensemble kernel:
        how many control candidates fit one 128-lane tile (8 at the
        flagship's N=16). 1 means no multi-candidate packing — but when
        pack_eligible, even G=1 ensembles use the packed builder for its
        Tc-blocked grid (sub-steps amortize the ~0.36 us/grid-step
        machinery) and transposed-stack backward."""
        if not self.pack_eligible:
            return 1
        from .ops.pallas_stream import packed_group_size
        dim = self.N * self.N if self.lindblad else self.N
        return packed_group_size(dim)

    def _objective_group(self, Pg, params_ref):
        """Objective of a GROUP of G control candidates through ONE
        lane-packed streamK kernel program
        (ops/pallas_stream.make_streamk_packed_propagate): the G states
        occupy disjoint lane segments and the G Hamiltonians the matching
        diagonal blocks of the (P, P) planes, so every MXU issue serves all
        G candidates. Returns (sum_g J_g, (J (G,), aux)) — each J_g depends
        only on Pg[g], so the gradient of the sum w.r.t. Pg IS the stacked
        per-candidate gradients. Used by the ensemble builders when
        pack_group > 1 (the multi-candidate analog of comm_init's
        embarrassing parallelism, optimproblem.cpp:85-91, turned into MXU
        lane occupancy instead of processes)."""
        s = self.setup
        G = Pg.shape[0]
        Cs = jax.vmap(self.coeff_rows_mid)(Pg)        # (G, ntime, 1, K)
        Cg = jnp.transpose(Cs[:, :, 0, :], (1, 0, 2))  # (ntime, G, K)
        if self.real_glue:
            (dim, gd), x0k = self._real_layout(), None
        else:
            dim, gd, x0k = self._flat_state_layout()
        shape_proto = np.zeros((self.model.K, dim, dim), np.complex64)
        from .ops.pallas_stream import make_streamk_packed_propagate
        prop = make_streamk_packed_propagate(
            shape_proto, s.dt, s.linsolve_iters, gen_diag=gd,
            linsolver=self.linsolver, group=G,
            interpret=self._pallas_interpret,
            store_iters=self._store_iters_ok(G * dim),
            real_io=self.real_glue)
        if self.real_glue:
            x0p = (jnp.asarray(self._x0_planes[0]),
                   jnp.asarray(self._x0_planes[1]))
            (xTr, xTi), (hr, hi) = prop(
                jnp.asarray(self.engine.pallas_Sr),
                jnp.asarray(self.engine.pallas_Si), x0p, Cg)

            def tail_r(pg, xTr_g, xTi_g, hr_g, hi_g):
                pl_b, pj_b, pd_b = self._history_penalties_real(hr_g, hi_g)
                return self._assemble_objective_real(
                    pg, params_ref, xTr_g, xTi_g, pl_b, pj_b, pd_b,
                    self._energy_integral(pg))

            Js, aux = jax.vmap(tail_r, in_axes=(0, 0, 0, 1, 1))(
                Pg, xTr, xTi, hr, hi)
            return jnp.sum(Js), (Js, aux)
        xT, hist = prop(jnp.asarray(self.engine.pallas_Sr),
                        jnp.asarray(self.engine.pallas_Si), x0k, Cg)
        xT, hist = self._unflatten_states(xT, hist)

        def tail(pg, xTg, histg):
            pen_leak_b, pen_jt_b, pen_dpdm_b = self._history_penalties(histg)
            return self._assemble_objective(pg, params_ref, xTg, pen_leak_b,
                                            pen_jt_b, pen_dpdm_b,
                                            self._energy_integral(pg))

        Js, aux = jax.vmap(tail, in_axes=(0, 0, 1))(Pg, xT, hist)
        return jnp.sum(Js), (Js, aux)

    # ------------------------------------------------------------------
    # big-array argument threading
    #
    # Small static arrays are embedded as jit constants from host memory.
    # LARGE arrays (operator stacks, big initial-condition batches) must be
    # passed as runtime ARGUMENTS instead: embedded constants bloat the
    # compile payload (remote-compile backends reject them) and, if held on
    # device, get fetched back at every trace. We temporarily swap tracers
    # into the holder attributes during tracing.
    # ------------------------------------------------------------------

    _BIG_THRESHOLD = 1 << 16   # elements

    def _big_slots(self):
        if self.real_glue:
            # the real-glue objective never touches the complex x0/target
            # (a complex device_put would also fail outright when the
            # relay drops complex support); thread their f32 planes
            slots = [(self, "_x0r"), (self, "_x0i"),
                     (self, "_tgtr"), (self, "_tgti")]
        else:
            slots = [(self, "x0"), (self, "target")]
        eng = self.engine
        for name in ("stack", "Ls", "stackL", "stackR", "cross_diag",
                     "crossA", "crossB", "jumpL", "jumpR",
                     "pallas_Sr", "pallas_Si"):
            if getattr(eng, name, None) is not None:
                slots.append((eng, name))
        out = []
        for holder, name in slots:
            arr = getattr(holder, name, None)
            if arr is not None and np.size(arr) >= self._BIG_THRESHOLD:
                out.append((holder, name))
        return out

    def _wrap_with_data(self, fn):
        """Return a jitted fn(*args) with big arrays threaded as arguments
        (device-resident between calls). Per array, the cheapest materialization
        wins: an engine-provided on-device builder (zero transfer), a sparse
        scatter (indices+values only), or a chunked host transfer."""
        slots = self._big_slots()
        if not slots:
            return jax.jit(fn)
        builders = {}
        for h, _name in slots:
            get_b = getattr(h, "device_builders", None)
            if get_b is not None and id(h) not in builders:
                builders[id(h)] = get_b()
        dev_vals = {}
        for h, name in slots:
            b = builders.get(id(h), {}).get(name)
            if b is not None:
                dev_vals[name] = _relay_retry(b)
                continue
            arr = np.asarray(getattr(h, name))
            dev = _sparse_device_put(arr)
            dev_vals[name] = dev if dev is not None else _chunked_device_put(arr)
        if self.mesh is not None:
            # mesh placement composes with the relay-safe materialization:
            # states sharded per state_sharding_spec, operator data replicated
            from jax.sharding import NamedSharding, PartitionSpec as P
            for h, name in slots:
                if h is self and name in ("x0", "target"):
                    spec = self.state_sharding_spec(np.ndim(dev_vals[name]))
                else:
                    spec = P()
                dev_vals[name] = jax.device_put(
                    dev_vals[name], NamedSharding(self.mesh, spec))

        def traced(data, *args):
            saved = {}
            try:
                for h, name in slots:
                    saved[name] = getattr(h, name)
                    setattr(h, name, data[name])
                return fn(*args)
            finally:
                for h, name in slots:
                    setattr(h, name, saved[name])

        jf = jax.jit(traced)

        def call(*args):
            return jf(dev_vals, *args)

        return call

    # compiled entry points -------------------------------------------------

    def build_value_and_grad(self):
        return self._wrap_with_data(
            jax.value_and_grad(self.objective, has_aux=True))

    def build_objective(self):
        return self._wrap_with_data(self.objective)

    def build_propagate_trajectory(self):
        return self._wrap_with_data(self.propagate_trajectory)

    def build_propagate_final(self):
        return self._wrap_with_data(self.propagate_final)

    def _ensemble_vg(self):
        """(E, nparams)-batched value_and_grad
        fn(Ps, ref) -> ((J (E,), aux), grad (E, nparams)). Routes through
        the lane-packed group kernel (_objective_group) when the fused
        streamK path is active: candidates are evaluated in groups of
        G = pack_group per kernel program (block-diagonal planes), vmapped
        over E/G groups — ~G x fewer MXU issues than vmapping the
        per-candidate program. Falls back to the plain per-candidate vmap
        when packing is off or E has no usable group factor."""
        vg = jax.value_and_grad(self.objective, has_aux=True)
        base = jax.vmap(vg, in_axes=(0, None))
        if not self.pack_eligible:
            return base
        Gmax = self.pack_group
        gvg = jax.value_and_grad(self._objective_group, has_aux=True)

        def evg(Ps, params_ref):
            E = Ps.shape[0]
            # largest group size <= Gmax dividing E (static under jit);
            # even G=1 routes through the packed builder (Tc-blocked grid)
            G = next((g for g in range(min(Gmax, E), 0, -1) if E % g == 0))
            Pg = Ps.reshape(E // G, G, Ps.shape[-1])
            (_, (Js, aux)), grads = jax.vmap(
                gvg, in_axes=(0, None))(Pg, params_ref)
            J = Js.reshape(E)
            aux = jax.tree.map(
                lambda a: a.reshape((E,) + a.shape[2:]), aux)
            return (J, aux), grads.reshape(E, Ps.shape[-1])

        return evg

    def _ensemble_objective(self):
        """(E, nparams)-batched objective fn(Ps, ref) -> (J (E,), aux),
        routed through the lane-packed group kernel when available (the
        forward-only companion of _ensemble_vg — used by batched line
        searches and multi-start population evaluation)."""
        base = jax.vmap(self.objective, in_axes=(0, None))
        if not self.pack_eligible:
            return base
        Gmax = self.pack_group

        def eobj(Ps, params_ref):
            E = Ps.shape[0]
            G = next((g for g in range(min(Gmax, E), 0, -1) if E % g == 0))
            Pg = Ps.reshape(E // G, G, Ps.shape[-1])
            _, (Js, aux) = jax.vmap(
                self._objective_group, in_axes=(0, None))(Pg, params_ref)
            return Js.reshape(E), jax.tree.map(
                lambda a: a.reshape((E,) + a.shape[2:]), aux)

        return eobj

    def packed_batch_fns(self, params_ref, mesh=None, axis="init"):
        """batched_lbfgsb hooks that route a population's objective/grad
        evaluations through the packed group kernels (G candidates per MXU
        issue). Returns {} when packing is unavailable — callers splat the
        result into batched_lbfgsb(**kw) and get the plain vmaps then.
        Shared by Quandary._multistart_best and the multistart bench.

        With `mesh`, every evaluation is shard_map'ed over the candidate
        axis (each device runs its E/n population slice through the full
        packed path) — a WHOLE population optimization then scales across
        chips like the throughput headline; sharded-vs-unsharded parity is
        pinned in test_sharding.py."""
        if self.pack_group <= 1:
            return {}
        eobj = self._ensemble_objective()
        evg = self._ensemble_vg()

        def obj_only(Ps, ref):
            return eobj(Ps, ref)[0]

        def vg_only(Ps, ref):
            (J, _aux), gr = evg(Ps, ref)
            return J, gr

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            obj_only = self._ensemble_shard(obj_only, mesh, axis, P(axis))
            vg_only = self._ensemble_shard(vg_only, mesh, axis,
                                           (P(axis), P(axis)))

        return dict(objective_batch=lambda xs: obj_only(xs, params_ref),
                    grad_batch=lambda xs: vg_only(xs, params_ref)[1],
                    vg_batch=lambda xs: vg_only(xs, params_ref))

    def _ensemble_shard(self, fn, mesh, axis, out_specs):
        """shard_map `fn(Ps, ref)` over the candidate (leading-Ps) axis of
        the mesh. Each device runs the FULL per-candidate program — fused
        Pallas kernels included, which GSPMD cannot partition but shard_map
        runs whole per shard — on its E/n slice of the ensemble. This is the
        multi-chip analog of the reference's comm_init split
        (optimproblem.cpp:85-91, user_guide.md:422): candidates are
        embarrassingly parallel, so the only collectives are the final
        reductions (psum / all-gather of per-candidate outputs)."""
        from jax.sharding import PartitionSpec as P

        n = mesh.shape[axis]

        def sharded(Ps, params_ref):
            E = Ps.shape[-2]
            if E % n:
                raise ValueError(
                    f"ensemble size {E} not divisible by mesh axis "
                    f"'{axis}' of size {n}")
            return jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P(*([None] * (Ps.ndim - 2)), axis), P()),
                out_specs=out_specs,
                # the fused Pallas kernels don't carry varying-mesh-axes
                # annotations; correctness is pinned by the sharded-vs-
                # unsharded parity tests (test_sharding.py)
                check_vma=False)(Ps, params_ref)

        return sharded

    def build_ensemble_value_and_grad(self, mesh=None, axis="init"):
        """value_and_grad vmapped over an ensemble of control vectors
        (E, nparams) -> ((J (E,), aux (E,...)), grad (E, nparams)).

        This is the batched-candidate axis the reference has no analog for:
        many control candidates (multi-start optimization, robust-control
        ensembles, population-based search) propagate simultaneously, turning
        the small per-problem matmuls into large batched GEMMs.

        With `mesh`, the candidate axis is SHARDED over the mesh's `axis`
        (shard_map; each device runs its E/n slice through the full fused
        path) — the multi-chip scaling axis for the flagship throughput
        metric."""
        evg = self._ensemble_vg()
        if mesh is None:
            return self._wrap_with_data(evg)
        from jax.sharding import PartitionSpec as P
        out_specs = ((P(axis), P(axis)), P(axis))
        return self._wrap_with_data(
            self._ensemble_shard(evg, mesh, axis, out_specs))

    def build_ensemble_sweeps(self, mesh=None, axis="init"):
        """f(Ps, params_ref) -> scalar consuming Ps.shape[0] PIPELINED
        ensemble gradient sweeps in one jit call (each a vmapped
        value_and_grad over Ps.shape[1] candidates; the scalar sums J and
        the gradients so nothing can be dead-code-eliminated). This is the
        throughput-probe entry point: one dispatch + one synchronous fetch
        measures chip rate without charging a remote link's round-trip to
        every repetition.

        With `mesh`, the candidate axis of every sweep is SHARDED over the
        mesh's `axis`: Ps (reps, E, nparams) with E split n ways, one psum
        of the accumulated scalar at the end — per-chip work is exactly the
        unsharded program at E/n."""
        evg = self._ensemble_vg()

        def reps(Ps, params_ref):
            def body(acc, P):
                (J, _), g = evg(P, params_ref)
                # cast: under x64 the objective promotes to f64 while the
                # carry is the setup's real dtype
                return (acc + jnp.sum(J) + jnp.sum(g)).astype(acc.dtype), None
            out, _ = jax.lax.scan(body, jnp.zeros((), self.rdtype), Ps)
            return out

        if mesh is None:
            return self._wrap_with_data(reps)
        from jax.sharding import PartitionSpec as P

        def reps_psum(Ps, params_ref):
            return jax.lax.psum(reps(Ps, params_ref), axis)

        return self._wrap_with_data(
            self._ensemble_shard(reps_psum, mesh, axis, P()))

    def propagate_final(self, params):
        """Forward-only propagation; returns final states (B, ...)."""
        if self.time_parallel:
            return self._all_states_time_parallel(params)[-1]
        C = self.coeff_rows_mid(params)
        xT, _ = solvers.propagate(self.step_fn, self.x0, C, remat=False)
        return xT

    def propagate_trajectory(self, params):
        """All states (ntime+1, B, ...) for trajectory output."""
        if self.time_parallel:
            states = self._all_states_time_parallel(params)
            x0 = jnp.asarray(self.x0).astype(states.dtype)
            return jnp.concatenate([x0[None], states], axis=0)
        C = self.coeff_rows_mid(params)
        return solvers.propagate_trajectory(self.step_fn, self.x0, C)

    def controls_on_output_grid(self, params):
        """(ts, p, q, f_lab) on the output time grid t_n = n*dt."""
        p, q = eval_controls(self.plan_out, params, self.setup.pipulses)
        f = eval_controls_labframe(self.plan_out, params,
                                   np.asarray(self.setup.ground_freqs_radns),
                                   self.setup.pipulses)
        return self.ts_out, p, q, f
