"""Density-matrix-form fused Lindblad kernel (ops/pallas_rho.py).

Kernel-level parity against the identical IMR discretization run through
ops/steppers.make_step_fn on the DenseEngine's matrix-form RHS
(ops/rhs.py:97-103), for all three stage solvers, plus gradient parity
through the hand-derived VJP, and a Problem-level end-to-end check that
a mid-size open system (N = 16, past the superop admission when the
budget is forced down) routes through the rho form and reproduces the
scan objective. Reference semantics: mastereq.cpp:546-614 (Lindblad
terms), timestepper.cpp:631-694 (discrete adjoint)."""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quandary_tpu.ops.pallas_rho import _planes, make_rho_propagate
from quandary_tpu.ops.steppers import make_step_fn


def _setup_kernel(linsolver, seed=0, N=5, K=3, B=2, nt=7, J=2, dt=0.01,
                  iters=3):
    rng = np.random.default_rng(seed)

    def rand_herm(n):
        A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        return (A + A.conj().T) / 2

    stack = np.stack([rand_herm(N) for _ in range(K)]).astype(np.complex128)
    Ls = [0.3 * (rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N)))
          for _ in range(J)]
    G = sum(L.conj().T @ L for L in Ls)
    stack[0] = stack[0] - 0.5j * G        # the engine's H_eff fold
    stackc = stack.astype(np.complex64)
    Lsc = [L.astype(np.complex64) for L in Ls]

    def rhs(c, x):
        A = jnp.tensordot(c.astype(jnp.complex64), jnp.asarray(stackc),
                          axes=1)
        out = -1j * (jnp.einsum("ij,bjk->bik", A, x)
                     - jnp.einsum("bij,jk->bik", x, A.conj().T))
        Lj = jnp.asarray(np.stack(Lsc))
        return out + jnp.einsum("cij,bjl,ckl->bik", Lj, x, Lj.conj())

    h = np.diagonal(stack[0])
    gd = -1j * (h[:, None] - np.conj(h)[None, :])
    for L in Ls:
        dl = np.diagonal(L)
        gd = gd + dl[:, None] * np.conj(dl)[None, :]

    step = make_step_fn(rhs, dt, "IMR", iters, linsolver, gen_diag=gd)
    C = (rng.normal(size=(nt, K)) * 0.5).astype(np.float32)
    C[:, 0] = 1.0
    x0 = (rng.normal(size=(B, N, N))
          + 1j * rng.normal(size=(B, N, N))).astype(np.complex64)

    def scan_traj(Cj, x0j):
        def body(x, c):
            xn = step(x, c[None, :])
            return xn, xn
        return jax.lax.scan(body, x0j, Cj)

    prop = make_rho_propagate(stackc, Lsc, dt, iters, gen_diag=gd,
                              linsolver=linsolver, interpret=True)
    Sr, Si = _planes(stackc, 128)
    return prop, scan_traj, Sr, Si, C, x0, rng


@pytest.mark.parametrize("linsolver", ["neumann", "jacobi", "split"])
def test_rho_kernel_forward_parity(linsolver):
    prop, scan_traj, Sr, Si, C, x0, _ = _setup_kernel(linsolver)
    xT_ref, hist_ref = scan_traj(jnp.asarray(C), jnp.asarray(x0))
    xT, hist = prop(jnp.asarray(Sr), jnp.asarray(Si), jnp.asarray(x0),
                    jnp.asarray(C))
    assert float(jnp.max(jnp.abs(xT - xT_ref))
                 / jnp.max(jnp.abs(xT_ref))) < 2e-4
    assert float(jnp.max(jnp.abs(hist - hist_ref))
                 / jnp.max(jnp.abs(hist_ref))) < 2e-4


@pytest.mark.parametrize("linsolver", ["neumann", "jacobi", "split"])
def test_rho_kernel_gradient_parity(linsolver):
    prop, scan_traj, Sr, Si, C, x0, rng = _setup_kernel(linsolver)
    B, N = x0.shape[0], x0.shape[1]
    nt = C.shape[0]
    tgt = (rng.normal(size=(B, N, N))
           + 1j * rng.normal(size=(B, N, N))).astype(np.complex64)
    w = rng.normal(size=nt).astype(np.float32)

    def obj(traj_fn, Cj, x0j):
        xT, hist = traj_fn(Cj, x0j)
        return (jnp.sum(jnp.real(jnp.conj(jnp.asarray(tgt)) * xT))
                + jnp.sum(jnp.asarray(w)[:, None, None, None]
                          * jnp.real(hist)))

    def traj_kernel(Cj, x0j):
        return prop(jnp.asarray(Sr), jnp.asarray(Si), x0j, Cj)

    gC_k, gx_k = jax.grad(lambda c, x: obj(traj_kernel, c, x),
                          argnums=(0, 1))(jnp.asarray(C), jnp.asarray(x0))
    gC_s, gx_s = jax.grad(lambda c, x: obj(scan_traj, c, x),
                          argnums=(0, 1))(jnp.asarray(C), jnp.asarray(x0))
    assert float(jnp.max(jnp.abs(gC_k - gC_s))
                 / jnp.max(jnp.abs(gC_s))) < 5e-4
    assert float(jnp.max(jnp.abs(gx_k - gx_s))
                 / jnp.max(jnp.abs(gx_s))) < 5e-4


def _open_problem(pallas, pallas_rho="auto"):
    from quandary_tpu.models import gates
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    Ne, Ng = [2, 2], [2, 2]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[],
        decay_time=[80.0, 90.0], dephase_time=[40.0, 45.0], lindblad=True)
    T, ntime = 8.0, 48
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=10, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0,),
        ) for _ in range(2))
    V = gates.assemble_gate(gates.cnot(), nlevels, Ne, [0.0, 0.0], T)
    setup = Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="diagonal", target_type="gate", target_gate_full=V,
        objective_type="Jtrace", gamma_tik=1e-4, gamma_penalty=0.1,
        dtype=jnp.complex64, linsolve_iters=4, pallas=pallas,
        pallas_rho=pallas_rho, time_parallel=False)
    return Problem(setup)


def test_rho_form_problem_parity():
    """pallas_rho='rho' routes the guarded open system (N = 16, superop
    dim 256) through the matrix form; objective and gradient must match
    the scan engine. ninit = 4 diagonal inits pack G = 4 per tile
    (block-diagonal lane grouping), so this also pins the grouped path."""
    p_rho = _open_problem(pallas=True, pallas_rho="rho")
    assert p_rho.use_pallas and p_rho.pallas_form == "rho"
    assert p_rho._rho_group == 4
    p_scan = _open_problem(pallas=False)

    params = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, p_rho.setup.nparams) * 0.01,
        dtype=jnp.float32)
    (J_r, aux_r), g_r = p_rho.build_value_and_grad()(params, params)
    (J_s, aux_s), g_s = p_scan.build_value_and_grad()(params, params)
    assert abs(float(J_r) - float(J_s)) < 5e-5 * max(1.0, abs(float(J_s)))
    assert float(jnp.max(jnp.abs(g_r - g_s))) < 5e-4 * float(
        jnp.max(jnp.abs(g_s)) + 1e-30)
    assert abs(float(aux_r["fidelity"]) - float(aux_s["fidelity"])) < 5e-5


def test_rho_form_ungrouped_matches_grouped(monkeypatch):
    """G = 1 (grouping disabled by monkeypatching the divisor pick) must
    reproduce the grouped objective bit-for-bit up to f32 roundoff."""
    import quandary_tpu.problem as problem_mod

    p_g = _open_problem(pallas=True, pallas_rho="rho")
    params = jnp.asarray(
        np.random.default_rng(4).uniform(-1, 1, p_g.setup.nparams) * 0.01,
        dtype=jnp.float32)
    (J_g, _), g_g = p_g.build_value_and_grad()(params, params)

    p_1 = _open_problem(pallas=True, pallas_rho="rho")
    # rebuild the un-grouped operator planes in place
    from quandary_tpu.ops.pallas_adjoint import plane_args
    p_1._rho_group = 1
    p_1._rho_gen_diag = p_1.gen_diag
    p_1._rho_Ls = (None if p_1.engine.Ls is None
                   else np.asarray(p_1.engine.Ls).copy())
    p_1.engine.pallas_Sr, p_1.engine.pallas_Si = plane_args(
        np.asarray(p_1.engine.stack))
    (J_1, _), g_1 = p_1.build_value_and_grad()(params, params)
    assert abs(float(J_g) - float(J_1)) < 1e-5 * max(1.0, abs(float(J_1)))
    assert float(jnp.max(jnp.abs(g_g - g_1))) < 1e-4 * float(
        jnp.max(jnp.abs(g_1)) + 1e-30)
