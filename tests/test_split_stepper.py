"""Diagonally-split IMR stepper (steppers.make_step_fn linsolver='split',
grouped_rhs.make_real_split_step, grouped_adjoint split=True).

The split scheme integrates the stiff drift diagonal exactly (elementwise
rotation) and solves only the off-diagonal remainder implicitly — 2nd order
like IMR (Strang), time-symmetric, norm-preserving to elementwise rounding,
and convergent for arbitrarily stiff diagonals where plain Neumann diverges.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quandary_tpu.models import gates
from quandary_tpu.ops.steppers import make_step_fn
from quandary_tpu.ops.tensor_rhs import build_structured_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _grouped_setup(nlev=4, ntime=24, T=1.2, linsolver="split", iters=4,
                   dtype=jnp.complex128, engine="grouped", adjoint="auto"):
    Q = 2
    nlevels = [nlev, nlev]
    freqs = [4.1, 4.2]
    model = build_structured_model(
        nlevels=nlevels, freq01_ghz=freqs, rotfreq_ghz=freqs,
        selfkerr_ghz=[0.22, 0.21], crosskerr_ghz=[0.01], jkl_ghz=[0.005],
    )
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0, -0.2 * 2 * np.pi),
        ) for _ in range(Q))
    setup = Setup(
        model=model, nessential=tuple(nlevels), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freqs),
        initcond_type="basis", initcond_ids=(0,),
        target_type="pure", pure_target_levels=(0, 0),
        objective_type="Jtrace", gamma_tik=1e-4,
        dtype=dtype, linsolve_iters=iters, linsolver=linsolver,
        engine=engine, adjoint=adjoint,
    )
    return Problem(setup), setup


def _rand_params(setup, seed=3, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, setup.nparams) * scale)


def test_split_matches_expm_second_order():
    """Global error of the split stepper vs the exact propagator is O(dt^2)
    and much smaller than plain-IMR's on a stiff diagonal."""
    rng = np.random.default_rng(0)
    N = 6
    h = np.linspace(0.0, 40.0, N)                     # stiff diagonal
    Voff = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    Voff = (Voff + Voff.conj().T) / 2
    np.fill_diagonal(Voff, 0.0)
    H = np.diag(h) + 0.1 * Voff
    x0 = rng.normal(size=(1, N)) + 1j * rng.normal(size=(1, N))
    x0 /= np.linalg.norm(x0)

    import scipy.linalg as sla
    T = 1.0
    xT_exact = x0 @ sla.expm(-1j * H * T).T

    def run(nt, linsolver):
        dt = T / nt
        rhs = lambda c, x: -1j * (x @ jnp.asarray(H).T)
        step = make_step_fn(rhs, dt, "IMR", linsolve_iters=10,
                            linsolver=linsolver,
                            gen_diag=-1j * jnp.asarray(h))
        c = jnp.ones((1, 1))

        @jax.jit
        def sweep(x):
            return jax.lax.fori_loop(0, nt, lambda _, y: step(y, c), x)

        return np.asarray(sweep(jnp.asarray(x0)))

    errs = [np.linalg.norm(run(nt, "split") - xT_exact) for nt in (64, 128)]
    order = np.log2(errs[0] / errs[1])
    assert 1.7 < order < 2.3, (errs, order)
    # exact diagonal integration: far more accurate than IMR-with-Jacobi at
    # the same resolution (dt*h_max = 0.625 at nt=64)
    err_imr = np.linalg.norm(run(64, "jacobi") - xT_exact)
    assert errs[0] < err_imr / 50, (errs[0], err_imr)


def test_split_norm_preservation_f32_stiff():
    """f32 norm drift over a long stiff horizon stays at elementwise
    rounding scale (the jacobi path drifts orders of magnitude more,
    PERF.md 'f32 norm drift')."""
    problem, setup = _grouped_setup(ntime=400, T=20.0, dtype=jnp.complex64,
                                    linsolver="split", iters=4)
    assert problem.linsolver == "split"
    params = _rand_params(setup)
    xT = problem.propagate_final(params)
    norms = np.linalg.norm(np.asarray(xT).reshape(xT.shape[0], -1), axis=1)
    assert np.max(np.abs(norms - 1.0)) < 5e-5, norms


def test_split_grouped_real_step_matches_generic():
    """make_real_split_step (real planes) == generic complex split step."""
    from quandary_tpu.ops.grouped_rhs import make_real_split_step
    problem, setup = _grouped_setup(linsolver="split", iters=5)
    eng = problem.engine
    params = _rand_params(setup)
    C = problem.coeff_rows_mid(params)

    step_c = problem.step_fn                      # generic complex split
    rstep = make_real_split_step(eng, setup.dt, setup.linsolve_iters)

    x = jnp.asarray(problem.x0)
    Xr = jnp.real(x).reshape(-1, eng.m1, eng.m2)
    Xi = jnp.imag(x).reshape(-1, eng.m1, eng.m2)
    for n in range(4):
        x = step_c(x, C[n])
        Xr, Xi = rstep(Xr, Xi, C[n][0])
    xr = np.asarray(Xr).reshape(x.shape[0], -1)
    xi = np.asarray(Xi).reshape(x.shape[0], -1)
    np.testing.assert_allclose(xr + 1j * xi, np.asarray(x),
                               rtol=1e-10, atol=1e-12)


def test_split_adjoint_matches_reversible_ad():
    """Hand-written split adjoint == AD through the unrolled split step."""
    p_solve, s_solve = _grouped_setup(linsolver="split", adjoint="auto")
    p_ad, _ = _grouped_setup(linsolver="split", adjoint="reversible-ad")
    assert p_solve.linsolver == p_ad.linsolver == "split"
    params = _rand_params(s_solve)
    (J1, _), g1 = jax.value_and_grad(p_solve.objective, has_aux=True)(
        params, params)
    (J2, _), g2 = jax.value_and_grad(p_ad.objective, has_aux=True)(
        params, params)
    np.testing.assert_allclose(float(J1), float(J2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-7, atol=1e-12)


def test_split_gradient_fd():
    """Split-path gradient vs central finite differences."""
    problem, setup = _grouped_setup(linsolver="split")
    params = _rand_params(setup)
    (J, _), g = jax.value_and_grad(problem.objective, has_aux=True)(
        params, params)
    obj = lambda p: float(problem.objective(p, params)[0])
    rng = np.random.default_rng(7)
    for i in rng.choice(setup.nparams, size=4, replace=False):
        eps = 1e-6
        e = np.zeros(setup.nparams)
        e[i] = eps
        fd = (obj(params + e) - obj(params - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-5, atol=1e-10)


def test_split_agrees_with_imr_at_fine_dt():
    """Split and IMR converge to the same trajectory (same ODE)."""
    ntime = 512
    p_split, s1 = _grouped_setup(ntime=ntime, linsolver="split", iters=6)
    p_imr, _ = _grouped_setup(ntime=ntime, linsolver="jacobi", iters=12)
    params = _rand_params(s1)
    x1 = np.asarray(p_split.propagate_final(params))
    x2 = np.asarray(p_imr.propagate_final(params))
    np.testing.assert_allclose(x1, x2, rtol=0, atol=5e-5)


def test_stiff_grouped_auto_selects_split():
    """The stiffness guard picks 'split' for the grouped engine."""
    problem, _ = _grouped_setup(nlev=6, ntime=8, T=2.0, linsolver="neumann",
                                iters=8)
    assert problem.linsolver == "split"


def test_split_imr4_fourth_order():
    """Yoshida composition of the (time-symmetric, 2nd-order) split step is
    4th order, exactly as for plain IMR sub-steps."""
    rng = np.random.default_rng(1)
    N = 5
    h = np.linspace(0.0, 25.0, N)
    Voff = rng.normal(size=(N, N)) + 1j * rng.normal(size=(N, N))
    Voff = (Voff + Voff.conj().T) / 2
    np.fill_diagonal(Voff, 0.0)
    H = np.diag(h) + 0.3 * Voff
    x0 = rng.normal(size=(1, N)) + 1j * rng.normal(size=(1, N))
    x0 /= np.linalg.norm(x0)

    import scipy.linalg as sla
    T = 0.5
    xT_exact = x0 @ sla.expm(-1j * H * T).T

    def run(nt):
        dt = T / nt
        rhs = lambda c, x: -1j * (x @ jnp.asarray(H).T)
        step = make_step_fn(rhs, dt, "IMR4", linsolve_iters=14,
                            linsolver="split",
                            gen_diag=-1j * jnp.asarray(h))
        c = jnp.ones((3, 1))

        @jax.jit
        def sweep(x):
            return jax.lax.fori_loop(0, nt, lambda _, y: step(y, c), x)

        return np.asarray(sweep(jnp.asarray(x0)))

    errs = [np.linalg.norm(run(nt) - xT_exact) for nt in (16, 32)]
    order = np.log2(errs[0] / errs[1])
    assert 3.5 < order < 4.6, (errs, order)


def _grouped_lindblad_setup(nlev=4, ntime=24, T=1.2, linsolver="split",
                            iters=4, dtype=jnp.complex128):
    Q = 2
    nlevels = [nlev, nlev]
    freqs = [4.1, 4.2]
    model = build_structured_model(
        nlevels=nlevels, freq01_ghz=freqs, rotfreq_ghz=freqs,
        selfkerr_ghz=[0.22, 0.21], crosskerr_ghz=[0.01], jkl_ghz=[0.005],
        decay_time=[60.0, 70.0], dephase_time=[30.0, 35.0], lindblad=True)
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0, -0.2 * 2 * np.pi),
        ) for _ in range(Q))
    setup = Setup(
        model=model, nessential=tuple(nlevels), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freqs),
        initcond_type="pure", pure_levels=(1, 0),
        target_type="pure", pure_target_levels=(0, 0),
        objective_type="Jtrace", gamma_tik=1e-4,
        dtype=dtype, linsolve_iters=iters, linsolver=linsolver,
        engine="grouped",
    )
    return Problem(setup), setup


def test_grouped_lindblad_split_matches_fine_imr():
    """Split on the grouped Lindblad engine (dissipative diagonal: exact
    decay factors) converges to the same trajectory as Jacobi-IMR."""
    from quandary_tpu.ops.grouped_lindblad import GroupedLindbladEngine

    p_split, s1 = _grouped_lindblad_setup(ntime=256, linsolver="split",
                                          iters=5)
    assert isinstance(p_split.engine, GroupedLindbladEngine)
    p_imr, _ = _grouped_lindblad_setup(ntime=256, linsolver="jacobi",
                                       iters=10)
    params = _rand_params(s1)
    x1 = np.asarray(p_split.propagate_final(params))
    x2 = np.asarray(p_imr.propagate_final(params))
    np.testing.assert_allclose(x1, x2, rtol=0, atol=1e-4)
    # trace preserved to solver tolerance
    tr = np.trace(x1[0])
    np.testing.assert_allclose(tr.real, 1.0, atol=1e-6)


def test_grouped_lindblad_split_gradient_fd():
    problem, setup = _grouped_lindblad_setup(ntime=12, linsolver="split")
    params = _rand_params(setup)
    (J, _), g = jax.value_and_grad(problem.objective, has_aux=True)(
        params, params)
    obj = lambda p: float(problem.objective(p, params)[0])
    rng = np.random.default_rng(5)
    for i in rng.choice(setup.nparams, size=3, replace=False):
        eps = 1e-6
        e = np.zeros(setup.nparams)
        e[i] = eps
        fd = (obj(params + e) - obj(params - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=3e-5, atol=1e-10)
