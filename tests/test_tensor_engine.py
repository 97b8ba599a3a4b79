"""TensorEngine (matrix-free per-axis contractions) vs DenseEngine parity:
identical RHS applications on random states for closed and open systems with
every term active (detuning, Kerr, cross-Kerr, JC coupling, T1/T2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.rhs import DenseEngine
from quandary_tpu.ops.tensor_rhs import TensorEngine, build_structured_model

ARGS = dict(
    nlevels=[3, 2, 4],
    freq01_ghz=[4.1, 5.0, 3.3],
    rotfreq_ghz=[4.0, 4.9, 3.35],
    selfkerr_ghz=[0.22, 0.1, 0.15],
    crosskerr_ghz=[0.01, 0.002, 0.005],
    jkl_ghz=[0.004, 0.0, 0.006],
    decay_time=[50.0, 0.0, 70.0],
    dephase_time=[30.0, 20.0, 0.0],
)


@pytest.mark.parametrize("lindblad", [False, True])
def test_tensor_vs_dense_rhs(lindblad):
    dense = DenseEngine(build_standard_model(lindblad=lindblad, **ARGS))
    tensor = TensorEngine(build_structured_model(lindblad=lindblad, **ARGS))
    assert dense.model.K == tensor.model.K

    N = dense.N
    rng = np.random.default_rng(7)
    B = 3
    if lindblad:
        x = rng.normal(size=(B, N, N)) + 1j * rng.normal(size=(B, N, N))
    else:
        x = rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
    x = jnp.asarray(x)

    c = jnp.asarray(rng.normal(size=dense.model.K))
    c = c.at[0].set(1.0)

    y_dense = np.asarray(dense.rhs(c, x))
    y_tensor = np.asarray(tensor.rhs(c, x))
    err = np.abs(y_dense - y_tensor).max() / max(np.abs(y_dense).max(), 1e-30)
    assert err < 1e-12, err


def test_coeff_rows_match():
    dense_m = build_standard_model(**ARGS)
    struct_m = build_structured_model(**ARGS)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(5, 3)))
    q = jnp.asarray(rng.normal(size=(5, 3)))
    ts = np.linspace(0, 1.0, 5)
    np.testing.assert_allclose(np.asarray(dense_m.coeff_rows(p, q, ts)),
                               np.asarray(struct_m.coeff_rows(p, q, ts)),
                               rtol=1e-14)


def test_problem_with_tensor_engine_matches_dense():
    """Full objective + gradient parity between engines."""
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    T, ntime = 2.0, 50
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * 0.1),
        ) for _ in range(3)
    )
    common = dict(
        nessential=(3, 2, 4), ntime=ntime, dt=T / ntime, oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in ARGS["freq01_ghz"]),
        initcond_type="pure", pure_levels=(1, 0, 0),
        target_type="pure", pure_target_levels=(0, 0, 0),
        objective_type="Jfrobenius", gamma_tik=1e-4, gamma_penalty_energy=0.1,
    )
    import jax
    rng = np.random.default_rng(5)
    setups = [
        Setup(model=build_standard_model(lindblad=True, **ARGS), **common),
        Setup(model=build_structured_model(lindblad=True, **ARGS), **common),
    ]
    params = jnp.asarray(rng.normal(size=setups[0].nparams) * 0.02)
    outs = []
    for s in setups:
        prob = Problem(s)
        (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(params, params)
        outs.append((float(J), np.asarray(g)))
    assert abs(outs[0][0] - outs[1][0]) < 1e-11
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-9, atol=1e-13)


def test_grouped_vs_tensor_rhs():
    """GroupedEngine (matricized big-GEMM path) == TensorEngine for a
    Schroedinger system with cross-group crossKerr and JC terms."""
    from quandary_tpu.ops.grouped_rhs import GroupedEngine

    args = dict(
        nlevels=[3, 4, 2, 3],
        freq01_ghz=[4.1, 5.0, 3.3, 4.4],
        rotfreq_ghz=[4.0, 4.9, 3.35, 4.38],
        selfkerr_ghz=[0.22, 0.1, 0.15, 0.18],
        crosskerr_ghz=[0.01, 0.002, 0.005, 0.003, 0.004, 0.006],
        jkl_ghz=[0.004, 0.0, 0.006, 0.002, 0.0, 0.003],
    )
    m = build_structured_model(**args)
    tensor = TensorEngine(m)
    grouped = GroupedEngine(m, dtype=jnp.complex128)

    rng = np.random.default_rng(2)
    N = m.N
    x = jnp.asarray(rng.normal(size=(2, N)) + 1j * rng.normal(size=(2, N)))
    c = jnp.asarray(rng.normal(size=m.K))
    c = c.at[0].set(1.0)
    y1 = np.asarray(tensor.rhs(c, x))
    y2 = np.asarray(grouped.rhs(c, x))
    err = np.abs(y1 - y2).max() / np.abs(y1).max()
    assert err < 1e-12, err


def test_real_imr_step_matches_complex():
    """Fully-real grouped IMR step == complex jacobi step."""
    from quandary_tpu.ops.grouped_rhs import GroupedEngine, make_real_imr_step
    from quandary_tpu.ops.steppers import make_step_fn

    args = dict(
        nlevels=[3, 4, 2, 3],
        freq01_ghz=[4.1, 5.0, 3.3, 4.4],
        rotfreq_ghz=[4.0, 4.9, 3.35, 4.38],
        selfkerr_ghz=[0.22, 0.1, 0.15, 0.18],
        crosskerr_ghz=[0.01, 0.002, 0.005, 0.003, 0.004, 0.006],
        jkl_ghz=[0.004, 0.0, 0.006, 0.002, 0.0, 0.003],
    )
    m = build_structured_model(**args)
    eng = GroupedEngine(m, dtype=jnp.complex128)
    dt, iters = 0.02, 12
    step_c = make_step_fn(eng.rhs, dt, "IMR", iters, "jacobi",
                          gen_diag=eng.gen_diag())
    step_r = make_real_imr_step(eng, dt, iters)

    rng = np.random.default_rng(9)
    N = m.N
    x = rng.normal(size=(2, N)) + 1j * rng.normal(size=(2, N))
    xj = jnp.asarray(x)
    y_c = np.asarray(step_c(xj, jnp.ones((1, m.K))))
    Xr = jnp.asarray(x.real.reshape(2, eng.m1, eng.m2))
    Xi = jnp.asarray(x.imag.reshape(2, eng.m1, eng.m2))
    yr, yi = step_r(Xr, Xi, jnp.ones((m.K,)))
    y_r = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(2, N)
    assert np.abs(y_c - y_r).max() < 1e-11, np.abs(y_c - y_r).max()


def test_grouped_device_builders_match_host():
    """On-device kron assembly (zero-transfer path) == host-built arrays."""
    from quandary_tpu.ops.grouped_rhs import GroupedEngine

    args = dict(
        nlevels=[3, 4, 2, 3],
        freq01_ghz=[4.1, 5.0, 3.3, 4.4],
        rotfreq_ghz=[4.0, 4.9, 3.35, 4.38],
        selfkerr_ghz=[0.22, 0.1, 0.15, 0.18],
        crosskerr_ghz=[0.01, 0.002, 0.005, 0.003, 0.004, 0.006],
        jkl_ghz=[0.004, 0.0, 0.006, 0.002, 0.0, 0.003],
    )
    m = build_structured_model(**args)
    for dtype in (jnp.complex64, jnp.complex128):
        eng = GroupedEngine(m, dtype=dtype)
        built = {k: np.asarray(f()) for k, f in eng.device_builders().items()}
        for name in ("stackL", "stackR", "crossA", "crossB", "cross_diag"):
            host = getattr(eng, name)
            if host is None:
                assert name not in built
                continue
            dev = built[name]
            scale = max(np.abs(host).max(), 1e-300)
            assert np.abs(dev - np.asarray(host)).max() < 1e-6 * scale, name


def test_grouped_real_reversible_gradient_parity():
    """Problem-level: all-real grouped reversible adjoint == remat AD of the
    complex step (engine='grouped' forced at small N)."""
    import dataclasses

    import jax

    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    args = dict(
        nlevels=[3, 3],
        freq01_ghz=[4.1, 5.0],
        rotfreq_ghz=[4.09, 4.99],
        selfkerr_ghz=[0.22, 0.1],
        crosskerr_ghz=[0.01],
        jkl_ghz=[0.004],
    )
    m = build_structured_model(**args)
    T, ntime = 2.0, 8
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=3, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0,)) for _ in range(2))
    base = Setup(
        model=m, nessential=(3, 3), ntime=ntime, dt=T / ntime,
        linsolve_iters=15, oscillators=oscs,
        ground_freqs_radns=(4.1, 5.0),
        initcond_type="pure", pure_levels=(0, 0),
        target_type="pure", pure_target_levels=(1, 0),
        objective_type="Jfrobenius", gamma_tik=1e-4, gamma_penalty=0.05,
        dtype=jnp.complex128, engine="grouped")

    rng = np.random.default_rng(5)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.02)
    ref = jnp.zeros_like(params)

    outs = {}
    for adj in ("reversible", "remat"):
        prob = Problem(dataclasses.replace(base, adjoint=adj))
        from quandary_tpu.ops.grouped_rhs import GroupedEngine
        assert isinstance(prob.engine, GroupedEngine)
        (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
            params, ref)
        outs[adj] = (float(J), np.asarray(g))

    J1, g1 = outs["reversible"]
    J2, g2 = outs["remat"]
    assert abs(J1 - J2) < 1e-9 * max(1.0, abs(J2)), (J1, J2)
    assert np.abs(g1 - g2).max() < 1e-7 * max(np.abs(g2).max(), 1e-12)
