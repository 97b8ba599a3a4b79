"""GroupedLindbladEngine (ops/grouped_lindblad.py) parity with TensorEngine:
same StructuredModel, same coefficient rows -> identical RHS, identical
objective/gradient through the full Problem pipeline."""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")


def _model(Q=3, d=3):
    from quandary_tpu.ops.tensor_rhs import build_structured_model
    freqs = [4.1 + 0.1 * k for k in range(Q)]
    npairs = Q * (Q - 1) // 2
    return build_structured_model(
        nlevels=[d] * Q, freq01_ghz=freqs, rotfreq_ghz=freqs,
        selfkerr_ghz=[0.2] * Q, crosskerr_ghz=[0.001] * npairs,
        jkl_ghz=[0.002] * npairs,
        decay_time=[50.0 + 10 * k for k in range(Q)],
        dephase_time=[30.0 + 5 * k for k in range(Q)],
        lindblad=True,
    )


def test_rhs_matches_tensor_engine():
    from quandary_tpu.ops.grouped_lindblad import GroupedLindbladEngine
    from quandary_tpu.ops.tensor_rhs import TensorEngine

    model = _model()
    te = TensorEngine(model, dtype=jnp.complex128)
    ge = GroupedLindbladEngine(model, dtype=jnp.complex128)

    rng = np.random.default_rng(0)
    B, N = 2, model.N
    x = rng.normal(size=(B, N, N)) + 1j * rng.normal(size=(B, N, N))
    x = jnp.asarray(x + np.conj(np.swapaxes(x, -1, -2)))  # hermitian rho
    # c[0] is the drift slot and is identically 1 in real coefficient rows
    # (StructuredModel.coeff_rows); TensorEngine relies on that (it applies
    # the drift unconditionally), so parity is defined on c[0] = 1
    c = jnp.asarray(rng.normal(size=model.K)).at[0].set(1.0)

    y_t = te.rhs(c, x)
    y_g = ge.rhs(c, x)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_t),
                               rtol=1e-12, atol=1e-12)


def test_rhs_matches_tensor_engine_2osc():
    """2-oscillator split: one group per oscillator, all JC pairs cross."""
    from quandary_tpu.ops.grouped_lindblad import GroupedLindbladEngine
    from quandary_tpu.ops.tensor_rhs import TensorEngine

    model = _model(Q=2, d=4)
    te = TensorEngine(model, dtype=jnp.complex128)
    ge = GroupedLindbladEngine(model, dtype=jnp.complex128)
    rng = np.random.default_rng(1)
    N = model.N
    x = jnp.asarray(rng.normal(size=(1, N, N))
                    + 1j * rng.normal(size=(1, N, N)))
    c = jnp.asarray(rng.normal(size=model.K)).at[0].set(1.0)
    np.testing.assert_allclose(np.asarray(ge.rhs(c, x)),
                               np.asarray(te.rhs(c, x)),
                               rtol=1e-12, atol=1e-12)


def test_gen_diag_matches_tensor_engine():
    from quandary_tpu.ops.grouped_lindblad import GroupedLindbladEngine
    from quandary_tpu.ops.tensor_rhs import TensorEngine

    model = _model()
    np.testing.assert_allclose(
        GroupedLindbladEngine(model, dtype=jnp.complex128).gen_diag(),
        TensorEngine(model, dtype=jnp.complex128).gen_diag())


def _lind_problem(engine):
    import numpy as _np
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    model = _model(Q=2, d=3)
    T, ntime = 1.0, 10
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0,),
        ) for _ in range(2))
    setup = Setup(
        model=model, nessential=(3, 3), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * _np.pi * (4.1 + 0.1 * k)
                                 for k in range(2)),
        initcond_type="diagonal", initcond_ids=(0, 1),
        target_type="pure", pure_target_levels=(0, 0),
        objective_type="Jfrobenius", gamma_tik=1e-4,
        dtype=jnp.complex128, engine=engine,
    )
    return Problem(setup), setup


def test_problem_objective_parity():
    """Full pipeline: objective + gradient identical between the tensor and
    grouped-Lindblad engines."""
    prob_t, setup = _lind_problem("tensor")
    prob_g, _ = _lind_problem("grouped")
    assert type(prob_g.engine).__name__ == "GroupedLindbladEngine"
    assert type(prob_t.engine).__name__ == "TensorEngine"

    params = jnp.asarray(
        np.random.default_rng(7).normal(size=setup.nparams) * 0.02)
    (Jt, auxt), gt = jax.value_and_grad(prob_t.objective, has_aux=True)(
        params, params)
    (Jg, auxg), gg = jax.value_and_grad(prob_g.objective, has_aux=True)(
        params, params)
    np.testing.assert_allclose(float(Jg), float(Jt), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gt),
                               rtol=1e-9, atol=1e-13)
