"""Real-glue objective tail (problem._assemble_objective_real and the
real_io kernel contract): the fused closed-system jit program must
contain NO complex ops — the axon TPU relay intermittently rejects
complex programs wholesale, TPU has no native complex type, and the
reference itself integrates the real-blocked x = [u; v] form
(user_guide.md:269-306). Pinned here: real-glue objective/gradient ==
complex-glue objective/gradient on the flagship-class closed config
(guard leakage + energy + tikhonov penalties active), on both the plain
streamk path and the lane-packed group path, and the absence of complex
primitives in the lowered HLO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _closed_problem(real_glue: bool, monkeypatch):
    from quandary_tpu.models import gates
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    if not real_glue:
        monkeypatch.setenv("QTPU_REAL_GLUE", "0")
    Ne, Ng = [2, 2], [2, 2]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[],
        decay_time=[0.0, 0.0], dephase_time=[0.0, 0.0], lindblad=False)
    T, ntime = 20.0, 122
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=10, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * (freq01[1 - k] - freq01[k])),
        ) for k in range(2))
    V = gates.assemble_gate(gates.cnot(), nlevels, Ne, [0.0, 0.0], T)
    setup = Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis", target_type="gate", target_gate_full=V,
        objective_type="Jtrace", gamma_tik=1e-4, gamma_penalty=0.1,
        gamma_penalty_energy=0.1,
        dtype=jnp.complex64, linsolve_iters=3, linsolver="split",
        pallas=True, time_parallel=False)
    p = Problem(setup)
    assert p.use_pallas
    assert p.real_glue == real_glue
    return p


def test_real_glue_matches_complex(monkeypatch):
    p_r = _closed_problem(True, monkeypatch)
    p_c = _closed_problem(False, monkeypatch)
    params = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, p_r.setup.nparams) * 0.01,
        dtype=jnp.float32)
    (J_r, aux_r), g_r = p_r.build_value_and_grad()(params, params)
    (J_c, aux_c), g_c = p_c.build_value_and_grad()(params, params)
    assert abs(float(J_r) - float(J_c)) < 2e-6 * max(1.0, abs(float(J_c)))
    assert float(jnp.max(jnp.abs(g_r - g_c))) < 2e-5 * float(
        jnp.max(jnp.abs(g_c)) + 1e-30)
    for k in aux_c:
        assert abs(float(aux_r[k]) - float(aux_c[k])) < 5e-6, k


def test_real_glue_group_matches_complex(monkeypatch):
    p_r = _closed_problem(True, monkeypatch)
    p_c = _closed_problem(False, monkeypatch)
    if not (p_r.pack_eligible and p_c.pack_eligible):
        pytest.skip("packed path not eligible in this environment")
    rng = np.random.default_rng(6)
    G = min(p_r.pack_group, 4)
    Pg = jnp.asarray(rng.uniform(-1, 1, (G, p_r.setup.nparams)) * 0.01,
                     dtype=jnp.float32)
    ref = jnp.zeros(p_r.setup.nparams, jnp.float32)
    (s_r, (Js_r, _)) = p_r._objective_group(Pg, ref)
    (s_c, (Js_c, _)) = p_c._objective_group(Pg, ref)
    np.testing.assert_allclose(np.asarray(Js_r), np.asarray(Js_c),
                               rtol=3e-6, atol=1e-7)


def test_real_glue_program_has_no_complex_ops(monkeypatch):
    p_r = _closed_problem(True, monkeypatch)
    params = jnp.zeros(p_r.setup.nparams, jnp.float32)
    vg = jax.value_and_grad(p_r.objective, has_aux=True)
    fn = p_r._wrap_with_data(vg)
    # inspect the lowered module text for complex types
    wrapped = getattr(fn, "__wrapped__", None)
    txt = jax.jit(lambda x: vg(x, x)).lower(params).as_text()
    assert "c64" not in txt and "complex" not in txt, \
        "real-glue program must be complex-free"


def _open_problem(pallas, monkeypatch=None, real=True):
    from quandary_tpu.models import gates
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    Ne, Ng = [2, 2], [1, 1]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[],
        decay_time=[80.0, 90.0], dephase_time=[40.0, 45.0], lindblad=True)
    T, ntime = 6.0, 36
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=8, tstart=0.0,
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
        pallas_rho="superop", time_parallel=False)
    return Problem(setup)


def test_real_glue_lindblad_superop_matches_complex(monkeypatch):
    """The guarded open system on the vectorized-superop fused path:
    real glue (flat vec(rho) plane pairs, strided-diagonal leak penalty)
    must reproduce the complex tail."""
    p_r = _open_problem(pallas=True)
    assert p_r.use_pallas and p_r.pallas_form == "superop"
    assert p_r.real_glue and p_r._real_flat
    monkeypatch.setenv("QTPU_REAL_GLUE", "0")
    p_c = _open_problem(pallas=True)
    assert p_c.use_pallas and not p_c.real_glue
    monkeypatch.delenv("QTPU_REAL_GLUE")
    params = jnp.asarray(
        np.random.default_rng(8).uniform(-1, 1, p_r.setup.nparams) * 0.01,
        dtype=jnp.float32)
    (J_r, aux_r), g_r = p_r.build_value_and_grad()(params, params)
    (J_c, aux_c), g_c = p_c.build_value_and_grad()(params, params)
    assert abs(float(J_r) - float(J_c)) < 2e-6 * max(1.0, abs(float(J_c)))
    assert float(jnp.max(jnp.abs(g_r - g_c))) < 2e-5 * float(
        jnp.max(jnp.abs(g_c)) + 1e-30)
    for k in aux_c:
        assert abs(float(aux_r[k]) - float(aux_c[k])) < 5e-6, k
