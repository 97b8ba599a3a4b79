"""Config-file option coverage: every key the reference's config getters
consume must be honored (or deliberately consumed) by setup_from_config.
Covers the keys added in round 2: linearsolver_type, usematfree,
optim_regul_interpolate (deprecated alias), np_optim."""

import numpy as np

from quandary_tpu.io.configfile import Config, setup_from_config
from quandary_tpu.ops.tensor_rhs import StructuredModel
from quandary_tpu.models.hamiltonian import HamiltonianModel


BASE = """
nlevels = 3
nessential = 2
ntime = 20
dt = 0.1
transfreq = 4.1
rotfreq = 4.1
selfkerr = 0.22
carrier_frequency0 = 0.0
control_segments0 = spline, 5
control_initialization0 = constant, 0.001
initialcondition = basis
optim_target = pure, 0
runtype = simulation
"""


def _cfg(extra: str, tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text(BASE + extra)
    cfg = Config.read(str(p))
    return setup_from_config(cfg, str(tmp_path))


def test_linearsolver_type_is_advisory(tmp_path):
    """'linearsolver_type' picks between two solvers for the same IMR stage
    equations; both config values map to the guarded Neumann/Jacobi solve
    (machine-precision residuals). Setup.linsolver='gmres' stays available
    for parity experiments."""
    setup, _ = _cfg("linearsolver_type = gmres\n", tmp_path)
    assert setup.linsolver == "neumann"
    setup2, _ = _cfg("", tmp_path)
    assert setup2.linsolver == "neumann"


def test_usematfree_is_advisory(tmp_path):
    """'usematfree' selects between the reference's two mathematically-
    identical RHS implementations; here it is consumed (config_log parity)
    but engine choice stays automatic — both settings produce the same
    model/engine and therefore bit-identical results."""
    setup, _ = _cfg("usematfree = true\n", tmp_path)
    setup2, _ = _cfg("usematfree = false\n", tmp_path)
    assert type(setup.model) is type(setup2.model)
    assert isinstance(setup.model, HamiltonianModel)


def test_regul_interpolate_deprecated_alias(tmp_path):
    setup, _ = _cfg("optim_regul_interpolate = true\n", tmp_path)
    assert setup.gamma_tik_interpolate is True
    # the new key wins when both are present
    setup2, _ = _cfg("optim_regul_interpolate = true\n"
                     "optim_regul_tik0 = false\n", tmp_path)
    assert setup2.gamma_tik_interpolate is False


def test_structured_engine_matches_dense(tmp_path):
    """The engines the auto-selection switches between are mathematically
    identical: forcing the tensor engine on a small config reproduces the
    dense-stack trajectory."""
    import dataclasses

    from quandary_tpu.ops.tensor_rhs import build_structured_model
    from quandary_tpu.problem import Problem

    s1, spec = _cfg("", tmp_path)
    m = s1.model
    sm = build_structured_model(
        nlevels=list(m.dims), freq01_ghz=[4.1], rotfreq_ghz=[4.1],
        selfkerr_ghz=[0.22], crosskerr_ghz=[], jkl_ghz=[])
    s2 = dataclasses.replace(s1, model=sm, engine="tensor")
    p1, p2 = Problem(s1), Problem(s2)
    params = np.asarray(spec.params0, dtype=np.float64)
    x1 = np.asarray(p1.propagate_final(params))
    x2 = np.asarray(p2.propagate_final(params))
    np.testing.assert_allclose(x1, x2, rtol=1e-10, atol=1e-12)


def test_random_init_one_stream_per_oscillator(tmp_path):
    """Random control init draws ONE mt19937 stream per oscillator,
    consumed sequentially across segments/carriers (the reference copies
    the seeded engine into each oscillator and draws from that copy,
    main.cpp:240 / oscillator.cpp:164-189). Restarting per carrier block
    would make all carriers' coefficients byte-identical."""
    from quandary_tpu.io.native import mt19937_uniform

    p = tmp_path / "t.cfg"
    p.write_text(BASE.replace("carrier_frequency0 = 0.0",
                              "carrier_frequency0 = 0.0, 0.1")
                 .replace("control_initialization0 = constant, 0.001",
                          "control_initialization0 = random, 0.01")
                 + "rand_seed = 77\ncontrol_enforceBC = false\n")
    from quandary_tpu.io.configfile import Config, setup_from_config
    cfg = Config.read(str(p))
    setup, spec = setup_from_config(cfg, str(tmp_path))
    osc = setup.oscillators[0]
    npc = osc.segments[0].nparams_per_carrier()
    vals = np.asarray(spec.params0)
    b0, b1 = vals[:npc], vals[npc:2 * npc]
    assert not np.allclose(b0, b1), "carrier blocks must differ"
    u = mt19937_uniform(77, 2 * npc)
    if u is not None:  # native lib available: check stream continuity
        amp = 0.01 * 2 * np.pi
        np.testing.assert_allclose(np.concatenate([b0, b1]),
                                   2.0 * u * amp - amp, rtol=1e-12)
