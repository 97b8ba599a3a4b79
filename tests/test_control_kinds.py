"""Deterministic pins for the two control-basis kinds beyond spline/spline0:
'spline_amplitude' (amplitude splines + one phase parameter per carrier,
controlbasis.cpp:99-166) and 'step' (ramped step whose single parameter is
the step width, controlbasis.cpp:168-216).

The reference EXITS when asked for spline_amplitude gradients
(oscillator.cpp:354 "Gradient computation for BSplineAmplitude basis is not
implemented"); here both kinds are FD-exact like every other basis. These
tests pin (a) the closed-form evaluation against an independent
reconstruction, (b) the gradients, and (c) the config-file wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quandary_tpu.io.configfile import Config, setup_from_config
from quandary_tpu.models.controls import eval_controls
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import (
    ControlSegment, OscillatorControl, bspline2_basis, build_control_plan,
    ramp_factor,
)

pytestmark = pytest.mark.quick


def test_spline_amplitude_closed_form():
    """p = amp(t) cos(Om t + s*theta), q = amp(t) sin(Om t + s*theta) with
    amp = B @ a — reconstructed here independently of eval_controls."""
    T, ns, scaling = 8.0, 6, 1.7
    freqs = (0.3, -0.55)
    osc = OscillatorControl(
        segments=(ControlSegment("spline_amplitude", nsplines=ns,
                                 tstart=0.0, tstop=T, scaling=scaling),),
        carrier_freqs=freqs)
    ts = np.linspace(0.0, T, 41)
    plan = build_control_plan([osc], ts)
    rng = np.random.default_rng(7)
    params = rng.normal(size=plan.nparams) * 0.1
    p, q = eval_controls(plan, jnp.asarray(params))
    P = params.reshape(len(freqs), ns + 1)
    B = bspline2_basis(ns, 0.0, T, ts)
    p_ref = np.zeros_like(ts)
    q_ref = np.zeros_like(ts)
    for f, om in enumerate(freqs):
        amp = B @ P[f, :ns]
        ph = om * ts + scaling * P[f, ns]
        p_ref += amp * np.cos(ph)
        q_ref += amp * np.sin(ph)
    np.testing.assert_allclose(np.asarray(p)[:, 0], p_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(q)[:, 0], q_ref, atol=1e-12)


def test_step_closed_form():
    """The step control equals ramp_factor(ts, tstart, tstepend, tramp) *
    (amp1, amp2) with tstepend = tstart + alpha*(tstop - tstart)."""
    T, tramp, a1, a2 = 10.0, 1.2, 0.04, -0.02
    osc = OscillatorControl(
        segments=(ControlSegment("step", tstart=0.0, tstop=T,
                                 step_amp1=a1, step_amp2=a2, tramp=tramp),),
        carrier_freqs=(0.0,))
    ts = np.linspace(0.0, T, 101)
    plan = build_control_plan([osc], ts)
    alpha = 0.62
    p, q = eval_controls(plan, jnp.asarray(np.asarray([alpha])))
    tstepend = alpha * T
    r = ramp_factor(ts, 0.0, tstepend, tramp)
    np.testing.assert_allclose(np.asarray(p)[:, 0], r * a1, atol=1e-12)
    np.testing.assert_allclose(np.asarray(q)[:, 0], r * a2, atol=1e-12)


def test_spline_amplitude_enforce_bc_zeroes_edge_amplitudes():
    """enforce_bc zeroes the first/last two AMPLITUDE basis columns (the
    phase parameter is untouched), so the pulse starts and ends at zero."""
    T, ns = 6.0, 7
    osc = OscillatorControl(
        segments=(ControlSegment("spline_amplitude", nsplines=ns,
                                 tstart=0.0, tstop=T),),
        carrier_freqs=(0.0,), enforce_bc=True)
    ts = np.asarray([0.0, T])
    plan = build_control_plan([osc], ts)
    params = np.ones(plan.nparams)
    p, q = eval_controls(plan, jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(q), 0.0, atol=1e-14)


def _problem_with(seg: ControlSegment, carrier=(0.1,)):
    model = build_standard_model(
        nlevels=[3], freq01_ghz=[4.1], rotfreq_ghz=[4.1],
        selfkerr_ghz=[0.22], crosskerr_ghz=[], jkl_ghz=[],
        decay_time=[], dephase_time=[], lindblad=False)
    T = seg.tstop
    osc = OscillatorControl(segments=(seg,), carrier_freqs=carrier)
    ntime = 60
    return Problem(Setup(
        model=model, nessential=(2,), ntime=ntime, dt=T / ntime,
        timestepper="IMR", oscillators=(osc,),
        ground_freqs_radns=(2 * np.pi * 4.1,),
        initcond_type="basis", target_type="pure",
        pure_target_levels=(1,), objective_type="Jtrace",
        gamma_tik=1e-4, gamma_penalty_energy=0.05))


@pytest.mark.parametrize("kind", ["spline_amplitude", "step"])
def test_gradient_fd_deterministic(kind):
    """Central-difference pin of EVERY parameter's gradient for the two
    otherwise-untested kinds, through the full objective (propagation +
    fidelity + tikhonov + energy penalty)."""
    if kind == "spline_amplitude":
        seg = ControlSegment("spline_amplitude", nsplines=5, tstart=0.0,
                             tstop=7.5, scaling=1.3)
        params = np.asarray([0.012, -0.03, 0.02, 0.015, -0.01, 0.4])
    else:
        seg = ControlSegment("step", tstart=0.0, tstop=7.5,
                             step_amp1=0.05, step_amp2=0.03, tramp=1.1)
        params = np.asarray([0.57])
    prob = _problem_with(seg)
    assert prob.setup.nparams == len(params)
    ref = jnp.zeros(len(params))
    obj = prob.build_objective()
    (J, _), g = jax.value_and_grad(prob.objective, has_aux=True)(
        jnp.asarray(params), ref)
    g = np.asarray(g)
    assert np.isfinite(float(J)) and np.isfinite(g).all()
    assert np.linalg.norm(g) > 1e-8   # a live gradient, not silent zeros
    eps = 1e-6
    for i in range(len(params)):
        e = np.zeros(len(params)); e[i] = eps
        fd = (float(obj(jnp.asarray(params + e), ref)[0])
              - float(obj(jnp.asarray(params - e), ref)[0])) / (2 * eps)
        assert abs(fd - g[i]) < 1e-6 * max(abs(fd), 1.0) + 2e-9, (i, fd, g[i])


def test_spline_amplitude_config_path(tmp_path):
    """A spline_amplitude case wired through the reference config format:
    segment parsing, parameter count/init (amplitudes constant*2pi, the
    extra token is the phase), and a live simulation + gradient."""
    cfg_text = """
nlevels = 3
nessential = 2
ntime = 40
dt = 0.12
transfreq = 4.1
rotfreq = 4.1
selfkerr = 0.22
carrier_frequency0 = 0.0, 0.05
control_segments0 = spline_amplitude, 6, 1.5
control_initialization0 = constant, 0.002, 0.31
initialcondition = basis
optim_target = pure, 0
runtype = simulation
"""
    p = tmp_path / "amp.cfg"
    p.write_text(cfg_text)
    setup, spec = setup_from_config(Config.read(str(p)), str(tmp_path))
    seg = setup.oscillators[0].segments[0]
    assert seg.kind == "spline_amplitude"
    assert seg.nsplines == 6 and seg.scaling == 1.5
    # nparams: (ns + 1 phase) per carrier, 2 carriers
    assert setup.nparams == 2 * 7
    P = np.asarray(spec.params0).reshape(2, 7)
    # control_enforceBC defaults true: first/last two amplitude coefficients
    # are zeroed at init; the interior ones get constant*2pi; the extra
    # init token is the phase parameter
    np.testing.assert_allclose(P[:, 2:4], 0.002 * 2 * np.pi, atol=1e-14)
    np.testing.assert_allclose(P[:, [0, 1, 4, 5]], 0.0, atol=1e-14)
    np.testing.assert_allclose(P[:, 6], 0.31, atol=1e-14)
    prob = Problem(setup)
    (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
        jnp.asarray(spec.params0), jnp.zeros(setup.nparams))
    assert np.isfinite(float(J))
    assert np.isfinite(np.asarray(g)).all()


def test_step_config_path(tmp_path):
    """'step' through the config format: amp1, amp2, tramp tokens; constant
    init clips the width into [0, 1]."""
    cfg_text = """
nlevels = 2
nessential = 2
ntime = 40
dt = 0.1
transfreq = 4.1
rotfreq = 4.1
selfkerr = 0.2
carrier_frequency0 = 0.0
control_segments0 = step, 0.03, 0.02, 0.8
control_initialization0 = constant, 0.6
initialcondition = basis
optim_target = pure, 1
runtype = simulation
"""
    p = tmp_path / "step.cfg"
    p.write_text(cfg_text)
    setup, spec = setup_from_config(Config.read(str(p)), str(tmp_path))
    seg = setup.oscillators[0].segments[0]
    assert seg.kind == "step"
    assert (seg.step_amp1, seg.step_amp2, seg.tramp) == (0.03, 0.02, 0.8)
    assert setup.nparams == 1
    # constant init: 0.6*2pi clipped into [0, 1]
    np.testing.assert_allclose(np.asarray(spec.params0), [1.0], atol=1e-14)
    prob = Problem(setup)
    J, aux = prob.build_objective()(jnp.asarray(spec.params0),
                                    jnp.zeros(1))
    assert np.isfinite(float(J))
