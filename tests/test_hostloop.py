"""Host-driven stepping == scan path (forward states and gradients)."""

import jax.numpy as jnp
import numpy as np

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.hostloop import HostLoopRunner
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _prob():
    T, ntime = 4.0, 30
    model = build_standard_model(
        nlevels=[3, 2], freq01_ghz=[4.1, 5.0], rotfreq_ghz=[4.05, 4.95],
        selfkerr_ghz=[0.2, 0.15], jkl_ghz=[0.01], crosskerr_ghz=[0.002],
    )
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0,),
        ) for _ in range(2)
    )
    setup = Setup(
        model=model, nessential=(3, 2), ntime=ntime, dt=T / ntime,
        oscillators=oscs, ground_freqs_radns=(1.0, 1.0),
        initcond_type="basis", target_type="pure", pure_target_levels=(0, 0),
        objective_type="Jfrobenius", time_parallel=False,
    )
    return Problem(setup), setup


def test_hostloop_forward_matches_scan():
    prob, setup = _prob()
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)
    xT_scan = np.asarray(prob.build_propagate_final()(params))
    runner = HostLoopRunner(prob)
    xT_host, _ = runner.forward(params)
    assert np.abs(np.asarray(xT_host) - xT_scan).max() < 1e-12


def test_hostloop_gradient_matches_ad():
    prob, setup = _prob()
    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)

    def loss_on_final(xT, p):
        J_re_b, J_im_b = prob.eval_J_parts(xT)
        return jnp.sum(jnp.asarray(prob.weights) * J_re_b) + 1e-4 * jnp.sum(p * p)

    import jax
    def full(p):
        xT = prob.propagate_final(p)
        return loss_on_final(xT, p)
    J_ref, g_ref = jax.value_and_grad(full)(params)

    runner = HostLoopRunner(prob)
    J_host, g_host = runner.gradient(params, loss_on_final)
    assert abs(float(J_ref) - J_host) < 1e-12
    np.testing.assert_allclose(g_host, np.asarray(g_ref), rtol=1e-8, atol=1e-13)
