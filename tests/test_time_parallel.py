"""Time-parallel (associative-scan) propagation vs the sequential scan:
objective values and gradients must agree to roundoff for Schroedinger and
Lindblad, all penalties active."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models import gates
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _setup(lindblad, objective="Jtrace", penalty_param=0.0):
    Ne = [2, 2]
    Ng = [1, 0]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.8, 5.1]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=[4.79, 5.09],
        selfkerr_ghz=[0.22, 0.25], crosskerr_ghz=[0.01], jkl_ghz=[0.005],
        decay_time=[100.0, 80.0] if lindblad else [],
        dephase_time=[50.0, 60.0] if lindblad else [],
        lindblad=lindblad,
    )
    T, ntime = 20.0, 100
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=6, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * 0.05),
        ) for _ in range(2)
    )
    V = gates.assemble_gate(gates.cnot(), nlevels, Ne, [0.0, 0.0], T)
    return Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        oscillators=oscs, ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis", target_type="gate", target_gate_full=V,
        objective_type=objective, gamma_tik=1e-4, gamma_penalty=0.1,
        penalty_param=penalty_param,
        gamma_penalty_dpdm=0.0 if lindblad else 0.01,
        gamma_penalty_energy=0.1,
    )


@pytest.mark.parametrize("lindblad,penalty_param", [
    (False, 0.0), (False, 0.5), (True, 0.0),
])
def test_tp_matches_scan(lindblad, penalty_param):
    base = _setup(lindblad, penalty_param=penalty_param)
    s_scan = dataclasses.replace(base, time_parallel=False)
    s_tp = dataclasses.replace(base, time_parallel=True)

    rng = np.random.default_rng(11)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.01)

    p_scan = Problem(s_scan)
    p_tp = Problem(s_tp)
    assert not p_scan.time_parallel
    assert p_tp.time_parallel

    (J1, a1), g1 = jax.value_and_grad(p_scan.objective, has_aux=True)(params, params)
    (J2, a2), g2 = jax.value_and_grad(p_tp.objective, has_aux=True)(params, params)
    assert abs(float(J1) - float(J2)) < 1e-10, (float(J1), float(J2))
    for k in a1:
        assert abs(float(a1[k]) - float(a2[k])) < 1e-10, (k, float(a1[k]), float(a2[k]))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7, atol=1e-12)

    # trajectories agree too
    t1 = np.asarray(p_scan.propagate_trajectory(params))
    t2 = np.asarray(p_tp.propagate_trajectory(params))
    assert np.abs(t1 - t2).max() < 1e-10
