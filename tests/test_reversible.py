"""Reversible O(1)-memory adjoint vs remat AD: gradients must agree to the
stage-solve tolerance for Schroedinger problems with leakage + weighted-J
penalties, for IMR and IMR4."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models import gates
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _setup(timestepper="IMR", penalty_param=0.5):
    Ne = [2, 2]
    Ng = [1, 0]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.8, 5.1]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=[4.79, 5.09],
        selfkerr_ghz=[0.22, 0.25], crosskerr_ghz=[0.01], jkl_ghz=[0.005],
    )
    T, ntime = 10.0, 80
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=5, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * 0.05),
        ) for _ in range(2)
    )
    V = gates.assemble_gate(gates.cnot(), nlevels, Ne, [0.0, 0.0], T)
    return Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        oscillators=oscs, ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis", target_type="gate", target_gate_full=V,
        objective_type="Jtrace", gamma_tik=1e-4, gamma_penalty=0.1,
        penalty_param=penalty_param, gamma_penalty_dpdm=0.0,
        gamma_penalty_energy=0.1, timestepper=timestepper,
        time_parallel=False, linsolve_iters=25,
    )


@pytest.mark.parametrize("stepper", ["IMR", "IMR4", "IMR8"])
def test_reversible_matches_remat(stepper):
    base = _setup(timestepper=stepper)
    s_rev = dataclasses.replace(base, adjoint="reversible")
    s_remat = dataclasses.replace(base, adjoint="remat")
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.normal(size=base.nparams) * 0.01)

    p_rev = Problem(s_rev)
    p_remat = Problem(s_remat)
    (J1, a1), g1 = jax.value_and_grad(p_rev.objective, has_aux=True)(params, params)
    (J2, a2), g2 = jax.value_and_grad(p_remat.objective, has_aux=True)(params, params)
    assert abs(float(J1) - float(J2)) < 1e-11
    for k in a1:
        assert abs(float(a1[k]) - float(a2[k])) < 1e-11, k
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-7, atol=1e-11)
