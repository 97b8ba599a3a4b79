"""Central finite-difference check of the AD gradient of the full objective
(mirrors the reference's compile-time TEST_FD_GRAD harness, main.cpp:490-542).

Covers: Schroedinger gate optimization with guard levels, all penalty terms,
Tikhonov, JC coupling, multiple carrier waves; and a Lindblad case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models import gates
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _make_setup(lindblad=False, objective="Jtrace", guard=True):
    Ne = [2, 2]
    Ng = [1, 0] if guard else [0, 0]
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.8, 5.1]
    rotfreq = freq01
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=[4.79, 5.09],
        selfkerr_ghz=[0.22, 0.25], crosskerr_ghz=[0.01], jkl_ghz=[0.005],
        decay_time=[100.0, 80.0] if lindblad else [],
        dephase_time=[50.0, 60.0] if lindblad else [],
        lindblad=lindblad,
    )
    T = 20.0
    ntime = 200
    oscillators = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=6, tstart=0.0, tstop=T),),
            carrier_freqs=(0.0, 2 * np.pi * 0.05),
            enforce_bc=False,
        )
        for _ in range(2)
    )
    V = gates.assemble_gate(gates.cnot(), nlevels, Ne, [0.0, 0.0], T)
    return Setup(
        model=model,
        nessential=tuple(Ne),
        ntime=ntime,
        dt=T / ntime,
        oscillators=oscillators,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="basis",
        target_type="gate",
        target_gate_full=V,
        objective_type=objective,
        gamma_tik=1e-4,
        gamma_penalty=0.1 if guard else 0.0,
        penalty_param=0.0,
        gamma_penalty_dpdm=0.0 if lindblad else 0.01,
        gamma_penalty_energy=0.1,
        gamma_penalty_variation=0.0,
    )


@pytest.mark.parametrize("lindblad,objective", [
    (False, "Jtrace"),
    (False, "Jfrobenius"),
    (True, "Jtrace"),
])
def test_fd_gradient(lindblad, objective):
    setup = _make_setup(lindblad=lindblad, objective=objective)
    prob = Problem(setup)
    rng = np.random.default_rng(42)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.01)
    ref = jnp.zeros_like(params)

    vg = prob.build_value_and_grad()
    (J0, aux), g = vg(params, ref)
    g = np.asarray(g)

    obj = prob.build_objective()
    eps = 1e-6
    idxs = rng.choice(setup.nparams, size=8, replace=False)
    for i in idxs:
        e = np.zeros(setup.nparams)
        e[i] = eps
        Jp, _ = obj(params + e, ref)
        Jm, _ = obj(params - e, ref)
        fd = (float(Jp) - float(Jm)) / (2 * eps)
        err = abs(fd - g[i])
        assert err < 1e-5 * max(abs(fd), 1.0) + 1e-9, (i, fd, g[i], err)


def test_fd_gradient_jmeasure_pure():
    """Jmeasure with pure target + weighted-J penalty integral (the
    AxC_grad_schroedinger configuration class)."""
    Ne = [3]
    model = build_standard_model(
        nlevels=Ne, freq01_ghz=[4.4], rotfreq_ghz=[4.4], selfkerr_ghz=[0.23],
    )
    T, ntime = 10.0, 100
    osc = OscillatorControl(
        segments=(ControlSegment("spline", nsplines=8, tstart=0.0, tstop=T),),
        carrier_freqs=(0.0, -2 * np.pi * 0.23),
        enforce_bc=True,
    )
    setup = Setup(
        model=model, nessential=(3,), ntime=ntime, dt=T / ntime,
        oscillators=(osc,), ground_freqs_radns=(2 * np.pi * 4.4,),
        initcond_type="pure", pure_levels=(2,),
        target_type="pure", pure_target_levels=(0,),
        objective_type="Jmeasure",
        gamma_tik=1e-5, gamma_penalty=1.0, penalty_param=0.5,
        gamma_penalty_dpdm=0.1, gamma_penalty_energy=0.1,
    )
    prob = Problem(setup)
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.normal(size=setup.nparams) * 0.02)
    ref = jnp.zeros_like(params)
    (J0, aux), g = prob.build_value_and_grad()(params, ref)
    g = np.asarray(g)
    obj = prob.build_objective()
    eps = 1e-6
    for i in rng.choice(setup.nparams, size=6, replace=False):
        e = np.zeros(setup.nparams)
        e[i] = eps
        Jp, _ = obj(params + e, ref)
        Jm, _ = obj(params - e, ref)
        fd = (float(Jp) - float(Jm)) / (2 * eps)
        err = abs(fd - g[i])
        assert err < 1e-5 * max(abs(fd), 1.0) + 1e-9, (i, fd, g[i], err)
