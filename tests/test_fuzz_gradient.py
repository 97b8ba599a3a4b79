"""Property-based cross-feature check: random small configurations
(dimensions, objectives, initial conditions, penalties, steppers, engines)
must all produce FD-consistent gradients. Catches interactions no individual
feature test covers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quandary_tpu.models import gates
from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.tensor_rhs import build_structured_model
from quandary_tpu.problem import Problem, Setup
from quandary_tpu.utils.splines import ControlSegment, OscillatorControl


def _random_setup(rng):
    Q = int(rng.integers(1, 3))
    Ne = [int(rng.integers(2, 4)) for _ in range(Q)]
    Ng = [int(rng.integers(0, 2)) for _ in range(Q)]
    nlv = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.0 + 0.3 * k + rng.uniform(0, 0.05) for k in range(Q)]
    rot = [f - rng.uniform(0, 0.02) for f in freq01]
    lind = bool(rng.integers(0, 2))
    kwargs = dict(
        nlevels=nlv, freq01_ghz=freq01, rotfreq_ghz=rot,
        selfkerr_ghz=[rng.uniform(0.1, 0.3) for _ in range(Q)],
        crosskerr_ghz=[rng.uniform(0, 0.01) for _ in range(Q * (Q - 1) // 2)],
        jkl_ghz=[rng.uniform(0, 0.01) for _ in range(Q * (Q - 1) // 2)],
        decay_time=[rng.uniform(30, 80) for _ in range(Q)] if lind else [],
        dephase_time=[rng.uniform(20, 60) for _ in range(Q)] if lind else [],
        lindblad=lind,
    )
    structured = bool(rng.integers(0, 2)) and not lind
    model = (build_structured_model(**kwargs) if structured
             else build_standard_model(**kwargs))

    T = float(rng.uniform(4.0, 10.0))
    ntime = int(rng.integers(40, 90))
    # all four reference control-basis kinds (controlbasis.cpp:20-254):
    # spline/spline0 uniformly; spline_amplitude and step each on ~1/6 of
    # draws (the reference exits on spline_amplitude gradients,
    # oscillator.cpp:354 — here they must be FD-exact like the others)
    kinds = ["spline", "spline0", "spline", "spline0",
             "spline_amplitude", "step"]

    def _seg(kind):
        if kind == "step":
            return ControlSegment(
                "step", tstart=0.0, tstop=T,
                step_amp1=float(rng.uniform(0.01, 0.05)),
                step_amp2=float(rng.uniform(0.01, 0.05)),
                tramp=0.15 * T)
        return ControlSegment(kind, nsplines=int(rng.integers(4, 8)),
                              tstart=0.0, tstop=T,
                              scaling=float(rng.uniform(0.5, 2.0)))

    oscs = tuple(
        OscillatorControl(
            segments=(_seg(kinds[rng.integers(0, len(kinds))]),),
            carrier_freqs=tuple(2 * np.pi * rng.uniform(-0.1, 0.1)
                                for _ in range(int(rng.integers(1, 3)))),
            enforce_bc=bool(rng.integers(0, 2)),
        ) for _ in range(Q)
    )

    objective = ["Jtrace", "Jfrobenius", "Jmeasure"][int(rng.integers(0, 3))]
    if objective == "Jmeasure":
        target_type, pure_t = "pure", tuple(0 for _ in range(Q))
        tg = None
    else:
        if rng.integers(0, 2):
            target_type, pure_t, tg = "pure", tuple(0 for _ in range(Q)), None
        else:
            target_type, pure_t = "gate", None
            dim_ess = int(np.prod(Ne))
            tg = gates.assemble_gate(gates.qft(dim_ess), nlv, Ne,
                                     [0.0] * Q, T)
    ic_choices = ["basis", "diagonal", "pure"] + (["3states"] if lind else [])
    ic = ic_choices[int(rng.integers(0, len(ic_choices)))]

    return Setup(
        model=model, nessential=tuple(Ne), ntime=ntime, dt=T / ntime,
        timestepper=["IMR", "IMR4"][int(rng.integers(0, 2))],
        oscillators=oscs, ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type=ic,
        pure_levels=tuple(0 for _ in range(Q)) if ic == "pure" else None,
        target_type=target_type, target_gate_full=tg,
        pure_target_levels=pure_t,
        objective_type=objective,
        gamma_tik=10.0 ** rng.uniform(-6, -3),
        gamma_penalty=float(rng.uniform(0, 0.2)),
        penalty_param=float(rng.choice([0.0, 0.5])),
        gamma_penalty_dpdm=float(rng.uniform(0, 0.05)),
        gamma_penalty_energy=float(rng.uniform(0, 0.2)),
        gamma_penalty_variation=float(rng.uniform(0, 0.05)),
        time_parallel=bool(rng.integers(0, 2)) and "auto" or False,
        adjoint=["auto", "remat"][int(rng.integers(0, 2))],
        # a third of the draws force the diagonally-split stepper so the
        # fuzz covers split x {engines, objectives, penalties, initconds}
        linsolver=["neumann", "neumann", "split"][int(rng.integers(0, 3))],
    )


@pytest.mark.parametrize("seed", range(8))  # 4 draws spline_amplitude, 6 step
def test_fuzz_fd_gradient(seed):
    rng = np.random.default_rng(1000 + seed)
    setup = _random_setup(rng)
    prob = Problem(setup)
    params = np.asarray(rng.normal(size=setup.nparams) * 0.01)
    # 'step' width parameters live in [0,1] (fraction of the window) and
    # are vacuous near 0 (the ramp is clipped to empty below 2*tramp):
    # place them mid-window so the FD probes a live gradient
    off = 0
    for osc in setup.oscillators:
        nf = len(osc.carrier_freqs)
        for seg in osc.segments:
            n = seg.nparams_per_carrier() * nf
            if seg.kind == "step":
                params[off:off + n] = rng.uniform(0.4, 0.85, size=n)
            off += n
    params = jnp.asarray(params)
    ref = jnp.zeros_like(params)
    (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(params, ref)
    assert np.isfinite(float(J)), setup
    g = np.asarray(g)
    assert np.isfinite(g).all()

    obj = prob.build_objective()
    eps = 1e-6
    idxs = rng.choice(setup.nparams, size=min(4, setup.nparams), replace=False)
    for i in idxs:
        e = np.zeros(setup.nparams)
        e[i] = eps
        fd = (float(obj(params + e, ref)[0]) - float(obj(params - e, ref)[0])) / (2 * eps)
        err = abs(fd - g[i])
        assert err < 1e-5 * max(abs(fd), 1.0) + 2e-9, \
            (seed, i, fd, g[i], setup.objective_type, setup.initcond_type)
