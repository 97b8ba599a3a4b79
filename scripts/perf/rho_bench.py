#!/usr/bin/env python
"""Mid-size OPEN-system benchmark: the density-matrix-form fused kernel
(ops/pallas_rho.py) vs the XLA scan engine (VERDICT round-3 item 1).

Workloads: a 3-qutrit-class open system (3x3x3 levels, N = 27, superop
dimension 729) and a two-qudit N = 64 system (8x8), both with T1/T2
collapse, '3states' initial conditions (the reference's reduced Lindblad
basis, optimtarget.cpp:495-540), full gradient sweeps:

    timeout 1800 python scripts/perf/rho_bench.py rho 27
    timeout 1800 python scripts/perf/rho_bench.py scan 27
    timeout 1800 python scripts/perf/rho_bench.py rho 64
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build(pallas, N, pallas_rho="auto"):
    import jax.numpy as jnp
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    cfg = {
        27: dict(nlevels=[3, 3, 3], freq01=[4.80595, 4.8601, 4.9],
                 selfkerr=[0.2198, 0.2252, 0.22], jkl=[0.005, 0.0, 0.004],
                 decay=[80.0, 90.0, 85.0], dephase=[40.0, 45.0, 42.0]),
        64: dict(nlevels=[8, 8], freq01=[4.80595, 4.8601],
                 selfkerr=[0.2198, 0.2252], jkl=[0.005],
                 decay=[80.0, 90.0], dephase=[40.0, 45.0]),
    }[N]
    nlevels = cfg["nlevels"]
    freq01 = cfg["freq01"]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=cfg["selfkerr"], jkl_ghz=cfg["jkl"], crosskerr_ghz=[],
        decay_time=cfg["decay"], dephase_time=cfg["dephase"], lindblad=True)
    T, ntime = 100.0, 1000
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=20, tstart=0.0,
                                     tstop=T),),
            carrier_freqs=(0.0,),
        ) for _ in range(len(nlevels)))
    rng = np.random.default_rng(42)
    # random pure target state (state preparation under dissipation)
    tgt = rng.normal(size=N) + 1j * rng.normal(size=N)
    tgt = tgt / np.linalg.norm(tgt)
    tgt_dm = np.outer(tgt, tgt.conj())
    return Setup(
        model=model, nessential=tuple(nlevels), ntime=ntime, dt=T / ntime,
        oscillators=oscs,
        ground_freqs_radns=tuple(2 * np.pi * f for f in freq01),
        initcond_type="3states", target_type="state",
        target_state_full=tgt_dm,
        objective_type="Jtrace", gamma_tik=1e-4,
        dtype=jnp.complex64, linsolve_iters=6, pallas=pallas,
        pallas_rho=pallas_rho, time_parallel=False)


def main(mode, N):
    import jax
    import jax.numpy as jnp
    from quandary_tpu.problem import Problem

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    setup = build(pallas=False if mode == "scan" else "auto", N=N,
                  pallas_rho="rho" if mode == "rho" else "auto")
    problem = Problem(setup)
    if mode == "rho":
        assert problem.use_pallas and problem.pallas_form == "rho", \
            (problem.use_pallas, getattr(problem, "pallas_form", None))
    vg = problem.build_value_and_grad()
    params = jnp.asarray(np.random.default_rng(1234).uniform(
        -1, 1, setup.nparams) * 0.005, dtype=jnp.float32)

    t0 = time.perf_counter()
    (J, aux), g = vg(params, params)
    _ = float(J)
    compile_s = time.perf_counter() - t0
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        (J, aux), g = vg(params + 1e-6 * i, params)
        _ = float(J)
    rate = n / (time.perf_counter() - t0)

    reps = int(os.environ.get("QTPU_BENCH_REPS", "8"))
    Ps = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (reps, 1, setup.nparams)) * 0.005, dtype=jnp.float32)
    freps = problem.build_ensemble_sweeps()
    _ = float(freps(Ps, params))
    t0 = time.perf_counter()
    for _i in range(3):
        _ = float(freps(Ps, params))
    rate_pipe = 3 * reps / (time.perf_counter() - t0)

    print(json.dumps({
        "mode": mode, "device": jax.devices()[0].platform, "N": N,
        "superop_dim": N * N, "ninit": problem.ninit,
        "rho_group": getattr(problem, "_rho_group", None),
        "linsolver": problem.linsolver,
        "compile_s": round(compile_s, 1),
        "gradient_sweeps_per_s": round(rate, 3),
        "pipelined_sweeps_per_s": round(rate_pipe, 3),
        "J": float(J), "gnorm": float(jnp.linalg.norm(g)),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "rho",
         int(sys.argv[2]) if len(sys.argv) > 2 else 27)
