#!/usr/bin/env python
"""Open-system (Lindblad) fused-kernel benchmark: the CNOT flagship with
T1/T2 collapse — vec(rho) dimension N^2 = 256, 16 basis density matrices,
full gradient sweeps. Compares the streamed Pallas path against the XLA
scan path on the attached TPU.

    timeout 900 python scripts/perf/lindblad_pallas_bench.py pallas
    timeout 900 python scripts/perf/lindblad_pallas_bench.py streamk
    timeout 900 python scripts/perf/lindblad_pallas_bench.py scan

'streamk' = in-kernel plane contraction (make_streamk_propagate): the
(ntime, 256, 256) pseudo-Hamiltonian plane arrays (~320 MB forward +
~320 MB cotangent per sweep) never touch HBM — the round-2 profile
attributed most of the open-system fused path's 30x-vs-closed gap to
exactly that glue.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build(pallas, guards=False):
    import jax.numpy as jnp
    from quandary_tpu.models import gates
    from quandary_tpu.models.hamiltonian import build_standard_model
    from quandary_tpu.problem import Problem, Setup
    from quandary_tpu.utils.splines import ControlSegment, OscillatorControl

    # guards=True: the GUARDED open flagship — N = 4x4 = 16, vec(rho)
    # dim 256 -> P = 256 plane padding (the configuration behind the
    # round-2 "open is 30x slower than closed" finding)
    Ne, Ng = [2, 2], ([2, 2] if guards else [0, 0])
    nlevels = [e + g for e, g in zip(Ne, Ng)]
    freq01 = [4.80595, 4.8601]
    model = build_standard_model(
        nlevels=nlevels, freq01_ghz=freq01, rotfreq_ghz=freq01,
        selfkerr_ghz=[0.2198, 0.2252], jkl_ghz=[0.005], crosskerr_ghz=[],
        decay_time=[80.0, 90.0], dephase_time=[40.0, 45.0], lindblad=True)
    T, ntime = 200.0, 1221
    oscs = tuple(
        OscillatorControl(
            segments=(ControlSegment("spline", nsplines=30, tstart=0.0,
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
        dtype=jnp.complex64, linsolve_iters=8, pallas=pallas,
        time_parallel=False)
    return setup


def main(mode):
    import jax
    import jax.numpy as jnp
    from quandary_tpu.problem import Problem

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    guards = mode.endswith("-guarded")
    mode = mode.replace("-guarded", "")
    setup = build(pallas=False if mode == "scan" else "auto", guards=guards)
    if mode == "streamk":
        setup = dataclasses.replace(setup, pallas_mode="streamk")
    problem = Problem(setup)
    if mode != "scan":
        assert problem.use_pallas, "lindblad fused path not eligible?"
    vg = problem.build_value_and_grad()
    params = jnp.asarray(np.random.default_rng(1234).uniform(
        -1, 1, setup.nparams) * 0.005, dtype=jnp.float32)

    t0 = time.perf_counter()
    (J, aux), g = vg(params, params)
    _ = float(J)
    compile_s = time.perf_counter() - t0
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        (J, aux), g = vg(params + 1e-6 * i, params)
        _ = float(J)
    rate = n / (time.perf_counter() - t0)

    # pipelined: reps scanned inside one jit, one fetch (chip rate)
    reps = 6
    Ps = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (reps, 1, setup.nparams)) * 0.005, dtype=jnp.float32)
    freps = problem.build_ensemble_sweeps()
    _ = float(freps(Ps, params))
    t0 = time.perf_counter()
    for _i in range(3):
        _ = float(freps(Ps, params))
    rate_pipe = 3 * reps / (time.perf_counter() - t0)

    print(json.dumps({
        "mode": mode, "device": jax.devices()[0].platform,
        "dim": problem.N * problem.N, "ninit": problem.ninit,
        "compile_s": round(compile_s, 1),
        "gradient_sweeps_per_s": round(rate, 3),
        "pipelined_sweeps_per_s": round(rate_pipe, 3), "J": float(J),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pallas")
