#!/usr/bin/env python
"""Compare the grid-streamed fused kernels (ops/pallas_stream.py) against
the chunked multi-step kernels (ops/pallas_adjoint.py) on the CNOT flagship
workload, on the attached TPU. Run each mode in a FRESH process (relay
discipline):

    timeout 900 python scripts/perf/pallas_stream_bench.py stream
    timeout 900 python scripts/perf/pallas_stream_bench.py chunk
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(mode: str):
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import build_problem
    from quandary_tpu.problem import Problem

    problem, setup = build_problem(pallas="auto")
    if mode == "split":
        # diagonally-split stepper in-kernel: exact diagonal rotation +
        # plain Neumann on the off-diagonal remainder at 4 iterations
        # (truncation (dt/2 |V|)^5 ~ 1e-11 on this workload)
        setup = dataclasses.replace(setup, linsolver="split",
                                    linsolve_iters=4)
        problem = Problem(setup)
    elif mode != "stream":
        problem = Problem(dataclasses.replace(setup, pallas_mode=mode))
    assert problem.use_pallas, "pallas path not eligible?"

    vg = problem.build_value_and_grad()
    params = jnp.asarray(np.random.default_rng(1234).uniform(
        -1, 1, setup.nparams) * 0.005, dtype=jnp.float32)

    t0 = time.perf_counter()
    (J, aux), g = vg(params, params)
    _ = float(J)
    compile_s = time.perf_counter() - t0

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        (J, aux), g = vg(params + 1e-6 * i, params)
        _ = float(J)
    single = n / (time.perf_counter() - t0)

    E = 16
    evg = problem.build_ensemble_value_and_grad()
    rng = np.random.default_rng(7)
    P = jnp.asarray(rng.uniform(-1, 1, (E, setup.nparams)) * 0.005,
                    dtype=jnp.float32)
    (Je, _), _ = evg(P, params)
    _ = float(Je[0])
    n = 6
    t0 = time.perf_counter()
    for _i in range(n):
        P = jnp.asarray(rng.uniform(-1, 1, (E, setup.nparams)) * 0.005,
                        dtype=jnp.float32)
        (Je, _), _ = evg(P, params)
        _ = float(Je[0])
    ens = n * E / (time.perf_counter() - t0)

    print(json.dumps({
        "mode": mode, "device": jax.devices()[0].platform,
        "compile_s": round(compile_s, 1),
        "single_sweeps_per_s": round(single, 2),
        "ensemble_sweeps_per_s": round(ens, 2),
        "J": float(J),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "stream")
