"""Measure the lane-packed streamK ensemble path on the flagship CNOT
workload (bench.py build_problem): pipelined gradient sweeps/s at several
ensemble sizes, packed vs per-candidate kernels.

Usage: python scripts/perf/packed_bench.py [packed|unpacked] [E] [reps]
(defaults: packed 32 6). Uses the shared bench compilation cache.
"""

import json
import sys
import time

import numpy as np


def main(mode="packed", E=32, reps=6):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import build_problem

    problem, setup = build_problem(pallas="auto", linsolver="split",
                                   linsolve_iters=2)
    assert problem.use_pallas, "fused path not active"
    if mode == "unpacked":
        # disable packing for THIS instance only: reassign its class to a
        # one-off subclass overriding the property (mutating the shared
        # Problem class would silently affect every later instance)
        problem.__class__ = type(
            "UnpackedProblem", (type(problem),),
            {"pack_eligible": property(lambda self: False)})
    print(f"pack_group={problem.pack_group} E={E} reps={reps}", flush=True)

    rng = np.random.default_rng(7)
    Ps = jnp.asarray(rng.uniform(-1, 1, (reps, E, setup.nparams)) * 0.005,
                     dtype=jnp.float32)
    params = jnp.zeros((setup.nparams,), jnp.float32)
    f = problem.build_ensemble_sweeps()
    t0 = time.perf_counter()
    _ = float(f(Ps, params))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    n_timed = 3
    for _i in range(n_timed):
        _ = float(f(Ps, params))
    dt_ = time.perf_counter() - t0
    rate = n_timed * reps * E / dt_
    print(json.dumps({"mode": mode, "E": E, "reps": reps,
                      "sweeps_per_s": round(rate, 1),
                      "s_per_call": round(dt_ / n_timed, 3)}))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "packed",
         int(a[1]) if len(a) > 1 else 32,
         int(a[2]) if len(a) > 2 else 6)
