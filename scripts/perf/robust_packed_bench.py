"""Robust (sampled-Hamiltonian) ensemble gradient throughput: 8 detuned
realizations of the flagship CNOT system, one shared control — packed
(all samples in ONE lane-packed kernel program per sweep,
optim/robust.build_packed_robust_objective) vs per-sample fused programs
(build_robust_objective).

Usage: python scripts/perf/robust_packed_bench.py [n_samples]
"""

import json
import sys
import time

import numpy as np


def main(S=8):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as B
    from quandary_tpu.optim.robust import (build_packed_robust_objective,
                                           build_robust_objective)

    # S detuned realizations of the flagship system (+-2 MHz qubit-frequency
    # spread), same control layout
    problems = []
    rng = np.random.default_rng(5)
    base0, base1 = 4.80595, 4.8601
    for s_i in range(S):
        d0, d1 = rng.uniform(-0.002, 0.002, 2)
        orig = B.build_problem

        def patched(pallas="auto", linsolver=None, linsolve_iters=None,
                    _d0=d0, _d1=d1):
            import quandary_tpu.models.hamiltonian as H
            real_build = H.build_standard_model

            def build2(**kw):
                kw = dict(kw)
                kw["freq01_ghz"] = [base0 + _d0, base1 + _d1]
                return real_build(**kw)

            H.build_standard_model, orig_b = build2, real_build
            try:
                return orig(pallas, linsolver, linsolve_iters)
            finally:
                H.build_standard_model = orig_b

        p, setup = patched(pallas="auto", linsolver="split",
                           linsolve_iters=3)
        problems.append(p)
    assert all(p.use_pallas for p in problems)

    params = jnp.zeros((setup.nparams,), jnp.float32)
    ref = jnp.zeros_like(params)

    def timed(obj, label, reps=24):
        vg = jax.value_and_grad(obj, has_aux=True)

        def many(x, r):
            def body(acc, _):
                (J, _a), g = vg(x, r)
                return (acc + J + jnp.sum(g)).astype(acc.dtype), None
            out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                  None, length=reps)
            return out

        f = problems[0]._wrap_with_data(many)
        _ = float(f(params, ref))
        t0 = time.perf_counter()
        for _i in range(3):
            _ = float(f(params, ref))
        dt = (time.perf_counter() - t0) / 3
        rate = reps / dt
        print(json.dumps({"mode": label, "samples": S,
                          "ensemble_sweeps_per_s": round(rate, 2),
                          "ms_per_ensemble_sweep": round(dt / reps * 1e3, 2)}),
              flush=True)
        return rate

    r_packed = timed(build_packed_robust_objective(problems), "packed")
    r_plain = timed(build_robust_objective(problems), "per-sample")
    print(json.dumps({"speedup": round(r_packed / r_plain, 2)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
