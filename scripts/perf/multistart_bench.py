#!/usr/bin/env python
"""On-device multi-start optimization benchmark: E random control starts of
the CNOT flagship refined SIMULTANEOUSLY by the batched projected L-BFGS
(optim/batched_lbfgs.py) — the whole population optimization is ONE jit
call (lax.scan over iterations, parallel backtracking line search), so the
wall time is pure chip time plus a single dispatch.

This is the optimizer counterpart of the ensemble-throughput headline: the
reference optimizes one candidate per TAO process; here a population rides
the same GEMMs.

    timeout 1800 python scripts/perf/multistart_bench.py [E] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(E=16, iters=60):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import build_problem
    from quandary_tpu.optim.batched_lbfgs import batched_lbfgsb

    problem, setup = build_problem(pallas="auto", linsolver="split",
                                   linsolve_iters=3)
    ref = jnp.zeros((setup.nparams,), jnp.float32)

    def objective(x):
        J, _ = problem.objective(x, ref)
        return J

    grad = jax.grad(objective)

    # reference-style bound box (maxctrl ~15 MHz class)
    bound = 15e-3 * 2 * np.pi / np.sqrt(2.0) / 2.0 * 3.0
    lb = -bound * np.ones(setup.nparams, np.float32)
    ub = bound * np.ones(setup.nparams, np.float32)
    rng = np.random.default_rng(1234)
    x0s = jnp.asarray(rng.uniform(-1, 1, (E, setup.nparams)) * 0.03,
                      jnp.float32)

    # lane-packed group kernels: G candidates per MXU issue (round 3)
    kw = problem.packed_batch_fns(ref)
    run = problem._wrap_with_data(
        lambda xs: batched_lbfgsb(objective, grad, xs, lb, ub,
                                  iters=iters, ls_lengths=8,
                                  return_stats=True, **kw))
    t0 = time.perf_counter()
    xb, fb, tr, stats = run(x0s)
    fb = np.asarray(fb)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    xb, fb, tr, stats = run(x0s)
    fb = np.asarray(fb)
    tr = np.asarray(tr)
    nladder = int(stats["ladder_iters"])
    warm = time.perf_counter() - t0

    # Delivered-throughput accounting (VERDICT round-3 item 4): with the
    # round-5 SPECULATIVE per-candidate step scale, every post-warmup
    # L-BFGS iteration costs exactly ONE batched value_and_grad; only the
    # `ladder_iters` warmup iterations run the 8-trial backtracking ladder
    # (8 forward programs each, on top of their gradient). A forward eval
    # costs ~1/3 of a gradient sweep, so the conservative aggregate counts
    # gradient sweeps alone and the equivalent adds the ladder work.
    grad_sweeps = E * (iters + 1)
    fwd_evals = E * 8 * nladder
    # time to best-so-far population minimum crossing 1e-3 objective
    best_so_far = np.minimum.accumulate(tr.min(axis=1))
    hit = np.argmax(best_so_far < 1e-3) if (best_so_far < 1e-3).any() else -1
    per_iter = warm / iters

    # infidelity of the best candidate (jitted: eager evaluation would run
    # thousands of tiny ops through the relay)
    obj_c = problem.build_objective()
    (J, aux) = obj_c(jnp.asarray(xb[int(np.argmin(fb))]), ref)
    print(json.dumps({
        "device": jax.devices()[0].platform, "E": E, "iters": iters,
        "compile_and_run_s": round(compile_and_run, 1),
        "warm_wall_s": round(warm, 1),
        "agg_gradient_sweeps_per_s": round(grad_sweeps / warm, 1),
        "agg_sweep_equiv_per_s": round(
            (grad_sweeps + fwd_evals / 3.0) / warm, 1),
        "ladder_iters": nladder,
        "rejected_cand_iters": int(stats.get("rejected", 0)),
        "iters_to_obj_1e-3": int(hit),
        "time_to_obj_1e-3_s": (round(float(hit) * per_iter, 3)
                               if hit >= 0 else None),
        "best_objective": float(np.min(fb)),
        "best_infidelity": float(1.0 - float(aux["fidelity"])),
        "objectives_quartiles": [float(q) for q in
                                 np.percentile(fb, [0, 25, 50, 75, 100])],
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         int(sys.argv[2]) if len(sys.argv) > 2 else 60)
