#!/usr/bin/env python
"""Sublane-occupancy / grid-floor experiment (VERDICT round-3 item 10).

Two open questions from the round-3 headline kernel (flagship E=128
packed ensemble, B=4 inits padded to Bp=8 sublanes, Tc=8 grid blocking):

1. Is the ~0.36 us/grid-step machinery floor reducible by DEEPER Tc?
   The packed kernels pick Tc = largest divisor of ntime <= 8; this
   probe sweeps Tc in {1, 2, 4, 8, 16, 24, 32} on the REAL flagship
   workload (B=4-init CNOT ensemble sweep) and reports sweeps/s per Tc.
2. Does a B=8 workload (full sublane occupancy — 8 inits instead of the
   flagship's 4-padded-to-8) get 2x the per-init throughput, i.e. is
   the padding half of every sublane row free or paid?

Reproduce: timeout 1800 python scripts/perf/sublane_occupancy_probe.py
Writes one JSON line per experiment.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/quandary_bench_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import build_problem
    import quandary_tpu.ops.pallas_stream as ps

    E, reps = 32, 8

    def measure(problem, setup, label):
        ref = jnp.zeros((setup.nparams,), jnp.float32)
        rng = np.random.default_rng(7)
        Ps = jnp.asarray(rng.uniform(-1, 1, (reps, E, setup.nparams)) * 0.005,
                         jnp.float32)
        freps = problem.build_ensemble_sweeps()
        _ = float(freps(Ps, ref))
        t0 = time.perf_counter()
        for _i in range(3):
            _ = float(freps(Ps, ref))
        rate = 3 * reps * E / (time.perf_counter() - t0)
        return rate

    # --- experiment 1: Tc sweep on the flagship (B=4 inits) ---
    tc_orig = ps.tc_for
    results = {}
    for tc in (1, 3, 11, 33):   # divisors of the flagship's ntime=1221
        ps.tc_for = lambda nsteps, _tc=tc: (_tc if nsteps % _tc == 0
                                            else tc_orig(nsteps))
        problem, setup = build_problem(pallas="auto", linsolver="split",
                                       linsolve_iters=3)
        # flagship ntime=1221 = 3*11*37: only Tc in {1, 3, 11, 33} divide;
        # round to a dividing Tc so the override actually applies
        nt = setup.ntime
        tc_eff = tc if nt % tc == 0 else tc_orig(nt)
        rate = measure(problem, setup, f"tc{tc}")
        results[f"tc_{tc}"] = {"tc_effective": tc_eff,
                               "sweeps_per_s": round(rate, 1)}
        print(json.dumps({"experiment": "tc_sweep", "tc": tc,
                          "tc_effective": tc_eff,
                          "sweeps_per_s": round(rate, 1)}), flush=True)
    ps.tc_for = tc_orig

    # --- experiment 2: sublane occupancy at the KERNEL level ---
    # flagship geometry (N=16, G=8 packed candidates, ntime=1221, split,
    # iters=3), x0 batch B in {4 (flagship, padded to 8 sublanes), 8
    # (full sublanes), 16}. If the B=8 sweep costs the same wall time as
    # B=4, the padding rows are pure waste and a full-occupancy workload
    # gets 2x the per-init throughput for free.
    problem, setup = build_problem(pallas="auto", linsolver="split",
                                   linsolve_iters=3)
    eng = problem.engine
    stack = np.asarray(eng.stack)
    K, N, _ = stack.shape
    gd = problem.gen_diag
    rng = np.random.default_rng(3)
    Cg = jnp.asarray(rng.uniform(-1, 1, (setup.ntime, 8, K)) * 0.01,
                     jnp.float32).at[:, :, 0].set(1.0)
    for B in (4, 8, 16):
        # real_io: complex-free device program (relay-robust; the fused
        # kernels are f32-native anyway)
        prop = ps.make_streamk_packed_propagate(
            stack.astype(np.complex64), setup.dt, 3, gen_diag=gd,
            linsolver="split", group=8, real_io=True)
        x0 = (rng.normal(size=(B, N)) + 1j * rng.normal(size=(B, N))
              ).astype(np.complex64)
        x0 = x0 / np.linalg.norm(x0, axis=1, keepdims=True)
        x0p = (jnp.asarray(x0.real.astype(np.float32)),
               jnp.asarray(x0.imag.astype(np.float32)))
        Sr = jnp.asarray(eng.pallas_Sr)
        Si = jnp.asarray(eng.pallas_Si)

        def sweep(x0j, Cj):
            def loss(Cj2):
                (xTr, xTi), (hr, hi) = prop(Sr, Si, x0j, Cj2)
                return (jnp.sum(xTr ** 2 + xTi ** 2)
                        + 1e-6 * jnp.sum(hr[-1] ** 2 + hi[-1] ** 2))
            return jax.value_and_grad(loss)(Cj)

        def many(x0j, Cj):
            def body(acc, _):
                v, g = sweep(x0j, Cj)
                return acc + v + jnp.sum(g), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=reps)
            return out

        fm = jax.jit(many)
        _ = float(fm(x0p, Cg))
        t0 = time.perf_counter()
        for _i in range(3):
            _ = float(fm(x0p, Cg))
        per_sweep_ms = (time.perf_counter() - t0) / (3 * reps) * 1e3
        print(json.dumps({
            "experiment": "sublane_occupancy", "B": B, "N": N,
            "G": 8, "ms_per_packed_sweep": round(per_sweep_ms, 3),
            "ms_per_init": round(per_sweep_ms / B, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
