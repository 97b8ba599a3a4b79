#!/usr/bin/env python
"""Mesh scaling study — the counterpart of the reference's
submit_scalingstudy.py (SLURM strong-scaling driver): measures gradient-sweep
throughput across ('init' x 'hilbert') mesh shapes on the available devices.

Run with real chips, or on a virtual CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_study.py
"""

import itertools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _build_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    ndev = len(jax.devices())
    print(f"devices: {ndev}")
    shapes = []
    for ninit in [1, 2, 4, 8]:
        for nh in [1, 2]:
            if ninit * nh <= ndev:
                shapes.append((ninit, nh))

    results = []
    for (ni, nh) in shapes:
        problem, setup = _build_problem(ntime=64, T=4.0, lindblad=True)
        mesh = make_mesh(ni, nh)
        shard_problem(problem, mesh, shard_hilbert=(nh > 1))
        vg = jax.jit(jax.value_and_grad(problem.objective, has_aux=True))
        params = jnp.zeros((setup.nparams,), dtype=jnp.float32)
        with mesh:
            (J, aux), g = vg(params, params)
            jax.block_until_ready(g)
            n = 10
            t0 = time.perf_counter()
            for i in range(n):
                (J, aux), g = vg(params + 1e-6 * i, params)
                _ = float(J)
            dt = (time.perf_counter() - t0) / n
        results.append((ni, nh, 1.0 / dt))
        print(f"mesh init={ni} hilbert={nh}: {1.0/dt:.2f} sweeps/s")

    base = results[0][2]
    print("\nspeedup vs (1,1):")
    for ni, nh, r in results:
        print(f"  ({ni},{nh}): {r/base:.2f}x")


if __name__ == "__main__":
    main()
