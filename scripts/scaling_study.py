#!/usr/bin/env python
"""Mesh scaling study — the counterpart of the reference's
submit_scalingstudy.py (SLURM strong-scaling driver): measures gradient-sweep
throughput across ('init' x 'hilbert') mesh shapes on the available devices.

Run with real chips, or on a virtual CPU mesh:
    QUANDARY_SCALING_CPU=8 python scripts/scaling_study.py
(The env-var route — JAX_PLATFORMS=cpu — is overridden by site config on
this machine; only the in-process config.update below reliably selects CPU,
so the virtual mesh is requested via QUANDARY_SCALING_CPU.)
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

_ncpu = os.environ.get("QUANDARY_SCALING_CPU")
if _ncpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(_ncpu))
import jax.numpy as jnp
import numpy as np


def _time_sweeps(problem, setup, mesh, n=10):
    vg = jax.jit(jax.value_and_grad(problem.objective, has_aux=True))
    params = jnp.zeros((setup.nparams,), dtype=jnp.float32)
    with mesh:
        (J, aux), g = vg(params, params)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for i in range(n):
            (J, aux), g = vg(params + 1e-6 * i, params)
            _ = float(J)
        dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def _report(name, results):
    base = results[0][2]
    print(f"\n{name} speedup vs (1,1):")
    for ni, nh, r in results:
        print(f"  ({ni},{nh}): {r/base:.2f}x")


def main():
    from __graft_entry__ import _build_grouped_problem, _build_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    ndev = len(jax.devices())
    print(f"devices: {ndev}")
    shapes = []
    for ninit in [1, 2, 4, 8]:
        for nh in [1, 2]:
            if ninit * nh <= ndev:
                shapes.append((ninit, nh))

    # Dense Lindblad flagship: B = N^2 inits over 'init', rho columns over
    # 'hilbert'.
    dense = []
    for (ni, nh) in shapes:
        problem, setup = _build_problem(ntime=64, T=4.0, lindblad=True)
        mesh = make_mesh(ni, nh)
        shard_problem(problem, mesh, shard_hilbert=(nh > 1))
        r = _time_sweeps(problem, setup, mesh)
        dense.append((ni, nh, r))
        print(f"dense   mesh init={ni} hilbert={nh}: {r:.2f} sweeps/s")

    # Grouped large-N-class engine (the comm_petsc analog): state (B, m1, m2)
    # with the m1 row-group axis over 'hilbert'. B=nlev inits over 'init'.
    grouped = []
    for (ni, nh) in shapes:
        if ni > 4:
            continue  # B = nlev = 4 initial states: init axis caps at 4
        problem, setup = _build_grouped_problem(nlev=4, ntime=24, T=2.4)
        mesh = make_mesh(ni, nh)
        shard_problem(problem, mesh, shard_hilbert=(nh > 1))
        r = _time_sweeps(problem, setup, mesh)
        grouped.append((ni, nh, r))
        print(f"grouped mesh init={ni} hilbert={nh}: {r:.2f} sweeps/s")

    _report("dense", dense)
    _report("grouped", grouped)


if __name__ == "__main__":
    main()
