#!/usr/bin/env python
"""Probe the attached TPU relay's health in one shot.

The axon relay in this environment has two known degradation modes
(PERF.md "relay artifacts"): rejecting complex64 ops with UNIMPLEMENTED
while f32 still runs, and wedging entirely (every device op hangs). Run
this under `timeout` before trusting any on-chip measurement:

    timeout 120 python scripts/tpu_health.py
"""

import sys


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()}  device: {dev}")

    x = jnp.ones((128, 128), jnp.float32)
    print("f32 matmul:", "ok" if float((x @ x)[0, 0]) == 128.0 else "WRONG")

    try:
        c = jnp.ones((16, 16), jnp.complex64)
        _ = complex((c @ c)[0, 0])
        print("complex64: ok")
    except Exception as e:  # noqa: BLE001 - report any backend failure mode
        print(f"complex64: FAIL ({type(e).__name__}: {str(e)[:120]})")
        print("-> fused paths still run: real-glue mode keeps device "
              "programs complex-free (problem.real_glue)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
