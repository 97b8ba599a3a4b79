#!/usr/bin/env python
"""Accuracy of the fused TPU propagation vs an f64 CPU ground truth on the
CNOT flagship objective, per in-kernel matmul precision setting.

Run each mode in a fresh process (the precision knob is read at import):

    QTPU_PALLAS_PRECISION=high    python scripts/perf/pallas_precision_check.py tpu
    QTPU_PALLAS_PRECISION=highest python scripts/perf/pallas_precision_check.py tpu
    python scripts/perf/pallas_precision_check.py cpu64   # writes the truth file

Reports |J - J64| and the relative gradient error — the quantities that
bound optimization quality (quasi-Newton methods tolerate ~1e-3 relative
gradient noise; final-infidelity reporting needs |dJ| below the 1e-4
scale).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

TRUTH = "/tmp/quandary_precision_truth_{}.npz"


def main(mode: str, linsolver: str = "jacobi"):
    import jax

    if mode == "cpu64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import dataclasses
    from bench import build_problem
    from quandary_tpu.problem import Problem

    kw = {} if linsolver == "jacobi" else dict(linsolver="split",
                                               linsolve_iters=4)
    problem, setup = build_problem(pallas="auto", **kw)
    if mode == "cpu64":
        setup = dataclasses.replace(setup, dtype=jnp.complex128, pallas=False)
        problem = Problem(setup)

    vg = problem.build_value_and_grad()
    params = jnp.asarray(np.random.default_rng(1234).uniform(
        -1, 1, setup.nparams) * 0.005,
        dtype=jnp.float64 if mode == "cpu64" else jnp.float32)
    (J, aux), g = vg(params, params)
    J = float(J)
    g = np.asarray(g, dtype=np.float64)

    if mode == "cpu64":
        np.savez(TRUTH.format(linsolver), J=J, g=g)
        print(json.dumps({"mode": "cpu64", "J": J, "gnorm": float(np.linalg.norm(g))}))
        return

    t = np.load(TRUTH.format(linsolver))
    J64, g64 = float(t["J"]), t["g"]
    rel_g = float(np.linalg.norm(g - g64) / np.linalg.norm(g64))
    print(json.dumps({
        "mode": mode, "linsolver": linsolver,
        "precision": os.environ.get("QTPU_PALLAS_PRECISION", "high"),
        "engine": "pallas-fused" if problem.use_pallas else "xla-scan",
        "J": J, "dJ_vs_f64": J - J64, "rel_grad_err": rel_g,
        "fidelity": float(aux["fidelity"]),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tpu",
         sys.argv[2] if len(sys.argv) > 2 else "jacobi")
