"""Device-mesh sharding: the TPU-native replacement for the reference's
3-way MPI communicator split (main.cpp:133-177).

Axes:
* ``init``    — data parallelism over initial conditions (comm_init). The
  propagation of different initial states is embarrassingly parallel; the
  objective/fidelity/gradient reductions become XLA `psum`s over this axis,
  inserted automatically by GSPMD from the sharding annotations.
* ``hilbert`` — state-dimension parallelism (comm_petsc). For the dense
  engine the state batch is sharded along its last axis and the H(t) matmuls
  become distributed GEMMs; for the tensor engine the largest tensor axis is
  sharded (see ops/tensor_rhs.py).

The reference's comm_optim (time parallelism) is stubbed at size 1 there
(main.cpp:140-143) and intentionally has no analog here; the time loop stays
sequential (lax.scan), as in the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_init: int, n_hilbert: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_init * n_hilbert
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    dev = np.asarray(devices[:need]).reshape(n_init, n_hilbert)
    return Mesh(dev, axis_names=("init", "hilbert"))


def shard_problem(problem, mesh: Mesh, shard_hilbert: bool = False):
    """Re-place a Problem's device arrays with mesh shardings.

    x0/targets: batch axis over 'init'; optionally the last state axis over
    'hilbert'. The operator stack is replicated (it is O(K N^2), small next
    to the batched states). Subsequent jitted computations on these inputs
    are partitioned by GSPMD with psum/all-gather inserted as needed.
    """
    state_rank = problem.x0.ndim  # 2 (B,N) or 3 (B,N,N)
    spec_tail = [None] * (state_rank - 1)
    if shard_hilbert:
        spec_tail[-1] = "hilbert"
    state_spec = P("init", *spec_tail)

    problem.x0 = jax.device_put(problem.x0, NamedSharding(mesh, state_spec))
    if problem.target is not None:
        problem.target = jax.device_put(problem.target, NamedSharding(mesh, state_spec))
    problem.weights = jax.device_put(problem.weights, NamedSharding(mesh, P("init")))
    problem.purity = jax.device_put(problem.purity, NamedSharding(mesh, P("init")))
    repl = NamedSharding(mesh, P())
    problem.engine.stack = jax.device_put(problem.engine.stack, repl)
    if problem.engine.Ls is not None:
        problem.engine.Ls = jax.device_put(problem.engine.Ls, repl)
    return problem
