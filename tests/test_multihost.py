"""Multi-HOST (multi-process) execution: the reference's >= 2-host scaling
axis, validated in miniature with two local processes, 4 virtual CPU
devices each, forming one GLOBAL 8-device ('init' x 'hilbert') mesh with
cross-process (Gloo) collectives.

Every process runs the replicated host loop over the wrapped entry points
(multi-process jit may not close over global arrays — parallel/mesh.py
keeps problem data host-side when process_count > 1 and
Problem._wrap_with_data threads the big arrays as sharded arguments). The
objective and gradient must agree across processes AND with the
single-process virtual-mesh result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, {repo!r})
from quandary_tpu.parallel import multihost as mh
mh.initialize(coordinator_address=f"localhost:{{port}}",
              num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from __graft_entry__ import _build_problem
from quandary_tpu.parallel.mesh import make_mesh, shard_problem
problem, setup = _build_problem(ntime=12, T=2.0, lindblad=True,
                                dtype=jnp.complex128)
mesh = make_mesh(4, 2)
shard_problem(problem, mesh, shard_hilbert=True)
params = jnp.asarray(np.random.default_rng(0).normal(size=setup.nparams) * 0.02)
with mesh:
    vg = problem.build_value_and_grad()
    (J, aux), g = vg(params, params)
Jv = float(mh.sync_global_value(J))
gn = float(jnp.linalg.norm(g))
print(f"RESULT {{pid}} {{Jv:.15e}} {{gn:.15e}}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # single-process reference on the in-process 8-device virtual mesh
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, repo)
    from __graft_entry__ import _build_problem
    from quandary_tpu.parallel.mesh import make_mesh, shard_problem

    problem, setup = _build_problem(ntime=12, T=2.0, lindblad=True,
                                    dtype=jnp.complex128)
    mesh = make_mesh(4, 2)
    shard_problem(problem, mesh, shard_hilbert=True)
    params = jnp.asarray(
        np.random.default_rng(0).normal(size=setup.nparams) * 0.02)
    with mesh:
        vg = problem.build_value_and_grad()
        (J_ref, _), g_ref = vg(params, params)
    J_ref = float(J_ref)
    gn_ref = float(jnp.linalg.norm(g_ref))

    # two cooperating processes over one global mesh
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, Jv, gn = line.split()
                results[int(pid)] = (float(Jv), float(gn))
    assert set(results) == {0, 1}, outs
    for pid in (0, 1):
        Jv, gn = results[pid]
        np.testing.assert_allclose(Jv, J_ref, rtol=1e-12, err_msg=str(pid))
        np.testing.assert_allclose(gn, gn_ref, rtol=1e-10, err_msg=str(pid))
