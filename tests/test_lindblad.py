"""Lindblad solver correctness: trace/hermiticity preservation and comparison
against dense integration of the vectorized master equation."""

import jax.numpy as jnp
import numpy as np
from scipy.linalg import expm

from quandary_tpu.models.hamiltonian import build_standard_model
from quandary_tpu.ops.rhs import DenseEngine
from quandary_tpu.ops.steppers import make_step_fn, stage_midpoint_times
from quandary_tpu.ops import solvers


def _const_coeffs(model, ntime, nstages):
    C = np.zeros((ntime, nstages, model.K))
    C[:, :, 0] = 1.0
    return jnp.asarray(C)


def test_lindblad_vs_vectorized_expm():
    model = build_standard_model(
        nlevels=[3], freq01_ghz=[4.1], rotfreq_ghz=[4.0], selfkerr_ghz=[0.2],
        decay_time=[50.0], dephase_time=[30.0], lindblad=True,
    )
    N = model.N
    T, ntime = 2.0, 2000
    dt = T / ntime
    engine = DenseEngine(model)
    step = make_step_fn(engine.rhs, dt, "IMR", 20)

    rho0 = np.zeros((N, N), dtype=np.complex128)
    rho0[2, 2] = 0.6
    rho0[0, 0] = 0.4
    rho0[0, 2] = 0.3j
    rho0[2, 0] = -0.3j

    xT, _ = solvers.propagate(step, jnp.asarray(rho0)[None], _const_coeffs(model, ntime, 1))
    rhoT = np.asarray(xT)[0]

    # build the vectorized superoperator directly: column-major vec.
    # model.stack[0] is the bare Hermitian drift (the -i/2 sum L^dag L fold
    # happens inside DenseEngine, not in the model).
    Hpure = np.asarray(model.stack[0])
    Ls = [np.asarray(L) for L in model.collapse_ops]
    I = np.eye(N)
    Lsup = -1j * (np.kron(I, Hpure) - np.kron(Hpure.T, I))
    for L in Ls:
        Lsup += np.kron(L.conj(), L) - 0.5 * np.kron(I, L.conj().T @ L) \
                - 0.5 * np.kron((L.conj().T @ L).T, I)
    vec0 = rho0.reshape(-1, order="F")
    vecT = expm(Lsup * T) @ vec0
    rho_ref = vecT.reshape(N, N, order="F")

    assert np.abs(rhoT - rho_ref).max() < 1e-7
    # trace preserved, hermitian
    assert abs(np.trace(rhoT) - 1.0) < 1e-10
    assert np.abs(rhoT - rhoT.conj().T).max() < 1e-10


def test_lindblad_decay_to_ground():
    """Pure T1 decay of a qubit: excited population decays as exp(-t/T1)."""
    T1 = 20.0
    model = build_standard_model(
        nlevels=[2], freq01_ghz=[4.0], rotfreq_ghz=[4.0], selfkerr_ghz=[0.0],
        decay_time=[T1], lindblad=True,
    )
    T, ntime = 10.0, 1000
    dt = T / ntime
    engine = DenseEngine(model)
    step = make_step_fn(engine.rhs, dt, "IMR", 15)
    rho0 = np.diag([0.0, 1.0]).astype(np.complex128)
    xT, _ = solvers.propagate(step, jnp.asarray(rho0)[None], _const_coeffs(model, ntime, 1))
    p1 = float(np.real(np.asarray(xT)[0][1, 1]))
    assert abs(p1 - np.exp(-T / T1)) < 1e-6
