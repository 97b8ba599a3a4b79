"""Hessian tools: AD Hessian, FD verification, eigen-analysis.

Counterparts of the reference's compile-time developer harnesses:
TEST_FD_HESS (main.cpp:545-658, FD Hessian + symmetry check) and
HESSIAN_DECOMPOSITION (main.cpp:660-719, SLEPc eigen-analysis of the
Hessian). With JAX the exact Hessian is one transform away.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hessian(problem, params, params_ref=None):
    """Exact (AD) Hessian of the full objective at `params`, (n, n)."""
    params = jnp.asarray(params)
    ref = jnp.asarray(params_ref) if params_ref is not None else params

    def f(p):
        J, _ = problem.objective(p, ref)
        return J

    H = jax.hessian(f)(params)
    return np.asarray(H)


def fd_hessian(problem, params, params_ref=None, eps: float = 1e-5):
    """Central-FD Hessian from gradients (main.cpp:545-658)."""
    import numpy as np
    params = np.asarray(params, dtype=float)
    ref = jnp.asarray(params_ref if params_ref is not None else params)
    vg = problem.build_value_and_grad()

    def grad(p):
        (_, _aux), g = vg(jnp.asarray(p), ref)
        return np.asarray(g)

    n = params.size
    H = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = eps
        H[:, i] = (grad(params + e) - grad(params - e)) / (2 * eps)
    return H


def hessian_eigen(problem, params, params_ref=None):
    """Eigen-decomposition of the (symmetrized) Hessian — curvature
    spectrum of the control landscape (HESSIAN_DECOMPOSITION analog).
    Returns (eigenvalues ascending, eigenvectors)."""
    H = hessian(problem, params, params_ref)
    Hs = 0.5 * (H + H.T)
    return np.linalg.eigh(Hs)
