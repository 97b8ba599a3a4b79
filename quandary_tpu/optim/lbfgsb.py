"""Bound-constrained L-BFGS with projected line search.

The reference optimizes with PETSc TAO's BQNLS (bounded quasi-Newton line
search, optimproblem.cpp:177-189). This is a from-scratch projected L-BFGS:

* two-loop recursion over the last m curvature pairs,
* gradient projection onto the box for the active set,
* backtracking Armijo line search along the PROJECTED path
  x(t) = P(x + t d),
* curvature pairs accepted only when s^T y is sufficiently positive.

The driver loop runs on the host (as the reference's TAO loop runs
replicated on every rank over the small design vector); each iteration calls
the jitted value_and_grad once plus cheap O(ndesign) vector work. Convergence
is judged on the projected-gradient norm, matching TAO's monitor quantity.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np


@dataclasses.dataclass
class LbfgsbResult:
    x: np.ndarray
    f: float
    g: np.ndarray
    niter: int
    converged_reason: str
    history: List[dict]


def save_state(path: str, x, s_list, y_list, it: int) -> None:
    """Checkpoint the optimizer state (iterate + L-BFGS curvature memory) —
    richer than the reference's params-only warm start
    (control_initialization0 = file, optimproblem.cpp:167-175)."""
    np.savez(path, x=x, it=it,
             s=np.asarray(s_list) if s_list else np.zeros((0, x.size)),
             y=np.asarray(y_list) if y_list else np.zeros((0, x.size)))


def load_state(path: str):
    d = np.load(path)
    s_list = [s for s in d["s"]]
    y_list = [y for y in d["y"]]
    rho_list = [1.0 / float(np.dot(s, y)) for s, y in zip(s_list, y_list)]
    return dict(x=d["x"], it=int(d["it"]), s_list=s_list, y_list=y_list,
                rho_list=rho_list)


def _project(x, lb, ub):
    return np.minimum(np.maximum(x, lb), ub)


def _projected_grad(x, g, lb, ub, tol=1e-12):
    """Projected gradient: zero where the bound is active and the gradient
    pushes outward (TAO's convergence measure for bounded solvers)."""
    pg = g.copy()
    at_lb = (x <= lb + tol) & (g > 0)
    at_ub = (x >= ub - tol) & (g < 0)
    pg[at_lb | at_ub] = 0.0
    return pg


def _two_loop(g, s_list, y_list, rho_list):
    q = g.copy()
    alphas = []
    for s, y, rho in zip(reversed(s_list), reversed(y_list), reversed(rho_list)):
        a = rho * np.dot(s, q)
        alphas.append(a)
        q -= a * y
    if s_list:
        s, y = s_list[-1], y_list[-1]
        gamma = np.dot(s, y) / max(np.dot(y, y), 1e-300)
        q *= gamma
    for (s, y, rho), a in zip(zip(s_list, y_list, rho_list), reversed(alphas)):
        b = rho * np.dot(y, q)
        q += (a - b) * s
    return q


def minimize_lbfgsb(
    fun_and_grad: Callable,
    x0: np.ndarray,
    lb: np.ndarray,
    ub: np.ndarray,
    *,
    maxiter: int = 200,
    gatol: float = 1e-8,
    grtol: float = 1e-4,
    history_size: int = 10,
    ls_max: int = 30,
    c1: float = 1e-4,
    callback: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_state: Optional[dict] = None,
) -> LbfgsbResult:
    """Minimize f with box constraints.

    fun_and_grad(x) -> (f, g, aux). callback(it, x, f, g_pnorm, step, aux) ->
    optional stop string; called every iteration (mirrors TaoMonitor,
    optimproblem.cpp:586-660, incl. the custom infidelity/cost stopping tests
    which the caller implements inside the callback).
    """
    x = _project(np.asarray(x0, dtype=np.float64), lb, ub)
    s_list: List[np.ndarray] = []
    y_list: List[np.ndarray] = []
    rho_list: List[float] = []
    if resume_state is not None:
        x = _project(np.asarray(resume_state["x"], dtype=np.float64), lb, ub)
        s_list = list(resume_state["s_list"])
        y_list = list(resume_state["y_list"])
        rho_list = list(resume_state["rho_list"])
    f, g, aux = fun_and_grad(x)

    pg = _projected_grad(x, g, lb, ub)
    gnorm0 = np.linalg.norm(pg)
    reason = "maxiter reached"
    history: List[dict] = []
    step = 0.0
    it = 0

    for it in range(maxiter + 1):
        pg = _projected_grad(x, g, lb, ub)
        gnorm = np.linalg.norm(pg)
        if callback is not None:
            stop = callback(it, x, f, gnorm, step, aux)
            if stop:
                reason = stop
                break
        if gnorm < gatol:
            reason = "converged: small projected gradient norm (atol)"
            break
        if gnorm0 > 0 and gnorm / gnorm0 < grtol:
            reason = "converged: projected gradient norm reduction (rtol)"
            break
        if it == maxiter:
            reason = "maxiter reached"
            break

        d = -_two_loop(g, s_list, y_list, rho_list)
        # ensure descent along the projected direction; fall back to -pg
        if np.dot(d, pg) > -1e-14 * np.linalg.norm(d) * gnorm:
            d = -pg

        # backtracking Armijo on the projected path
        t = 1.0
        f_new, g_new, aux_new, x_new = f, g, aux, x
        ok = False
        gtd = np.dot(g, d)
        for _ in range(ls_max):
            x_try = _project(x + t * d, lb, ub)
            dx = x_try - x
            if np.linalg.norm(dx) < 1e-16:
                break
            f_try, g_try, aux_try = fun_and_grad(x_try)
            # Armijo on the actual (projected) displacement
            if f_try <= f + c1 * np.dot(g, dx):
                f_new, g_new, aux_new, x_new = f_try, g_try, aux_try, x_try
                ok = True
                break
            t *= 0.5
        if not ok:
            reason = "line search failed"
            break

        s = x_new - x
        y = g_new - g
        sy = np.dot(s, y)
        if sy > 1e-10 * np.linalg.norm(s) * max(np.linalg.norm(y), 1e-300):
            s_list.append(s)
            y_list.append(y)
            rho_list.append(1.0 / sy)
            if len(s_list) > history_size:
                s_list.pop(0)
                y_list.pop(0)
                rho_list.pop(0)

        step = t
        x, f, g, aux = x_new, f_new, g_new, aux_new
        if checkpoint_path and checkpoint_every and (it + 1) % checkpoint_every == 0:
            save_state(checkpoint_path, x, s_list, y_list, it + 1)

    return LbfgsbResult(x=x, f=f, g=g, niter=it, converged_reason=reason,
                        history=history)
