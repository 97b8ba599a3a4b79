"""Propagation drivers: `lax.scan` time loops over the whole state batch.

Replaces the reference's per-initial-condition solveODE loop
(timestepper.cpp:96-181 driven by optimproblem.cpp:245-282): here ONE scan
advances the entire batch of initial conditions simultaneously, so every RHS
application is a large batched matmul instead of ninit small ones.

Each step is wrapped in `jax.checkpoint`: under reverse-mode AD the scan
stores one state per step (exactly the reference's storeFWD policy for the
Lindblad adjoint, timestepper.cpp:37-48) and recomputes the in-step Neumann
iterates on the backward pass.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def propagate(step_fn: Callable, x0, C, extras=None, post_fn=None, post_init=None,
              remat: bool = True):
    """Scan the time loop.

    Parameters
    ----------
    step_fn : (x, c_stages) -> x_next, with c_stages (nstages, K).
    x0 : initial state batch.
    C : (ntime, nstages, K) coefficient rows at the stage midpoint times.
    extras : optional pytree of per-step arrays (leading dim ntime) passed to
        post_fn (e.g. penalty weights, step index).
    post_fn : optional (aux, x_next, extra_n) -> aux accumulator, evaluated on
        the state AFTER each step (the reference accumulates penalties at
        tstop, timestepper.cpp:125-158).
    post_init : initial accumulator pytree.

    Returns (x_final, aux).
    """
    f = jax.checkpoint(step_fn) if remat else step_fn

    if post_fn is None:
        def body(x, c):
            return f(x, c), None
        xT, _ = jax.lax.scan(body, x0, C)
        return xT, None

    def body(carry, inp):
        x, aux = carry
        c, extra = inp
        x = f(x, c)
        aux = post_fn(aux, x, extra)
        return (x, aux), None

    (xT, aux), _ = jax.lax.scan(body, (x0, post_init), (C, extras))
    return xT, aux


def propagate_trajectory(step_fn: Callable, x0, C):
    """Return all intermediate states, shape (ntime+1, *state.shape)."""
    def body(x, c):
        x = step_fn(x, c)
        return x, x
    _, xs = jax.lax.scan(body, x0, C)
    return jnp.concatenate([x0[None], xs], axis=0)


# ----- observables (oscillator.cpp:430-566, mastereq.cpp:2897-2973) -----

def population_full(x, lindblad: bool):
    """Per-level population of the full system, shape (..., N):
    |psi_i|^2 or Re(rho_ii)."""
    if lindblad:
        return jnp.real(jnp.diagonal(x, axis1=-2, axis2=-1))
    return jnp.abs(x) ** 2


def reduced_population(pop_full, dims, k: int):
    """Population of oscillator k: reduce the full per-level population over
    all other oscillators. pop_full (..., N) -> (..., dims[k])."""
    lead = pop_full.shape[:-1]
    t = pop_full.reshape(*lead, *dims)
    axes = tuple(i for i in range(len(dims)) if i != k)
    offset = len(lead)
    return jnp.sum(t, axis=tuple(a + offset for a in axes))


def expected_energy(pop_full, dims, k: int):
    """<N_k> = sum_l l * pop_k[l] (oscillator.cpp:430-473)."""
    red = reduced_population(pop_full, dims, k)
    levels = jnp.arange(dims[k], dtype=pop_full.dtype)
    return jnp.sum(red * levels, axis=-1)


def expected_energy_composite(pop_full, dims):
    """Composite expected energy: sum_i i * pop_i with the 'number operator'
    N_m = diag(0, 1, ..., N-1) over the GLOBAL index — i.e. the flat index
    itself, not the sum of per-oscillator number operators
    (mastereq.cpp:2897-2934, num_diag = i)."""
    N = pop_full.shape[-1]
    idx = jnp.arange(N, dtype=pop_full.dtype)
    return jnp.sum(pop_full * idx, axis=-1)
