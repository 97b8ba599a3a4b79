"""Reversible (O(1)-memory) discrete adjoint for closed systems.

The IMR update is time-symmetric: swapping x_n <-> x_{n+1} and dt <-> -dt at
the SAME midpoint coefficients inverts the step exactly (to stage-solve
tolerance). The reference exploits this to avoid storing the forward
trajectory for Schroedinger adjoints (timestepper.cpp:229-231,
solveAdjointODE recomputes primal states by integrating backwards). Here the
same idea becomes a `jax.custom_vjp`:

* forward: scan the steps, keep ONLY the final state — O(1) state memory
  instead of the O(ntime) checkpointing of plain reverse-mode AD;
* backward: one reverse scan that simultaneously (a) reconstructs x_{n-1}
  by stepping backwards, (b) applies the step's VJP to the state cotangent,
  (c) injects the per-step penalty cotangents at the reconstructed states,
  and (d) accumulates the coefficient-row cotangents.

Applicable to norm-preserving dynamics (Schroedinger); dissipative Lindblad
dynamics are NOT stably reversible — use the default remat scan there (the
reference stores forward states for the same reason, storeFWD).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_reversible_propagate(step_fwd: Callable, step_bwd: Callable,
                              penalty_fn: Optional[Callable] = None):
    """Build propagate(x0, C, extras) -> (xT, pen_sum) with a reversible VJP.

    step_fwd(x, c_stages): one forward step.
    step_bwd(x, c_stages): the INVERSE step (same scheme with negated dt).
    penalty_fn(x, extra) -> pytree of per-step penalty contributions evaluated
        at the post-step states (summed over steps), or None.
    """

    def _pen(x, extra):
        if penalty_fn is None:
            return ()
        return penalty_fn(x, extra)

    @jax.custom_vjp
    def propagate(x0, C, extras):
        def body(x, inp):
            c, extra = inp
            x = step_fwd(x, c)
            return x, _pen(x, extra)

        xT, pens = jax.lax.scan(body, x0, (C, extras))
        pen_sum = jax.tree.map(lambda p: jnp.sum(p, axis=0), pens)
        return xT, pen_sum

    def fwd(x0, C, extras):
        out = propagate(x0, C, extras)
        return out, (out[0], C, extras)

    def bwd(res, cots):
        xT, C, extras = res
        xT_bar, pen_bar = cots

        def body(carry, inp):
            x, xbar = carry
            c, extra = inp
            # reconstruct the pre-step state
            x_prev = step_bwd(x, c)

            # VJP of (step + penalty) at x_prev
            def f(xp, cc):
                xn = step_fwd(xp, cc)
                return xn, _pen(xn, extra)

            _, vjp = jax.vjp(f, x_prev, c)
            xbar_new, cbar = vjp((xbar, pen_bar))
            return (x_prev, xbar_new), cbar

        (x0_rec, x0_bar), C_bar = jax.lax.scan(
            body, (xT, xT_bar), (C, extras), reverse=True)

        def _zero(x):
            if jnp.issubdtype(x.dtype, jnp.floating) or \
                    jnp.issubdtype(x.dtype, jnp.complexfloating):
                return jnp.zeros_like(x)
            import numpy as _np
            return _np.zeros(x.shape, dtype=jax.dtypes.float0)

        extras_bar = jax.tree.map(_zero, extras)
        return x0_bar, C_bar, extras_bar

    propagate.defvjp(fwd, bwd)
    return propagate
