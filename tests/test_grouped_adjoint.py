"""The hand-written solve-based adjoint for the grouped engine
(ops/grouped_adjoint.py) must reproduce plain AD through the unrolled
stage solve to machine precision, and match finite differences."""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _problems():
    from __graft_entry__ import _build_grouped_problem
    from quandary_tpu.problem import Problem

    prob, setup = _build_grouped_problem(nlev=3, ntime=10, T=1.0,
                                         dtype=jnp.complex128)
    setup_ad = dataclasses.replace(setup, adjoint="reversible-ad")
    prob_ad = Problem(setup_ad)
    return prob, prob_ad, setup


def test_matches_reversible_ad():
    prob, prob_ad, setup = _problems()
    assert type(prob.engine).__name__ == "GroupedEngine"
    params = jnp.asarray(
        np.random.default_rng(11).normal(size=setup.nparams) * 0.03)

    (J, aux), g = jax.value_and_grad(prob.objective, has_aux=True)(
        params, params)
    (J2, aux2), g2 = jax.value_and_grad(prob_ad.objective, has_aux=True)(
        params, params)
    # identical forward map -> identical objective
    np.testing.assert_allclose(float(J), float(J2), rtol=1e-14)
    # adjoint-solve gradient vs AD-through-the-iteration gradient: equal to
    # solver-truncation error, far below 1e-10 at c128 with default iters
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=1e-9, atol=1e-12)


def test_matches_finite_differences():
    prob, _, setup = _problems()
    params = np.random.default_rng(12).normal(size=setup.nparams) * 0.03
    pj = jnp.asarray(params)

    obj = lambda p: prob.objective(p, pj)[0]
    (J, _), g = jax.value_and_grad(prob.objective, has_aux=True)(pj, pj)

    rng = np.random.default_rng(13)
    d = rng.standard_normal(params.shape)
    d /= np.linalg.norm(d)
    eps = 1e-6
    fd = (float(obj(jnp.asarray(params + eps * d)))
          - float(obj(jnp.asarray(params - eps * d)))) / (2 * eps)
    np.testing.assert_allclose(float(np.dot(np.asarray(g), d)), fd,
                               rtol=1e-6)


def test_penalties_through_handwritten_adjoint():
    """Leak + integral penalties flow through the custom VJP's penalty
    cotangent injection."""
    from __graft_entry__ import _build_grouped_problem
    from quandary_tpu.problem import Problem

    prob, setup = _build_grouped_problem(nlev=3, ntime=10, T=1.0,
                                         dtype=jnp.complex128)
    # add guard levels (nessential < nlevels) + penalties
    setup_pen = dataclasses.replace(
        setup, nessential=(2, 2, 2, 2), gamma_penalty=0.05,
        penalty_param=0.1)
    prob_pen = Problem(setup_pen)
    assert type(prob_pen.engine).__name__ == "GroupedEngine"
    setup_pen_ad = dataclasses.replace(setup_pen, adjoint="reversible-ad")
    prob_pen_ad = Problem(setup_pen_ad)

    params = jnp.asarray(
        np.random.default_rng(17).normal(size=setup.nparams) * 0.03)
    (J, aux), g = jax.value_and_grad(prob_pen.objective, has_aux=True)(
        params, params)
    (J2, aux2), g2 = jax.value_and_grad(prob_pen_ad.objective, has_aux=True)(
        params, params)
    assert float(aux["obj_penal"]) > 0 or float(aux["obj_penal"]) >= 0
    np.testing.assert_allclose(float(J), float(J2), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=1e-9, atol=1e-12)


def test_dC_matches_ad_direct():
    """Gradients w.r.t. the RAW coefficient rows C (not the control params)
    must match AD — this exposes the cross-JC and slot-0 cotangent
    components that the params chain rule annihilates (C[:,0] is pinned to
    1.0 and the JC columns are params-independent carrier values), for BOTH
    the jacobi and split adjoints."""
    import dataclasses

    from quandary_tpu.ops.grouped_adjoint import make_grouped_adjoint_propagate
    from quandary_tpu.ops.grouped_rhs import (make_real_imr_step,
                                              make_real_split_step)

    from __graft_entry__ import _build_grouped_problem
    problem, setup = _build_grouped_problem(nlev=3, ntime=10, T=1.0,
                                            dtype=jnp.complex128)
    eng = problem.engine
    assert eng.crossA is not None, "config must have a cross-group JC pair"
    rng = np.random.default_rng(11)
    ntime = 3
    Cnp = rng.normal(size=(ntime, 1, eng.K)) * 0.4
    Cnp[:, :, 0] = 1.0   # physical constant slot: the static Jacobi
    # preconditioner matches the actual diagonal, keeping the documented
    # adjoint-solve truncation far below the comparison tolerance
    C = jnp.asarray(Cnp)
    B = 2
    x0 = rng.normal(size=(2, B, eng.m1, eng.m2))
    x0p = (jnp.asarray(x0[0]), jnp.asarray(x0[1]))
    cot = rng.normal(size=(2, B, eng.m1, eng.m2))

    iters = 10
    for split in (False, True):
        prop = make_grouped_adjoint_propagate(
            eng, setup.dt, iters, None, split=split)

        def loss_hand(C_):
            (yr, yi), _ = prop(x0p, C_, {})
            return jnp.sum(jnp.asarray(cot[0]) * yr
                           + jnp.asarray(cot[1]) * yi)

        mk = make_real_split_step if split else make_real_imr_step
        step = mk(eng, setup.dt, iters)

        def loss_ad(C_):
            def body(x, c):
                return tuple(step(x[0], x[1], c[0])), None
            (yr, yi), _ = jax.lax.scan(body, x0p, C_)
            return jnp.sum(jnp.asarray(cot[0]) * yr
                           + jnp.asarray(cot[1]) * yi)

        g_hand = np.asarray(jax.grad(loss_hand)(C))
        g_ad = np.asarray(jax.grad(loss_ad)(C))
        np.testing.assert_allclose(
            g_hand, g_ad, rtol=1e-6,
            atol=1e-8 * max(1.0, np.abs(g_ad).max()),
            err_msg=f"split={split}")
