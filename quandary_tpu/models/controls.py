"""Device-side evaluation of rotating-frame controls p_k(t), q_k(t).

Takes the global parameter vector alpha and a precomputed
:class:`~quandary_tpu.utils.splines.ControlEvalPlan` and returns arrays
(p, q) of shape (nt, Q) for all oscillators at all plan time points — a
handful of small matmuls, fully differentiable, evaluated ONCE per objective
evaluation (versus one scalar spline sum per step per oscillator in the
reference, oscillator.cpp:281-337).

Pi-pulses (oscillator.cpp:327-334) override (p, q) with amp/sqrt(2) inside
their time windows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.splines import ControlEvalPlan, ControlSegment


def _eval_segment_pq(seg: ControlSegment, B, cos_t, sin_t, seg_params, nf, ts):
    """(p, q) contribution of one segment, shape (nt,).

    seg_params: flat slice of the oscillator's parameter vector for this
    segment, layout [carrier f: nparams_per_carrier]."""
    npc = seg.nparams_per_carrier()
    P = seg_params.reshape(nf, npc)
    if seg.kind in ("spline", "spline0"):
        ns = seg.nsplines
        a_re = P[:, :ns]                     # (nf, ns)
        a_im = P[:, ns:]                     # (nf, ns)
        B1 = B @ a_re.T                      # (nt, nf)
        B2 = B @ a_im.T
        p = jnp.sum(cos_t * B1 - sin_t * B2, axis=1)
        q = jnp.sum(sin_t * B1 + cos_t * B2, axis=1)
    elif seg.kind == "spline_amplitude":
        ns = seg.nsplines
        amp = B @ P[:, :ns].T                # (nt, nf)
        phase = seg.scaling * P[:, ns]       # (nf,)
        # p = cos(Om t + phase) * amp ; q = sin(Om t + phase) * amp
        cph = jnp.cos(phase)[None, :]
        sph = jnp.sin(phase)[None, :]
        cos_full = cos_t * cph - sin_t * sph
        sin_full = sin_t * cph + cos_t * sph
        p = jnp.sum(cos_full * amp, axis=1)
        q = jnp.sum(sin_full * amp, axis=1)
    elif seg.kind == "step":
        # Parameter alpha in [0,1] sets the step end time; the window mask was
        # folded into B (column 0). Ramp: up over tramp after tstart, down
        # over tramp before tstepend (controlbasis.cpp:195-206, util.cpp:92).
        alpha = P[:, 0]                      # (nf,) — reference uses carrier 0 slot
        a = alpha[0]
        tstepend = seg.tstart + a * (seg.tstop - seg.tstart)
        if seg.tramp > 1e-13:
            up = (ts - seg.tstart) / seg.tramp
            down = (tstepend - ts) / seg.tramp
            ramp = jnp.clip(jnp.minimum(up, down), 0.0, 1.0)
            ramp = jnp.where(tstepend < seg.tstart + 2 * seg.tramp, 0.0, ramp)
        else:
            ramp = jnp.where((ts >= seg.tstart) & (ts <= tstepend), 1.0, 0.0)
        ramp = ramp * B[:, 0]
        p = ramp * seg.step_amp1
        q = ramp * seg.step_amp2
    else:
        raise ValueError(seg.kind)
    return p, q


def eval_controls(plan: ControlEvalPlan, params, pipulses: Optional[Sequence] = None):
    """Evaluate (p, q) for all oscillators on the plan's time grid.

    Parameters
    ----------
    plan : ControlEvalPlan (static, host-built)
    params : (nparams,) global parameter vector (rad/ns units)
    pipulses : optional list (per oscillator) of lists of (tstart, tstop, amp)
        tuples; inside those windows p=q=amp/sqrt(2) (oscillator.cpp:327-334).

    Returns
    -------
    p, q : (nt, Q) arrays.
    """
    ts = jnp.asarray(plan.ts)
    p_cols = []
    q_cols = []
    for k, osc in enumerate(plan.oscillators):
        nf = len(osc.carrier_freqs)
        off = int(plan.param_offsets[k])
        p_k = jnp.zeros(ts.shape, dtype=params.dtype)
        q_k = jnp.zeros(ts.shape, dtype=params.dtype)
        seg_off = off
        cos_t = jnp.asarray(plan.cos_t[k])
        sin_t = jnp.asarray(plan.sin_t[k])
        for s, seg in enumerate(osc.segments):
            nseg_params = seg.nparams_per_carrier() * nf
            seg_params = jax.lax.dynamic_slice(params, (seg_off,), (nseg_params,)) \
                if nseg_params > 0 else jnp.zeros((0,), dtype=params.dtype)
            B = jnp.asarray(plan.basis[k][s])
            ps, qs = _eval_segment_pq(seg, B, cos_t, sin_t, seg_params, nf, ts)
            p_k = p_k + ps
            q_k = q_k + qs
            seg_off += nseg_params
        if pipulses is not None and k < len(pipulses):
            for (t0, t1, amp) in pipulses[k]:
                inwin = (ts >= t0) & (ts <= t1)
                amp_pq = amp / np.sqrt(2.0)
                p_k = jnp.where(inwin, amp_pq, p_k)
                q_k = jnp.where(inwin, amp_pq, q_k)
        p_cols.append(p_k)
        q_cols.append(q_k)
    return jnp.stack(p_cols, axis=1), jnp.stack(q_cols, axis=1)


def eval_controls_labframe(plan: ControlEvalPlan, params, ground_freqs_radns,
                           pipulses: Optional[Sequence] = None):
    """Lab-frame pulse f_k(t) = 2(p cos(w_k t) - q sin(w_k t)) where w_k is
    the oscillator ground frequency (oscillator.cpp:383-428). Note: the
    reference evaluates the ROTATING-frame p,q with the carrier waves and then
    modulates by the ground frequency."""
    p, q = eval_controls(plan, params, pipulses)
    ts = jnp.asarray(plan.ts)[:, None]
    w = jnp.asarray(ground_freqs_radns)[None, :]
    return 2.0 * (p * jnp.cos(w * ts) - q * jnp.sin(w * ts))


def control_variation_penalty(plan: ControlEvalPlan, params) -> jnp.ndarray:
    """Total-variation penalty over consecutive spline0 coefficients
    (controlbasis.cpp:257-277): sum over oscillators, carriers, Re/Im blocks
    of sum_s (a_s - a_{s-1})^2, plus first/last coefficient squared when
    boundary conditions are enforced. Only spline0 segments contribute (the
    reference implements computeVariation only for BSpline0)."""
    total = jnp.zeros((), dtype=params.dtype)
    for k, osc in enumerate(plan.oscillators):
        nf = len(osc.carrier_freqs)
        seg_off = int(plan.param_offsets[k])
        for seg in osc.segments:
            nseg_params = seg.nparams_per_carrier() * nf
            if seg.kind == "spline0":
                ns = seg.nsplines
                P = jax.lax.dynamic_slice(params, (seg_off,), (nseg_params,))
                P = P.reshape(nf, 2, ns)
                d = P[:, :, 1:] - P[:, :, :-1]
                total = total + jnp.sum(d * d)
                if osc.enforce_bc:
                    total = total + jnp.sum(P[:, :, 0] ** 2) + jnp.sum(P[:, :, -1] ** 2)
            seg_off += nseg_params
    return total
