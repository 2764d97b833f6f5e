"""Independent source waveform evaluation (reference vsource.go / isource.go).

Vectorized over all sources of one kind: waveform type is selected per-instance
with `jnp.where`, and the set of waveform BRANCHES built is gated statically on
the deck's source types (stype is compile-time circuit metadata) — a deck with
no PWL source must not pay for PWL evaluation.  That gate is load-bearing for
throughput: the earlier unconditional `vmap(searchsorted)` PWL branch lowered
to an XLA binary-search while-loop plus gathers costing ~2 ms PER TRANSIENT
ATTEMPT at B=8192 — it was the round-3 mystery overhead that made every
nonlinear deck flat at ~2.5M steps/s regardless of device-model cost.  PWL
itself interpolates by static per-knot masks (`_pwl_interp`): knot tables are
short and padded to a compile-time width, so P elementwise compares beat a
binary search by orders of magnitude on TPU (and batch trivially).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..compiler import SRC_DC, SRC_SIN, SRC_PULSE, SRC_PWL


def _pulse_value(p, t):
    """PULSE(v1 v2 delay rise fall width period) at scalar time t.

    Mirrors getPulseVoltage (vsource.go:179-209) including rise==0/fall==0
    edge handling and period wrap via mod.
    """
    v1, v2 = p["v1"], p["v2"]
    delay, rise, fall = p["delay"], p["rise"], p["fall"]
    width, period = p["width"], p["period"]

    tp = t - delay
    tp = jnp.where(period > 0, jnp.mod(tp, jnp.where(period > 0, period, 1.0)), tp)

    rise_safe = jnp.where(rise == 0, 1.0, rise)
    fall_safe = jnp.where(fall == 0, 1.0, fall)
    fall_start = rise + width

    in_rise = jnp.where(rise == 0, v2, v1 + (v2 - v1) * tp / rise_safe)
    in_fall = jnp.where(fall == 0, v1, v2 - (v2 - v1) * (tp - fall_start) / fall_safe)

    val = jnp.where(
        tp < rise,
        in_rise,
        jnp.where(tp < fall_start, v2, jnp.where(tp < fall_start + fall, in_fall, v1)),
    )
    return jnp.where(t < delay, v1, val)


def _pwl_interp(times, values, t):
    """PWL linear interpolation (vsource.go:211-231) by static per-knot masks.

    ``times``/``values``: (nS, P) shared knot tables, or (nS, P, B) per-lane
    (Monte-Carlo-batched) tables; ``t``: scalar or (B,) per-lane times.
    `times` is padded with far-future points repeating the last value, so the
    pad segments interpolate to exactly the last value.

    Identical semantics to ``clip(searchsorted(times, t, 'left'), 1, P-1)``
    segment indexing, built from P static compares + selects instead: no
    binary-search while-loop, no gathers (see module docstring for why)."""
    P = times.shape[1]
    lane_t = jnp.ndim(t) == 1

    def knot(arr, p):
        k = arr[:, p]  # (nS,) shared, or (nS, B) per-lane
        if lane_t and k.ndim == 1:
            k = k[:, None]
        return k

    tq = t[None, :] if lane_t else t
    # segment index = #(knots < t), clipped to [1, P-1] ('left' semantics)
    cnt = None
    for p in range(P):
        c = (knot(times, p) < tq).astype(jnp.int32)
        cnt = c if cnt is None else cnt + c
    idx = jnp.clip(cnt, 1, P - 1)
    t1, t2 = knot(times, 0), knot(times, 1)
    v1, v2 = knot(values, 0), knot(values, 1)
    for p in range(2, P):
        sel = idx >= p
        t1 = jnp.where(sel, knot(times, p - 1), t1)
        t2 = jnp.where(sel, knot(times, p), t2)
        v1 = jnp.where(sel, knot(values, p - 1), v1)
        v2 = jnp.where(sel, knot(values, p), v2)
    slope = (v2 - v1) / jnp.where(t2 == t1, 1.0, t2 - t1)
    val = v1 + slope * (tq - t1)
    return jnp.where(tq <= knot(times, 0), knot(values, 0), val)


def _static_types(stype):
    """The set of source-type codes present — static circuit metadata
    (cc.idx[kind]["stype"] is a host numpy array), used to gate which
    waveform branches get traced at all.  Falls back to 'all' if someone
    passes a traced stype."""
    try:
        return set(int(v) for v in np.asarray(stype).tolist())
    except Exception:
        return {SRC_DC, SRC_SIN, SRC_PULSE, SRC_PWL}


def eval_sources(stype, p, t, dc_scale=1.0):
    """Waveform value of every source at time t.

    `dc_scale` implements OP source-stepping (op.go:113-169): SetValue scales
    the dcValue field, which is the DC level for DC sources and the offset for
    SIN sources; PULSE/PWL waveforms are unaffected (their levels live in
    separate fields).
    """
    kinds = _static_types(stype)
    dc = p["dc"] * dc_scale
    out = dc  # SRC_DC (and the fall-through default)
    stype_a = jnp.asarray(stype)
    if SRC_SIN in kinds:
        phase_rad = p["phase"] * jnp.pi / 180.0
        sin_v = dc + p["amplitude"] * jnp.sin(
            2.0 * jnp.pi * p["freq"] * t + phase_rad)
        out = jnp.where(stype_a == SRC_SIN, sin_v, out)
    if SRC_PULSE in kinds:
        out = jnp.where(stype_a == SRC_PULSE, _pulse_value(p, t), out)
    if SRC_PWL in kinds:
        pwl_v = _pwl_interp(jnp.asarray(p["pwl_t"], dtype=jnp.float64),
                            jnp.asarray(p["pwl_v"], dtype=jnp.float64), t)
        out = jnp.where(stype_a == SRC_PWL, pwl_v, out)
    return jnp.broadcast_to(out, stype_a.shape if jnp.ndim(t) == 0
                            else stype_a.shape + jnp.shape(t))


def _lane_leaf(leaf, b):
    """Scalar-per-source leaf (nS,) shared or (b, nS) batched -> broadcastable
    against a (nS, b) lane grid."""
    leaf = jnp.asarray(leaf, dtype=jnp.float64)
    if leaf.ndim == 1:
        return leaf[:, None]  # (nS, 1)
    return jnp.transpose(leaf, (1, 0))  # (nS, b)


def eval_sources_lanes(stype, p, t, b):
    """Waveform value of every source at PER-LANE times: t is (b,), leaves
    are (nS,) shared or (b, nS) batched; returns (nS, b).  Same semantics as
    eval_sources (vsource.go/isource.go) — used by the fused transient kernel
    path, where each Monte-Carlo lane carries its own simulation clock.
    PWL knot tables are (nS, P) shared or (b, nS, P) per-lane batched."""
    kinds = _static_types(stype)
    q = {k: _lane_leaf(v, b) for k, v in p.items()
         if k not in ("pwl_t", "pwl_v")}
    tt = t[None, :]  # (1, b)
    dc = q["dc"]
    ns = len(np.asarray(stype))
    stype_a = jnp.asarray(stype)[:, None]
    phase_rad = q["phase"] * jnp.pi / 180.0
    sin_v = dc + q["amplitude"] * jnp.sin(
        2.0 * jnp.pi * q["freq"] * tt + phase_rad)
    pulse_v = _pulse_value(q, tt)
    if SRC_PWL in kinds:
        pwl_t = jnp.asarray(p["pwl_t"], dtype=jnp.float64)
        pwl_v = jnp.asarray(p["pwl_v"], dtype=jnp.float64)
        if pwl_t.ndim == 3:  # (b, nS, P) per-lane knots -> (nS, P, b)
            pwl_t = jnp.transpose(pwl_t, (1, 2, 0))
            pwl_v = jnp.transpose(pwl_v, (1, 2, 0))
        pwl_val = _pwl_interp(pwl_t, pwl_v, t)
    else:
        pwl_val = dc  # never selected: no SRC_PWL rows exist
    out = jnp.where(
        stype_a == SRC_DC,
        dc,
        jnp.where(stype_a == SRC_SIN, sin_v,
                  jnp.where(stype_a == SRC_PULSE, pulse_v, pwl_val)),
    )
    return jnp.broadcast_to(out, (ns, t.shape[0]))


def eval_sources_ac(p):
    """Complex phasor (real, imag) of every source for AC analysis
    (vsource.go:155-176, isource.go:150-165).  Non-AC sources have ac_mag=0.
    """
    phase_rad = p["ac_phase"] * jnp.pi / 180.0
    return p["ac_mag"] * jnp.cos(phase_rad), p["ac_mag"] * jnp.sin(phase_rad)
