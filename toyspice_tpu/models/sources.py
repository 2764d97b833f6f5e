"""Independent source waveform evaluation (reference vsource.go / isource.go).

Vectorized over all sources of one kind: waveform type is selected per-instance
with `jnp.where`, so a mixed population of DC/SIN/PULSE/PWL sources evaluates
in one fused pass — no per-device dispatch, no dynamic control flow.
"""

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


def _pwl_value_one(times, values, t):
    """PWL linear interpolation for one source (vsource.go:211-231).

    `times` is padded with far-future points repeating the last value, so the
    pad segments interpolate to exactly the last value.
    """
    idx = jnp.clip(jnp.searchsorted(times, t, side="left"), 1, times.shape[0] - 1)
    t1, t2 = times[idx - 1], times[idx]
    v1, v2 = values[idx - 1], values[idx]
    slope = (v2 - v1) / jnp.where(t2 == t1, 1.0, t2 - t1)
    val = v1 + slope * (t - t1)
    return jnp.where(t <= times[0], values[0], val)


def eval_sources(stype, p, t, dc_scale=1.0):
    """Waveform value of every source at time t.

    `dc_scale` implements OP source-stepping (op.go:113-169): SetValue scales
    the dcValue field, which is the DC level for DC sources and the offset for
    SIN sources; PULSE/PWL waveforms are unaffected (their levels live in
    separate fields).
    """
    dc = p["dc"] * dc_scale
    phase_rad = p["phase"] * jnp.pi / 180.0
    sin_v = dc + p["amplitude"] * jnp.sin(2.0 * jnp.pi * p["freq"] * t + phase_rad)
    pulse_v = _pulse_value(p, t)
    pwl_v = jax.vmap(_pwl_value_one, in_axes=(0, 0, None))(p["pwl_t"], p["pwl_v"], t)
    return jnp.where(
        stype == SRC_DC,
        dc,
        jnp.where(stype == SRC_SIN, sin_v, jnp.where(stype == SRC_PULSE, pulse_v, pwl_v)),
    )


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
    PWL knot tables must be unbatched (nS, P)."""
    q = {k: _lane_leaf(v, b) for k, v in p.items()
         if k not in ("pwl_t", "pwl_v")}
    tt = t[None, :]  # (1, b)
    dc = q["dc"]
    phase_rad = q["phase"] * jnp.pi / 180.0
    sin_v = dc + q["amplitude"] * jnp.sin(2.0 * jnp.pi * q["freq"] * tt + phase_rad)
    pulse_v = _pulse_value(q, tt)
    pwl_t = jnp.asarray(p["pwl_t"], dtype=jnp.float64)
    pwl_v = jnp.asarray(p["pwl_v"], dtype=jnp.float64)
    pwl_val = jax.vmap(_pwl_value_one, in_axes=(0, 0, None))(pwl_t, pwl_v, t)
    ns = pwl_val.shape[0]
    stype = jnp.asarray(stype)[:, None]
    out = jnp.where(
        stype == SRC_DC,
        dc,
        jnp.where(stype == SRC_SIN, sin_v,
                  jnp.where(stype == SRC_PULSE, pulse_v, pwl_val)),
    )
    return jnp.broadcast_to(out, (ns, t.shape[0]))


def eval_sources_ac(p):
    """Complex phasor (real, imag) of every source for AC analysis
    (vsource.go:155-176, isource.go:150-165).  Non-AC sources have ac_mag=0.
    """
    phase_rad = p["ac_phase"] * jnp.pi / 180.0
    return p["ac_mag"] * jnp.cos(phase_rad), p["ac_mag"] * jnp.sin(phase_rad)
