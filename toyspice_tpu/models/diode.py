"""Shockley diode model (reference pkg/device/diode.go)."""

import jax.numpy as jnp

from ..consts import BOLTZMANN, CHARGE, TEMP_DEFAULT


def thermal_voltage(temp):
    t = jnp.where(temp <= 0, TEMP_DEFAULT, temp)
    return BOLTZMANN * t / CHARGE


def temperature_adjusted_is(p, temp):
    """is(T2) = is(T1)·(T2/T1)^(XTI/N)·exp(-Eg/(2Vt)·(T2/T1 - 1))
    (diode.go:108-117; T1 = 273.15+27)."""
    ktemp = TEMP_DEFAULT
    vt = thermal_voltage(temp)
    ratio = temp / ktemp
    egfact = -p["eg"] / (2.0 * vt) * (temp / ktemp - 1.0)
    return p["is_"] * jnp.power(ratio, p["xti"] / p["n"]) * jnp.exp(egfact)


def dc_eval(p, vd, temp):
    """Returns (id, gd) at junction voltage vd (diode.go:119-148).

    Three regions: forward/weak-reverse (vd > -3nVt) with the exp-arg clamped
    at 40, strong reverse -Is; conductance (|id|+Is)/nVt + Gmin.
    """
    vt = thermal_voltage(temp)
    nvt = p["n"] * vt
    is_t = temperature_adjusted_is(p, temp)

    fwd = vd > -3.0 * nvt
    arg = jnp.minimum(vd / nvt, 40.0)
    i_fwd = is_t * (jnp.exp(arg) - 1.0)
    id_ = jnp.where(fwd, i_fwd, -is_t)
    gd = jnp.where(fwd, (jnp.abs(id_) + is_t) / nvt + p["gmin"], p["gmin"])
    return id_, gd


def dc_eval_physics(p, vd, temp):
    """Physics-mode (id, gd): the reference parses Rs (series resistance)
    and Bv (breakdown voltage) and never uses them (diode.go:65-69); compat
    reproduces that, physics mode cashes the check.

    Breakdown (SPICE3F5-style): for vd <= -Bv the reverse current turns on
    exponentially, id = -Is_t·exp(-(Bv+vd)/nVt), continuous with the -Is_t
    flat region at vd = -Bv.

    Rs is folded into the terminal characteristic instead of adding an
    internal node (which would change the MNA topology per semantics mode):
    the junction voltage vj solving vj + Rs·i(vj) = vd is found by a fixed
    8-step inner Newton (quadratic convergence; vectorized over devices and
    lanes, no data-dependent control flow), then id = i(vj) and the chain
    rule gives the terminal conductance gd = g(vj)/(1 + Rs·g(vj)).
    """
    vt = thermal_voltage(temp)
    nvt = p["n"] * vt
    is_t = temperature_adjusted_is(p, temp)
    rs = p["rs"]

    def raw(vj):
        fwd = vj > -3.0 * nvt
        bkd = vj <= -p["bv"]
        arg = jnp.minimum(vj / nvt, 40.0)
        barg = jnp.minimum(-(p["bv"] + vj) / nvt, 40.0)
        i_fwd = is_t * (jnp.exp(arg) - 1.0)
        i_bkd = -is_t * jnp.exp(barg)
        id_ = jnp.where(fwd, i_fwd, jnp.where(bkd, i_bkd, -is_t))
        g_fwd = (jnp.abs(i_fwd) + is_t) / nvt
        g_bkd = is_t * jnp.exp(barg) / nvt
        g = jnp.where(fwd, g_fwd, jnp.where(bkd, g_bkd, 0.0)) + p["gmin"]
        return id_, g

    # Inner Newton on f(vj) = vj + Rs·i(vj) − vd.  Newton on an exponential
    # from the high side only gains ~1 nVt per step, so seed from the
    # current-limited junction voltage (|i| ≤ |vd|/Rs bounds the exp arg):
    # forward vj0 = nVt·ln(1 + vd/(Rs·Is)), breakdown mirrored around −Bv.
    # With Rs = 0 the seed is vd exactly and every step is a no-op.
    rs_pos = rs > 0
    rs_safe = jnp.where(rs_pos, rs, 1.0)
    fwd_cap = nvt * jnp.log1p(jnp.maximum(vd, 0.0) / (rs_safe * is_t))
    bkd_cap = -p["bv"] - nvt * jnp.log1p(
        jnp.maximum(-vd - p["bv"], 0.0) / (rs_safe * is_t))
    vj = jnp.where(rs_pos & (vd > 0), jnp.minimum(vd, fwd_cap),
                   jnp.where(rs_pos & (vd < -p["bv"]),
                             jnp.maximum(vd, bkd_cap), vd))
    for _ in range(8):
        ij, gj = raw(vj)
        f = vj + rs * ij - vd
        vj = vj - f / (1.0 + rs * gj)
    ij, gj = raw(vj)
    return ij, gj / (1.0 + rs * gj)


def junction_cap(p, vd):
    """Depletion capacitance Cj0/(1-v/Vj)^M with arg floor 0.1 in reverse,
    linearized in forward (diode.go:151-166).  AC-path only."""
    arg = jnp.maximum(1.0 - vd / p["vj"], 0.1)
    rev = p["cj0"] / jnp.power(arg, p["m"])
    fwdc = p["cj0"] * (1.0 + p["m"] * vd / p["vj"])
    cj = jnp.where(vd < 0, rev, fwdc)
    return jnp.where(p["cj0"] == 0, 0.0, cj)
