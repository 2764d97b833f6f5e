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


def junction_cap(p, vd):
    """Depletion capacitance Cj0/(1-v/Vj)^M with arg floor 0.1 in reverse,
    linearized in forward (diode.go:151-166).  AC-path only."""
    arg = jnp.maximum(1.0 - vd / p["vj"], 0.1)
    rev = p["cj0"] / jnp.power(arg, p["m"])
    fwdc = p["cj0"] * (1.0 + p["m"] * vd / p["vj"])
    cj = jnp.where(vd < 0, rev, fwdc)
    return jnp.where(p["cj0"] == 0, 0.0, cj)
