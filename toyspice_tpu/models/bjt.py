"""Ebers-Moll BJT (reference pkg/device/bjt.go).

Deviation (PLAN.md item 10): exponential arguments are clamped at 40 — the
reference's unclamped exp (bjt.go:216-217) overflows to +Inf on the linear-only
initial estimate (e.g. vbe≈10V on bjt1.cir) and Go's NaN comparison semantics
make the outcome solver-noise; clamping (exactly as the reference's own diode
does, diode.go:127-131) keeps the Newton iteration finite and converging to the
same fixed point.
"""

import jax.numpy as jnp

from ..consts import BOLTZMANN, CHARGE, TEMP_DEFAULT

_EXP_CLAMP = 40.0


def thermal_voltage(temp):
    t = jnp.where(temp <= 0, TEMP_DEFAULT, temp)
    return BOLTZMANN * t / CHARGE


def cold_start(p, vbe, vbc, vce, temp):
    """Replace all-zero bias with the reference's cold-start guess
    (bjt.go:110-120, triggered at 323-331): vbe = Nf·Vt·ln(1e-3/Ies),
    vce = max(2, vbe+1), vbc = vbe - vce."""
    vt = thermal_voltage(temp)
    vbe0 = p["nf"] * vt * jnp.log(1e-3 / p["ies"])
    vce0 = jnp.maximum(2.0, vbe0 + 1.0)
    vbc0 = vbe0 - vce0
    cold = (vbe == 0.0) & (vce == 0.0)
    return (
        jnp.where(cold, vbe0, vbe),
        jnp.where(cold, vbc0, vbc),
        jnp.where(cold, vce0, vce),
    )


def currents(p, vbe, vbc, temp):
    """(ic, ib) from the Ebers-Moll equations with Early voltage and knee
    roll-off — exactly calculateCurrents (bjt.go:214-255) with the exp-arg
    clamp."""
    vt = thermal_voltage(temp)
    sign = p["sign"]
    exp_vbe = jnp.exp(jnp.minimum(vbe / (p["nf"] * vt), _EXP_CLAMP))
    exp_vbc = jnp.exp(jnp.minimum(vbc / (p["nr"] * vt), _EXP_CLAMP))
    i_f = sign * p["ies"] * (exp_vbe - 1.0)
    i_r = sign * p["ics"] * (exp_vbc - 1.0)
    i_f = jnp.where(p["vaf"] > 0, i_f * (1.0 - vbc / p["vaf"]), i_f)
    i_r = jnp.where(p["var"] > 0, i_r * (1.0 + vbe / p["var"]), i_r)
    qb = jnp.where(p["vaf"] > 0, 1.0 / (1.0 - vbc / p["vaf"]), 1.0)
    i_f = jnp.where(p["ikf"] > 0, i_f / (1.0 + jnp.abs(i_f) / (p["ikf"] * qb)), i_f)
    i_r = jnp.where(p["ikr"] > 0, i_r / (1.0 + jnp.abs(i_r) / (p["ikr"] * qb)), i_r)
    ie = sign * (i_f - i_r)
    ic = sign * ((p["alphaf"] * i_f - i_r) / qb)
    ib = ie - ic
    return ic, ib


_DELTA = 1e-6


def jacobian(p, vbe, vbc, temp):
    """Consistent Norton linearization of (ic, ib) wrt (vbe, vbc) by numeric
    differencing (the reference's own technique for MOSFET levels 2/3,
    mosfet.go:517-532).

    Deviation (PLAN.md 10, extended): the reference's hand-written BJT stamp
    (bjt.go:344-373) is NOT the Jacobian of its own current equations — the
    base row couples gpi to the collector instead of the emitter and the
    emitter RHS drops the linearization terms — and Newton limit-cycles on
    bjt1.cir even with junction limiting.  We stamp the exact Jacobian of the
    same equations instead; the nonlinear solution (what a fixed reference
    would produce) is identical.
    """
    ic0, ib0 = currents(p, vbe, vbc, temp)
    icp, ibp = currents(p, vbe + _DELTA, vbc, temp)
    icq, ibq = currents(p, vbe, vbc + _DELTA, temp)
    g11 = (icp - ic0) / _DELTA
    g12 = (icq - ic0) / _DELTA
    g21 = (ibp - ib0) / _DELTA
    g22 = (ibq - ib0) / _DELTA
    return ic0, ib0, g11, g12, g21, g22


def junction_caps(p, vbe, vbc, gm):
    """Depletion + diffusion capacitances (bjt.go:196-212); gm is the
    consistent forward transconductance |dic/dvbe|."""
    cbe_dep = jnp.where(
        vbe < p["vje"],
        p["cje"] / jnp.power(jnp.maximum(1.0 - vbe / p["vje"], 1e-30), p["mje"]),
        p["cje"] * (1.0 + p["mje"] * (vbe - p["vje"]) / p["vje"]),
    )
    cbc = jnp.where(
        vbc < p["vjc"],
        p["cjc"] / jnp.power(jnp.maximum(1.0 - vbc / p["vjc"], 1e-30), p["mjc"]),
        p["cjc"] * (1.0 + p["mjc"] * (vbc - p["vjc"]) / p["vjc"]),
    )
    cbe = cbe_dep + p["tf"] * jnp.abs(gm)
    return cbe, cbc
