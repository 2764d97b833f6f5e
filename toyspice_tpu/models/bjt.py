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


def jacobian(p, vbe, vbc, temp):
    """Closed-form consistent Norton linearization of (ic, ib) wrt
    (vbe, vbc): the exact derivative chain of ``currents`` above —
    Shockley exponentials (zero slope in the clamped region), Early factors,
    and the quotient rule through the Ikf/Ikr knee roll-off.

    Deviation (PLAN.md 10, extended): the reference's hand-written BJT stamp
    (bjt.go:344-373) is NOT the Jacobian of its own current equations — the
    base row couples gpi to the collector instead of the emitter and the
    emitter RHS drops the linearization terms — and Newton limit-cycles on
    bjt1.cir even with junction limiting.  The reference's analytic
    gm/gpi/gout (bjt.go:257-281) are likewise inconsistent with its own
    knee/Early algebra.  We stamp the exact Jacobian of the same current
    equations instead (rounds 1-2 used numeric differencing; this closed
    form replaces it — it is what the fused kernel computes at a third of
    the exponential count, and the Newton fixed point is unchanged).
    """
    vt = thermal_voltage(temp)
    sign = p["sign"]
    invnfvt = 1.0 / (p["nf"] * vt)
    invnrvt = 1.0 / (p["nr"] * vt)
    a1 = vbe * invnfvt
    a2 = vbc * invnrvt
    e1 = jnp.exp(jnp.minimum(a1, _EXP_CLAMP))
    e2 = jnp.exp(jnp.minimum(a2, _EXP_CLAMP))
    invvaf = jnp.where(p["vaf"] > 0, 1.0 / p["vaf"], 0.0)
    invvar = jnp.where(p["var"] > 0, 1.0 / p["var"], 0.0)
    invikf = jnp.where(p["ikf"] > 0, 1.0 / p["ikf"], 0.0)
    invikr = jnp.where(p["ikr"] > 0, 1.0 / p["ikr"], 0.0)
    # stage 1: raw Shockley currents (clamped exp has zero slope)
    f0 = sign * p["ies"] * (e1 - 1.0)
    r0 = sign * p["ics"] * (e2 - 1.0)
    df0 = jnp.where(a1 <= _EXP_CLAMP, sign * p["ies"] * e1 * invnfvt, 0.0)
    dr0 = jnp.where(a2 <= _EXP_CLAMP, sign * p["ics"] * e2 * invnrvt, 0.0)
    # stage 2: Early factors; u = 1/qb = 1 - vbc/vaf (1 when vaf off)
    u = 1.0 - vbc * invvaf
    wv = 1.0 + vbe * invvar
    f1 = f0 * u
    r1 = r0 * wv
    df1_be = df0 * u
    df1_bc = -f0 * invvaf
    dr1_be = r0 * invvar
    dr1_bc = dr0 * wv
    # stage 3: knee roll-off i/(1 + |i|·inv_ik·u), quotient rule
    sf = jnp.sign(f1)
    sr = jnp.sign(r1)
    den_f = 1.0 + jnp.abs(f1) * invikf * u
    den_r = 1.0 + jnp.abs(r1) * invikr * u
    f2 = f1 / den_f
    r2 = r1 / den_r
    ddenf_be = sf * df1_be * invikf * u
    ddenf_bc = sf * df1_bc * invikf * u - jnp.abs(f1) * invikf * invvaf
    ddenr_be = sr * dr1_be * invikr * u
    ddenr_bc = sr * dr1_bc * invikr * u - jnp.abs(r1) * invikr * invvaf
    df2_be = (df1_be - f2 * ddenf_be) / den_f
    df2_bc = (df1_bc - f2 * ddenf_bc) / den_f
    dr2_be = (dr1_be - r2 * ddenr_be) / den_r
    dr2_bc = (dr1_bc - r2 * ddenr_bc) / den_r
    # stage 4: terminal currents ic = sign·(af·f2 - r2)·u, ib = ie - ic
    af = p["alphaf"]
    ic0 = sign * (af * f2 - r2) * u
    ie0 = sign * (f2 - r2)
    ib0 = ie0 - ic0
    g11 = sign * (af * df2_be - dr2_be) * u
    g12 = sign * ((af * df2_bc - dr2_bc) * u - (af * f2 - r2) * invvaf)
    g21 = sign * (df2_be - dr2_be) - g11
    g22 = sign * (df2_bc - dr2_bc) - g12
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
