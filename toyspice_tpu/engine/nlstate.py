"""Nonlinear-device linearization state ("junction voltages", jv).

The reference keeps per-device voltages (diode.vd, bjt.vbe/vbc/vce,
mosfet.vgs/vds/vbs) updated by UpdateVoltages between Newton iterations.
Here they form one small pytree carried through the Newton loop and across
timesteps/sweep points (the warm-start semantics of PLAN.md 6).

``update_jv`` is UpdateVoltages + pnjlim junction limiting: the reference has
no limiter (its limiter.go is an empty stub) and its unclamped BJT exp
overflows on bjt1.cir (PLAN.md 10); with the standard SPICE3F5 limiter the
Newton fixed points are unchanged but the iteration is globally convergent on
the fixtures.
"""

from typing import Dict

import jax.numpy as jnp

from ..consts import BOLTZMANN, CHARGE, TEMP_DEFAULT
from ..models.limiter import pnjlim, vcrit

_VT = BOLTZMANN * TEMP_DEFAULT / CHARGE


def init_jv(cc) -> Dict:
    def z(kind):
        return jnp.zeros(cc.kind_count(kind), dtype=jnp.float64)

    jv: Dict = {}
    if "D" in cc.idx:
        jv["D"] = {"vd": z("D")}
    if "Q" in cc.idx:
        jv["Q"] = {"vbe": z("Q"), "vbc": z("Q"), "vce": z("Q")}
    if "M" in cc.idx:
        jv["M"] = {"vgs": z("M"), "vds": z("M"), "vbs": z("M")}
    return jv


def update_jv(cc, params, x, jv_prev: Dict, limit: bool = True,
              semantics: str = "compat") -> Dict:
    """Device voltages from the solution vector x, limited against the
    previous iteration's values."""
    jv: Dict = {}

    if "D" in cc.idx:
        nodes = cc.idx["D"]["nodes"]
        pd = params["D"]
        vd = x[nodes[:, 0]] - x[nodes[:, 1]]
        if limit:
            vte = pd["n"] * _VT
            vc = vcrit(vte, pd["is_"])
            vlim = pnjlim(vd, jv_prev["D"]["vd"], vte, vc)
            if semantics == "physics":
                # breakdown-frame limiting (SPICE3F5 diode.c): Newton on the
                # clamped reverse exponential otherwise advances ~1 nVt per
                # iteration; limit -(Bv+vd) exactly like a forward junction.
                # Gate on the NEW voltage only (SPICE3F5 gates on
                # vd < min(0, -bv+10·vte)): if the new vd jumps from
                # breakdown to forward bias, the forward pnjlim result must
                # win — frame-mapping a positive -(bv+vd) through pnjlim
                # would pass the jump through unlimited.
                vd_old = jv_prev["D"]["vd"]
                in_bkd = vd < jnp.minimum(0.0, -pd["bv"] + 10.0 * vte)
                vbk = pnjlim(-(pd["bv"] + vd), -(pd["bv"] + vd_old), vte, vc)
                vlim = jnp.where(in_bkd, -pd["bv"] - vbk, vlim)
            vd = vlim
        jv["D"] = {"vd": vd}

    if "Q" in cc.idx:
        nodes = cc.idx["Q"]["nodes"]
        pq = params["Q"]
        vc_ = x[nodes[:, 0]]
        vb = x[nodes[:, 1]]
        ve = x[nodes[:, 2]]
        pnp = pq["sign"] < 0
        vbe = jnp.where(pnp, ve - vb, vb - ve)
        vbc = jnp.where(pnp, vc_ - vb, vb - vc_)
        if limit:
            vte_f = pq["nf"] * _VT
            vte_r = pq["nr"] * _VT
            vbe = pnjlim(vbe, jv_prev["Q"]["vbe"], vte_f, vcrit(vte_f, pq["ies"]))
            vbc = pnjlim(vbc, jv_prev["Q"]["vbc"], vte_r, vcrit(vte_r, pq["ics"]))
        # vce kept consistent with the (possibly limited) junctions:
        # (vb-ve) - (vb-vc) == vc-ve in the raw frame for both polarities.
        vce = vbe - vbc
        jv["Q"] = {"vbe": vbe, "vbc": vbc, "vce": vce}

    if "M" in cc.idx:
        nodes = cc.idx["M"]["nodes"]
        pmo = params["M"]
        vd = x[nodes[:, 0]]
        vg = x[nodes[:, 1]]
        vs = x[nodes[:, 2]]
        vb = x[nodes[:, 3]]
        s = pmo["sign"]
        jv["M"] = {
            "vgs": s * (vg - vs),
            "vds": s * (vd - vs),
            "vbs": s * (vb - vs),
        }

    return jv
