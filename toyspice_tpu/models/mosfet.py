"""MOSFET levels 1-3 (reference pkg/device/mosfet.go).

All instances evaluate all three levels vectorized and select by the
per-device level code — no per-device dispatch.  Levels 2/3 use the
reference's numeric differencing (delta=1e-6, mosfet.go:517-532) for
conductances.

Deviation (documented): the reference computes gmbs from the *previous*
iteration's gm (mosfet.go:494-499 reads m.gm before it is overwritten below);
we use the current gm.  The Newton fixed point is identical, and the only
fixture (mosfet1.cir) has vbs=0 where gmbs=gmin either way.
"""

from typing import NamedTuple

import jax.numpy as jnp

CUTOFF, LINEAR, SATURATION = 0, 1, 2
_GMIN = 1e-12
_DELTA = 1e-6

_EPS0 = 8.85e-14  # F/cm, as the reference writes it (mosfet.go:382)


class MosEval(NamedTuple):
    id: jnp.ndarray
    region: jnp.ndarray
    gm: jnp.ndarray
    gds: jnp.ndarray
    gmbs: jnp.ndarray
    cgs: jnp.ndarray
    cgd: jnp.ndarray
    cgb: jnp.ndarray
    cbs_eff: jnp.ndarray
    cbd_eff: jnp.ndarray


def terminal_voltages(p, vnl, nodes):
    """vgs, vds, vbs (flipped for PMOS) per UpdateVoltages (mosfet.go:640-665).
    nodes columns: drain, gate, source, bulk."""
    vd = vnl[nodes[:, 0]]
    vg = vnl[nodes[:, 1]]
    vs = vnl[nodes[:, 2]]
    vb = vnl[nodes[:, 3]]
    s = p["sign"]
    vgs = s * (vg - vs)
    vds = s * (vd - vs)
    vbs = s * (vb - vs)
    return vgs, vds, vbs


def cold_start(p, vgs, vds, vbs):
    """All-zero bias -> typical bias guess (mosfet.go:678-690).  Stored state
    is the flipped (type-positive) voltage, so the guess is +0.7/+0.1 for both
    types in this representation."""
    cold = (vgs == 0.0) & (vds == 0.0) & (vbs == 0.0)
    return (
        jnp.where(cold, 0.7, vgs),
        jnp.where(cold, 0.1, vds),
        jnp.where(cold, 0.0, vbs),
    )


def _vth(p, vbs_pos):
    """Threshold with body effect, in the type-positive frame
    (mosfet.go:296-318).  The PMOS negation there cancels against the sign
    flips in calculateCurrents; evaluating in the flipped frame lets one
    expression serve both types."""
    vth = p["vto"] + p["gamma"] * (
        jnp.sqrt(jnp.maximum(0.0, p["phi"] - vbs_pos)) - jnp.sqrt(p["phi"])
    )
    return jnp.where(p["gamma"] > 0, vth, p["vto"])


def _ids_pos(p, level, vgs, vds, vbs):
    """Drain current in the type-positive frame; returns (id, region).

    vgs/vds/vbs here are the *stored* (already type-flipped) voltages, which is
    what calculateCurrents works with after its own flip (mosfet.go:321-355).
    """
    vth = _vth(p, vbs)
    vgst = vgs - vth

    beta1 = p["kp"] * p["w"] / p["l"]

    # --- Level 1 (mosfet.go:358-375) ---
    lin1 = beta1 * (vgst * vds - 0.5 * vds * vds) * (1.0 + p["lam"] * vds)
    sat1 = 0.5 * beta1 * vgst * vgst * (1.0 + p["lam"] * vds)
    id1 = jnp.where(vds < vgst, lin1, sat1)
    reg1 = jnp.where(vds < vgst, LINEAR, SATURATION)

    # --- Level 2 (mosfet.go:378-418) — unit quirks preserved verbatim ---
    cox = 3.9 * _EPS0 / p["tox"]
    eeff = vgst / (p["tox"] * 100.0)
    ueff = p["uo"] / jnp.where(
        (p["ucrit"] > 0) & (eeff > 0),
        1.0 + jnp.power(jnp.maximum(eeff / p["ucrit"], 1e-300), p["uexp"]),
        1.0,
    )
    ecrit = p["vmax"] / jnp.where(ueff == 0, 1.0, ueff) * 100.0
    vdsat2 = jnp.where(p["vmax"] > 0, jnp.minimum(vgst, ecrit * p["l"]), vgst)
    beta2 = ueff * cox * p["w"] / (p["l"] * 100.0)
    lin2 = beta2 * (vgst * vds - 0.5 * vds * vds) * (1.0 + p["lam"] * vds)
    sat2 = 0.5 * beta2 * vdsat2 * vdsat2 * (1.0 + p["lam"] * vds)
    id2 = jnp.where(vds < vdsat2, lin2, sat2)
    reg2 = jnp.where(vds < vdsat2, LINEAR, SATURATION)

    # --- Level 3 (mosfet.go:421-459) ---
    vgst_eff = jnp.where(p["theta"] > 0, vgst / (1.0 + p["theta"] * vgst), vgst)
    vdsat3 = jnp.where(
        p["kappa"] > 0,
        vgst_eff / jnp.sqrt(jnp.maximum(1.0 + p["kappa"] * vgst_eff, 1e-30)),
        vgst_eff,
    )
    beta3 = beta1 / jnp.where(p["delta"] > 0, 1.0 + p["delta"] / p["w"], 1.0)
    lin3 = (
        beta3
        * (vgst_eff * vds - 0.5 * vds * vds / (1.0 + p["kappa"] * vgst_eff))
        * (1.0 + p["lam"] * vds)
    )
    sat3 = 0.5 * beta3 * vdsat3 * vdsat3 * (1.0 + p["lam"] * vds)
    id3 = jnp.where(vds < vdsat3, lin3, sat3)
    reg3 = jnp.where(vds < vdsat3, LINEAR, SATURATION)

    idl = jnp.where(level == 2, id2, jnp.where(level == 3, id3, id1))
    regl = jnp.where(level == 2, reg2, jnp.where(level == 3, reg3, reg1))

    cutoff = vgst <= 0
    return jnp.where(cutoff, 0.0, idl), jnp.where(cutoff, CUTOFF, regl)


def dc_eval(p, level, vgs, vds, vbs) -> MosEval:
    """Currents, region, conductances and Meyer capacitances at the stored
    (type-flipped) bias."""
    sign = p["sign"]

    id_pos, region = _ids_pos(p, level, vgs, vds, vbs)
    id_ = sign * id_pos  # stamped current (mosfet.go:354)

    vth = _vth(p, vbs)
    vgst = vgs - vth
    beta1 = p["kp"] * p["w"] / p["l"]

    # Level 1 analytic conductances (mosfet.go:505-515), type-positive frame
    gm1 = jnp.where(
        region == LINEAR,
        beta1 * vds * (1.0 + p["lam"] * vds),
        beta1 * vgst * (1.0 + p["lam"] * vds),
    )
    gds1 = jnp.where(
        region == LINEAR,
        beta1 * (vgst - vds) * (1.0 + p["lam"] * vds)
        + beta1 * p["lam"] * (vgst * vds - 0.5 * vds * vds),
        0.5 * beta1 * vgst * vgst * p["lam"],
    )

    # Levels 2/3: numeric differencing (mosfet.go:517-532).  The reference
    # perturbs the *raw* voltages then re-flips inside calculateCurrents; in
    # the type-positive frame the NMOS perturbation is +delta and the PMOS one
    # is -delta, and the returned current carries the sign factor.
    d = _DELTA * sign  # perturbation as seen in the flipped frame
    idg, _ = _ids_pos(p, level, vgs + d, vds, vbs)
    idd, _ = _ids_pos(p, level, vgs, vds + d, vbs)
    idb, _ = _ids_pos(p, level, vgs, vds, vbs + d)
    gm23 = jnp.maximum((sign * idg - id_) / _DELTA, _GMIN)
    gds23 = jnp.maximum((sign * idd - id_) / _DELTA, _GMIN)
    gmbs23 = jnp.maximum((sign * idb - id_) / _DELTA, _GMIN)

    use23 = (level == 2) | (level == 3)
    gm = jnp.where(use23, gm23, gm1)
    gds = jnp.where(use23, gds23, gds1)

    # body-effect transconductance (mosfet.go:494-501); see module docstring
    # for the prev-gm deviation.
    gmbs1 = jnp.where(
        (p["gamma"] > 0) & (p["phi"] > 0) & (vbs < 0),
        gm * p["gamma"] / (2.0 * jnp.sqrt(jnp.maximum(p["phi"] - vbs, 1e-30))),
        _GMIN,
    )
    gmbs = jnp.where(use23, gmbs23, gmbs1)

    cut = region == CUTOFF
    gm = jnp.where(cut, _GMIN, gm)
    gds = jnp.where(cut, _GMIN, gds)
    gmbs = jnp.where(cut, _GMIN, gmbs)

    # PMOS sign application (mosfet.go:534-537): gm and gmbs flipped, gds not.
    gm = gm * sign
    gmbs = gmbs * sign

    # Meyer capacitances (mosfet.go:540-594)
    cox = 3.9 * _EPS0 / p["tox"]
    cgate = cox * p["w"] * p["l"]
    cgso = p["cgso"] * p["w"]
    cgdo = p["cgdo"] * p["w"]
    cgbo = p["cgbo"] * p["l"]

    cbs_eff = jnp.where(
        (p["cbs"] == 0) & (p["cj"] > 0),
        p["cj"] * p["as"] + p["cjsw"] * p["ps"],
        p["cbs"],
    )
    cbd_eff = jnp.where(
        (p["cbd"] == 0) & (p["cj"] > 0),
        p["cj"] * p["ad"] + p["cjsw"] * p["pd"],
        p["cbd"],
    )

    cgs = jnp.where(
        cut, cgso, jnp.where(region == LINEAR, cgate / 2.0 + cgso, 2.0 * cgate / 3.0 + cgso)
    )
    cgd = jnp.where(cut, cgdo, jnp.where(region == LINEAR, cgate / 2.0 + cgdo, cgdo))
    cgb = jnp.where(
        cut, 2.0 * cgate / 3.0, jnp.where(region == LINEAR, cgbo, cgbo + cgate / 3.0)
    )

    return MosEval(
        id=id_, region=region, gm=gm, gds=gds, gmbs=gmbs,
        cgs=cgs, cgd=cgd, cgb=cgb, cbs_eff=cbs_eff, cbd_eff=cbd_eff,
    )


def charges(p, ev: MosEval, vgs, vds, vbs):
    """Charge storage for the transient stamp (mosfet.go:597-637)."""
    vgd = vgs - vds
    vbd = vbs - vds

    qgs = jnp.where(ev.region == CUTOFF, 0.0, ev.cgs * vgs)
    qgd = jnp.where(ev.region == CUTOFF, 0.0, ev.cgd * vgd)
    qgb = ev.cgb * (vgs - vbs)

    cbs_v = jnp.where(
        vbs < 0,
        ev.cbs_eff / jnp.power(jnp.maximum(1.0 - vbs / p["pb"], 1e-30), p["mj"]),
        ev.cbs_eff * (1.0 + p["mj"] * vbs / p["pb"]),
    )
    cbd_v = jnp.where(
        vbd < 0,
        ev.cbd_eff / jnp.power(jnp.maximum(1.0 - vbd / p["pb"], 1e-30), p["mj"]),
        ev.cbd_eff * (1.0 + p["mj"] * vbd / p["pb"]),
    )
    qbs = cbs_v * vbs
    qbd = cbd_v * vbd
    return qgs, qgd, qgb, qbs, qbd
