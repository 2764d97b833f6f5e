"""MNA system assembly: vectorized evaluate-and-scatter stamping.

The matrix is dense (np1, np1) with row 0 the ground row (identity, b[0]=0).
Stamps never special-case ground: contributions into row 0 are overwritten by
the ground row, and contributions into column 0 are inert because x[0] == 0
exactly — so the scatter pattern is fully static.  Where the reference gates a
*different* row's RHS term behind a node's ground check (MOSFET gate/bulk
blocks, mosfet.go:744-782), the value is masked explicitly to preserve
semantics.

Each device kind contributes a fixed set of (row, col) entries per instance
(static numpy index arrays) and a value vector computed from (params, state,
linearization voltages, t, dt); one scatter-add builds A, another builds b.

Modes:
  "op"   — operating point / DC sweep stamps (reference Mode=OperatingPoint)
  "tran" — transient companion-model stamps (Mode=Transient)
AC assembly is separate (`assemble_system_ac`) and produces the real 2(np1)
block embedding [[G, -B], [B, G]] of the complex system.
"""

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..consts import TEMP_DEFAULT
from ..models import bjt as bjt_model
from ..models import diode as diode_model
from ..models import magnetic as mag_model
from ..models import mosfet as mos_model
from ..models.sources import eval_sources, eval_sources_ac


def _tadjust(tbl, temp):
    """Quadratic temperature adjustment value*(1 + tc1*dT + tc2*dT^2) at
    Tnom 300.15 K (resistor.go:77-81, capacitor.go:180-184)."""
    dtemp = temp - TEMP_DEFAULT
    return tbl["value"] * (1.0 + tbl["tc1"] * dtemp + tbl["tc2"] * dtemp * dtemp)


def _scatter(np1, rows, cols, vals):
    a = jnp.zeros((np1, np1), dtype=vals.dtype)
    return a.at[rows, cols].add(vals)


class _Acc:
    """Accumulates (row, col, value) and (row, value) contributions."""

    def __init__(self):
        self.rows = []
        self.cols = []
        self.vals = []
        self.rrows = []
        self.rvals = []

    def add(self, r, c, v):
        r = np.asarray(r, dtype=np.int32).ravel()
        c = np.asarray(c, dtype=np.int32).ravel()
        v = jnp.ravel(v)
        self.rows.append(r)
        self.cols.append(c)
        self.vals.append(v)

    def add_rhs(self, r, v):
        self.rrows.append(np.asarray(r, dtype=np.int32).ravel())
        self.rvals.append(jnp.ravel(v))

    def build(self, np1, dtype=jnp.float64):
        if self.rows:
            rows = np.concatenate(self.rows)
            cols = np.concatenate(self.cols)
            vals = jnp.concatenate(self.vals)
            a = jnp.zeros((np1, np1), dtype=dtype).at[rows, cols].add(vals)
        else:
            a = jnp.zeros((np1, np1), dtype=dtype)
        if self.rrows:
            rrows = np.concatenate(self.rrows)
            rvals = jnp.concatenate(self.rvals)
            b = jnp.zeros(np1, dtype=dtype).at[rrows].add(rvals)
        else:
            b = jnp.zeros(np1, dtype=dtype)
        return a, b


def _two_node_pattern(acc: _Acc, nodes: np.ndarray, g):
    """Standard conductance stamp: +g on diagonals, -g off-diagonal."""
    n1, n2 = nodes[:, 0], nodes[:, 1]
    acc.add(n1, n1, g)
    acc.add(n1, n2, -g)
    acc.add(n2, n1, -g)
    acc.add(n2, n2, g)


def _branch_pattern(acc: _Acc, nodes: np.ndarray, branch: np.ndarray, dtype):
    """±1 node-branch couplings with the reference inductor's sign convention
    (n1 -> -1, n2 -> +1; inductor.go:59-66, magnetic.go:226-232)."""
    n1, n2 = nodes[:, 0], nodes[:, 1]
    ones = jnp.ones(len(branch), dtype=dtype)
    acc.add(n1, branch, -ones)
    acc.add(branch, n1, -ones)
    acc.add(n2, branch, ones)
    acc.add(branch, n2, ones)


def _vsource_pattern(acc: _Acc, nodes: np.ndarray, branch: np.ndarray, dtype):
    """±1 with the voltage-source convention (n1 -> +1; vsource.go:140-147)."""
    n1, n2 = nodes[:, 0], nodes[:, 1]
    ones = jnp.ones(len(branch), dtype=dtype)
    acc.add(branch, n1, ones)
    acc.add(n1, branch, ones)
    acc.add(branch, n2, -ones)
    acc.add(n2, branch, -ones)


def _gather_inductance(cc, params, state, kind_sel, idx_sel, temp,
                       semantics="compat"):
    """Per-pair (inductance, i0, i1) as Mutual sees them via
    GetValue()/GetCurrent() (mutual.go:79-103): linear L -> (value, junk i0);
    magnetic -> (J-A GetValue at own i0, i0).  i1 is the committed current
    used by physics mode."""
    if "L" in cc.idx:
        l_val = params["L"]["value"]
        l_i0 = state["L"]["i0"]
        l_i1 = state["L"]["i1"]
    else:
        l_val = jnp.ones(1, dtype=jnp.float64)
        l_i0 = jnp.zeros(1, dtype=jnp.float64)
        l_i1 = jnp.zeros(1, dtype=jnp.float64)
    if "LM" in cc.idx:
        pm = params["LM"]
        stm = state["LM"]
        core_st = mag_model.CoreState(
            H=stm["H"], Hold=stm["Hold"], M=stm["M"], Mirr=stm["Mirr"],
            dMdH=stm["dMdH"],
        )
        if semantics == "compat":
            lm_val_all = mag_model.value_for_mutual(pm, core_st, stm["i0"], temp)
        else:
            # physics: same incremental inductance as the branch stamp
            lm_val_all = jnp.maximum(
                1e-12,
                mag_model.l_zero(pm) * (1.0 + jnp.clip(stm["dMdH"], -1e3, 1e3)),
            )
        lm_i0 = stm["i0"]
        lm_i1 = stm["i1"]
    else:
        lm_val_all = jnp.ones(1, dtype=jnp.float64)
        lm_i0 = jnp.zeros(1, dtype=jnp.float64)
        lm_i1 = jnp.zeros(1, dtype=jnp.float64)

    idx_l = np.minimum(idx_sel, max(0, l_val.shape[-1] - 1) if "L" in cc.idx else 0)
    idx_m = np.minimum(idx_sel, max(0, lm_val_all.shape[-1] - 1) if "LM" in cc.idx else 0)
    val = jnp.where(kind_sel == 0, l_val[idx_l], lm_val_all[idx_m])
    i0 = jnp.where(kind_sel == 0, l_i0[idx_l], lm_i0[idx_m])
    i1 = jnp.where(kind_sel == 0, l_i1[idx_l], lm_i1[idx_m])
    return val, i0, i1


def _assemble_acc(
    cc,
    params: Dict,
    state: Dict,
    jv,
    t,
    dt,
    mode: str,
    status_gmin,
    dc_scale=1.0,
    linear_only: bool = False,
    temp=TEMP_DEFAULT,
    semantics: str = "compat",
    gmin_floor: float = 1e-12,
    integration: str = "be",
) -> _Acc:
    """Device stamping into an accumulator of (row, col, value) entries.

    `jv` is the nonlinear linearization state (per-device junction voltages,
    engine/nlstate.py — what the reference devices hold after UpdateVoltages);
    `state` the committed transient state; `status_gmin` mirrors
    CircuitStatus.Gmin (stamp-visible gmin: the ladder value in OP/DC, 0 in
    transient); `linear_only` stamps only non-NonLinear devices (the OP
    initial estimate, op.go:90-111).

    The (row, col) arrays are STATIC (host numpy) for a given circuit and
    mode — only the values are traced — so callers can either scatter into a
    dense (np1, np1) system (`assemble_system`) or hand the flat entry
    vectors to a fused build+solve kernel (`assemble_entries` +
    ops/pallas_solve.solve_stamped).
    """
    assert mode in ("op", "tran")
    tran = mode == "tran"
    np1 = cc.np1
    acc = _Acc()
    f64 = jnp.float64

    # --- resistors (resistor.go:32-75), temperature-adjusted; tc defaults
    # are 0 so the factor is exactly 1 ---
    if "R" in cc.idx:
        g = 1.0 / _tadjust(params["R"], temp)
        _two_node_pattern(acc, cc.idx["R"]["nodes"], g)

    # --- capacitors (temperature-adjusted like the reference; the companion
    # charge and LTE use the raw value, capacitor.go:155-178) ---
    if "C" in cc.idx:
        nodes = cc.idx["C"]["nodes"]
        cval = _tadjust(params["C"], temp)
        if tran:
            if semantics == "physics" and integration == "trap":
                # trapezoidal companion: geq = 2C/dt, Ieq = geq*v_prev +
                # i_prev (2nd order); the FIRST step has no current history
                # and runs BE (SPICE3 starts at order 1 for the same reason)
                stc = state["C"]
                started = stc["hist"] > 0
                geq = jnp.where(started, 2.0 * cval / dt, cval / dt)
                ceq = jnp.where(started, geq * stc["v0"] + stc["i0"],
                                stc["q0"] / dt)
            else:
                # BE charge-form companion (capacitor.go:85-105): geq=C/dt
                # with ceq=charge1/dt.  compat uses the reference's one-step-
                # lagged q1 (PLAN.md 3 — costs ~30% amplitude error on
                # rc.cir); physics uses the previous accepted step's charge
                # q0, the textbook BE form.
                geq = cval / dt
                qprev = state["C"]["q1"] if semantics == "compat" else state["C"]["q0"]
                ceq = qprev / dt
            _two_node_pattern(acc, nodes, geq)
            acc.add_rhs(nodes[:, 0], ceq)
            acc.add_rhs(nodes[:, 1], -ceq)
        else:
            # OP: gmin leak (capacitor.go:67-83); the floor is the
            # convergence-gmin default (anlysis.go:41), SimOptions.gmin
            gc = jnp.maximum(status_gmin, gmin_floor) * jnp.ones_like(cval)
            _two_node_pattern(acc, nodes, gc)

    # --- linear inductors (inductor.go:38-79; BE order-1 companion, or the
    # trapezoidal branch companion in physics mode) ---
    if "L" in cc.idx:
        nodes = cc.idx["L"]["nodes"]
        branch = cc.idx["L"]["branch"]
        lval = params["L"]["value"]
        dt_eff = jnp.where(dt > 0, dt, 1e-9)
        _branch_pattern(acc, nodes, branch, f64)
        if semantics == "physics" and integration == "trap":
            # TR of L dI/dt = v with x_b = -I:
            # -v1+v2 - (2L/dt) x_b = (2L/dt) i1 + v_prev
            # (BE on the first step: no voltage history yet)
            stl = state["L"]
            started = stl["hist"] > 0
            lcoef = jnp.where(started, 2.0 * lval / dt_eff, lval / dt_eff)
            acc.add(branch, branch, -lcoef)
            acc.add_rhs(branch,
                        lcoef * stl["i1"] + jnp.where(started, stl["v0"], 0.0))
        else:
            acc.add(branch, branch, -lval / dt_eff)
            acc.add_rhs(branch, lval / dt_eff * state["L"]["i1"])

    # --- magnetic inductors (magnetic.go:197-274) ---
    if "LM" in cc.idx:
        nodes = cc.idx["LM"]["nodes"]
        branch = cc.idx["LM"]["branch"]
        pm = params["LM"]
        stm = state["LM"]
        _branch_pattern(acc, nodes, branch, f64)
        if tran:
            dt_eff = jnp.where(dt > 0, dt, 1e-9)
            l0 = mag_model.l_zero(pm)
            if semantics == "compat":
                # reference behavior: i0 is frozen at 0 (PLAN.md 1), so the
                # |i0|<1e-9 guard always selects the linear L0 branch
                core_st = mag_model.CoreState(
                    H=stm["H"], Hold=stm["Hold"], M=stm["M"], Mirr=stm["Mirr"],
                    dMdH=stm["dMdH"],
                )
                leff, _ = mag_model.l_effective(pm, core_st, stm["i0"], temp)
                use_l0 = (t < dt_eff) | (jnp.abs(stm["i0"]) < 1e-9)
                l_used = jnp.where(use_l0, l0, leff)
            else:
                # physics: incremental inductance from the committed core
                # state (dMdH starts at 0, so this is L0 at t=0 and evolves
                # continuously — no discontinuous L0/Leff switching)
                dmdh = jnp.clip(stm["dMdH"], -1e3, 1e3)
                l_used = jnp.maximum(1e-12, l0 * (1.0 + dmdh))
            acc.add(branch, branch, -l_used / dt_eff)
            acc.add_rhs(branch, l_used / dt_eff * stm["i1"])
        else:
            # OP: small fixed branch diagonal, note the +sign (magnetic.go:216-217)
            acc.add(branch, branch, 1e-3 * jnp.ones(len(branch), dtype=f64))

    # --- voltage sources (vsource.go:131-152) ---
    if "V" in cc.idx:
        nodes = cc.idx["V"]["nodes"]
        branch = cc.idx["V"]["branch"]
        _vsource_pattern(acc, nodes, branch, f64)
        vvals = eval_sources(cc.idx["V"]["stype"], params["V"], t, dc_scale)
        acc.add_rhs(branch, vvals)

    # --- current sources (isource.go:130-147) ---
    if "I" in cc.idx:
        nodes = cc.idx["I"]["nodes"]
        ivals = eval_sources(cc.idx["I"]["stype"], params["I"], t)
        acc.add_rhs(nodes[:, 0], ivals)
        acc.add_rhs(nodes[:, 1], -ivals)

    # --- mutual couplings: transient only (mutual.go:57-120) ---
    if "K" in cc.idx and tran:
        kidx = cc.idx["K"]
        coeff = params["K"]["coeff"]
        la, i0a, i1a = _gather_inductance(cc, params, state, kidx["kind_a"],
                                          kidx["idx_a"], temp, semantics)
        lb, i0b, i1b = _gather_inductance(cc, params, state, kidx["kind_b"],
                                          kidx["idx_b"], temp, semantics)
        mij = coeff * jnp.sqrt(la * lb)
        dt_eff = dt  # mutual returns early if dt<=0; transient always has dt>0
        if semantics == "physics" and integration == "trap":
            # the coupled rows are trapezoidal (2L/dt), so the cross terms
            # must be too: -2M/dt with memory +2M/dt*I_prev — a BE M/dt here
            # would converge to an effectively HALVED mutual inductance.
            # Applies only to linear-L pairs (magnetic LM rows stay BE) and
            # follows the first-step-BE gating of the windings' hist flag.
            both_linear = (kidx["kind_a"] == 0) & (kidx["kind_b"] == 0)  # static
            if "L" in cc.idx:
                nl = max(1, cc.kind_count("L"))
                ia = np.minimum(kidx["idx_a"], nl - 1)
                ib = np.minimum(kidx["idx_b"], nl - 1)
                started = ((state["L"]["hist"][ia] > 0)
                           & (state["L"]["hist"][ib] > 0))
            else:
                started = jnp.zeros(len(kidx["idx_a"]), dtype=bool)
            use_tr = jnp.asarray(both_linear) & started
            mcoef = jnp.where(use_tr, 2.0 * mij / dt_eff, mij / dt_eff)
            acc.add(kidx["branch_a"], kidx["branch_b"], -mcoef)
            acc.add(kidx["branch_b"], kidx["branch_a"], -mcoef)
            acc.add_rhs(kidx["branch_a"], mcoef * i1b)
            acc.add_rhs(kidx["branch_b"], mcoef * i1a)
        else:
            acc.add(kidx["branch_a"], kidx["branch_b"], -mij / dt_eff)
            acc.add(kidx["branch_b"], kidx["branch_a"], -mij / dt_eff)
            if semantics == "compat":
                # reference RHS uses GetCurrent() — the junk i0 (PLAN.md 4)
                # with a sign inconsistent with the inductor companion
                # (mutual.go:114-115)
                acc.add_rhs(kidx["branch_a"], -mij * i0b / dt_eff)
                acc.add_rhs(kidx["branch_b"], -mij * i0a / dt_eff)
            else:
                # physics: consistent BE memory term +M/dt·I_prev of partner
                acc.add_rhs(kidx["branch_a"], mij * i1b / dt_eff)
                acc.add_rhs(kidx["branch_b"], mij * i1a / dt_eff)

    if not linear_only:
        # --- diodes (diode.go:184-227) ---
        if "D" in cc.idx:
            nodes = cc.idx["D"]["nodes"]
            pd = params["D"]
            vd = jv["D"]["vd"]
            if semantics == "physics":
                # Rs/Bv live only here: the reference parses both and never
                # uses them (diode.go:65-69); compat stays faithful to that
                id_, gd = diode_model.dc_eval_physics(pd, vd, temp)
            else:
                id_, gd = diode_model.dc_eval(pd, vd, temp)
            if tran:
                charge = pd["tt"] * id_
                if semantics == "physics" and integration == "trap":
                    # trapezoidal diffusion-charge companion (2nd order):
                    # icap = (2/dt)(q - q_prev) - icap_prev, geq = 2·Tt·gd/dt;
                    # first committed step runs BE like the C/L companions
                    std = state["D"]
                    started = std["hist"] > 0
                    dq = charge - std["prev_charge"]
                    cap_cur = jnp.where(
                        dt > 0,
                        jnp.where(started, 2.0 * dq / dt - std["ic0"], dq / dt),
                        0.0)
                    geq = jnp.where(
                        dt > 0,
                        jnp.where(started, 2.0, 1.0) * pd["tt"] * gd / dt,
                        0.0)
                else:
                    cap_cur = jnp.where(
                        dt > 0, (charge - state["D"]["prev_charge"]) / dt, 0.0)
                    geq = jnp.where(dt > 0, pd["tt"] * gd / dt, 0.0)
                gd = gd + geq
                id_ = id_ + cap_cur
            _two_node_pattern(acc, nodes, gd)
            rhs = id_ - gd * vd
            acc.add_rhs(nodes[:, 0], -rhs)
            acc.add_rhs(nodes[:, 1], rhs)

        # --- BJTs: Ebers-Moll with a consistent numerically-differenced
        # Jacobian stamp (see models/bjt.py jacobian docstring for why this
        # deviates from bjt.go:315-374).  Transient charge storage stays off,
        # matching the reference where StampTransient is dead code (PLAN.md 1).
        if "Q" in cc.idx:
            nodes = cc.idx["Q"]["nodes"]
            pq = params["Q"]
            vbe, vbc, vce = jv["Q"]["vbe"], jv["Q"]["vbc"], jv["Q"]["vce"]
            vbe, vbc, vce = bjt_model.cold_start(pq, vbe, vbc, vce, temp)
            ic0, ib0, g11, g12, g21, g22 = bjt_model.jacobian(pq, vbe, vbc, temp)
            nc, nb, ne = nodes[:, 0], nodes[:, 1], nodes[:, 2]
            # junction-frame -> node-frame incidence: vbe/vbc differentiate
            # with +sb on the base node (sb = +1 NPN / -1 PNP)
            sb = pq["sign"]
            acc.add(nc, nb, (g11 + g12) * sb)
            acc.add(nc, ne, -g11 * sb)
            acc.add(nc, nc, -g12 * sb)
            acc.add(nb, nb, (g21 + g22) * sb)
            acc.add(nb, ne, -g21 * sb)
            acc.add(nb, nc, -g22 * sb)
            acc.add(ne, nb, -(g11 + g12 + g21 + g22) * sb)
            acc.add(ne, ne, (g11 + g21) * sb)
            acc.add(ne, nc, (g12 + g22) * sb)
            acc.add_rhs(nc, -ic0 + g11 * vbe + g12 * vbc)
            acc.add_rhs(nb, -ib0 + g21 * vbe + g22 * vbc)
            acc.add_rhs(ne, (ic0 + ib0) - (g11 + g21) * vbe - (g12 + g22) * vbc)

        # --- MOSFETs (mosfet.go:668-786) ---
        if "M" in cc.idx:
            nodes = cc.idx["M"]["nodes"]
            level = cc.idx["M"]["level"]
            pmo = params["M"]
            vgs, vds, vbs = jv["M"]["vgs"], jv["M"]["vds"], jv["M"]["vbs"]
            vgs, vds, vbs = mos_model.cold_start(pmo, vgs, vds, vbs)
            ev = mos_model.dc_eval(pmo, level, vgs, vds, vbs)
            nd, ng, ns, nb = nodes[:, 0], nodes[:, 1], nodes[:, 2], nodes[:, 3]
            gmin = status_gmin

            acc.add(nd, nd, ev.gds + gmin)
            acc.add(nd, ng, ev.gm)
            acc.add(nd, ns, -ev.gds - ev.gm - ev.gmbs)
            acc.add(nd, nb, ev.gmbs)
            acc.add(ns, ns, ev.gds + ev.gm + ev.gmbs + gmin)
            acc.add(ns, nd, -ev.gds)
            acc.add(ns, ng, -ev.gm)
            acc.add(ns, nb, -ev.gmbs)
            lin_rhs = -ev.id + ev.gds * vds + ev.gm * vgs + ev.gmbs * vbs
            acc.add_rhs(nd, lin_rhs)
            acc.add_rhs(ns, -lin_rhs)

            if tran:
                qgs, qgd, qgb, qbs, qbd = mos_model.charges(pmo, ev, vgs, vds, vbs)
                stm = state["M"]
                if semantics == "physics" and integration == "trap":
                    # trapezoidal Meyer-charge companions (2nd order), BE on
                    # the first committed step — same shape as the diode Tt
                    # and capacitor companions above
                    started = stm["hist"] > 0
                    cfac = jnp.where(started, 2.0, 1.0)

                    def icap(q, qk, ik):
                        dq = (q - stm[qk]) / dt
                        return jnp.where(started, 2.0 * dq - stm[ik], dq)

                    icgs = icap(qgs, "qgs", "icgs")
                    icgd = icap(qgd, "qgd", "icgd")
                    icgb = icap(qgb, "qgb", "icgb")
                    icbs = icap(qbs, "qbs", "icbs")
                    icbd = icap(qbd, "qbd", "icbd")
                else:
                    cfac = 1.0
                    icgs = (qgs - stm["qgs"]) / dt
                    icgd = (qgd - stm["qgd"]) / dt
                    icgb = (qgb - stm["qgb"]) / dt
                    icbs = (qbs - stm["qbs"]) / dt
                    icbd = (qbd - stm["qbd"]) / dt
                # the reference nests these stamps inside ground checks of the
                # *other* terminal (mosfet.go:744-782) — RHS values are masked
                # to match; matrix entries into row/col 0 are inert anyway.
                m_nd = (nd != 0).astype(jnp.float64)
                m_ng = (ng != 0).astype(jnp.float64)
                m_ns = (ns != 0).astype(jnp.float64)
                m_nb = (nb != 0).astype(jnp.float64)

                acc.add(ng, nd, cfac * ev.cgd / dt)
                acc.add(nd, ng, cfac * ev.cgd / dt)
                acc.add(ng, ns, cfac * ev.cgs / dt)
                acc.add(ns, ng, cfac * ev.cgs / dt)
                acc.add(ng, nb, cfac * ev.cgb / dt)
                acc.add(nb, ng, cfac * ev.cgb / dt)
                acc.add(ng, ng, cfac * (ev.cgd + ev.cgs + ev.cgb) / dt)
                acc.add(nb, ns, cfac * ev.cbs_eff / dt)
                acc.add(ns, nb, cfac * ev.cbs_eff / dt)
                acc.add(nb, nd, cfac * ev.cbd_eff / dt)
                acc.add(nd, nb, cfac * ev.cbd_eff / dt)
                acc.add(nb, nb, cfac * (ev.cbd_eff + ev.cbs_eff) / dt)

                acc.add_rhs(ng, icgd * m_nd)
                acc.add_rhs(nd, -icgd * m_ng)
                acc.add_rhs(ng, icgs * m_ns)
                acc.add_rhs(ns, -icgs * m_ng)
                acc.add_rhs(ng, icgb * m_nb)
                acc.add_rhs(nb, -icgb * m_ng)
                acc.add_rhs(nb, icbs * m_ns)
                acc.add_rhs(ns, -icbs * m_nb)
                acc.add_rhs(nb, icbd * m_nd)
                acc.add_rhs(nd, -icbd * m_nb)

    return acc


def assemble_system(cc, params, state, jv, t, dt, mode, status_gmin,
                    dc_scale=1.0, linear_only=False, temp=TEMP_DEFAULT,
                    semantics="compat", gmin_floor=1e-12, integration="be"):
    """Build the dense (A, b) for one OP/transient Newton iteration
    (see _assemble_acc for the argument semantics)."""
    acc = _assemble_acc(cc, params, state, jv, t, dt, mode, status_gmin,
                        dc_scale, linear_only, temp, semantics, gmin_floor,
                        integration)
    a, b = acc.build(cc.np1)
    # ground row: x[0] = 0
    a = a.at[0, :].set(0.0).at[0, 0].set(1.0)
    b = b.at[0].set(0.0)
    return a, b


def assemble_entries(cc, params, state, jv, t, dt, mode, status_gmin,
                     dc_scale=1.0, linear_only=False, temp=TEMP_DEFAULT,
                     semantics="compat", gmin_floor=1e-12, integration="be"):
    """Flat-entry form of assemble_system for the fused build+solve kernel:
    returns (rows, cols, vals, rrows, rvals) where rows/cols/rrows are static
    numpy index arrays and vals/rvals are the traced per-entry values.
    Ground-row fixup and the gmin diagonal are NOT applied here — the solver
    handles both (they are part of its static pattern)."""
    acc = _assemble_acc(cc, params, state, jv, t, dt, mode, status_gmin,
                        dc_scale, linear_only, temp, semantics, gmin_floor,
                        integration)
    rows = np.concatenate(acc.rows) if acc.rows else np.zeros(0, np.int32)
    cols = np.concatenate(acc.cols) if acc.cols else np.zeros(0, np.int32)
    vals = (jnp.concatenate(acc.vals) if acc.vals
            else jnp.zeros(0, dtype=jnp.float64))
    rrows = np.concatenate(acc.rrows) if acc.rrows else np.zeros(0, np.int32)
    rvals = (jnp.concatenate(acc.rvals) if acc.rvals
             else jnp.zeros(0, dtype=jnp.float64))
    return rows, cols, vals, rrows, rvals


def load_gmin(a, gmin):
    """Add gmin to every diagonal except the ground row
    (matrix/circuit.go:107-114 adds to rows 1..Size)."""
    n = a.shape[-1]
    diag = jnp.arange(1, n)
    return a.at[diag, diag].add(gmin)


def assemble_system_ac(cc, params: Dict, state: Dict, jv, freq,
                       temp=TEMP_DEFAULT, semantics: str = "compat"):
    """Build the real block system for one AC frequency.

    Complex MNA  (G + jB)(xr + j·xi) = br + j·bi  is embedded as
    [[G, -B], [B, G]] [xr; xi] = [br; bi]; complex128 is unavailable on TPU.
    Nonlinear devices stamp their small-signal conductances at the OP bias
    `vnl` (the reference re-uses the values left by the final OP stamp).
    """
    np1 = cc.np1
    omega = 2.0 * jnp.pi * freq
    gacc = _Acc()  # real parts
    bacc = _Acc()  # imaginary parts
    f64 = jnp.float64

    if "R" in cc.idx:
        _two_node_pattern(gacc, cc.idx["R"]["nodes"],
                          1.0 / _tadjust(params["R"], temp))

    if "C" in cc.idx:
        _two_node_pattern(bacc, cc.idx["C"]["nodes"],
                          omega * _tadjust(params["C"], temp))

    if "L" in cc.idx:
        # Correct branch-row AC stamp: -v1+v2 - jωL·x_b = 0.  (Deviation: the
        # reference stamps jωL as a node admittance and leaves the branch row
        # empty/singular, inductor.go:44-56; no fixture exercises it.)
        nodes = cc.idx["L"]["nodes"]
        branch = cc.idx["L"]["branch"]
        _branch_pattern(gacc, nodes, branch, f64)
        bacc.add(branch, branch, -omega * params["L"]["value"])

    if "LM" in cc.idx:
        nodes = cc.idx["LM"]["nodes"]
        branch = cc.idx["LM"]["branch"]
        pm = params["LM"]
        stm = state["LM"]
        core_st = mag_model.CoreState(
            H=stm["H"], Hold=stm["Hold"], M=stm["M"], Mirr=stm["Mirr"], dMdH=stm["dMdH"]
        )
        leff = mag_model.value_for_mutual(pm, core_st, stm["i0"], temp)
        _branch_pattern(gacc, nodes, branch, f64)
        bacc.add(branch, branch, -omega * leff)

    if "K" in cc.idx:
        # Correct mutual AC stamp on the branch rows (deviation from the
        # node-stamp of mutual.go:122-185, which is singular; see PLAN.md 13).
        kidx = cc.idx["K"]
        coeff = params["K"]["coeff"]
        la, _, _ = _gather_inductance(cc, params, state, kidx["kind_a"], kidx["idx_a"], temp)
        lb, _, _ = _gather_inductance(cc, params, state, kidx["kind_b"], kidx["idx_b"], temp)
        mij = coeff * jnp.sqrt(la * lb)
        bacc.add(kidx["branch_a"], kidx["branch_b"], -omega * mij)
        bacc.add(kidx["branch_b"], kidx["branch_a"], -omega * mij)

    if "V" in cc.idx:
        nodes = cc.idx["V"]["nodes"]
        branch = cc.idx["V"]["branch"]
        _vsource_pattern(gacc, nodes, branch, f64)
        vre, vim = eval_sources_ac(params["V"])
        gacc.add_rhs(branch, vre)
        bacc.add_rhs(branch, vim)

    if "I" in cc.idx:
        nodes = cc.idx["I"]["nodes"]
        ire, iim = eval_sources_ac(params["I"])
        gacc.add_rhs(nodes[:, 0], ire)
        bacc.add_rhs(nodes[:, 0], iim)
        gacc.add_rhs(nodes[:, 1], -ire)
        bacc.add_rhs(nodes[:, 1], -iim)

    if "D" in cc.idx:
        # bias-point gd + jωCj (diode.go:230-260)
        nodes = cc.idx["D"]["nodes"]
        pd = params["D"]
        vd = jv["D"]["vd"]
        if semantics == "physics":
            # small-signal gd at the physics bias includes Rs/Bv (the
            # physics-mode OP above biased with the same model)
            _, gd = diode_model.dc_eval_physics(pd, vd, temp)
        else:
            _, gd = diode_model.dc_eval(pd, vd, temp)
        cj = diode_model.junction_cap(pd, vd)
        _two_node_pattern(gacc, nodes, gd)
        _two_node_pattern(bacc, nodes, omega * cj)

    if "Q" in cc.idx:
        # Small-signal: the consistent Jacobian at the OP bias (deviation from
        # bjt.go:376-409, same reason as the DC stamp — see models/bjt.py),
        # plus physical junction capacitances Cbe (b-e) and Cbc (b-c); the
        # reference computed Cbc but never stamped it.
        nodes = cc.idx["Q"]["nodes"]
        pq = params["Q"]
        vbe, vbc, vce = jv["Q"]["vbe"], jv["Q"]["vbc"], jv["Q"]["vce"]
        vbe, vbc, vce = bjt_model.cold_start(pq, vbe, vbc, vce, temp)
        ic0, ib0, g11, g12, g21, g22 = bjt_model.jacobian(pq, vbe, vbc, temp)
        cbe, cbc = bjt_model.junction_caps(pq, vbe, vbc, g11)
        nc, nb, ne = nodes[:, 0], nodes[:, 1], nodes[:, 2]
        sb = pq["sign"]
        gacc.add(nc, nb, (g11 + g12) * sb)
        gacc.add(nc, ne, -g11 * sb)
        gacc.add(nc, nc, -g12 * sb)
        gacc.add(nb, nb, (g21 + g22) * sb)
        gacc.add(nb, ne, -g21 * sb)
        gacc.add(nb, nc, -g22 * sb)
        gacc.add(ne, nb, -(g11 + g12 + g21 + g22) * sb)
        gacc.add(ne, ne, (g11 + g21) * sb)
        gacc.add(ne, nc, (g12 + g22) * sb)
        wbe = omega * cbe
        wbc = omega * cbc
        bacc.add(nb, nb, wbe + wbc)
        bacc.add(nb, ne, -wbe)
        bacc.add(ne, nb, -wbe)
        bacc.add(ne, ne, wbe)
        bacc.add(nb, nc, -wbc)
        bacc.add(nc, nb, -wbc)
        bacc.add(nc, nc, wbc)

    if "M" in cc.idx:
        # mosfet.go:788-866, including its asymmetric imaginary couplings
        nodes = cc.idx["M"]["nodes"]
        level = cc.idx["M"]["level"]
        pmo = params["M"]
        vgs, vds, vbs = jv["M"]["vgs"], jv["M"]["vds"], jv["M"]["vbs"]
        vgs, vds, vbs = mos_model.cold_start(pmo, vgs, vds, vbs)
        ev = mos_model.dc_eval(pmo, level, vgs, vds, vbs)
        nd, ng, ns, nb = nodes[:, 0], nodes[:, 1], nodes[:, 2], nodes[:, 3]
        cgsi = omega * ev.cgs
        cgdi = omega * ev.cgd
        cgbi = omega * ev.cgb
        cbsi = omega * ev.cbs_eff
        cbdi = omega * ev.cbd_eff

        gacc.add(nd, nd, ev.gds)
        gacc.add(nd, ng, ev.gm)
        bacc.add(nd, ng, cgdi)
        gacc.add(nd, ns, -ev.gds - ev.gm - ev.gmbs)
        gacc.add(nd, nb, ev.gmbs)
        bacc.add(nd, nb, cbdi)

        gacc.add(ns, ns, ev.gds + ev.gm + ev.gmbs)
        gacc.add(ns, nd, -ev.gds)
        gacc.add(ns, ng, -ev.gm)
        bacc.add(ns, ng, cgsi)
        gacc.add(ns, nb, -ev.gmbs)
        bacc.add(ns, nb, cbsi)

        bacc.add(ng, ng, cgsi + cgdi + cgbi)
        bacc.add(ng, nd, cgdi)
        bacc.add(ng, ns, cgsi)
        bacc.add(ng, nb, cgbi)

        bacc.add(nb, nb, cbsi + cbdi + cgbi)
        bacc.add(nb, nd, cbdi)
        bacc.add(nb, ns, cbsi)
        bacc.add(nb, ng, cgbi)

    g, br = gacc.build(np1)
    bmat, bi = bacc.build(np1)

    # ground rows for both components
    g = g.at[0, :].set(0.0).at[0, 0].set(1.0)
    bmat = bmat.at[0, :].set(0.0)
    br = br.at[0].set(0.0)
    bi = bi.at[0].set(0.0)

    a2 = jnp.block([[g, -bmat], [bmat, g]])
    b2 = jnp.concatenate([br, bi])
    return a2, b2
