"""Committed device state as a pytree — the transient scan carry.

The reference keeps this state in device struct fields (capacitor.go:11-16,
inductor.go:12-19, magnetic.go:27-61, diode.go:38-42, mosfet.go:98-116,
bjt.go:59-66); here it is one pytree so a whole transient is a single compiled
loop and Monte-Carlo batches just add a leading axis.

``compat`` semantics (default) reproduces the reference exactly: only C and L
commit state (PLAN.md item 1 — the other device types fail the reference's
TimeDependent interface and their prev* fields stay 0 forever).  ``physics``
semantics commits all device families (live Jiles-Atherton hysteresis, real
diode/MOSFET charge memory).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ..models import magnetic as mag_model
from ..models import mosfet as mos_model
from ..models import diode as diode_model


def init_state(cc) -> Dict:
    """Zero-initialized committed state for every stateful kind present."""

    def z(kind):
        return jnp.zeros(cc.kind_count(kind), dtype=jnp.float64)

    state: Dict = {}
    if "C" in cc.idx:
        # i0 = capacitor current, hist = committed-step flag: the trapezoidal
        # companion needs both (first step runs BE, as SPICE3 does at order 1)
        state["C"] = {"v0": z("C"), "v1": z("C"), "q0": z("C"), "q1": z("C"),
                      "i0": z("C"), "hist": z("C")}
    if "L" in cc.idx:
        state["L"] = {
            "i0": z("L"), "i1": z("L"), "v0": z("L"), "v1": z("L"),
            "flux0": z("L"), "hist": z("L"),
        }
    if "LM" in cc.idx:
        state["LM"] = {
            "i0": z("LM"), "i1": z("LM"), "v0": z("LM"), "v1": z("LM"),
            "flux0": z("LM"), "H": z("LM"), "Hold": z("LM"), "M": z("LM"),
            "Mirr": z("LM"), "dMdH": z("LM"),
        }
    if "D" in cc.idx:
        # ic0/hist: committed diffusion-capacitance current + first-step flag
        # for the trapezoidal Tt companion (physics mode; compat never
        # commits and ignores both)
        state["D"] = {"prev_vd": z("D"), "prev_id": z("D"),
                      "prev_charge": z("D"), "ic0": z("D"), "hist": z("D")}
    if "M" in cc.idx:
        # ic*/hist: committed Meyer-charge currents + first-step flag for the
        # trapezoidal companions (physics; compat never commits)
        state["M"] = {
            "qgs": z("M"), "qgd": z("M"), "qgb": z("M"), "qbs": z("M"), "qbd": z("M"),
            "icgs": z("M"), "icgd": z("M"), "icgb": z("M"), "icbs": z("M"),
            "icbd": z("M"), "hist": z("M"),
        }
    if "Q" in cc.idx:
        state["Q"] = {"qbe": z("Q"), "qbc": z("Q")}
    return state


def make_op_seed(cc, temp: float = 300.15):
    """Seed the committed state from an operating-point solution.

    physics-mode non-UIC transients start from the bias point: a DC-charged
    capacitor begins with its OP voltage/charge and an inductor with its OP
    current, instead of the zero state (which would inject a spurious
    C·V/dt current spike on the first step).  compat mode intentionally
    keeps the zero state — that IS the reference behavior (its devices never
    see the OP solution, circuit.go:192-224).  hist stays 0 so trapezoidal
    runs still take their first step as BE.  ``temp`` must be the stamp
    temperature (opts.temp): seeding the diode charge at a different
    temperature would inject a spurious first-step diffusion current
    dq = q(temp) - q(seed_temp)."""

    def seed(params, state, x):
        new = dict(state)
        if "C" in cc.idx:
            nodes = cc.idx["C"]["nodes"]
            st = state["C"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            q = params["C"]["value"] * vd
            new["C"] = {**st, "v0": vd, "v1": vd, "q0": q, "q1": q}
        if "L" in cc.idx:
            nodes = cc.idx["L"]["nodes"]
            st = state["L"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            i = -x[cc.idx["L"]["branch"]]
            new["L"] = {**st, "i0": i, "i1": i, "v0": vd, "v1": vd}
        if "LM" in cc.idx:
            st = state["LM"]
            i = -x[cc.idx["LM"]["branch"]]
            new["LM"] = {**st, "i0": i, "i1": i}
        if "D" in cc.idx:
            nodes = cc.idx["D"]["nodes"]
            pd = params["D"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            id_, _ = diode_model.dc_eval_physics(pd, vd, temp)
            new["D"] = {"prev_vd": vd, "prev_id": id_,
                        "prev_charge": pd["tt"] * id_,
                        "ic0": jnp.zeros_like(id_),
                        "hist": state["D"]["hist"]}
        return new

    return seed


def make_commit(cc, semantics: str = "compat", integration: str = "be",
                temp: float = 300.15):
    """Build the state-commit function: (params, state, x, dt, t) -> state'."""

    compat = semantics == "compat"
    trap = (not compat) and integration == "trap"

    def commit(params, state, x, dt):
        new = dict(state)

        if "C" in cc.idx:
            nodes = cc.idx["C"]["nodes"]
            st = state["C"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            cval = params["C"]["value"]
            if trap:
                # committed capacitor current: BE form on the first committed
                # step (no current history yet), TR form afterwards.  Must use
                # the SAME temperature-adjusted C as the stamp: the TR current
                # recursion i_{n+1}=(2C/dt)dv - i_n is marginally stable, so a
                # stamp/commit mismatch would persist instead of decaying.
                dtm = temp - 300.15
                c_t = cval * (1.0 + params["C"]["tc1"] * dtm
                              + params["C"]["tc2"] * dtm * dtm)
                i_be = c_t * (vd - st["v0"]) / dt
                i_tr = 2.0 * c_t / dt * (vd - st["v0"]) - st["i0"]
                i_new = jnp.where(st["hist"] > 0, i_tr, i_be)
            elif compat:
                i_new = st["i0"]  # unused in compat stamps/LTE
            else:
                i_new = cval * (vd - st["v0"]) / dt  # BE current
            new["C"] = {
                "v0": vd,
                "v1": st["v0"],
                "q0": cval * vd,
                "q1": st["q0"],
                "i0": i_new,
                "hist": jnp.ones_like(st["hist"]),
            }

        if "L" in cc.idx:
            nodes = cc.idx["L"]["nodes"]
            st = state["L"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            lval = params["L"]["value"]
            # LoadState (inductor.go:81-95): BE current integration
            i_load = st["i1"] + vd * dt / lval
            flux0 = vd * dt  # flux1 is never shifted in the reference
            if compat:
                # UpdateState (inductor.go:97-114): i1 <- integrated current,
                # i0 <- v·1e-9/L (the junk value consumed by Mutual and LTE)
                i0_new = vd * 1e-9 / lval
            else:
                # physics: the branch unknown IS the current (x_b = -I)
                i_load = -x[cc.idx["L"]["branch"]]
                i0_new = i_load
            new["L"] = {
                "i0": i0_new,
                "i1": i_load,
                "v0": vd,
                "v1": st["v0"],
                "flux0": flux0,
                "hist": jnp.ones_like(st["hist"]),
            }

        if "LM" in cc.idx and not compat:
            # physics mode: magnetic inductor state is live.  Windings on a
            # shared core (same core_id) see the core's TOTAL magnetomotive
            # force H = sum_w(N_w·I_w)/len, so each winding's core-state copy
            # stays identical within the group (a physical fix the reference
            # doesn't attempt: it updates one shared core object sequentially
            # per winding with per-winding H).
            nodes = cc.idx["LM"]["nodes"]
            branch = cc.idx["LM"]["branch"]
            core_id = cc.idx["LM"]["core_id"]
            n_cores = int(core_id.max()) + 1
            st = state["LM"]
            pm = params["LM"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            i_new = -x[branch]
            core_st = mag_model.CoreState(
                H=st["H"], Hold=st["Hold"], M=st["M"], Mirr=st["Mirr"], dMdH=st["dMdH"]
            )
            mmf = jax.ops.segment_sum(pm["turns"] * i_new, core_id,
                                      num_segments=n_cores)[core_id]
            h = jnp.clip(mmf / pm["len"], -1e6, 1e6)
            _, _, core2 = mag_model.ja_calculate(pm, core_st, h, 300.15)
            new["LM"] = {
                "i0": i_new,
                "i1": st["i0"],
                "v0": vd,
                "v1": st["v0"],
                "flux0": st["flux0"] + vd * dt,
                "H": core2.H,
                "Hold": core2.Hold,
                "M": core2.M,
                "Mirr": core2.Mirr,
                "dMdH": core2.dMdH,
            }

        if "D" in cc.idx and not compat:
            nodes = cc.idx["D"]["nodes"]
            pd = params["D"]
            vd = x[nodes[:, 0]] - x[nodes[:, 1]]
            # physics eval (Rs/Bv) so the committed memory matches the stamp
            id_, _ = diode_model.dc_eval_physics(pd, vd, temp)
            st = state["D"]
            q_new = pd["tt"] * id_
            if trap:
                dq = q_new - st["prev_charge"]
                ic_new = jnp.where(st["hist"] > 0,
                                   2.0 * dq / dt - st["ic0"], dq / dt)
            else:
                ic_new = (q_new - st["prev_charge"]) / dt
            new["D"] = {
                "prev_vd": vd,
                "prev_id": id_,
                "prev_charge": q_new,
                "ic0": ic_new,
                "hist": jnp.ones_like(st["hist"]),
            }

        if "M" in cc.idx and not compat:
            nodes = cc.idx["M"]["nodes"]
            level = cc.idx["M"]["level"]
            pmo = params["M"]
            vgs, vds, vbs = mos_model.terminal_voltages(pmo, x, nodes)
            ev = mos_model.dc_eval(pmo, level, vgs, vds, vbs)
            qgs, qgd, qgb, qbs, qbd = mos_model.charges(pmo, ev, vgs, vds, vbs)
            stm = state["M"]

            def ic_new(q, qk, ik):
                dq = (q - stm[qk]) / dt
                if trap:
                    return jnp.where(stm["hist"] > 0, 2.0 * dq - stm[ik], dq)
                return dq

            new["M"] = {
                "qgs": qgs, "qgd": qgd, "qgb": qgb, "qbs": qbs, "qbd": qbd,
                "icgs": ic_new(qgs, "qgs", "icgs"),
                "icgd": ic_new(qgd, "qgd", "icgd"),
                "icgb": ic_new(qgb, "qgb", "icgb"),
                "icbs": ic_new(qbs, "qbs", "icbs"),
                "icbd": ic_new(qbd, "qbd", "icbd"),
                "hist": jnp.ones_like(stm["hist"]),
            }

        return new

    return commit


def make_lte(cc):
    """Max local-truncation-error over TimeDependent devices, which in the
    reference are only C and L (tran.go:239-250; PLAN.md 1).  Uses committed
    state — i.e. the estimate lags one accepted step, as in the reference."""

    def lte(params, state, dt):
        worst = jnp.zeros((), dtype=jnp.float64)
        if "C" in cc.idx:
            st = state["C"]
            cval = params["C"]["value"]
            # capacitor.go:173-178
            v = jnp.abs(cval * st["v0"] - cval * st["v1"]) / (2.0 * dt)
            worst = jnp.maximum(worst, jnp.max(v, initial=0.0))
        if "L" in cc.idx:
            st = state["L"]
            # inductor.go:116-121
            cur = jnp.abs(st["i0"] - st["i1"]) / (2.0 * dt)
            vol = jnp.abs(st["v0"] - st["v1"]) / (2.0 * dt)
            worst = jnp.maximum(worst, jnp.max(jnp.maximum(cur, vol), initial=0.0))
        return worst

    return lte
