"""Fused transient-attempt Pallas kernel for compat/BE circuits.

The general transient (engine/tran.py) spends ~45% of each attempt outside
the fused build+solve kernel: XLA-level companion/value ops, the LTE
reduction, the state commit, and vmap's while_loop masking — ~40 µs of
overhead around a ~48 µs solve at the 8192-way benchmark batch.  For the
linear device subset (R, C, L, V, I — no Newton loop, one solve per attempt,
empty nonlinear-state pytree) everything numeric in an attempt can live in
ONE kernel:

    companion entries (geq=C/dt, ceq=q1/dt, L/dt, ±1 patterns, source RHS)
    → augmented double-float matrix in VMEM → Gauss-Jordan eliminate
    → LTE from the committed C/L state (tran.go:239-250)
    → commit candidates (capacitor.go:155-171, inductor.go:81-114)

while the step CONTROL stays in exact f64 XLA: t/dt arithmetic, source
waveform evaluation (sin needs f64 precision), accept/reject decisions, and
counters (tran.go:96-152 semantics, identical to engine/tran.py).  Carried
state crosses the kernel boundary as (hi, lo) f32 stacks, so the
accept-select is two jnp.where ops on the whole stack.

Numerical class: double-float (~48-bit mantissa) for matrix values, LTE and
state — the same noise class as the fused solve kernel the general engine
already uses on TPU (ops/pallas_solve.py); step decisions use those values
against f64 thresholds.  Accepted-step parity vs the general engine is
asserted by tests/test_fused_tran.py and the on-TPU A/B protocol.

DIODE decks (R/C/L/V/I + D) fuse too: the whole Newton iteration — junction
update with SPICE3F5 pnjlim limiting (models/limiter.py), Shockley eval with
the reference's exp-arg clamp and three regions (diode.go:119-148), the Tt
transit-time companion with the compat frozen prev_charge (PLAN.md 1), the
matrix build and the Gauss-Jordan solve, and the reference convergence test
|Δ| ≤ reltol·max(|new|,|old|) + abstol checked from iteration 1 — runs as a
``lax.while_loop`` INSIDE the kernel, with per-lane freezing exactly like
JAX's batched while_loop in the general engine (engine/newton.py).  Device
transcendentals use the double-float exp/log of ops/df_math.py.  The one-time
OP warm-up for the Newton warm start (tran.go:57-75) runs through the general
XLA OP engine (rescue ladders included) before the attempt loop starts.

BJT decks fuse the same way: the Ebers-Moll eval (bjt.go:214-255 with the
exp-arg clamp, Early voltage, knee roll-off and NPN/PNP sign handling), the
consistent ANALYTIC Jacobian (models/bjt.py jacobian — the engine's PLAN.md
10 deviation from the reference's inconsistent hand stamp; the closed-form
derivative chain costs one pair of exponentials where the round-2 numeric
difference paid three full evals), per-junction pnjlim limiting of vbe/vbc
and the reference cold-start guess (bjt.go:110-120) all run inside the
Newton while_loop in double-float.
Transient BJT stamping is DC-only, matching the reference where
StampTransient is dead code (PLAN.md 1), and Q state (qbe/qbc) is never
committed — passthrough like the diode state.

MOSFET decks fuse too: levels 1-3 (mosfet.go:358-459 with the reference's
unit quirks verbatim), body-effect threshold, analytic level-1 /
numerically-differenced level-2/3 conductances (mosfet.go:505-532), Meyer
capacitances and the five charge currents with compat-frozen previous
charges — all inside the Newton while_loop, the level selected STATICALLY
per device (it is circuit metadata, not a parameter).  Terminal voltages
carry without junction limiting, exactly like the general engine
(engine/nlstate.py:73-85); the cold-start bias guess (mosfet.go:678-690)
applies to the eval voltages only.  Power/sqrt run on the double-float
df_pow/df_sqrt of ops/df_math.py.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solve import (_df_add, _df_mul, _df_recip, _gj_eliminate,
                           _unpinned)
from .df_math import df_div, df_exp, df_log, df_pow, df_sqrt
from ..consts import BOLTZMANN, CHARGE, TEMP_DEFAULT

FUSED_KINDS = {"R", "C", "L", "LM", "K", "V", "I", "D", "Q", "M"}


def fused_ineligible_reason(cc, semantics: str, store: str, opts,
                            params=None):
    """Why this run can NOT use the fused kernel; None when it can.

    The fused path covers: R/C/L/V/I plus diodes, BJTs and MOSFETs
    (in-kernel Newton), magnetic inductors and mutual couplings (compat
    freezes the J-A core state — PLAN.md 1 — so L0/Leff and M=k·sqrt(LaLb)
    are run constants computed in XLA f64 around the kernel; physics
    carries the LIVE J-A state in the attempt loop), both semantics
    (physics nonlinear devices run in-kernel too: the Rs/Bv diode eval
    with breakdown-frame pnjlim and the committed D/M charge-memory
    companions under BE and trap — round-4 closure of the round-3 gap),
    BE and trapezoidal integration (trap is physics-only, as in the
    general engine), store='none' and store='full' (uniform-slot attempt
    buffer + compaction), and solver knobs that affect the in-kernel math
    only through scalars baked at trace time (temp, reltol/abstol/max_iter
    are supported)."""
    if semantics not in ("compat", "physics"):
        return f"semantics={semantics!r}"
    if store not in ("none", "full"):
        return f"store={store!r} (fused path supports 'none' and 'full')"
    if opts.integration not in ("be", "trap"):
        return f"integration={opts.integration!r}"
    if opts.integration == "trap" and semantics != "physics":
        return ("integration='trap' requires semantics='physics' "
                "(compat reproduces the reference's backward Euler)")
    extra = set(cc.idx.keys()) - FUSED_KINDS
    if extra:
        return f"device kinds {sorted(extra)} not supported by the kernel"
    if params is not None:
        # the kernel statically skips the physics diode's 8-step Rs inner
        # Newton for devices whose deck model leaves Rs at 0 (_layout
        # d_rs_on); an override ENABLING Rs would be silently wrong
        if semantics == "physics" and "D" in cc.idx and "D" in params:
            rs_static = np.asarray(cc.params["D"]["rs"]) > 0
            leaf = params["D"].get("rs")
            if leaf is not None:
                try:
                    arr = np.asarray(leaf)
                except Exception:
                    return ("traced diode Rs params (cannot verify the "
                            "static Rs gate)")
                on = (arr != 0).reshape(-1, arr.shape[-1]).any(axis=0)
                if np.any(on & ~rs_static):
                    return ("diode Rs override enables series resistance "
                            "the deck's model leaves off (static Rs "
                            "gating)")
    if params is not None:
        # the kernel statically skips junction-cap math for devices whose
        # deck model leaves cj/cbs/cbd at 0 (see _layout m_jcap); an
        # override that ENABLES caps the static gate skipped would be
        # silently wrong — reject it (disabling them is fine: zeros flow)
        if "M" in cc.idx and "M" in params:
            base = cc.params["M"]
            jcap_static = ((np.asarray(base["cbs"]) > 0)
                           | (np.asarray(base["cbd"]) > 0)
                           | (np.asarray(base["cj"]) > 0))
            for key in ("cbs", "cbd", "cj"):
                leaf = params["M"].get(key)
                if leaf is None:
                    continue
                try:
                    arr = np.asarray(leaf)
                except Exception:
                    return ("traced MOSFET junction-cap params (cannot "
                            "verify the static cap gate)")
                on = (arr != 0).reshape(-1, arr.shape[-1]).any(axis=0)
                if np.any(on & ~jcap_static):
                    return ("MOSFET junction-cap override enables caps the "
                            "deck's model leaves off (static cap gating)")
    return None


def fused_eligible(cc, semantics: str, store: str, opts, params=None) -> bool:
    return fused_ineligible_reason(cc, semantics, store, opts, params) is None


# ------------------------------------------------------------------- plan


def _build_plan(cc):
    """Static stamp plan: cell -> [(tag, device_index, sign)].

    Tags resolve in-kernel to double-float row values:
      g      1/R_t (const)             geq    C_t/dt
      lterm  L/dt                      one    literal ±1
      ceq    q1/dt (RHS)               lrhs   (L/dt)·i1 (RHS)
      vsrc   V(t) (RHS, from XLA)      isrc   I(t) (RHS, from XLA)
    Mirrors ops/assemble.py's linear stamps exactly (same file:line refs).
    """
    cells = {}
    rhs = {}

    def addc(i, j, tag, k, s):
        cells.setdefault((int(i), int(j)), []).append((tag, int(k), float(s)))

    def addr(i, tag, k, s):
        rhs.setdefault(int(i), []).append((tag, int(k), float(s)))

    if "R" in cc.idx:
        for k, (n1, n2) in enumerate(np.asarray(cc.idx["R"]["nodes"])):
            addc(n1, n1, "g", k, 1); addc(n1, n2, "g", k, -1)
            addc(n2, n1, "g", k, -1); addc(n2, n2, "g", k, 1)
    if "C" in cc.idx:
        for k, (n1, n2) in enumerate(np.asarray(cc.idx["C"]["nodes"])):
            addc(n1, n1, "geq", k, 1); addc(n1, n2, "geq", k, -1)
            addc(n2, n1, "geq", k, -1); addc(n2, n2, "geq", k, 1)
            addr(n1, "ceq", k, 1); addr(n2, "ceq", k, -1)
    if "L" in cc.idx:
        nodes = np.asarray(cc.idx["L"]["nodes"])
        branch = np.asarray(cc.idx["L"]["branch"])
        for k in range(len(branch)):
            n1, n2, br = nodes[k, 0], nodes[k, 1], branch[k]
            # inductor sign convention n1→-1, n2→+1 (inductor.go:59-66)
            addc(n1, br, "one", 0, -1); addc(br, n1, "one", 0, -1)
            addc(n2, br, "one", 0, 1); addc(br, n2, "one", 0, 1)
            addc(br, br, "lterm", k, -1)
            addr(br, "lrhs", k, 1)
    if "V" in cc.idx:
        nodes = np.asarray(cc.idx["V"]["nodes"])
        branch = np.asarray(cc.idx["V"]["branch"])
        for k in range(len(branch)):
            n1, n2, br = nodes[k, 0], nodes[k, 1], branch[k]
            # voltage-source convention n1→+1 (vsource.go:140-147)
            addc(br, n1, "one", 0, 1); addc(n1, br, "one", 0, 1)
            addc(br, n2, "one", 0, -1); addc(n2, br, "one", 0, -1)
            addr(br, "vsrc", k, 1)
    if "I" in cc.idx:
        for k, (n1, n2) in enumerate(np.asarray(cc.idx["I"]["nodes"])):
            addr(n1, "isrc", k, 1); addr(n2, "isrc", k, -1)
    if "LM" in cc.idx:
        nodes = np.asarray(cc.idx["LM"]["nodes"])
        branch = np.asarray(cc.idx["LM"]["branch"])
        for k in range(len(branch)):
            n1, n2, br = nodes[k, 0], nodes[k, 1], branch[k]
            # magnetic inductor branch row, inductor sign convention
            # (magnetic.go:197-274); the L_used/dt term and its companion
            # RHS arrive fully formed through the dyn stack (exact XLA f64,
            # loop math in make_tran_fused — compat freezes the core state)
            addc(n1, br, "one", 0, -1); addc(br, n1, "one", 0, -1)
            addc(n2, br, "one", 0, 1); addc(br, n2, "one", 0, 1)
            addc(br, br, "lmterm", k, -1)
            addr(br, "lmrhs", k, 1)
    if "K" in cc.idx:
        ba = np.asarray(cc.idx["K"]["branch_a"])
        bb = np.asarray(cc.idx["K"]["branch_b"])
        for k in range(len(ba)):
            # mutual coupling cross terms between branch rows
            # (mutual.go:106-120): -M/dt off-diagonals plus the reference's
            # junk-i0 RHS memory, both computed per attempt in XLA f64 and
            # passed via the dyn stack (krhs* arrive already signed)
            addc(ba[k], bb[k], "kterm", k, -1)
            addc(bb[k], ba[k], "kterm", k, -1)
            addr(ba[k], "krhsa", k, 1)
            addr(bb[k], "krhsb", k, 1)
    return cells, rhs


# ------------------------------------------------------------------ kernel


def _df_neg(p):
    return (-p[0], -p[1])


def _df_twice(p):
    """Exact x2 on both limbs (power-of-two scale preserves the df
    invariant)."""
    f32c = jnp.float32
    return (p[0] * f32c(2.0), p[1] * f32c(2.0))


def _df_abs(p):
    neg = p[0] < 0
    return (jnp.where(neg, -p[0], p[0]), jnp.where(neg, -p[1], p[1]))


def _df_gt(a, b):
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] > b[1]))


def _df_max(a, b):
    sel = _df_gt(a, b)
    return (jnp.where(sel, a[0], b[0]), jnp.where(sel, a[1], b[1]))


def _df_const(v, lanes):
    """f64 python constant as a broadcast double-float pair."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    f32 = jnp.float32
    return (jnp.full(lanes, hi, dtype=f32), jnp.full(lanes, lo, dtype=f32))


def _df_where(cond, a, b):
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def _pnjlim_df(vnew, vold, vte, invvte, vcr, lanes):
    """SPICE3F5 DEVpnjlim in double-float (models/limiter.py semantics).

    The discarded branches may produce inf/nan through the df transforms
    (e.g. log of a clamped-to-tiny argument); ``_df_where`` on the hi-limb
    condition discards both limbs, so nothing contaminates the result."""
    f32 = jnp.float32
    diff = _df_add(*vnew, *_df_neg(vold))
    two_vte = (vte[0] * f32(2.0), vte[1] * f32(2.0))  # exact scaling
    limit = _df_gt(vnew, vcr) & _df_gt(_df_abs(diff), two_vte)
    one = jnp.ones(lanes, dtype=f32)
    zero = jnp.zeros(lanes, dtype=f32)
    arg = _df_add(one, zero, *_df_mul(*diff, *invvte))
    argpos = arg[0] > 0
    # pos: vold + vte·ln(arg); the clamp only matters in the discarded region
    la = df_log(jnp.maximum(arg[0], f32(1e-30)),
                jnp.where(arg[0] > f32(1e-30), arg[1], zero))
    pos = _df_where(argpos, _df_add(*vold, *_df_mul(*vte, *la)), vcr)
    # neg: vte·ln(vnew/vte) — limit implies vnew > vcrit > 0 here
    ratio = _df_mul(jnp.maximum(vnew[0], f32(1e-30)),
                    jnp.where(vnew[0] > f32(1e-30), vnew[1], zero), *invvte)
    neg = _df_mul(*vte, *df_log(*ratio))
    limited = _df_where(vold[0] > 0, pos, neg)
    return _df_where(limit, limited, vnew)


def _device_eval_lib(nd_, nq_, nm_, layout, const, lanes, mode="compat"):
    """Per-device eval closures over the const stack, shared by the Newton
    body (``_newton_in_kernel``) and the physics commit candidates
    (``_attempt_core``) — both evaluate the same device characteristics, at
    the limited junction voltages and the raw solution respectively (exactly
    like ops/assemble.py vs engine/state.py make_commit).

    ``mode``: "compat" evaluates the reference diode (diode.go:119-148);
    "phys_be"/"phys_trap" evaluate models/diode.py dc_eval_physics — the
    Bv breakdown region plus, for devices whose deck sets Rs (statically
    gated by layout["d_rs_on"]), the 8-step seeded inner Newton folding the
    series resistance into the terminal characteristic."""
    f32 = jnp.float32
    L = layout
    physics = mode != "compat"
    zero = jnp.zeros(lanes, dtype=f32)
    one_df = (jnp.ones(lanes, dtype=f32), zero)
    zz = (zero, zero)
    c40 = _df_const(40.0, lanes)

    invnvt = [const(L["d_invnvt"] + k) for k in range(nd_)]
    m3nvt = [const(L["d_m3nvt"] + k) for k in range(nd_)]
    ist = [const(L["d_ist"] + k) for k in range(nd_)]
    dgmin = [const(L["d_gmin"] + k) for k in range(nd_)]
    dtt = [const(L["d_tt"] + k) for k in range(nd_)]
    vte = [const(L["d_vte"] + k) for k in range(nd_)]
    invvte = [const(L["d_invvte"] + k) for k in range(nd_)]
    vcr = [const(L["d_vcrit"] + k) for k in range(nd_)]
    pq = [const(L["d_pq"] + k) for k in range(nd_)]
    if physics:
        d_nvt = [const(L["d_nvt"] + k) for k in range(nd_)]
        d_rs = [const(L["d_rs"] + k) for k in range(nd_)]
        d_mbv = [const(L["d_mbv"] + k) for k in range(nd_)]
        d_bkgate = [const(L["d_bkgate"] + k) for k in range(nd_)]
        d_invrsis = [const(L["d_invrsis"] + k) for k in range(nd_)]

    def d_raw(kd, vj):
        """Junction (i, g) at voltage vj.  compat: the 3-region Shockley
        with the exp-arg clamp (diode.go:119-148); physics adds the Bv
        breakdown exponential (models/diode.py dc_eval_physics raw)."""
        arg = _df_mul(*vj, *invnvt[kd])
        arg = _df_where(_df_gt(arg, c40), c40, arg)
        e = df_exp(*arg)
        ifwd = _df_mul(*ist[kd], *_df_add(*e, *_df_neg(one_df)))
        fwd = _df_gt(vj, m3nvt[kd])  # vj > -3nVt
        if not physics:
            id_ = _df_where(fwd, ifwd, _df_neg(ist[kd]))
            gfwd = _df_add(
                *_df_mul(*_df_add(*_df_abs(id_), *ist[kd]), *invnvt[kd]),
                *dgmin[kd])
            gd = _df_where(fwd, gfwd, dgmin[kd])
            return id_, gd
        # breakdown region vj <= -Bv: -(Bv+vj) = -Bv - vj
        barg = _df_mul(*_df_add(*d_mbv[kd], *_df_neg(vj)), *invnvt[kd])
        barg = _df_where(_df_gt(barg, c40), c40, barg)
        eb = df_exp(*barg)
        bkd = ~_df_gt(vj, d_mbv[kd])
        id_ = _df_where(fwd, ifwd,
                        _df_where(bkd, _df_neg(_df_mul(*ist[kd], *eb)),
                                  _df_neg(ist[kd])))
        gfwd = _df_mul(*_df_add(*_df_abs(ifwd), *ist[kd]), *invnvt[kd])
        gbkd = _df_mul(*_df_mul(*ist[kd], *eb), *invnvt[kd])
        g = _df_where(fwd, gfwd, _df_where(bkd, gbkd, zz))
        return id_, _df_add(*g, *dgmin[kd])

    def d_eval(kd, vd):
        """Terminal (id, gd).  physics devices with static Rs fold the
        series resistance via the seeded inner Newton (models/diode.py
        dc_eval_physics: seed from the current-limited junction voltage,
        8 quadratic steps, chain-rule terminal conductance)."""
        if not (physics and L["d_rs_on"][kd]):
            return d_raw(kd, vd)
        rs_pos = d_rs[kd][0] > 0
        vd_pos = _df_gt(vd, zz)
        fwd_amt = _df_where(vd_pos, vd, zz)
        fwd_cap = _df_mul(*d_nvt[kd], *df_log(*_df_add(
            *one_df, *_df_mul(*fwd_amt, *d_invrsis[kd]))))
        bk_amt = _df_add(*d_mbv[kd], *_df_neg(vd))  # -vd - Bv
        bk_amt = _df_where(_df_gt(bk_amt, zz), bk_amt, zz)
        bkd_cap = _df_add(*d_mbv[kd], *_df_neg(_df_mul(
            *d_nvt[kd], *df_log(*_df_add(
                *one_df, *_df_mul(*bk_amt, *d_invrsis[kd]))))))
        below_bv = _df_gt(d_mbv[kd], vd)  # vd < -Bv
        vj = _df_where(
            rs_pos & vd_pos,
            _df_where(_df_gt(vd, fwd_cap), fwd_cap, vd),  # min(vd, cap)
            _df_where(rs_pos & below_bv, _df_max(vd, bkd_cap), vd))
        for _ in range(8):
            ij, gj = d_raw(kd, vj)
            f = _df_add(*_df_add(*vj, *_df_mul(*d_rs[kd], *ij)),
                        *_df_neg(vd))
            den = _df_add(*one_df, *_df_mul(*d_rs[kd], *gj))
            vj = _df_add(*vj, *_df_neg(df_div(*f, *den)))
        ij, gj = d_raw(kd, vj)
        den = _df_add(*one_df, *_df_mul(*d_rs[kd], *gj))
        return ij, df_div(*gj, *den)

    def d_limit_bkd(kd, vnew, vold, vlim):
        """Breakdown-frame pnjlim overlay (engine/nlstate.py physics
        branch): limit -(Bv+vd) like a forward junction, gated on the NEW
        voltage only (vd < min(0, -Bv + 10·vte))."""
        in_bkd = _df_gt(d_bkgate[kd], vnew)
        vbk = _pnjlim_df(_df_add(*d_mbv[kd], *_df_neg(vnew)),
                         _df_add(*d_mbv[kd], *_df_neg(vold)),
                         vte[kd], invvte[kd], vcr[kd], lanes)
        return _df_where(in_bkd, _df_add(*d_mbv[kd], *_df_neg(vbk)), vlim)

    qrow = {key: [const(L[key] + k) for k in range(nq_)]
            for key in ("q_invnfvt", "q_invnrvt", "q_sies", "q_sics",
                        "q_invvaf", "q_invvar", "q_invikf", "q_invikr",
                        "q_alphaf", "q_sign",
                        "q_vtef", "q_invvtef", "q_vcritf",
                        "q_vter", "q_invvter", "q_vcritr",
                        "q_vbe0", "q_vbc0")}

    mrow = {key: [const(L[key] + k) for k in range(nm_)]
            for key in ("m_sign", "m_vto", "m_gamma", "m_phi", "m_sqrtphi",
                        "m_beta1", "m_lam",
                        "m_e2u", "m_uexp", "m_b2u", "m_vmlu", "m_uopos",
                        "m_vmax", "m_theta", "m_kappa", "m_beta3",
                        "m_cgate", "m_cgso", "m_cgdo", "m_cgbo",
                        "m_cbs", "m_cbd", "m_invpb", "m_mj",
                        "m_pqgs", "m_pqgd", "m_pqgb", "m_pqbs", "m_pqbd")}
    if nm_:
        c_half = _df_const(0.5, lanes)
        c_gmin = _df_const(1e-12, lanes)  # model _GMIN floor (mosfet.go)
        c_mdelta = _df_const(1e-6, lanes)  # models/mosfet.py _DELTA
        c_minv = _df_const(1e6, lanes)  # 1/_DELTA

    def m_vth(km, vbs):
        """Body-effect threshold in the type-positive frame (models/mosfet.py
        _vth; mosfet.go:296-318).  df_sqrt returns 0 for non-positive args,
        matching the max(0, phi - vbs) guard."""
        s = df_sqrt(*_df_add(*mrow["m_phi"][km], *_df_neg(vbs)))
        vth = _df_add(*mrow["m_vto"][km], *_df_mul(
            *mrow["m_gamma"][km],
            *_df_add(*s, *_df_neg(mrow["m_sqrtphi"][km]))))
        return _df_where(mrow["m_gamma"][km][0] > 0, vth, mrow["m_vto"][km])

    def m_ids_pos(km, lv, vgs, vds, vbs):
        """Drain current, type-positive frame, STATIC level lv — mirrors
        models/mosfet.py _ids_pos with the reference's unit quirks.
        Returns (id, is_lin, cutoff); is_lin is the pre-cutoff region."""
        vth = m_vth(km, vbs)
        vgst = _df_add(*vgs, *_df_neg(vth))
        fac = _df_add(*one_df, *_df_mul(*mrow["m_lam"][km], *vds))
        t_lin = _df_add(*_df_mul(*vgst, *vds),
                        *_df_neg(_df_mul(*_df_mul(*c_half, *vds), *vds)))
        if lv == 2:
            # mobility degradation + VMAX saturation voltage
            # (mosfet.go:378-418); see _layout for the precombined rows
            ratio = _df_mul(*vgst, *mrow["m_e2u"][km])
            cond = (mrow["m_e2u"][km][0] > 0) & (vgst[0] > 0)
            # floor 1e-37 (f32 normal range) vs the reference's 1e-300:
            # differs only when vgst is within ~1e-31 of the threshold
            flo = _df_const(1e-37, lanes)
            pw = df_pow(*_df_max(ratio, flo), *mrow["m_uexp"][km])
            denom = _df_where(cond, _df_add(*one_df, *pw), one_df)
            beta = df_div(*mrow["m_b2u"][km], *denom)
            lim = _df_mul(*mrow["m_vmlu"][km],
                          *_df_where(mrow["m_uopos"][km][0] > 0,
                                     denom, one_df))
            vdsat = _df_where(mrow["m_vmax"][km][0] > 0,
                              _df_where(_df_gt(vgst, lim), lim, vgst), vgst)
            lin = _df_mul(*_df_mul(*beta, *t_lin), *fac)
        elif lv == 3:
            # semi-empirical THETA/KAPPA (mosfet.go:421-459)
            th = mrow["m_theta"][km]
            ve = df_div(*vgst, *_df_add(*one_df, *_df_mul(*th, *vgst)))
            vgst_eff = _df_where(th[0] > 0, ve, vgst)
            k1 = _df_add(*one_df, *_df_mul(*mrow["m_kappa"][km], *vgst_eff))
            flo = _df_const(1e-30, lanes)
            vd3 = df_div(*vgst_eff, *df_sqrt(*_df_max(k1, flo)))
            vdsat = _df_where(mrow["m_kappa"][km][0] > 0, vd3, vgst_eff)
            beta = mrow["m_beta3"][km]
            hv2 = _df_mul(*_df_mul(*c_half, *vds), *vds)
            t3 = _df_add(*_df_mul(*vgst_eff, *vds), *_df_neg(df_div(*hv2, *k1)))
            lin = _df_mul(*_df_mul(*beta, *t3), *fac)
        else:
            # level 1 Shockley quadratic (mosfet.go:358-375)
            beta = mrow["m_beta1"][km]
            vdsat = vgst
            lin = _df_mul(*_df_mul(*beta, *t_lin), *fac)
        sat = _df_mul(*_df_mul(*_df_mul(*c_half, *beta),
                               *_df_mul(*vdsat, *vdsat)), *fac)
        is_lin = _df_gt(vdsat, vds)  # vds < vdsat
        idl = _df_where(is_lin, lin, sat)
        cutoff = ~_df_gt(vgst, (zero, zero))  # raw vgst, all levels
        return _df_where(cutoff, (zero, zero), idl), is_lin, cutoff

    def m_dc_eval(km, lv, vgs, vds, vbs):
        """models/mosfet.py dc_eval at static level: current, conductances
        (analytic L1 / numeric-diff L2-3, mosfet.go:505-532) and Meyer caps.
        Values the cut mask overrides are unselected, never NaN-poisoned:
        _df_where discards both limbs."""
        sgn = mrow["m_sign"][km]
        id_pos, is_lin, cut = m_ids_pos(km, lv, vgs, vds, vbs)
        id_ = _df_mul(*sgn, *id_pos)

        if lv == 1:
            vth = m_vth(km, vbs)
            vgst = _df_add(*vgs, *_df_neg(vth))
            beta1 = mrow["m_beta1"][km]
            lam = mrow["m_lam"][km]
            fac = _df_add(*one_df, *_df_mul(*lam, *vds))
            gm = _df_where(is_lin & ~cut,
                           _df_mul(*_df_mul(*beta1, *vds), *fac),
                           _df_mul(*_df_mul(*beta1, *vgst), *fac))
            t_lin = _df_add(*_df_mul(*vgst, *vds),
                            *_df_neg(_df_mul(*_df_mul(*c_half, *vds), *vds)))
            gds_l = _df_add(
                *_df_mul(*_df_mul(*beta1,
                                  *_df_add(*vgst, *_df_neg(vds))), *fac),
                *_df_mul(*_df_mul(*beta1, *lam), *t_lin))
            gds_s = _df_mul(*_df_mul(*_df_mul(*c_half, *beta1),
                                     *_df_mul(*vgst, *vgst)), *lam)
            gds = _df_where(is_lin & ~cut, gds_l, gds_s)
            # gmbs from the current gm (documented deviation, models/mosfet.py)
            flo = _df_const(1e-30, lanes)
            den = df_sqrt(*_df_max(
                _df_add(*mrow["m_phi"][km], *_df_neg(vbs)), flo))
            gmbs_v = df_div(*_df_mul(*gm, *mrow["m_gamma"][km]),
                            *_df_add(*den, *den))
            gmbs_on = ((mrow["m_gamma"][km][0] > 0)
                       & (mrow["m_phi"][km][0] > 0)
                       & _df_gt((zero, zero), vbs))
            gmbs = _df_where(gmbs_on, gmbs_v, c_gmin)
        else:
            # numeric differencing, delta applied in the flipped frame
            d = _df_mul(*sgn, *c_mdelta)
            idg, _, _ = m_ids_pos(km, lv, _df_add(*vgs, *d), vds, vbs)
            idd, _, _ = m_ids_pos(km, lv, vgs, _df_add(*vds, *d), vbs)
            idb, _, _ = m_ids_pos(km, lv, vgs, vds, _df_add(*vbs, *d))

            def gfd(idp):
                diff = _df_add(*_df_mul(*sgn, *idp), *_df_neg(id_))
                return _df_max(_df_mul(*diff, *c_minv), c_gmin)

            gm, gds, gmbs = gfd(idg), gfd(idd), gfd(idb)

        gm = _df_where(cut, c_gmin, gm)
        gds = _df_where(cut, c_gmin, gds)
        gmbs = _df_where(cut, c_gmin, gmbs)
        # PMOS sign (mosfet.go:534-537): gm and gmbs flip, gds does not
        gm = _df_mul(*gm, *sgn)
        gmbs = _df_mul(*gmbs, *sgn)

        # Meyer capacitances by region (mosfet.go:540-594)
        cgate = mrow["m_cgate"][km]
        cgso = mrow["m_cgso"][km]
        cgdo = mrow["m_cgdo"][km]
        cgbo = mrow["m_cgbo"][km]
        half_g = _df_mul(*c_half, *cgate)
        two3_g = _df_mul(*_df_const(2.0 / 3.0, lanes), *cgate)
        thr_g = _df_mul(*_df_const(1.0 / 3.0, lanes), *cgate)
        cgs = _df_where(cut, cgso,
                        _df_where(is_lin, _df_add(*half_g, *cgso),
                                  _df_add(*two3_g, *cgso)))
        cgd = _df_where(cut, cgdo,
                        _df_where(is_lin, _df_add(*half_g, *cgdo), cgdo))
        cgb = _df_where(cut, two3_g,
                        _df_where(is_lin, cgbo, _df_add(*cgbo, *thr_g)))
        return id_, gm, gds, gmbs, cgs, cgd, cgb, cut, is_lin

    def m_charges(km, cut, cgs, cgd, cgb, vgs, vds, vbs):
        """Charge storage (mosfet.go:597-637): Meyer gate charges plus
        voltage-dependent junction charges via df_pow.  The junction
        branches are statically skipped (identically-zero values) for
        devices whose model never sets cj/cbs/cbd (L["m_jcap"])."""
        vgd = _df_add(*vgs, *_df_neg(vds))
        zz_ = (zero, zero)
        qgs = _df_where(cut, zz_, _df_mul(*cgs, *vgs))
        qgd = _df_where(cut, zz_, _df_mul(*cgd, *vgd))
        qgb = _df_mul(*cgb, *_df_add(*vgs, *_df_neg(vbs)))
        if not L["m_jcap"][km]:
            return qgs, qgd, qgb, zz_, zz_
        vbd = _df_add(*vbs, *_df_neg(vds))
        invpb = mrow["m_invpb"][km]
        mj = mrow["m_mj"][km]
        flo = _df_const(1e-30, lanes)

        def qjunc(ceff, v):
            base = _df_add(*one_df, *_df_neg(_df_mul(*v, *invpb)))
            rev = df_div(*ceff, *df_pow(*_df_max(base, flo), *mj))
            fwd = _df_mul(*ceff, *_df_add(
                *one_df, *_df_mul(*_df_mul(*mj, *v), *invpb)))
            return _df_mul(*_df_where(_df_gt(zz_, v), rev, fwd), *v)

        qbs = qjunc(mrow["m_cbs"][km], vbs)
        qbd = qjunc(mrow["m_cbd"][km], vbd)
        return qgs, qgd, qgb, qbs, qbd

    def q_jacobian(kq, vbe, vbc):
        """Analytic consistent Ebers-Moll Jacobian — the exact derivative
        chain of models/bjt.py ``jacobian`` in double-float: ONE pair of
        exponentials instead of the three full evals the round-2 numeric
        difference paid (the BJT body was FLOP-bound on exactly those,
        tests/tools/bench_kernel_ops.py).  qbinv u = 1 - vbc·inv_vaf; the
        inv_* rows are 0 when a knob is off, collapsing each factor
        algebraically (1·x, /1, zero slope)."""
        invnfvt = qrow["q_invnfvt"][kq]
        invnrvt = qrow["q_invnrvt"][kq]
        a1 = _df_mul(*vbe, *invnfvt)
        cl1 = _df_gt(a1, c40)  # clamped exp region: value e^40, zero slope
        a2 = _df_mul(*vbc, *invnrvt)
        cl2 = _df_gt(a2, c40)
        e1 = df_exp(*_df_where(cl1, c40, a1))
        e2 = df_exp(*_df_where(cl2, c40, a2))
        sies = qrow["q_sies"][kq]
        sics = qrow["q_sics"][kq]
        zz_ = (zero, zero)
        f0 = _df_mul(*sies, *_df_add(*e1, *_df_neg(one_df)))
        r0 = _df_mul(*sics, *_df_add(*e2, *_df_neg(one_df)))
        df0 = _df_where(cl1, zz_, _df_mul(*_df_mul(*sies, *e1), *invnfvt))
        dr0 = _df_where(cl2, zz_, _df_mul(*_df_mul(*sics, *e2), *invnrvt))
        invvaf = qrow["q_invvaf"][kq]
        invvar = qrow["q_invvar"][kq]
        invikf = qrow["q_invikf"][kq]
        invikr = qrow["q_invikr"][kq]
        # Early factors: u = 1/qb, wv = 1 + vbe/var
        u = _df_add(*one_df, *_df_neg(_df_mul(*vbc, *invvaf)))
        wv = _df_add(*one_df, *_df_mul(*vbe, *invvar))
        f1 = _df_mul(*f0, *u)
        r1 = _df_mul(*r0, *wv)
        df1_be = _df_mul(*df0, *u)
        df1_bc = _df_neg(_df_mul(*f0, *invvaf))
        dr1_be = _df_mul(*r0, *invvar)
        dr1_bc = _df_mul(*dr0, *wv)
        # knee roll-off i/(1 + |i|·inv_ik·u), quotient rule
        absf1 = _df_abs(f1)
        absr1 = _df_abs(r1)
        ikfu = _df_mul(*invikf, *u)
        ikru = _df_mul(*invikr, *u)
        den_f = _df_add(*one_df, *_df_mul(*absf1, *ikfu))
        den_r = _df_add(*one_df, *_df_mul(*absr1, *ikru))
        inv_df_ = _df_recip(*den_f)
        inv_dr_ = _df_recip(*den_r)
        f2 = _df_mul(*f1, *inv_df_)
        r2 = _df_mul(*r1, *inv_dr_)

        def smul(gpair, x):
            # sign(g)·x with sign(0)=0, selected on the hi limb (a
            # normalized df pair with hi==0 has lo==0)
            return _df_where(gpair[0] < 0, _df_neg(x),
                             _df_where(gpair[0] > 0, x, zz_))

        ddenf_be = smul(f1, _df_mul(*df1_be, *ikfu))
        ddenf_bc = _df_add(
            *smul(f1, _df_mul(*df1_bc, *ikfu)),
            *_df_neg(_df_mul(*_df_mul(*absf1, *invikf), *invvaf)))
        ddenr_be = smul(r1, _df_mul(*dr1_be, *ikru))
        ddenr_bc = _df_add(
            *smul(r1, _df_mul(*dr1_bc, *ikru)),
            *_df_neg(_df_mul(*_df_mul(*absr1, *invikr), *invvaf)))
        df2_be = _df_mul(
            *_df_add(*df1_be, *_df_neg(_df_mul(*f2, *ddenf_be))), *inv_df_)
        df2_bc = _df_mul(
            *_df_add(*df1_bc, *_df_neg(_df_mul(*f2, *ddenf_bc))), *inv_df_)
        dr2_be = _df_mul(
            *_df_add(*dr1_be, *_df_neg(_df_mul(*r2, *ddenr_be))), *inv_dr_)
        dr2_bc = _df_mul(
            *_df_add(*dr1_bc, *_df_neg(_df_mul(*r2, *ddenr_bc))), *inv_dr_)
        # terminal currents and the four conductances
        af = qrow["q_alphaf"][kq]
        sgn = qrow["q_sign"][kq]
        t_c = _df_add(*_df_mul(*af, *f2), *_df_neg(r2))  # af·f2 - r2
        ic0 = _df_mul(*sgn, *_df_mul(*t_c, *u))
        ie0 = _df_mul(*sgn, *_df_add(*f2, *_df_neg(r2)))
        ib0 = _df_add(*ie0, *_df_neg(ic0))
        g11 = _df_mul(*sgn, *_df_mul(
            *_df_add(*_df_mul(*af, *df2_be), *_df_neg(dr2_be)), *u))
        g12 = _df_mul(*sgn, *_df_add(
            *_df_mul(*_df_add(*_df_mul(*af, *df2_bc), *_df_neg(dr2_bc)), *u),
            *_df_neg(_df_mul(*t_c, *invvaf))))
        g21 = _df_add(*_df_mul(*sgn, *_df_add(*df2_be, *_df_neg(dr2_be))),
                      *_df_neg(g11))
        g22 = _df_add(*_df_mul(*sgn, *_df_add(*df2_bc, *_df_neg(dr2_bc))),
                      *_df_neg(g12))
        return ic0, ib0, g11, g12, g21, g22

    return {
        "invnvt": invnvt, "m3nvt": m3nvt, "ist": ist, "dgmin": dgmin,
        "dtt": dtt, "vte": vte, "invvte": invvte, "vcr": vcr, "pq": pq,
        "qrow": qrow, "mrow": mrow,
        "d_raw": d_raw, "d_eval": d_eval, "d_limit_bkd": d_limit_bkd,
        "m_vth": m_vth, "m_ids_pos": m_ids_pos, "m_dc_eval": m_dc_eval,
        "m_charges": m_charges, "q_jacobian": q_jacobian,
    }


def _newton_in_kernel(n, nd_, nq_, nm_, layout, cfgk, build_matrix, const,
                      jv_hi, jv_lo, dtinv, lanes, act_mask,
                      flavor="tran", gmin=None, x0=None,
                      transient_terms=True, mode="compat", st=None):
    """The Newton loop (engine/newton.py) inside the kernel, per-lane.
    Mirrors the vmapped ``lax.while_loop`` semantics exactly: a lane whose
    convergence flag latches (or that exhausts max_iter) freezes its whole
    carry — x, junction voltages and iteration count — while other lanes in
    the block keep iterating.

    Three flavors, exactly engine/newton.py's static switches:

    * ``tran`` (default) — warm start: iteration 0 stamps with the carried
      junction voltages (tran.go:174 `if iter > 0`); OP convergence formula.
    * ``op`` — the OP NR (op.go:25-88): linearization voltages update from
      the previous solution EVERY iteration, seeded by ``x0`` (the linear
      initial estimate); ``gmin`` (df pair) is CircuitStatus.Gmin — added to
      every non-ground diagonal (matrix/circuit.go:107-114) and the MOSFET
      drain/source diagonals (mosfet.go:698-701).
    * ``dc`` — warm start like ``tran`` but with the CheckConvergence
      formula (anlysis.go:46-59): diff ≤ abstol OR diff ≤ reltol·|new|.

    ``transient_terms=False`` statically drops the companion-model terms
    (diode Tt, MOSFET Meyer/junction charge currents) — the OP/DC stamp
    (assemble.py mode="op") has none.

    Returns (x_hi, x_lo, iters, converged, jv_pair) where jv_pair stacks the
    exit junction voltages (the ones used for the last solve, which persist
    across accept/reject like res.jv in engine/tran.py:184)."""
    f32 = jnp.float32
    reltol, abstol, max_iter = cfgk
    warm = flavor != "op"
    L = layout
    kj = nd_ + 2 * nq_ + 3 * nm_
    zero = jnp.zeros(lanes, dtype=f32)
    one_df = (jnp.ones(lanes, dtype=f32), zero)
    rel_c = _df_const(reltol, lanes)
    abs_c = _df_const(abstol, lanes)
    physics = mode != "compat"
    trap = mode == "phys_trap"

    lib = _device_eval_lib(nd_, nq_, nm_, layout, const, lanes, mode)
    vte, invvte, vcr = lib["vte"], lib["invvte"], lib["vcr"]
    dtt, pq = lib["dtt"], lib["pq"]
    qrow, mrow = lib["qrow"], lib["mrow"]
    d_eval, d_limit_bkd = lib["d_eval"], lib["d_limit_bkd"]
    m_dc_eval, m_charges = lib["m_dc_eval"], lib["m_charges"]
    q_jacobian = lib["q_jacobian"]

    jv0_hi = jnp.stack([jv_hi[k, :] for k in range(kj)])
    jv0_lo = jnp.stack([jv_lo[k, :] for k in range(kj)])

    def body(carry):
        # conv is carried as int32 0/1: Mosaic can't round-trip i1 vectors
        # through while-loop carries (trunci i8->i1 is unsupported)
        k, conv, x_hi, x_lo, jvs_hi, jvs_lo = carry
        active = (conv == 0) & (k < jnp.int32(max_iter))
        sel0 = k == jnp.int32(0)

        # --- UpdateVoltages + pnjlim (engine/nlstate.py); iteration 0 uses
        # the carried warm-start voltages (tran.go:174 `if iter > 0`) ---
        def limited_row(row, vnew, vte_p, invvte_p, vcr_p):
            vold = (jvs_hi[row], jvs_lo[row])
            vlim = _pnjlim_df(vnew, vold, vte_p, invvte_p, vcr_p, lanes)
            if not warm:  # OP flavor: update from x every iteration
                return vlim
            return _df_where(sel0, (jv0_hi[row], jv0_lo[row]), vlim)

        jv_used = [None] * kj
        for kd in range(nd_):
            n1, n2 = L["d_nodes"][kd]
            vnew = _df_add(x_hi[n1], x_lo[n1],
                           *_df_neg((x_hi[n2], x_lo[n2])))
            row = L["jv_d"] + kd
            vold = (jvs_hi[row], jvs_lo[row])
            vlim = _pnjlim_df(vnew, vold, vte[kd], invvte[kd], vcr[kd],
                              lanes)
            if physics:
                # breakdown-frame overlay (engine/nlstate.py physics)
                vlim = d_limit_bkd(kd, vnew, vold, vlim)
            if warm:
                vlim = _df_where(sel0, (jv0_hi[row], jv0_lo[row]), vlim)
            jv_used[row] = vlim
        for kq in range(nq_):
            ncn, nbn, nen = L["q_nodes"][kq]
            npn = qrow["q_sign"][kq][0] > 0
            # vbe = sign·(vb − ve), vbc = sign·(vb − vc)  (nlstate.py:61-62)
            be_raw = _df_add(x_hi[nbn], x_lo[nbn],
                             *_df_neg((x_hi[nen], x_lo[nen])))
            bc_raw = _df_add(x_hi[nbn], x_lo[nbn],
                             *_df_neg((x_hi[ncn], x_lo[ncn])))
            vbe_new = _df_where(npn, be_raw, _df_neg(be_raw))
            vbc_new = _df_where(npn, bc_raw, _df_neg(bc_raw))
            jv_used[L["jv_qbe"] + kq] = limited_row(
                L["jv_qbe"] + kq, vbe_new, qrow["q_vtef"][kq],
                qrow["q_invvtef"][kq], qrow["q_vcritf"][kq])
            jv_used[L["jv_qbc"] + kq] = limited_row(
                L["jv_qbc"] + kq, vbc_new, qrow["q_vter"][kq],
                qrow["q_invvter"][kq], qrow["q_vcritr"][kq])
        for km in range(nm_):
            # MOSFET terminal voltages carry raw — no junction limiting
            # (engine/nlstate.py:73-85); sign flips PMOS to the stored frame
            ndn, ngn, nsn, nbn = L["m_nodes"][km]
            sgn = mrow["m_sign"][km]

            def mterm(na, nb2):
                diff = _df_add(x_hi[na], x_lo[na],
                               *_df_neg((x_hi[nb2], x_lo[nb2])))
                return _df_mul(*sgn, *diff)

            for off_key, pair in (("jv_mgs", mterm(ngn, nsn)),
                                  ("jv_mds", mterm(ndn, nsn)),
                                  ("jv_mbs", mterm(nbn, nsn))):
                row = L[off_key] + km
                jv_used[row] = (pair if not warm else _df_where(
                    sel0, (jv0_hi[row], jv0_lo[row]), pair))

        # --- Shockley eval + Tt companion + Norton stamp (diode.go:119-226,
        # compat prev_charge frozen per PLAN.md 1) ---
        extra = {}

        def addx(i, j, p):
            if i == 0:
                return
            cur = extra.get((i, j))
            extra[(i, j)] = p if cur is None else _df_add(*cur, *p)

        for kd in range(nd_):
            n1, n2 = L["d_nodes"][kd]
            vd = jv_used[L["jv_d"] + kd]
            id_, gd = d_eval(kd, vd)
            if transient_terms and not physics:
                # geq = Tt·gd/dt ; icap = (Tt·id − prev_charge)/dt with the
                # compat-frozen prev_charge (PLAN.md 1)
                geq = _df_mul(*_df_mul(*dtt[kd], *gd), *dtinv)
                cap = _df_mul(
                    *_df_add(*_df_mul(*dtt[kd], *id_), *_df_neg(pq[kd])),
                    *dtinv)
                gdp = _df_add(*gd, *geq)
                idp = _df_add(*id_, *cap)
            elif transient_terms:
                # physics: committed diffusion-charge memory from the state
                # stack (assemble.py physics D block); trap runs the
                # 2nd-order companion after the first committed step
                dq = _df_mul(*_df_add(*_df_mul(*dtt[kd], *id_),
                                      *_df_neg(st(L["d_pq_s"] + kd))),
                             *dtinv)
                geq_b = _df_mul(*_df_mul(*dtt[kd], *gd), *dtinv)
                if trap:
                    started = st(L["d_hist"] + kd)[0] > 0
                    cap = _df_where(
                        started,
                        _df_add(*_df_twice(dq),
                                *_df_neg(st(L["d_ic0"] + kd))), dq)
                    geq = _df_where(started, _df_twice(geq_b), geq_b)
                else:
                    cap = dq
                    geq = geq_b
                gdp = _df_add(*gd, *geq)
                idp = _df_add(*id_, *cap)
            else:  # OP/DC stamp: no companion (assemble.py skips when not tran)
                gdp = gd
                idp = id_
            rhs_d = _df_add(*idp, *_df_neg(_df_mul(*gdp, *vd)))
            addx(n1, n1, gdp)
            addx(n2, n2, gdp)
            addx(n1, n2, _df_neg(gdp))
            addx(n2, n1, _df_neg(gdp))
            addx(n1, n, _df_neg(rhs_d))
            addx(n2, n, rhs_d)

        # --- Ebers-Moll eval + analytic consistent Jacobian + stamp
        # (ops/assemble.py BJT block; cold start bjt.go:110-120 applied to
        # the EVAL voltages only — the carried jv stays raw, like the
        # general engine where cold_start lives inside assemble) ---
        for kq in range(nq_):
            ncn, nbn, nen = L["q_nodes"][kq]
            vbe_u = jv_used[L["jv_qbe"] + kq]
            vbc_u = jv_used[L["jv_qbc"] + kq]
            cold = ((vbe_u[0] == 0) & (vbe_u[1] == 0)
                    & (vbc_u[0] == 0) & (vbc_u[1] == 0))
            vbe = _df_where(cold, qrow["q_vbe0"][kq], vbe_u)
            vbc = _df_where(cold, qrow["q_vbc0"][kq], vbc_u)

            ic0, ib0, g11, g12, g21, g22 = q_jacobian(kq, vbe, vbc)

            sb = qrow["q_sign"][kq]
            g1112 = _df_add(*g11, *g12)
            g2122 = _df_add(*g21, *g22)
            g1121 = _df_add(*g11, *g21)
            g1222 = _df_add(*g12, *g22)
            addx(ncn, nbn, _df_mul(*g1112, *sb))
            addx(ncn, nen, _df_neg(_df_mul(*g11, *sb)))
            addx(ncn, ncn, _df_neg(_df_mul(*g12, *sb)))
            addx(nbn, nbn, _df_mul(*g2122, *sb))
            addx(nbn, nen, _df_neg(_df_mul(*g21, *sb)))
            addx(nbn, ncn, _df_neg(_df_mul(*g22, *sb)))
            addx(nen, nbn, _df_neg(_df_mul(*_df_add(*g1112, *g2122), *sb)))
            addx(nen, nen, _df_mul(*g1121, *sb))
            addx(nen, ncn, _df_mul(*g1222, *sb))
            addx(ncn, n, _df_add(
                *_df_add(*_df_neg(ic0), *_df_mul(*g11, *vbe)),
                *_df_mul(*g12, *vbc)))
            addx(nbn, n, _df_add(
                *_df_add(*_df_neg(ib0), *_df_mul(*g21, *vbe)),
                *_df_mul(*g22, *vbc)))
            addx(nen, n, _df_add(
                *_df_add(*ic0, *ib0),
                *_df_neg(_df_add(*_df_mul(*g1121, *vbe),
                                 *_df_mul(*g1222, *vbc)))))

        # --- MOSFET eval + DC stamp + transient charge currents
        # (ops/assemble.py "MOSFETs" block; mosfet.go:668-786).  status_gmin
        # is 0 during transient NR (engine/tran.py:144), so the reference's
        # +gmin drain/source diagonal terms vanish. ---
        if nm_:
            c_07 = _df_const(0.7, lanes)
            c_01 = _df_const(0.1, lanes)
        for km in range(nm_):
            ndn, ngn, nsn, nbn = L["m_nodes"][km]
            lv = L["m_level"][km]
            vgs_u = jv_used[L["jv_mgs"] + km]
            vds_u = jv_used[L["jv_mds"] + km]
            vbs_u = jv_used[L["jv_mbs"] + km]
            # cold start (mosfet.go:678-690) on the EVAL voltages only
            cold = ((vgs_u[0] == 0) & (vgs_u[1] == 0)
                    & (vds_u[0] == 0) & (vds_u[1] == 0)
                    & (vbs_u[0] == 0) & (vbs_u[1] == 0))
            vgs = _df_where(cold, c_07, vgs_u)
            vds = _df_where(cold, c_01, vds_u)
            vbs = _df_where(cold, (zero, zero), vbs_u)

            id_, gm, gds, gmbs, cgs, cgd, cgb, cut, is_lin = m_dc_eval(
                km, lv, vgs, vds, vbs)

            g_dgm = _df_add(*gds, *gm)
            g_all = _df_add(*g_dgm, *gmbs)
            addx(ndn, ndn, gds)
            addx(ndn, ngn, gm)
            addx(ndn, nsn, _df_neg(g_all))
            addx(ndn, nbn, gmbs)
            addx(nsn, nsn, g_all)
            addx(nsn, ndn, _df_neg(gds))
            addx(nsn, ngn, _df_neg(gm))
            addx(nsn, nbn, _df_neg(gmbs))
            if gmin is not None:
                # OP/DC: status_gmin on the drain/source diagonals
                # (mosfet.go:698-701); 0 during transient NR (tran.py:144)
                addx(ndn, ndn, gmin)
                addx(nsn, nsn, gmin)
            lin_rhs = _df_add(*_df_add(
                *_df_neg(id_), *_df_mul(*gds, *vds)),
                *_df_add(*_df_mul(*gm, *vgs), *_df_mul(*gmbs, *vbs)))
            addx(ndn, n, lin_rhs)
            addx(nsn, n, _df_neg(lin_rhs))

            if not transient_terms:
                continue  # OP/DC stamp has no charge companions
            # transient: C/dt entries + charge currents.  compat uses the
            # frozen previous charges (PLAN.md 1; state never committed);
            # physics the committed state rows, with the trapezoidal
            # 2nd-order form after the first committed step (assemble.py
            # physics M block)
            qgs, qgd, qgb, qbs, qbd = m_charges(
                km, cut, cgs, cgd, cgb, vgs, vds, vbs)
            jcap = L["m_jcap"][km]  # static: junction caps identically zero
            if trap:
                m_started = st(L["m_hist_s"] + km)[0] > 0

            def icap(q, prev_key):
                if not physics:
                    prev = mrow[prev_key][km]  # m_pq* const rows
                    return _df_mul(*_df_add(*q, *_df_neg(prev)), *dtinv)
                prev = st(L[prev_key.replace("m_pq", "m_q") + "_s"] + km)
                dq = _df_mul(*_df_add(*q, *_df_neg(prev)), *dtinv)
                if not trap:
                    return dq
                ic_prev = st(L[prev_key.replace("m_pq", "m_ic") + "_s"] + km)
                return _df_where(
                    m_started,
                    _df_add(*_df_twice(dq), *_df_neg(ic_prev)), dq)

            def cdt(c):
                v = _df_mul(*c, *dtinv)
                if trap:
                    return _df_where(m_started, _df_twice(v), v)
                return v

            icgs = icap(qgs, "m_pqgs")
            icgd = icap(qgd, "m_pqgd")
            icgb = icap(qgb, "m_pqgb")

            cgd_dt = cdt(cgd)
            cgs_dt = cdt(cgs)
            cgb_dt = cdt(cgb)
            addx(ngn, ndn, cgd_dt)
            addx(ndn, ngn, cgd_dt)
            addx(ngn, nsn, cgs_dt)
            addx(nsn, ngn, cgs_dt)
            addx(ngn, nbn, cgb_dt)
            addx(nbn, ngn, cgb_dt)
            addx(ngn, ngn, _df_add(*_df_add(*cgd_dt, *cgs_dt), *cgb_dt))
            if jcap:
                icbs = icap(qbs, "m_pqbs")
                icbd = icap(qbd, "m_pqbd")
                cbs_dt = cdt(mrow["m_cbs"][km])
                cbd_dt = cdt(mrow["m_cbd"][km])
                addx(nbn, nsn, cbs_dt)
                addx(nsn, nbn, cbs_dt)
                addx(nbn, ndn, cbd_dt)
                addx(ndn, nbn, cbd_dt)
                addx(nbn, nbn, _df_add(*cbd_dt, *cbs_dt))

            # RHS masked by the OTHER terminal's ground check
            # (mosfet.go:744-782) — node indices are static, so the masks are
            # static skips
            if ndn:
                addx(ngn, n, icgd)
            if ngn:
                addx(ndn, n, _df_neg(icgd))
            if nsn:
                addx(ngn, n, icgs)
            if ngn:
                addx(nsn, n, _df_neg(icgs))
            if nbn:
                addx(ngn, n, icgb)
            if ngn:
                addx(nbn, n, _df_neg(icgb))
            if jcap:
                if nsn:
                    addx(nbn, n, icbs)
                if nbn:
                    addx(nsn, n, _df_neg(icbs))
                if ndn:
                    addx(nbn, n, icbd)
                if nbn:
                    addx(ndn, n, _df_neg(icbd))

        if gmin is not None:
            # CircuitStatus.Gmin on every non-ground diagonal
            # (matrix/circuit.go:107-114, LoadGmin before each OP/DC solve)
            for r in range(1, n):
                addx(r, r, gmin)

        x2_hi, x2_lo = _gj_eliminate(n, *build_matrix(extra))

        # --- reference convergence, checked from iteration 1, per row:
        # op/tran: |Δ| ≤ reltol·max(|new|,|old|) + abstol (op.go:67-82);
        # dc: |Δ| ≤ abstol OR |Δ| ≤ reltol·|new| (anlysis.go:46-59) ---
        allok = None
        finite = None
        for r in range(n):
            new = (x2_hi[r], x2_lo[r])
            old = (x_hi[r], x_lo[r])
            d = _df_abs(_df_add(*new, *_df_neg(old)))
            if flavor == "dc":
                okr = (~_df_gt(d, abs_c)) | (
                    ~_df_gt(d, _df_mul(*_df_abs(new), *rel_c)))
            else:
                amax = _df_max(_df_abs(new), _df_abs(old))
                tol = _df_add(*_df_mul(*amax, *rel_c), *abs_c)
                okr = ~_df_gt(d, tol)
            fin = jnp.isfinite(x2_hi[r]) & jnp.isfinite(x2_lo[r])
            allok = okr if allok is None else (allok & okr)
            finite = fin if finite is None else (finite & fin)
        conv_new = (k > jnp.int32(0)) & finite & allok

        # --- per-lane freeze (batched-while_loop masking) ---
        act_r = active[None]
        x_hi_n = jnp.where(act_r, x2_hi, x_hi)
        x_lo_n = jnp.where(act_r, x2_lo, x_lo)
        jvs_hi_n = jnp.where(act_r, jnp.stack([p[0] for p in jv_used]), jvs_hi)
        jvs_lo_n = jnp.where(act_r, jnp.stack([p[1] for p in jv_used]), jvs_lo)
        conv_n = jnp.where(active, conv_new.astype(jnp.int32), conv)
        k_n = k + active.astype(jnp.int32)
        return (k_n, conv_n, x_hi_n, x_lo_n, jvs_hi_n, jvs_lo_n)

    def cond(carry):
        k, conv = carry[0], carry[1]
        pending = ((conv == 0) & (k < jnp.int32(max_iter))).astype(jnp.int32)
        # not jnp.any: Mosaic's reduce_or proxy lowering casts bool through
        # Python float, which x64 promotes to f64 — unlowerable in-kernel
        return jnp.max(pending) > 0

    zn = jnp.zeros((n,) + lanes, dtype=f32)
    x_init = (zn, zn) if x0 is None else x0
    init = (jnp.zeros(lanes, dtype=jnp.int32),
            (~act_mask).astype(jnp.int32), x_init[0], x_init[1],
            jv0_hi, jv0_lo)
    # Check the cross-lane cond only every TOYSPICE_NR_UNROLL body passes:
    # converged/inactive lanes are frozen per-lane inside body, so extra
    # passes are no-ops on them and results are bit-identical.
    nr_unroll = int(os.environ.get("TOYSPICE_NR_UNROLL", "1"))

    def body_n(carry):
        for _ in range(nr_unroll):
            carry = body(carry)
        return carry

    k, conv, x_hi, x_lo, jvs_hi, jvs_lo = jax.lax.while_loop(
        cond, body_n if nr_unroll > 1 else body, init)
    return x_hi, x_lo, k, conv > 0, jnp.stack([jvs_hi, jvs_lo])


def _attempt_core(n, counts, layout, cells, rhs_cells, cfgk, mode,
                  const_hi, const_lo, dyn_hi, dyn_lo,
                  st_hi, st_lo, jv_hi, jv_lo, cpu_build=False,
                  dyn_tables=None):
    """One whole transient attempt as a pure array function:
    (const/dyn/state/jv double-float stacks) -> (xlte, stout, jvout) with a
    leading limb axis.  This is the ENTIRE in-kernel math; the Pallas kernel
    (``_fused_kernel``) is a thin ref wrapper around it, and the same
    function compiles directly under XLA (``TOYSPICE_TRAN_IMPL=xla``) — the
    CPU-fast path the parity tests use, since Pallas interpret mode
    evaluates the Newton loop eagerly at ~seconds per attempt.

    ``dyn_tables``: the whole-run kernel (ops/pallas_run.py) computes the
    per-attempt values IN-KERNEL instead of reading them from a dyn stack —
    a dict of df pairs/lists {dt, act (bool), vsrc, isrc, lmterm, lmrhs,
    kterm, krhsa, krhsb} replacing dyn_hi/dyn_lo (which are then unused)."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    f32 = jnp.float32
    lanes = st_hi.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)

    def const(r):
        return (const_hi[r, :], const_lo[r, :])

    def dyn(r):
        return (dyn_hi[r, :], dyn_lo[r, :])

    def st(r):
        return (st_hi[r, :], st_lo[r, :])

    L = layout  # row-offset dict
    dt = dyn_tables["dt"] if dyn_tables is not None else dyn(0)
    dtinv = _df_recip(*dt)

    f32c = jnp.float32

    def _df_twice(p):  # exact x2 on both limbs
        return (p[0] * f32c(2.0), p[1] * f32c(2.0))

    g = [const(L["g"] + k) for k in range(nr_)]
    if mode == "phys_trap":
        # trapezoidal companions (assemble.py physics/trap forms), first
        # committed step BE via the hist flag: C geq = 2C_t/dt with
        # Ieq = geq*v0 + i0; L branch -2L/dt with RHS lcoef*i1 + v0
        geq, ceq, lterm, lrhs = [], [], [], []
        for k in range(nc_):
            base = _df_mul(*const(L["cadj"] + k), *dtinv)
            started = st(L["c_hist"] + k)[0] > 0
            gk = _df_where(started, _df_twice(base), base)
            ceq_tr = _df_add(*_df_mul(*gk, *st(L["c_v0"] + k)),
                             *st(L["c_i0"] + k))
            ceq_be = _df_mul(*st(L["c_q0"] + k), *dtinv)
            geq.append(gk)
            ceq.append(_df_where(started, ceq_tr, ceq_be))
        for k in range(nl_):
            base = _df_mul(*const(L["lval"] + k), *dtinv)
            started = st(L["l_hist"] + k)[0] > 0
            lk = _df_where(started, _df_twice(base), base)
            rhs = _df_add(*_df_mul(*lk, *st(L["l_i1"] + k)),
                          *_df_where(started, st(L["l_v0"] + k),
                                     (zero, zero)))
            lterm.append(lk)
            lrhs.append(rhs)
    else:
        # BE companions; compat uses the reference's one-step-lagged q1
        # (PLAN.md 3), physics the previous accepted step's q0
        qrow_key = "c_q1" if mode == "compat" else "c_q0"
        geq = [_df_mul(*const(L["cadj"] + k), *dtinv) for k in range(nc_)]
        ceq = [_df_mul(*st(L[qrow_key] + k), *dtinv) for k in range(nc_)]
        lterm = [_df_mul(*const(L["lval"] + k), *dtinv) for k in range(nl_)]
        lrhs = [_df_mul(*lterm[k], *st(L["l_i1"] + k)) for k in range(nl_)]
    if dyn_tables is not None:
        vsrc = dyn_tables["vsrc"]
        isrc = dyn_tables["isrc"]
        lmterm = dyn_tables["lmterm"]
        lmrhs = dyn_tables["lmrhs"]
        kterm = dyn_tables["kterm"]
        krhsa = dyn_tables["krhsa"]
        krhsb = dyn_tables["krhsb"]
    else:
        vsrc = [dyn(1 + k) for k in range(nv_)]
        isrc = [dyn(1 + nv_ + k) for k in range(ni_)]
        # magnetic-inductor and mutual-coupling rows: precomputed per attempt
        # in XLA f64 (make_tran_fused body) — the kernel only sums them into
        # cells
        dlm = 1 + nv_ + ni_
        lmterm = [dyn(dlm + k) for k in range(nlm_)]
        lmrhs = [dyn(dlm + nlm_ + k) for k in range(nlm_)]
        kterm = [dyn(dlm + 2 * nlm_ + k) for k in range(nk_)]
        krhsa = [dyn(dlm + 2 * nlm_ + nk_ + k) for k in range(nk_)]
        krhsb = [dyn(dlm + 2 * nlm_ + 2 * nk_ + k) for k in range(nk_)]

    tables = {"g": g, "geq": geq, "ceq": ceq, "lterm": lterm, "lrhs": lrhs,
              "vsrc": vsrc, "isrc": isrc, "lmterm": lmterm, "lmrhs": lmrhs,
              "kterm": kterm, "krhsa": krhsa, "krhsb": krhsb}

    def term_value(tag, k, s):
        if tag == "one":
            hi = jnp.full(lanes, f32(s))
            return (hi, zero)
        p = tables[tag][k]
        return p if s > 0 else _df_neg(p)

    def cell_sum(terms):
        if not terms:
            return (zero, zero)
        acc = term_value(*terms[0])
        for t_ in terms[1:]:
            acc = _df_add(*acc, *term_value(*t_))
        return acc

    one = jnp.ones(lanes, dtype=f32)
    # Base (linear-device) cell sums, loop-invariant across Newton iterations;
    # RHS sums are keyed (i, n) in the same dict.
    base = {}
    for i in range(1, n):
        for j in range(n + 1):
            terms = rhs_cells.get(i, []) if j == n else cells.get((i, j), [])
            if terms:
                base[(i, j)] = cell_sum(terms)

    def cell(i, j, extra):
        if i == 0:  # ground row: x[0] = 0
            return (one, zero) if j == 0 else (zero, zero)
        p = base.get((i, j), (zero, zero))
        e = extra.get((i, j))
        if e is not None:
            p = _df_add(*p, *e)
        return p

    if cpu_build:
        # Plain-XLA impl (CPU tests): assemble via .at[].set chains.  The
        # jnp.stack build below turns into ONE kLoop concatenate fusion with
        # every computed cell embedded; XLA CPU's per-element region-dispatch
        # codegen for it explodes ~30x under LLVM opt (observed 280 KB ->
        # 7.9 MB of IR per kernel, >10-minute compiles inside the Newton
        # while body).  Update-slice chains compile linearly.  XLA CPU
        # deletes optimization_barrier, so this is a structural fix, not an
        # annotation.
        def build_matrix(extra):
            m_hi = jnp.zeros((n, n + 1) + lanes, dtype=f32)
            m_lo = jnp.zeros_like(m_hi)
            for i in range(n):
                for j in range(n + 1):
                    p = cell(i, j, extra)
                    if p[0] is not zero:
                        m_hi = m_hi.at[i, j].set(p[0])
                    if p[1] is not zero:
                        m_lo = m_lo.at[i, j].set(p[1])
            return m_hi, m_lo
    else:
        def build_matrix(extra):
            """Stack the augmented (n, n+1, *lanes) df matrix from base +
            extra cells; row 0 is the ground identity row."""
            row_his, row_los = [], []
            for i in range(n):
                col_his = [cell(i, j, extra)[0] for j in range(n + 1)]
                col_los = [cell(i, j, extra)[1] for j in range(n + 1)]
                row_his.append(jnp.stack(col_his, axis=0))
                row_los.append(jnp.stack(col_los, axis=0))
            return jnp.stack(row_his, axis=0), jnp.stack(row_los, axis=0)

    if nd_ == 0 and nq_ == 0 and nm_ == 0:
        x_hi, x_lo = _gj_eliminate(n, *build_matrix({}))
        nr_k = None
        nr_conv = None
        jvout = jnp.stack([jv_hi, jv_lo])  # passthrough
    else:
        # lanes the XLA attempt loop considers inactive (batch padding, or
        # instances already done) start converged: zero Newton iterations
        # instead of burning max_iter on their stale/singular systems
        if dyn_tables is not None:
            act_mask = dyn_tables["act"]
        else:
            act_mask = dyn_hi[1 + nv_ + ni_ + 2 * nlm_ + 3 * nk_, :] > 0.5
        x_hi, x_lo, nr_k, nr_conv, jvout = _newton_in_kernel(
            n, nd_, nq_, nm_, layout, cfgk, build_matrix, const, jv_hi,
            jv_lo, dtinv, lanes, act_mask, mode=mode, st=st)

    def xrow(r):
        return (x_hi[r], x_lo[r])

    def diff_x(n1, n2):
        return _df_add(*xrow(n1), *_df_neg(xrow(n2)))

    # --- LTE from the committed (pre-attempt) state — tran.go:239-250 ---
    half = _df_const(0.5, lanes)
    worst = (zero, zero)
    for k in range(nc_):
        craw = const(L["craw"] + k)
        qa = _df_mul(*craw, *st(L["c_v0"] + k))
        qb = _df_mul(*craw, *st(L["c_v1"] + k))
        d = _df_abs(_df_add(*qa, *_df_neg(qb)))
        v = _df_mul(*_df_mul(*d, *dtinv), *half)
        worst = _df_max(worst, v)
    for k in range(nl_):
        di = _df_abs(_df_add(*st(L["l_i0"] + k), *_df_neg(st(L["l_i1"] + k))))
        dv = _df_abs(_df_add(*st(L["l_v0"] + k), *_df_neg(st(L["l_v1"] + k))))
        d = _df_max(di, dv)
        v = _df_mul(*_df_mul(*d, *dtinv), *half)
        worst = _df_max(worst, v)

    if nd_ == 0 and nq_ == 0 and nm_ == 0:
        hi_rows = [x_hi[r] for r in range(n)] + [worst[0]]
        lo_rows = [x_lo[r] for r in range(n)] + [worst[1]]
    else:
        # rows n+1 / n+2: Newton iteration count and convergence flag
        hi_rows = ([x_hi[r] for r in range(n)]
                   + [worst[0], nr_k.astype(f32), nr_conv.astype(f32)])
        lo_rows = ([x_lo[r] for r in range(n)] + [worst[1], zero, zero])
    xlte = jnp.stack([jnp.stack(hi_rows), jnp.stack(lo_rows)])

    # --- commit candidates (compat: capacitor.go:155-171, inductor.go:81-114;
    # physics: engine/state.py make_commit forms)
    # default: pass the input state through (also covers the dummy row when
    # the circuit has no C/L state at all)
    out_rows_hi = [st_hi[r, :] for r in range(st_hi.shape[0])]
    out_rows_lo = [st_lo[r, :] for r in range(st_hi.shape[0])]

    def put(r, p):
        out_rows_hi[r], out_rows_lo[r] = p

    one_pair = (jnp.ones(lanes, dtype=f32), zero)
    for k in range(nc_):
        n1, n2 = layout["c_nodes"][k]
        vd = diff_x(n1, n2)
        put(L["c_v0"] + k, vd)
        put(L["c_v1"] + k, st(L["c_v0"] + k))
        put(L["c_q0"] + k, _df_mul(*const(L["craw"] + k), *vd))
        put(L["c_q1"] + k, st(L["c_q0"] + k))
        if mode != "compat":
            dv = _df_add(*vd, *_df_neg(st(L["c_v0"] + k)))
            if mode == "phys_be":
                # BE current with the RAW C (engine/state.py:140)
                i_new = _df_mul(*_df_mul(*const(L["craw"] + k), *dv), *dtinv)
            else:
                # trap current recursion with the temperature-adjusted C
                # (must match the stamp — the TR recursion is marginally
                # stable); first committed step BE
                i_be = _df_mul(*_df_mul(*const(L["cadj"] + k), *dv), *dtinv)
                i_tr = _df_add(*_df_twice(i_be),
                               *_df_neg(st(L["c_i0"] + k)))
                started = st(L["c_hist"] + k)[0] > 0
                i_new = _df_where(started, i_tr, i_be)
            put(L["c_i0"] + k, i_new)
            put(L["c_hist"] + k, one_pair)
    c1e9 = _df_const(1e-9, lanes)
    for k in range(nl_):
        n1, n2 = layout["l_nodes"][k]
        vd = diff_x(n1, n2)
        if mode == "compat":
            linv = const(L["linv"] + k)
            # LoadState then UpdateState: i1' = i1 + vd·dt/L ; i0' = vd·1e-9/L
            put(L["l_i1"] + k,
                _df_add(*st(L["l_i1"] + k),
                        *_df_mul(*_df_mul(*vd, *dt), *linv)))
            put(L["l_i0"] + k, _df_mul(*_df_mul(*vd, *c1e9), *linv))
        else:
            # physics: the branch unknown IS the current (x_b = -I)
            i_new = _df_neg(xrow(layout["l_branch"][k]))
            put(L["l_i0"] + k, i_new)
            put(L["l_i1"] + k, i_new)
            put(L["l_hist"] + k, one_pair)
        put(L["l_v0"] + k, vd)
        put(L["l_v1"] + k, st(L["l_v0"] + k))
        put(L["l_flux0"] + k, _df_mul(*vd, *dt))

    if mode != "compat" and (nd_ or nm_):
        # physics D/M commit candidates (engine/state.py make_commit):
        # devices re-evaluated at the RAW solution voltages — exactly the
        # general engine's commit, which never applies pnjlim or cold start
        lib_c = _device_eval_lib(nd_, nq_, nm_, layout, const, lanes, mode)
        trap_c = mode == "phys_trap"
        for kd in range(nd_):
            n1, n2 = layout["d_nodes"][kd]
            vd = diff_x(n1, n2)
            id_, _gd = lib_c["d_eval"](kd, vd)
            q_new = _df_mul(*lib_c["dtt"][kd], *id_)
            dq = _df_mul(*_df_add(*q_new, *_df_neg(st(L["d_pq_s"] + kd))),
                         *dtinv)
            if trap_c:
                started = st(L["d_hist"] + kd)[0] > 0
                ic_new = _df_where(
                    started,
                    _df_add(*_df_twice(dq), *_df_neg(st(L["d_ic0"] + kd))),
                    dq)
            else:
                ic_new = dq
            put(L["d_pvd"] + kd, vd)
            put(L["d_pid"] + kd, id_)
            put(L["d_pq_s"] + kd, q_new)
            put(L["d_ic0"] + kd, ic_new)
            put(L["d_hist"] + kd, one_pair)
        for km in range(nm_):
            ndn, ngn, nsn, nbn = layout["m_nodes"][km]
            sgn = lib_c["mrow"]["m_sign"][km]
            vgs = _df_mul(*sgn, *diff_x(ngn, nsn))
            vds = _df_mul(*sgn, *diff_x(ndn, nsn))
            vbs = _df_mul(*sgn, *diff_x(nbn, nsn))
            _id, _gm, _gds, _gmbs, cgs, cgd, cgb, cut, _il = (
                lib_c["m_dc_eval"](km, layout["m_level"][km],
                                   vgs, vds, vbs))
            qn = lib_c["m_charges"](km, cut, cgs, cgd, cgb, vgs, vds, vbs)
            if trap_c:
                m_started = st(L["m_hist_s"] + km)[0] > 0
            for qv, qkey, ikey in zip(
                    qn, ("m_qgs_s", "m_qgd_s", "m_qgb_s", "m_qbs_s",
                         "m_qbd_s"),
                    ("m_icgs_s", "m_icgd_s", "m_icgb_s", "m_icbs_s",
                     "m_icbd_s")):
                dq = _df_mul(*_df_add(*qv, *_df_neg(st(L[qkey] + km))),
                             *dtinv)
                if trap_c:
                    ic_new = _df_where(
                        m_started,
                        _df_add(*_df_twice(dq), *_df_neg(st(L[ikey] + km))),
                        dq)
                else:
                    ic_new = dq
                put(L[qkey] + km, qv)
                put(L[ikey] + km, ic_new)
            put(L["m_hist_s"] + km, one_pair)

    stout = jnp.stack([jnp.stack(out_rows_hi, axis=0),
                       jnp.stack(out_rows_lo, axis=0)])
    return xlte, stout, jvout


@_unpinned
def _fused_kernel(n, counts, layout, cells, rhs_cells, cfgk, mode, dus_build,
                  const_hi_ref, const_lo_ref, dyn_hi_ref, dyn_lo_ref,
                  st_hi_ref, st_lo_ref, jv_hi_ref, jv_lo_ref,
                  xlte_ref, stout_ref, jvout_ref):
    # Input refs are (rows, 8, W): the lane axis is folded to sublane-dense
    # (8, W) tiles so every df op fills all 8 sublanes of the f32 vreg — a
    # 1-D (blk,) layout occupies 1 of 8 sublanes and issue-binds the kernel
    # at 1/8th VPU utilization (measured 67.8 of 72.7 us per attempt).
    #
    # Output refs are (2, rows, 8, W) with limb axis 0 — the hi and lo limbs
    # of each df pair MUST leave the kernel through ONE ref: with separate
    # hi/lo outputs the compiler duplicates the error-free transforms into
    # two fusions whose last-bit rounding can disagree, yielding pairs like
    # (hi+ulp, lo-of-hi) that are off by 2^-23 relative (observed in
    # interpret mode on rl decks).
    xlte, stout, jvout = _attempt_core(
        n, counts, layout, cells, rhs_cells, cfgk, mode,
        const_hi_ref[...], const_lo_ref[...],
        dyn_hi_ref[...], dyn_lo_ref[...],
        st_hi_ref[...], st_lo_ref[...],
        jv_hi_ref[...], jv_lo_ref[...], cpu_build=dus_build)
    xlte_ref[...] = xlte
    stout_ref[...] = stout
    jvout_ref[...] = jvout


# ----------------------------------------------------------------- wrapper


def _layout(cc, physics: bool = False):
    """Row offsets inside the const and state stacks.  ``physics`` appends
    the extra committed-state rows the corrected-physics companions carry
    (capacitor current + first-step flags for the trapezoidal forms)."""
    nr_ = cc.kind_count("R") if "R" in cc.idx else 0
    nc_ = cc.kind_count("C") if "C" in cc.idx else 0
    nl_ = cc.kind_count("L") if "L" in cc.idx else 0
    nlm_ = cc.kind_count("LM") if "LM" in cc.idx else 0
    nv_ = cc.kind_count("V") if "V" in cc.idx else 0
    ni_ = cc.kind_count("I") if "I" in cc.idx else 0
    nk_ = len(np.asarray(cc.idx["K"]["branch_a"])) if "K" in cc.idx else 0
    nd_ = cc.kind_count("D") if "D" in cc.idx else 0
    nq_ = cc.kind_count("Q") if "Q" in cc.idx else 0
    nm_ = cc.kind_count("M") if "M" in cc.idx else 0
    L = {"g": 0, "cadj": nr_, "craw": nr_ + nc_, "lval": nr_ + 2 * nc_,
         "linv": nr_ + 2 * nc_ + nl_}
    base_d = nr_ + 2 * nc_ + 2 * nl_
    # per-diode attempt-invariant rows: 1/(n·Vt(T)), −3·n·Vt(T), Is(T),
    # device gmin, Tt, limiter vte = n·Vt_nom, 1/vte, vcrit, the compat
    # frozen prev_charge (PLAN.md 1: never committed, so attempt-invariant),
    # and the physics-mode Rs/Bv rows (models/diode.py dc_eval_physics):
    # n·Vt(T), Rs, −Bv, the breakdown-frame limiter gate min(0, −Bv+10·vte)
    # (engine/nlstate.py physics branch) and the Rs-Newton seed factor
    # 1/(Rs·Is(T)) — zero/unused under compat
    for off, key in enumerate(("d_invnvt", "d_m3nvt", "d_ist", "d_gmin",
                               "d_tt", "d_vte", "d_invvte", "d_vcrit",
                               "d_pq", "d_nvt", "d_rs", "d_mbv",
                               "d_bkgate", "d_invrsis")):
        L[key] = base_d + off * nd_
    base_q = base_d + 14 * nd_
    # per-BJT attempt-invariant rows for the Ebers-Moll eval (models/bjt.py
    # currents), per-junction pnjlim at NOMINAL temperature (nlstate.py:64-67)
    # and the cold-start guess (bjt.go:110-120); inv_* rows are 0 when the
    # corresponding Vaf/Var/Ikf/Ikr knob is disabled (<= 0)
    for off, key in enumerate((
            "q_invnfvt", "q_invnrvt", "q_sies", "q_sics",
            "q_invvaf", "q_invvar", "q_invikf", "q_invikr",
            "q_alphaf", "q_sign",
            "q_vtef", "q_invvtef", "q_vcritf",
            "q_vter", "q_invvter", "q_vcritr",
            "q_vbe0", "q_vbc0")):
        L[key] = base_q + off * nq_
    base_m = base_q + 18 * nq_
    # per-MOSFET attempt-invariant rows.  Precombined where the reference's
    # factors are all parameters (mosfet.go:358-459, 540-637): beta1=KP·W/L,
    # e2u=1/(tox·100·Ucrit) (0 when Ucrit<=0), b2u=Uo·Cox·W/(L·100),
    # vmlu=Vmax·100·L/Uo (or ·L when Uo<=0, matching the ueff==0 guard),
    # beta3=beta1/(1+delta/W), cgate=Cox·W·L, overlap caps scaled by W/L,
    # junction caps resolved via the cbs==0&cj>0 select, and the five
    # compat-frozen previous charges (never committed, PLAN.md 1).
    for off, key in enumerate((
            "m_sign", "m_vto", "m_gamma", "m_phi", "m_sqrtphi",
            "m_beta1", "m_lam",
            "m_e2u", "m_uexp", "m_b2u", "m_vmlu", "m_uopos", "m_vmax",
            "m_theta", "m_kappa", "m_beta3",
            "m_cgate", "m_cgso", "m_cgdo", "m_cgbo",
            "m_cbs", "m_cbd", "m_invpb", "m_mj",
            "m_pqgs", "m_pqgd", "m_pqgb", "m_pqbs", "m_pqbd")):
        L[key] = base_m + off * nm_
    n_const = base_m + 29 * nm_
    # jv stack rows: diode vd, BJT vbe, BJT vbc, then MOSFET vgs/vds/vbs
    L.update({"jv_d": 0, "jv_qbe": nd_, "jv_qbc": nd_ + nq_,
              "jv_mgs": nd_ + 2 * nq_, "jv_mds": nd_ + 2 * nq_ + nm_,
              "jv_mbs": nd_ + 2 * nq_ + 2 * nm_})
    # state stack rows (same layout for input and commit-candidate output)
    L.update({"c_q0": 0, "c_q1": nc_, "c_v0": 2 * nc_, "c_v1": 3 * nc_,
              "l_i0": 4 * nc_, "l_i1": 4 * nc_ + nl_, "l_v0": 4 * nc_ + 2 * nl_,
              "l_v1": 4 * nc_ + 3 * nl_, "l_flux0": 4 * nc_ + 4 * nl_})
    n_state = 4 * nc_ + 5 * nl_
    if physics:
        L.update({"c_i0": n_state, "c_hist": n_state + nc_,
                  "l_hist": n_state + 2 * nc_})
        n_state += 2 * nc_ + nl_
        # physics D/M committed rows (engine/state.py make_commit): diode
        # prev_vd/prev_id/prev_charge/ic0/hist, MOSFET five charges + five
        # companion currents + hist — compat never commits these (PLAN.md 1)
        for off, key in enumerate(("d_pvd", "d_pid", "d_pq_s", "d_ic0",
                                   "d_hist")):
            L[key] = n_state + off * nd_
        n_state += 5 * nd_
        for off, key in enumerate(("m_qgs_s", "m_qgd_s", "m_qgb_s",
                                   "m_qbs_s", "m_qbd_s", "m_icgs_s",
                                   "m_icgd_s", "m_icgb_s", "m_icbs_s",
                                   "m_icbd_s", "m_hist_s")):
            L[key] = n_state + off * nm_
        n_state += 11 * nm_
    L["c_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["C"]["nodes"])]
                    if nc_ else [])
    L["l_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["L"]["nodes"])]
                    if nl_ else [])
    L["l_branch"] = ([int(v) for v in np.asarray(cc.idx["L"]["branch"])]
                     if nl_ else [])
    L["d_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["D"]["nodes"])]
                    if nd_ else [])
    L["q_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["Q"]["nodes"])]
                    if nq_ else [])
    # MOSFET node columns: drain, gate, source, bulk (mosfet.go:640-665)
    L["m_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["M"]["nodes"])]
                    if nm_ else [])
    L["m_level"] = ([int(v) for v in np.asarray(cc.idx["M"]["level"])]
                    if nm_ else [])
    # Static junction-cap gate: decks whose models never set cj/cbs/cbd
    # (e.g. mosfet1.cir) statically skip the two df_pow junction-charge
    # branches and their stamps — the values are identically zero there.
    # Batched overrides that would flip the gate are rejected by
    # fused_ineligible_reason.
    if nm_:
        pm = cc.params["M"]
        L["m_jcap"] = [bool(np.asarray(pm["cbs"])[k] > 0
                            or np.asarray(pm["cbd"])[k] > 0
                            or np.asarray(pm["cj"])[k] > 0)
                       for k in range(nm_)]
    else:
        L["m_jcap"] = []
    # Static Rs gate (physics diode): devices whose deck model leaves Rs at
    # 0 statically skip the 8-step seeded inner Newton (models/diode.py
    # dc_eval_physics) — the loop is an exact no-op at Rs = 0.  Batched
    # overrides that would flip the gate are rejected by
    # fused_ineligible_reason (same contract as m_jcap).
    L["d_rs_on"] = ([bool(np.asarray(cc.params["D"]["rs"])[k] > 0)
                     for k in range(nd_)] if nd_ else [])
    return (nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_), L, n_const, n_state


def _hi_lo(x64):
    hi = x64.astype(jnp.float32)
    return hi, (x64 - hi.astype(jnp.float64)).astype(jnp.float32)


def _lanes(leaf, nk, bp):
    """Param leaf (nk,) shared or (B, nk) batched -> (nk, bp) f64, with the
    lane axis zero-padded to the block-aligned width bp (pad lanes start
    `done` and their values are never consumed)."""
    leaf = jnp.asarray(leaf, dtype=jnp.float64)
    if leaf.ndim == 1:
        return jnp.broadcast_to(leaf[:, None], (nk, bp))
    out = jnp.transpose(leaf, (1, 0))
    if out.shape[1] != bp:
        out = jnp.pad(out, ((0, 0), (0, bp - out.shape[1])))
    return out


def _const_stack64(cc, params, state0, counts, bp, temp):
    """Attempt-invariant per-device const rows as one (n_const, bp) f64 stack
    (row offsets: ``_layout``).  Shared by the fused transient kernel
    (make_tran_fused) and the fused OP/Newton kernel (ops/pallas_op.py) —
    both stamp the same device physics, so the precombined parameter rows
    (diode Is(T)/limiter rows, BJT Ebers-Moll factors + cold start, MOSFET
    level constants + Meyer/junction caps) are identical.

    Rows are computed at the leaves' NATURAL width — (nk,) shared or
    (B, nk) batched — and broadcast to (nk, bp) only at the end: computing
    the transcendental-heavy rows (Is(T), vcrit, the BJT cold start, MOSFET
    beta factors) at full lane width in emulated f64 cost a measured
    25-32 ms PER CALL at B=8192 on v5e, which dominated every short
    workload fronted by the fused OP (the whole 40-point DC sweep ran in
    27 ms, 24 of it this prologue)."""
    from ..models import bjt as bjt_model
    from ..models import diode as diode_model
    from ..models.limiter import vcrit as vcrit_fn

    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    dtemp = temp - TEMP_DEFAULT
    f64 = jnp.float64

    def nat(tbl):
        return {k: jnp.asarray(v, dtype=f64) for k, v in tbl.items()}

    def tadj(tbl):
        p = nat(tbl)
        return p["value"] * (1.0 + p["tc1"] * dtemp
                             + p["tc2"] * dtemp * dtemp)

    rows = []
    if nr_:
        rows.append(1.0 / tadj(params["R"]))
    if nc_:
        rows.append(tadj(params["C"]))
        rows.append(jnp.asarray(params["C"]["value"], dtype=f64))
    if nl_:
        lv = jnp.asarray(params["L"]["value"], dtype=f64)
        rows.extend([lv, 1.0 / lv])
    if nd_:
        pdl = {k: jnp.asarray(params["D"][k], dtype=f64)
               for k in ("n", "is_", "tt", "gmin", "eg", "xti", "rs", "bv")}
        vt_t = diode_model.thermal_voltage(jnp.float64(temp))
        nvt = pdl["n"] * vt_t
        is_t = diode_model.temperature_adjusted_is(pdl, temp)
        # the limiter runs at NOMINAL temperature with the raw Is
        # (engine/nlstate.py:22,49-51), unlike the device eval
        vte_lim = pdl["n"] * (BOLTZMANN * TEMP_DEFAULT / CHARGE)
        pq0 = state0.get("D", {}).get("prev_charge")
        pq0 = (jnp.zeros(nd_, dtype=f64) if pq0 is None
               else jnp.asarray(pq0, dtype=f64))
        # physics Rs/Bv rows (models/diode.py dc_eval_physics +
        # engine/nlstate.py breakdown frame); 1/(Rs·Is) guarded at Rs = 0
        # (statically skipped by d_rs_on, value never consumed)
        invrsis = jnp.where(pdl["rs"] > 0,
                            1.0 / (jnp.where(pdl["rs"] > 0, pdl["rs"], 1.0)
                                   * is_t), 0.0)
        rows.extend([1.0 / nvt, -3.0 * nvt, is_t, pdl["gmin"], pdl["tt"],
                     vte_lim, 1.0 / vte_lim,
                     vcrit_fn(vte_lim, pdl["is_"]), pq0,
                     nvt, pdl["rs"], -pdl["bv"],
                     jnp.minimum(0.0, -pdl["bv"] + 10.0 * vte_lim),
                     invrsis])
    if nq_:
        pql = {k: jnp.asarray(params["Q"][k], dtype=f64)
               for k in ("sign", "ies", "ics", "nf", "nr", "alphaf",
                         "vaf", "var", "ikf", "ikr")}
        vtq = bjt_model.thermal_voltage(jnp.float64(temp))
        vt_nom = BOLTZMANN * TEMP_DEFAULT / CHARGE
        vte_f = pql["nf"] * vt_nom  # limiter at nominal T (nlstate.py)
        vte_r = pql["nr"] * vt_nom
        # cold start (bjt.go:110-120): vbe0 = Nf·Vt·ln(1e-3/Ies),
        # vce0 = max(2, vbe0+1), vbc0 = vbe0 − vce0
        vbe0 = pql["nf"] * vtq * jnp.log(1e-3 / pql["ies"])
        vbc0 = vbe0 - jnp.maximum(2.0, vbe0 + 1.0)

        def inv_or0(v):
            return jnp.where(v > 0, 1.0 / v, jnp.zeros_like(v))

        rows.extend([
            1.0 / (pql["nf"] * vtq), 1.0 / (pql["nr"] * vtq),
            pql["sign"] * pql["ies"], pql["sign"] * pql["ics"],
            inv_or0(pql["vaf"]), inv_or0(pql["var"]),
            inv_or0(pql["ikf"]), inv_or0(pql["ikr"]),
            pql["alphaf"], pql["sign"],
            vte_f, 1.0 / vte_f, vcrit_fn(vte_f, pql["ies"]),
            vte_r, 1.0 / vte_r, vcrit_fn(vte_r, pql["ics"]),
            vbe0, vbc0,
        ])
    if nm_:
        pml = {k: jnp.asarray(params["M"][k], dtype=f64)
               for k in ("sign", "vto", "gamma", "phi", "kp", "w", "l",
                         "lam", "tox", "uo", "ucrit", "uexp", "vmax",
                         "theta", "kappa", "delta", "cgso", "cgdo",
                         "cgbo", "cbs", "cbd", "cj", "as", "ps", "ad",
                         "pd", "cjsw", "pb", "mj")}
        cox = 3.9 * 8.85e-14 / pml["tox"]  # mosfet.go:382
        beta1 = pml["kp"] * pml["w"] / pml["l"]
        e2u = jnp.where(pml["ucrit"] > 0,
                        1.0 / (pml["tox"] * 100.0 * pml["ucrit"]), 0.0)
        b2u = pml["uo"] * cox * pml["w"] / (pml["l"] * 100.0)
        vml = pml["vmax"] * 100.0 * pml["l"]
        vmlu = jnp.where(pml["uo"] > 0, vml / pml["uo"], vml)
        beta3 = beta1 / jnp.where(pml["delta"] > 0,
                                  1.0 + pml["delta"] / pml["w"], 1.0)
        cbs_eff = jnp.where((pml["cbs"] == 0) & (pml["cj"] > 0),
                            pml["cj"] * pml["as"]
                            + pml["cjsw"] * pml["ps"], pml["cbs"])
        cbd_eff = jnp.where((pml["cbd"] == 0) & (pml["cj"] > 0),
                            pml["cj"] * pml["ad"]
                            + pml["cjsw"] * pml["pd"], pml["cbd"])

        def mq0(key):
            leaf = state0.get("M", {}).get(key)
            return (jnp.zeros(nm_, dtype=f64)
                    if leaf is None else jnp.asarray(leaf, dtype=f64))

        rows.extend([
            pml["sign"], pml["vto"], pml["gamma"], pml["phi"],
            jnp.sqrt(pml["phi"]), beta1, pml["lam"],
            e2u, pml["uexp"], b2u, vmlu,
            (pml["uo"] > 0).astype(f64), pml["vmax"],
            pml["theta"], pml["kappa"], beta3,
            cox * pml["w"] * pml["l"], pml["cgso"] * pml["w"],
            pml["cgdo"] * pml["w"], pml["cgbo"] * pml["l"],
            cbs_eff, cbd_eff, 1.0 / pml["pb"], pml["mj"],
            mq0("qgs"), mq0("qgd"), mq0("qgb"), mq0("qbs"), mq0("qbd"),
        ])
    if not rows:
        return jnp.zeros((1, bp), dtype=f64)
    # broadcast each row to the (nk, bp) lane layout LAST (cheap memory
    # ops; the math above ran at natural width)
    out = []
    for r in rows:
        r = jnp.asarray(r, dtype=f64)
        if r.ndim == 0:
            r = r[None]
        if r.ndim == 1:
            out.append(jnp.broadcast_to(r[:, None], (r.shape[0], bp)))
        else:  # (B, nk) batched leaf
            t_ = jnp.transpose(r, (1, 0))
            if t_.shape[1] != bp:
                t_ = jnp.pad(t_, ((0, 0), (0, bp - t_.shape[1])))
            out.append(t_)
    return jnp.concatenate(out, axis=0)


def _op_bias(cc, op_fused_fn, op_execute, op_seed, physics, params, state0):
    """The pre-transient OP bias point (tran.go:57-75), batch-aware: fused
    OP/Newton kernel when built, else the (vmapped) general engine; physics
    seeds the committed state from the bias solution (engine/tran.py:
    111-116).  Returns (opr, state0') — shared by the attempt-loop engine
    and the whole-run kernel."""
    paxes = {kind: {k: (0 if jnp.asarray(v).ndim
                        == (3 if k in ("pwl_t", "pwl_v") else 2)
                        else None)
                    for k, v in tbl.items()}
             for kind, tbl in params.items()}
    saxes0 = {kind: {k: (0 if jnp.asarray(v).ndim == 2 else None)
                     for k, v in tbl.items()}
              for kind, tbl in state0.items()}
    mapped = any(a == 0
                 for t in list(paxes.values()) + list(saxes0.values())
                 for a in t.values())
    if op_fused_fn is not None:
        # fused OP kernel: batch-native, (b, ·) outputs either way
        opr = op_fused_fn(params, state0)
    elif mapped:
        opr = jax.vmap(op_execute, in_axes=(paxes, saxes0))(params, state0)
    else:
        opr = op_execute(params, state0)
    if physics:
        if mapped:
            state0 = jax.vmap(op_seed, in_axes=(paxes, saxes0, 0))(
                params, state0, opr.x)
        elif op_fused_fn is not None:
            # the fused OP is batch-native: opr.x is (b, np1) even for an
            # unbatched run
            state0 = op_seed(params, state0, opr.x[0])
        else:
            state0 = op_seed(params, state0, opr.x)
    return opr, state0


def _jv_stack64(counts, jv_tree, bp):
    """Junction-voltage warm-start pytree -> (kj, bp) f64 stack (kj >= 1;
    a dummy zero row for linear decks).  jv_tree=None -> zeros (UIC)."""
    nd_, nq_, nm_ = counts[7], counts[8], counts[9]
    kj = nd_ + 2 * nq_ + 3 * nm_
    if kj == 0 or jv_tree is None:
        return jnp.zeros((max(kj, 1), bp), dtype=jnp.float64)
    jrows = []
    if nd_:
        jrows.append(_lanes(jv_tree["D"]["vd"], nd_, bp))
    if nq_:
        jrows.append(_lanes(jv_tree["Q"]["vbe"], nq_, bp))
        jrows.append(_lanes(jv_tree["Q"]["vbc"], nq_, bp))
    if nm_:
        jrows.append(_lanes(jv_tree["M"]["vgs"], nm_, bp))
        jrows.append(_lanes(jv_tree["M"]["vds"], nm_, bp))
        jrows.append(_lanes(jv_tree["M"]["vbs"], nm_, bp))
    return jnp.concatenate(jrows, axis=0)


def _init_state_stack64(counts, physics, state0, bp):
    """Initial committed-state pytree -> (ks, bp) f64 stack (row offsets:
    ``_layout``; a dummy zero row when the circuit has no state)."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts

    def srow(kind, key, nk):
        leaf = state0.get(kind, {}).get(key)
        if leaf is None:
            return jnp.zeros((nk, bp), dtype=jnp.float64)
        return _lanes(leaf, nk, bp)

    srows = []
    if nc_:
        srows += [srow("C", "q0", nc_), srow("C", "q1", nc_),
                  srow("C", "v0", nc_), srow("C", "v1", nc_)]
    if nl_:
        srows += [srow("L", "i0", nl_), srow("L", "i1", nl_),
                  srow("L", "v0", nl_), srow("L", "v1", nl_),
                  srow("L", "flux0", nl_)]
    if physics:
        # extra committed rows the physics companions read/write
        # (_layout physics=True): C current + hist, L hist, diode
        # diffusion-charge memory, MOSFET charges + companion currents
        if nc_:
            srows += [srow("C", "i0", nc_), srow("C", "hist", nc_)]
        if nl_:
            srows += [srow("L", "hist", nl_)]
        if nd_:
            srows += [srow("D", "prev_vd", nd_),
                      srow("D", "prev_id", nd_),
                      srow("D", "prev_charge", nd_),
                      srow("D", "ic0", nd_), srow("D", "hist", nd_)]
        if nm_:
            srows += [srow("M", key, nm_)
                      for key in ("qgs", "qgd", "qgb", "qbs", "qbd",
                                  "icgs", "icgd", "icgb", "icbs",
                                  "icbd", "hist")]
    return (jnp.concatenate(srows, axis=0) if srows
            else jnp.zeros((1, bp), dtype=jnp.float64))


def _unpack_state_jv(counts, layout, physics, st64f, jvf, state0,
                     accepted_b, b, bp):
    """Final state stack + junction-voltage stack -> the TranOutput
    (state, jv) pytrees, shared by the attempt-loop engine
    (make_tran_fused) and the whole-run kernel (ops/pallas_run.py).

    ``st64f`` is the (ks, b) f64 state stack, ``jvf`` the (kj, b) f64 jv
    stack (None for linear decks).  Handles C/L/D/Q/M and the compat-LM
    passthrough; the physics-LM live carry stays with make_tran_fused
    (the J-A state lives in its XLA loop carry, not the stack)."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    layoutL = layout
    f64 = jnp.float64
    nonlin = bool(nd_ or nq_ or nm_)

    def grab(off, nk):
        return jnp.transpose(st64f[off:off + nk], (1, 0))

    def srow(kind, key, nk):
        leaf = state0.get(kind, {}).get(key)
        if leaf is None:
            return jnp.zeros((nk, bp), dtype=f64)
        return _lanes(leaf, nk, bp)

    state = {}
    if nc_:
        started = (accepted_b > 0)[:, None]
        if physics:
            i00 = grab(layoutL["c_i0"], nc_)
            hist_c = grab(layoutL["c_hist"], nc_)
        else:
            i00 = srow("C", "i0", nc_)[:, :b].T
            hist_c = jnp.where(started, 1.0,
                               srow("C", "hist", nc_)[:, :b].T)
        state["C"] = {
            "q0": grab(layoutL["c_q0"], nc_),
            "q1": grab(layoutL["c_q1"], nc_),
            "v0": grab(layoutL["c_v0"], nc_),
            "v1": grab(layoutL["c_v1"], nc_),
            "i0": i00, "hist": hist_c,
        }
    if nl_:
        started = (accepted_b > 0)[:, None]
        if physics:
            hist_l = grab(layoutL["l_hist"], nl_)
        else:
            hist_l = jnp.where(started, 1.0,
                               srow("L", "hist", nl_)[:, :b].T)
        state["L"] = {
            "i0": grab(layoutL["l_i0"], nl_),
            "i1": grab(layoutL["l_i1"], nl_),
            "v0": grab(layoutL["l_v0"], nl_),
            "v1": grab(layoutL["l_v1"], nl_),
            "flux0": grab(layoutL["l_flux0"], nl_),
            "hist": hist_l,
        }
    if nlm_ and not physics and "LM" in state0:
        # compat never commits magnetic-inductor state (PLAN.md 1):
        # pass state0 through, broadcast to the batch
        state["LM"] = {k: _lanes(state0["LM"][k], nlm_, bp)[:, :b].T
                       for k in state0["LM"]}
    jv_out = {}
    if nonlin:
        nd2, nq2, nm2 = nd_, nq_, nm_
        # compat: diode/BJT transient state is never committed (PLAN.md
        # 1) — pass state0 through, broadcast to the batch like the
        # general engine's vmapped tree_map does.  physics commits D/M
        # in-kernel (state stack rows); Q has no committed state in
        # either semantics (engine/state.py make_commit has no Q branch)
        for kind, nk in (("D", nd2), ("Q", nq2), ("M", nm2)):
            if not nk or kind not in state0:
                continue
            if physics and kind == "D":
                state["D"] = {
                    "prev_vd": grab(layoutL["d_pvd"], nd2),
                    "prev_id": grab(layoutL["d_pid"], nd2),
                    "prev_charge": grab(layoutL["d_pq_s"], nd2),
                    "ic0": grab(layoutL["d_ic0"], nd2),
                    "hist": grab(layoutL["d_hist"], nd2),
                }
            elif physics and kind == "M":
                state["M"] = {
                    key: grab(layoutL[row], nm2)
                    for key, row in (
                        ("qgs", "m_qgs_s"), ("qgd", "m_qgd_s"),
                        ("qgb", "m_qgb_s"), ("qbs", "m_qbs_s"),
                        ("qbd", "m_qbd_s"), ("icgs", "m_icgs_s"),
                        ("icgd", "m_icgd_s"), ("icgb", "m_icgb_s"),
                        ("icbs", "m_icbs_s"), ("icbd", "m_icbd_s"),
                        ("hist", "m_hist_s"))}
            else:
                state[kind] = {
                    k: _lanes(state0[kind][k], nk, bp)[:, :b].T
                    for k in state0[kind]}
        if nd2:
            o = layoutL["jv_d"]
            jv_out["D"] = {"vd": jnp.transpose(jvf[o:o + nd2], (1, 0))}
        if nq2:
            ob, oc = layoutL["jv_qbe"], layoutL["jv_qbc"]
            vbe = jnp.transpose(jvf[ob:ob + nq2], (1, 0))
            vbc = jnp.transpose(jvf[oc:oc + nq2], (1, 0))
            # vce = vbe − vbc always holds on exit (nlstate.py:70)
            jv_out["Q"] = {"vbe": vbe, "vbc": vbc, "vce": vbe - vbc}
        if nm2:
            jv_out["M"] = {
                key: jnp.transpose(
                    jvf[layoutL[off]:layoutL[off] + nm2], (1, 0))
                for key, off in (("vgs", "jv_mgs"), ("vds", "jv_mds"),
                                 ("vbs", "jv_mbs"))}
    return state, jv_out


def make_tran_fused(cc, cfg, opts, block: int | None = None,
                    store: str = "none", resume: bool = False,
                    semantics: str = "compat", stream: bool = False):
    """Batched fused transient for eligible circuits.

    Returns fn(params, state0) -> TranOutput with a leading batch axis on
    every per-instance field.  `params` leaves are (nk,) shared or (B, nk)
    batched; `state0` is the unbatched init_state(cc) dict (or (B, nk)
    leaves).  Semantics: exactly engine/tran.py (the control flow below is
    a line-for-line counterpart; state/LTE/solve run in-kernel).  Both
    semantics fuse for the linear/magnetic device set: ``compat`` (default,
    reference-exact BE) and ``physics`` — the corrected variant with BE or
    trapezoidal companions (opts.integration), bias-point state seeding,
    end-of-interval source evaluation under trap, and LIVE Jiles-Atherton
    core state: the J-A update (magnetic.go:88-132 as used by
    engine/state.py make_commit) runs in exact XLA f64 in the attempt loop
    carry, feeding the kernel per-attempt branch-row values.  Physics
    nonlinear devices (D/Q/M) run in-kernel too: the Rs/Bv diode eval with
    breakdown-frame pnjlim, and committed D/M charge-memory companions
    carried through the state stack (BE and trap).

    resume=True mirrors make_tran's resume flavor: fn(params, state0, t0,
    jv0) continues a checkpointed run — the OP re-bias is skipped, the
    clock starts at t0 (scalar shared or (B,) per-lane, so time-varying
    sources keep their phase) and the carried device linearization comes
    from the checkpoint jv0; cfg.tstart/tstop stay absolute.  ``attempts0``
    (per-lane int) seeds the attempt counter, so cfg.max_attempts binds the
    CUMULATIVE budget across streamed re-entries instead of per chunk; the
    returned ``attempts`` is then cumulative too.

    store='full' keeps the kernel untouched and stores waveforms from the
    XLA control loop: every attempt's solution is written at the UNIFORM
    loop-iteration slot (one in-place dynamic_update_slice per attempt — no
    per-lane scatter on the hot path, which XLA would serialize), with a
    per-lane keep bit for `accepted & t >= tstart` (tran.go:141-143).  After
    the loop, one cumsum+searchsorted+gather compacts kept rows into the
    accepted-indexed (b, max_store, np1) layout the general engine emits.
    The attempt buffer holds 2*max_store+256 attempts (override:
    TOYSPICE_FUSED_STORE_ATTEMPTS); a run whose reject churn exceeds that
    reports the truncation per-lane in TranOutput.store_overflow.
    """
    from ..engine.op import make_op
    from ..engine.state import make_op_seed
    from ..engine.tran import TranOutput
    from ..models.sources import eval_sources_lanes
    from ..models import magnetic as mag_model

    physics = semantics == "physics"
    trap = physics and opts.integration == "trap"
    if opts.integration == "trap" and not physics:
        raise ValueError("trapezoidal integration requires semantics='physics'"
                         " (compat reproduces the reference's backward Euler)")
    if stream and store != "full":
        raise ValueError("stream=True pauses lanes on a full waveform "
                         "buffer and therefore requires store='full'")
    mode = "phys_trap" if trap else ("phys_be" if physics else "compat")
    counts, layout, n_const, n_state = _layout(cc, physics=physics)
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    nonlin = bool(nd_ or nq_ or nm_)
    n = cc.np1
    cells, rhs_cells = _build_plan(cc)
    cells = {k: tuple(v) for k, v in cells.items()}
    rhs_cells = {k: tuple(v) for k, v in rhs_cells.items()}
    cfgk = (opts.reltol, opts.abstol, opts.max_iter)
    # TOYSPICE_TRAN_KERNEL_BUILD=dus: the interpret-mode smoke test inlines
    # the kernel into XLA CPU, which needs the update-slice matrix build
    # (see _attempt_core) to avoid the concatenate-fusion compile explosion;
    # real Mosaic keeps the stack build.
    kernel = functools.partial(
        _fused_kernel, n, counts, layout, cells, rhs_cells, cfgk, mode,
        os.environ.get("TOYSPICE_TRAN_KERNEL_BUILD") == "dus")
    extra = 2 if nonlin else 0  # xlte rows: NR iter count + converged flag
    # physics non-UIC transients also need the OP: the bias point seeds the
    # committed state (engine/tran.py:114-116) even for linear decks
    need_op = nonlin or (physics and not cfg.uic and not resume)
    # The warm-up bias runs through the fused OP/Newton kernel when eligible
    # (ops/pallas_op.py) — the round-3 committed numbers showed the vmapped
    # general OP dominating every short nonlinear deck (diode2: 38 accepted
    # steps/lane behind an 8192-lane emulated-f64 OP).  TOYSPICE_OP=general
    # forces the old path (A/B harness).
    op_fused_fn = None
    if need_op and not resume and not cfg.uic:
        from .pallas_op import make_op_fused, op_fused_eligible
        if (op_fused_eligible(cc, semantics, opts)
                and os.environ.get("TOYSPICE_OP", "auto") != "general"):
            op_fused_fn = make_op_fused(cc, opts, semantics=semantics)
    op_execute = (make_op(cc, opts, semantics=semantics)[0]
                  if need_op and op_fused_fn is None else None)
    op_seed = make_op_seed(cc, opts.temp) if physics else None
    # lanes per grid block (rounded up to a multiple of 1024 = 8 sublanes x
    # 128 lanes).  Linear decks are bandwidth/pipeline-bound and like small
    # blocks (v5e 8192-way rlc: 1024 -> ~285M steps/s, 8192 -> 223M).
    # Round 2 measured diode-only decks gaining 2.3x from one maximal
    # block; round 3 removed the overhead that made that true (the
    # unconditional PWL searchsorted in eval_sources_lanes, ~2 ms per
    # attempt at B=8192 — see models/sources.py) and re-measured diode2 at
    # 1024 -> 4.7M, 2048 -> 5.1M, 8192 -> 4.8M: block size is now a wash
    # for nonlinear decks (BJT/MOSFET likewise).  The maximal-block default
    # for diode-only decks is kept — it is never worse and avoids grid
    # overhead on short runs.
    if block is None:
        if nd_ and not (nq_ or nm_):
            # Block-size sweeps on the tunneled v5e are INCONCLUSIVE: an
            # interleaved 2048/8192 A/B on diode2 measured 0.7-98 M
            # steps/s for IDENTICAL configs (2026-08-21, PARITY.md
            # "variance" note) — worker stalls and warm-up dwarf any block
            # effect at sub-second walls.  Keep the long-standing default.
            block = int(os.environ.get("TOYSPICE_BLOCK_NL", "8192"))
        else:
            block = int(os.environ.get("TOYSPICE_BLOCK", "1024"))
    temp = opts.temp
    trtol = opts.trtol

    def tran_fused(params, state0, t0=None, jv0=None, dt0=None,
                   attempts0=None):
        if resume:
            assert t0 is not None, "resume=True requires the checkpoint time"
            assert jv0 is not None or not nonlin, (
                "resume=True requires the checkpointed jv for nonlinear decks")
        # infer batch size from any batched leaf (scalar-per-device leaves
        # batch as (B, nK); PWL knot tables as (B, nS, P))
        b = 1
        if resume:
            t0a = jnp.asarray(t0, dtype=jnp.float64)
            if t0a.ndim == 1:
                b = max(b, t0a.shape[0])
        for tbl in params.values():
            for key, leaf in tbl.items():
                leaf = jnp.asarray(leaf)
                if key in ("pwl_t", "pwl_v"):
                    if leaf.ndim == 3:
                        b = max(b, leaf.shape[0])
                elif leaf.ndim == 2:
                    b = max(b, leaf.shape[0])
        for tbl in state0.values():
            for leaf in tbl.values():
                leaf = jnp.asarray(leaf)
                if leaf.ndim == 2:  # resumed/batched committed state
                    b = max(b, leaf.shape[0])
        # lanes fold to sublane-dense (8, W) tiles in-kernel, so blocks are
        # multiples of 8 sublanes x 128 lanes = 1024
        blk = min(block, max(1024, ((b + 1023) // 1024) * 1024))
        blk = ((blk + 1023) // 1024) * 1024
        bp = ((b + blk - 1) // blk) * blk
        w = blk // 8

        def pad_src(tbl):
            out = {}
            for key, leaf in tbl.items():
                leaf = jnp.asarray(leaf, dtype=jnp.float64)
                if key in ("pwl_t", "pwl_v"):
                    # (nk, P) shared, or (B, nk, P) per-lane: pad the lane
                    # axis (pad lanes never consumed — they start done)
                    if leaf.ndim == 3 and leaf.shape[0] != bp:
                        leaf = jnp.pad(
                            leaf, ((0, bp - leaf.shape[0]), (0, 0), (0, 0)))
                    out[key] = leaf
                elif leaf.ndim == 2 and leaf.shape[0] != bp:
                    out[key] = jnp.pad(leaf, ((0, bp - leaf.shape[0]), (0, 0)))
                else:
                    out[key] = leaf
            return out

        pv = pad_src(params["V"]) if nv_ else None
        pi = pad_src(params["I"]) if ni_ else None

        # ---- OP bias point (tran.go:57-75) through the general XLA engine,
        # rescue ladders included.  Runs BEFORE any state-derived tables:
        # physics non-UIC transients seed the committed state from the bias
        # solution (engine/tran.py:111-116), which the LM carry and the
        # state stack below must see. ----
        opr = None
        if need_op and not resume and not cfg.uic:
            opr, state0 = _op_bias(cc, op_fused_fn, op_execute, op_seed,
                                   physics, params, state0)

        # ---- magnetic-inductor / mutual-coupling values.  compat freezes
        # the J-A core state (PLAN.md 1), so everything except the
        # per-attempt /dt scaling and the t<dt L0 gate is loop-invariant;
        # physics carries the LIVE core + winding state through the attempt
        # loop (exact XLA f64, matching ops/assemble.py + make_commit) and
        # recomputes the branch/mutual values per attempt ----
        if nlm_:
            pml_lm = {k: _lanes(params["LM"][k], nlm_, bp)
                      for k in ("turns", "ms", "alpha", "a", "c", "k",
                                "area", "len", "tc", "beta")}

            def lmrow(key):
                leaf = state0.get("LM", {}).get(key)
                return (jnp.zeros((nlm_, bp), dtype=jnp.float64)
                        if leaf is None else _lanes(leaf, nlm_, bp))

            lm_l0 = jnp.broadcast_to(mag_model.l_zero(pml_lm), (nlm_, bp))
            if physics:
                lm0 = {key: lmrow(key)
                       for key in ("i0", "i1", "v0", "v1", "flux0",
                                   "H", "Hold", "M", "Mirr", "dMdH")}
                lm_core_id = np.asarray(cc.idx["LM"]["core_id"])
                lm_ncores = int(lm_core_id.max()) + 1
                lm_nodes_np = np.asarray(cc.idx["LM"]["nodes"])
                lm_branch_np = np.asarray(cc.idx["LM"]["branch"])
            else:
                lm_i0 = lmrow("i0")
                lm_i1 = lmrow("i1")
                core0 = mag_model.CoreState(
                    H=lmrow("H"), Hold=lmrow("Hold"), M=lmrow("M"),
                    Mirr=lmrow("Mirr"), dMdH=lmrow("dMdH"))
                lm_leff, _ = mag_model.l_effective(pml_lm, core0, lm_i0,
                                                   jnp.float64(temp))
                lm_leff = jnp.broadcast_to(lm_leff, (nlm_, bp))
        if nk_:
            kidx = cc.idx["K"]
            ka = np.asarray(kidx["kind_a"])
            ia = np.asarray(kidx["idx_a"])
            kb = np.asarray(kidx["kind_b"])
            ib = np.asarray(kidx["idx_b"])
            lval_lanes = _lanes(params["L"]["value"], nl_, bp) if nl_ else None
            kcoeff_lanes = _lanes(params["K"]["coeff"], nk_, bp)

            def pick_pairs(kinds, idxs, lin_tbl, mag_tbl):
                # static per-pair partner selection (compiler kind 0 = L)
                return jnp.stack([lin_tbl[i] if kk == 0 else mag_tbl[i]
                                  for kk, i in zip(kinds, idxs)])

            if not physics:
                lm_vm = (jnp.broadcast_to(
                    mag_model.value_for_mutual(pml_lm, core0, lm_i0,
                                               jnp.float64(temp)),
                    (nlm_, bp)) if nlm_ else None)
                la_k = pick_pairs(ka, ia, lval_lanes, lm_vm)
                lb_k = pick_pairs(kb, ib, lval_lanes, lm_vm)
                mij_k = kcoeff_lanes * jnp.sqrt(la_k * lb_k)
            else:
                # static pair metadata for the per-attempt physics values
                k_both_linear = (ka == 0) & (kb == 0)

        # ---- const stack (attempt-invariant, split to df once) ----
        const64 = _const_stack64(cc, params, state0, counts, bp, temp)
        const_hi, const_lo = _hi_lo(const64)

        # ---- junction-voltage warm start: the OP bias point (tran.go:57-75)
        # through the general XLA engine, rescue ladders included; a resumed
        # run carries the checkpointed linearization instead ----
        jv64 = _jv_stack64(
            counts,
            ((jv0 if resume else (None if cfg.uic else opr.jv))
             if nonlin else None), bp)
        jvh0, jvl0 = _hi_lo(jv64)
        kj = jvh0.shape[0]

        # ---- initial state stack ----
        st64 = _init_state_stack64(counts, physics, state0, bp)
        st_hi0, st_lo0 = _hi_lo(st64)
        ks = st_hi0.shape[0]

        zero = np.int32(0)

        def fold(x):
            """(rows, bp) -> (rows, 8, bp//8) sublane-dense lane tiles.  Any
            fixed lane bijection works (everything per-lane is elementwise);
            pack and unpack just have to agree."""
            return x.reshape(x.shape[0], 8, bp // 8)

        const_hi, const_lo = fold(const_hi), fold(const_lo)

        def vec(rows_):
            return pl.BlockSpec((rows_, 8, w), lambda i: (zero, zero, i),
                                memory_space=pltpu.VMEM)

        def vec2(rows_):
            # paired-limb outputs: (2, rows, 8, W), limb axis leading
            return pl.BlockSpec((2, rows_, 8, w),
                                lambda i: (zero, zero, zero, i),
                                memory_space=pltpu.VMEM)

        # TOYSPICE_TRAN_IMPL=kernel (default) runs the attempt as the Pallas
        # kernel; =xla compiles the identical _attempt_core math as plain
        # XLA ops — bit-identical per-op semantics (same f32 df transforms;
        # XLA's float rewrites and fma contraction are blocked by _pin(),
        # see ops/pallas_solve.py), used by the CPU parity tests where
        # Pallas interpret mode is ~1000x slower.
        impl = os.environ.get("TOYSPICE_TRAN_IMPL", "kernel")

        def attempt_xla(dyn64, st_hi, st_lo, jv_hi, jv_lo):
            dyn_hi, dyn_lo = _hi_lo(dyn64)
            xlte, stout, jvout = _attempt_core(
                n, counts, layout, cells, rhs_cells, cfgk, mode,
                const_hi, const_lo, fold(dyn_hi), fold(dyn_lo),
                st_hi, st_lo, jv_hi, jv_lo, cpu_build=True)
            return (xlte[0], xlte[1], stout[0], stout[1],
                    jvout[0], jvout[1])

        def attempt(dyn64, st_hi, st_lo, jv_hi, jv_lo):
            dyn_hi, dyn_lo = _hi_lo(dyn64)
            xlte, stout, jvout = pl.pallas_call(
                kernel,
                grid=(bp // blk,),
                in_specs=[vec(const_hi.shape[0])] * 2
                         + [vec(dyn_hi.shape[0])] * 2 + [vec(ks)] * 2
                         + [vec(kj)] * 2,
                out_specs=(vec2(n + 1 + extra), vec2(ks), vec2(kj)),
                out_shape=(
                    jax.ShapeDtypeStruct((2, n + 1 + extra, 8, bp // 8),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((2, ks, 8, bp // 8), jnp.float32),
                    jax.ShapeDtypeStruct((2, kj, 8, bp // 8), jnp.float32),
                ),
            )(const_hi, const_lo, fold(dyn_hi), fold(dyn_lo), st_hi, st_lo,
              jv_hi, jv_lo)
            return (xlte[0], xlte[1], stout[0], stout[1],
                    jvout[0], jvout[1])

        if impl == "xla":
            attempt = attempt_xla

        # pad lanes beyond b start done (their kernel output is never used)
        lane = jnp.arange(bp)
        pad = lane >= b
        f64 = jnp.float64
        if resume:
            if t0a.ndim == 0:
                t_init = jnp.full(bp, t0a, dtype=f64)
            else:
                t_init = jnp.pad(t0a, (0, bp - t0a.shape[0]))
        else:
            t_init = jnp.zeros(bp, dtype=f64)
        if dt0 is None:
            dt_init = jnp.full(bp, cfg.minstep, dtype=f64)
        else:
            # continue the EXACT adaptive-dt trajectory (streamed store)
            dt0a = jnp.asarray(dt0, dtype=f64)
            dt_init = (jnp.full(bp, dt0a, dtype=f64) if dt0a.ndim == 0
                       else jnp.pad(dt0a, (0, bp - dt0a.shape[0]),
                                    constant_values=cfg.minstep))
        if attempts0 is None:
            att_init = jnp.zeros(bp, dtype=jnp.int32)
        else:
            a0 = jnp.asarray(attempts0, dtype=jnp.int32)
            att_init = (jnp.full(bp, a0, dtype=jnp.int32) if a0.ndim == 0
                        else jnp.pad(a0, (0, bp - a0.shape[0])))
        carry0 = dict(
            t=t_init,
            dt=dt_init,
            done=pad | (t_init >= cfg.tstop) | jnp.full(bp, cfg.tstop <= 0.0),
            fail=jnp.zeros(bp, dtype=bool),
            st_hi=fold(st_hi0), st_lo=fold(st_lo0),
            jv_hi=fold(jvh0), jv_lo=fold(jvl0),
            accepted=jnp.zeros(bp, dtype=jnp.int32),
            attempts=att_init,
            nr_iters=jnp.zeros(bp, dtype=jnp.int32),
        )
        if nlm_ and physics:
            # live magnetic winding + J-A core state, exact f64 in the carry
            carry0["lm"] = lm0
        if store == "full":
            # One slot-indexed value buffer: rows [x_hi(n), x_lo(n),
            # t(3)] — t crosses as an EXACT triple-float split (24+24+4
            # mantissa bits covers any f64; an f64 bitcast would be bit-
            # cheaper but crashes the TPU compiler on the emulated-f64
            # backend).  Row `la` is a trash slot for overshoot.  The slot
            # counter advances only on attempts where SOME lane keeps a row
            # (rejected/pre-tstart attempts consume no slot), so consumed
            # slots track the max-over-lanes kept count plus lane skew —
            # the round-2 design indexed slots by raw attempt count and
            # needed 2*max_store+256 rows plus reject-churn overflow
            # exposure.
            la = int(os.environ.get("TOYSPICE_FUSED_STORE_ATTEMPTS",
                                    cfg.max_store + 64))
            la = min(la, cfg.max_attempts)
            carry0.update(
                it=jnp.int32(0),
                val_buf=jnp.zeros((la + 1, 2 * n + 3, bp), dtype=jnp.float32),
                keep_buf=jnp.zeros((la + 1, bp), dtype=bool),
                n_kept=jnp.zeros(bp, dtype=jnp.int32),
            )

        # The while cond is a cross-batch reduction whose value gates the next
        # dispatch — on TPU that serializes every iteration behind a scalar
        # round-trip (unroll=1 is pathological).  The body freezes finished
        # lanes via the `active` mask, so over-running is safe and the cond is
        # only checked every UNROLL attempts; beyond ~8 the returns vanish
        # (kernel compute dominates).
        unroll = int(os.environ.get("TOYSPICE_TRAN_UNROLL", "8"))

        def cond(c):
            live = (~c["done"]) & (c["attempts"] < cfg.max_attempts)
            if stream:
                # streamed store: lanes PAUSE (not fail) when their waveform
                # buffer is full; the caller drains it and re-enters with
                # (t_final, dt_final, state, jv) — same compiled program
                live = live & (c["n_kept"] < cfg.max_store)
            return jnp.any(live)

        def body(c):
            t, dt = c["t"], c["dt"]
            active = (~c["done"]) & (c["attempts"] < cfg.max_attempts)
            if stream:
                active = active & (c["n_kept"] < cfg.max_store)
            next_t = jnp.minimum(t + dt, cfg.tstop)
            dt_eff = jnp.where(t + dt > cfg.tstop, cfg.tstop - t, dt)

            # sources at the OLD time t (PLAN.md 2); trapezoidal physics
            # evaluates at the END of the interval for 2nd-order accuracy
            # with driven circuits (engine/tran.py:147).  Exact f64.
            t_src = next_t if trap else t
            drows = [dt_eff[None, :]]
            if nv_:
                drows.append(eval_sources_lanes(
                    cc.idx["V"]["stype"], pv, t_src, bp))
            if ni_:
                drows.append(eval_sources_lanes(
                    cc.idx["I"]["stype"], pi, t_src, bp))
            if nlm_ and not physics:
                # magnetic branch value: the |i0|<1e-9 guard always holds in
                # compat (i0 frozen at 0) but the t<dt gate and a nonzero
                # user-provided i0 are honored exactly (assemble.py LM tran)
                use_l0 = (t < dt_eff)[None, :] | (jnp.abs(lm_i0) < 1e-9)
                l_used = jnp.where(use_l0, lm_l0, lm_leff)
                lmterm = l_used / dt_eff
                drows.append(lmterm)
                drows.append(lmterm * lm_i1)
            elif nlm_:
                # physics: incremental inductance from the carried core
                # state (assemble.py LM physics branch), LM rows stay BE
                dmdh = jnp.clip(c["lm"]["dMdH"], -1e3, 1e3)
                l_used = jnp.maximum(1e-12, lm_l0 * (1.0 + dmdh))
                lmterm = l_used / dt_eff
                drows.append(lmterm)
                drows.append(lmterm * c["lm"]["i1"])
            if nk_:
                st64b = (c["st_hi"].astype(f64)
                         + c["st_lo"].astype(f64)).reshape(ks, bp)
                if not physics:
                    # mutual cross term M/dt (stamped with s=-1 in-kernel)
                    # and the reference's junk-i0 RHS memory
                    # (mutual.go:114-115): linear-L partners read the live
                    # in-kernel committed i0
                    l_i0_dyn = (st64b[layout["l_i0"]:layout["l_i0"] + nl_]
                                if nl_ else None)
                    i0a = pick_pairs(ka, ia, l_i0_dyn,
                                     lm_i0 if nlm_ else None)
                    i0b = pick_pairs(kb, ib, l_i0_dyn,
                                     lm_i0 if nlm_ else None)
                    drows.append(mij_k / dt_eff)
                    drows.append(-mij_k * i0b / dt_eff)
                    drows.append(-mij_k * i0a / dt_eff)
                else:
                    # physics mutual: per-attempt values from the live core
                    # (assemble.py _gather_inductance physics branch) with
                    # the consistent +M/dt·I1 memory; trap upgrades
                    # both-linear pairs to 2M/dt after their windings have
                    # history (assemble.py K trap block)
                    l_i1_dyn = (st64b[layout["l_i1"]:layout["l_i1"] + nl_]
                                if nl_ else None)
                    lmv_dyn = None
                    if nlm_:
                        dmdh_k = jnp.clip(c["lm"]["dMdH"], -1e3, 1e3)
                        lmv_dyn = jnp.maximum(
                            1e-12, lm_l0 * (1.0 + dmdh_k))
                    la_p = pick_pairs(ka, ia, lval_lanes, lmv_dyn)
                    lb_p = pick_pairs(kb, ib, lval_lanes, lmv_dyn)
                    mij = kcoeff_lanes * jnp.sqrt(la_p * lb_p)
                    i1a = pick_pairs(ka, ia, l_i1_dyn,
                                     c["lm"]["i1"] if nlm_ else None)
                    i1b = pick_pairs(kb, ib, l_i1_dyn,
                                     c["lm"]["i1"] if nlm_ else None)
                    if trap and nl_:
                        l_hist_dyn = st64b[
                            layout["l_hist"]:layout["l_hist"] + nl_]
                        nlc = max(1, nl_)
                        iac = np.minimum(ia, nlc - 1)
                        ibc = np.minimum(ib, nlc - 1)
                        started_k = ((l_hist_dyn[iac] > 0)
                                     & (l_hist_dyn[ibc] > 0))
                        use_tr = (jnp.asarray(k_both_linear)[:, None]
                                  & started_k)
                        mcoef = jnp.where(use_tr, 2.0 * mij / dt_eff,
                                          mij / dt_eff)
                    else:
                        mcoef = mij / dt_eff
                    drows.append(mcoef)
                    drows.append(mcoef * i1b)
                    drows.append(mcoef * i1a)
            if nonlin:
                # active-lane mask for the in-kernel Newton loop (inactive
                # lanes skip NR entirely instead of spinning to max_iter)
                drows.append(active.astype(f64)[None, :])
            dyn64 = jnp.concatenate(drows, axis=0)

            xlte_hi, xlte_lo, stout_hi, stout_lo, jvout_hi, jvout_lo = attempt(
                dyn64, c["st_hi"], c["st_lo"], c["jv_hi"], c["jv_lo"])
            xlte_hi = xlte_hi.reshape(n + 1 + extra, bp)  # unfold lane tiles
            xlte_lo = xlte_lo.reshape(n + 1 + extra, bp)

            lte = (xlte_hi[n].astype(f64) + xlte_lo[n].astype(f64))
            if nonlin:
                # NR convergence verdict and iteration count from the kernel
                nr_ok = xlte_hi[n + 2] > 0.5
                nr_it = xlte_hi[n + 1].astype(jnp.int32)
            else:
                nr_ok = jnp.all(jnp.isfinite(xlte_hi[:n])
                                & jnp.isfinite(xlte_lo[:n]), axis=0)
                nr_it = jnp.ones(bp, dtype=jnp.int32)

            can_halve = dt_eff > cfg.minstep
            nr_fail = ~nr_ok
            hard_fail = nr_fail & ~can_halve
            reject = (nr_fail & can_halve) | (nr_ok & (lte > trtol) & can_halve)
            accept = nr_ok & ~reject

            acc_act = accept & active
            acc3 = acc_act.reshape(8, bp // 8)[None]
            st_hi = jnp.where(acc3, stout_hi, c["st_hi"])
            st_lo = jnp.where(acc3, stout_lo, c["st_lo"])
            # junction voltages persist across rejects too (tran.py:184)
            act3 = active.reshape(8, bp // 8)[None]
            jv_hi = jnp.where(act3, jvout_hi, c["jv_hi"])
            jv_lo = jnp.where(act3, jvout_lo, c["jv_lo"])

            t_new = jnp.where(acc_act, next_t, t)
            grow = jnp.where(lte < trtol / 100.0, 2.0, 1.1)
            dt_grown = jnp.where(
                (next_t < cfg.tstop) & (dt_eff < cfg.tmax),
                jnp.minimum(dt_eff * grow, cfg.tmax),
                dt_eff,
            )
            dt_new = jnp.where(active,
                               jnp.where(accept, dt_grown, dt_eff / 2.0), dt)

            done = c["done"] | (active & ((accept & (next_t >= cfg.tstop))
                                          | hard_fail))
            out = dict(
                t=t_new, dt=dt_new, done=done,
                fail=c["fail"] | (hard_fail & active),
                st_hi=st_hi, st_lo=st_lo,
                jv_hi=jv_hi, jv_lo=jv_lo,
                accepted=c["accepted"] + acc_act.astype(jnp.int32),
                attempts=c["attempts"] + active.astype(jnp.int32),
                nr_iters=c["nr_iters"] + nr_it * active.astype(jnp.int32),
            )
            if nlm_ and physics:
                # live magnetic commit (engine/state.py make_commit LM
                # physics): windings on a shared core see the core's TOTAL
                # magnetomotive force, every J-A guard included
                xf = (xlte_hi[:n].astype(f64) + xlte_lo[:n].astype(f64))
                vd_lm = xf[lm_nodes_np[:, 0]] - xf[lm_nodes_np[:, 1]]
                i_new = -xf[lm_branch_np]
                mmf = jax.ops.segment_sum(
                    pml_lm["turns"] * i_new, lm_core_id,
                    num_segments=lm_ncores)[lm_core_id]
                h = jnp.clip(mmf / pml_lm["len"], -1e6, 1e6)
                core_st = mag_model.CoreState(
                    H=c["lm"]["H"], Hold=c["lm"]["Hold"], M=c["lm"]["M"],
                    Mirr=c["lm"]["Mirr"], dMdH=c["lm"]["dMdH"])
                _, _, core2 = mag_model.ja_calculate(pml_lm, core_st, h,
                                                     300.15)
                lm_new = dict(
                    i0=i_new, i1=c["lm"]["i0"], v0=vd_lm, v1=c["lm"]["v0"],
                    flux0=c["lm"]["flux0"] + vd_lm * dt_eff,
                    H=core2.H, Hold=core2.Hold, M=core2.M, Mirr=core2.Mirr,
                    dMdH=core2.dMdH)
                out["lm"] = {key: jnp.where(acc_act[None, :], v,
                                            c["lm"][key])
                             for key, v in lm_new.items()}
            if store == "full":
                keep = acc_act & (next_t >= cfg.tstart)
                slot = jnp.minimum(c["it"], la)  # la = trash row (overshoot)
                out["it"] = c["it"] + jnp.any(keep).astype(jnp.int32)
                # exact triple split: each residual subtraction is exact in
                # f64 and the final residual fits f32 (<= 4 mantissa bits)
                t_a = next_t.astype(jnp.float32)
                r1 = next_t - t_a.astype(f64)
                t_b = r1.astype(jnp.float32)
                t_c = (r1 - t_b.astype(f64)).astype(jnp.float32)
                update = jnp.concatenate(
                    [xlte_hi[:n], xlte_lo[:n],
                     t_a[None], t_b[None], t_c[None]], axis=0)
                out["val_buf"] = jax.lax.dynamic_update_slice(
                    c["val_buf"], update[None], (slot, zero, zero))
                out["keep_buf"] = jax.lax.dynamic_update_slice(
                    c["keep_buf"], keep[None], (slot, zero))
                out["n_kept"] = c["n_kept"] + keep.astype(jnp.int32)
            return out

        def unrolled_body(c):
            for _ in range(unroll):
                c = body(c)
            return c

        c = jax.lax.while_loop(cond, unrolled_body, carry0)

        # ---- unpack state stack -> f64 dict (batch-leading) ----
        st64f = (c["st_hi"].astype(f64)
                 + c["st_lo"].astype(f64)).reshape(ks, bp)[:, :b]
        jvf = ((c["jv_hi"].astype(f64)
                + c["jv_lo"].astype(f64)).reshape(kj, bp)[:, :b]
               if nonlin else None)
        state, jv_out = _unpack_state_jv(
            counts, layout, physics, st64f, jvf, state0,
            c["accepted"][:b], b, bp)
        if nlm_ and physics:
            # live state from the f64 carry
            state["LM"] = {k: jnp.transpose(v[:, :b], (1, 0))
                           for k, v in c["lm"].items()}

        if store == "full":
            # Compact kept attempt rows into accepted order.  Lane-leading
            # layout throughout: per-lane ops then walk the CONTIGUOUS la
            # axis.  The inverse map is built by ONE scatter (src[lane,
            # cnt-1] = attempt row; 0.5 s at la=60k, b=1024 on v5e, where a
            # vmapped searchsorted costs 12 s), followed by one gather per
            # buffer.  Rows never kept scatter to the k_store trash column.
            k_store = cfg.max_store
            w_rows = 8
            kp = c["keep_buf"][:la, :b]  # live lanes only; padding is junk
            cnt = jnp.cumsum(kp.astype(jnp.int32), axis=0)  # (la, b)
            stored = cnt[-1]
            kidx = jnp.arange(k_store, dtype=jnp.int32)[:, None]
            mask = kidx < stored[None, :]
            # Combine the f32 limb pairs into f64 rows FIRST (elementwise):
            # whatever row selection follows then moves half the elements.
            # The barriers pin stage boundaries — left alone, XLA fuses
            # convert + selection + mask + transpose into one mega-fusion
            # whose (b, k, n)-ordered emission strides the whole buffer
            # (measured 969 ms at la=30k, b=1024).
            vb = c["val_buf"][:la, :, :b]
            x64buf = vb[:, :n].astype(f64) + vb[:, n:2 * n].astype(f64)
            t64buf = (vb[:, 2 * n].astype(f64) + vb[:, 2 * n + 1].astype(f64)
                      + vb[:, 2 * n + 2].astype(f64))  # exact reconstruction
            buf64 = jnp.concatenate([x64buf, t64buf[:, None]], axis=1)
            need = k_store + w_rows  # shifted slices need this many rows
            if la < need:  # la overridden smaller via env: zero-pad rows
                buf64 = jnp.pad(buf64, ((0, need - la), (0, 0), (0, 0)))
                kpp = jnp.pad(kp, ((0, need - la), (0, 0)))
                cntp = jnp.pad(cnt, ((0, need - la), (0, 0)), mode="edge")
            else:
                kpp, cntp = kp, cnt
            buf64 = jax.lax.optimization_barrier(buf64)
            # Lanes keep in near-lockstep (the slot counter advances only on
            # keeps, and accept/reject patterns synchronize across a
            # Monte-Carlo batch: measured src == k exactly on 1024-way
            # rlc), so a lane's k-th kept row sits at slot k + skew with
            # tiny skew.  Find it with W shifted compares — row k+w is the
            # k-th keep of a lane iff it is kept and its cumulative count
            # is k+1 — all uniform slices + elementwise ops at copy speed.
            skew = jnp.zeros((k_store, b), dtype=jnp.int32)
            found = jnp.zeros((k_store, b), dtype=bool)
            for w in range(w_rows):
                hit = (kpp[w:w + k_store]
                       & (cntp[w:w + k_store] == kidx + 1))
                skew = jnp.where(hit, jnp.int32(w), skew)
                found = found | hit
            fast_ok = jnp.all(found | ~mask)

            def _shifted_select(buf):
                acc = jnp.zeros((k_store, n + 1, b), dtype=f64)
                for w in range(w_rows):
                    sel = (skew == w)[:, None, :]
                    acc = acc + jnp.where(sel, buf[w:w + k_store], 0.0)
                return acc

            def _row_gather(buf):
                # general path: a lane fell > W slots behind.  Build the
                # k -> slot map with one scatter (0.5 s where a vmapped
                # searchsorted costs 12 s at this size), then one row
                # gather (issue-bound at ~1 scalar load/cycle).
                lane_ix = jax.lax.broadcasted_iota(jnp.int32, (la, b), 1)
                row_ix = jax.lax.broadcasted_iota(jnp.int32, (la, b), 0)
                dest = jnp.where(kp, cnt - 1, k_store)
                src = jnp.zeros((k_store + 1, b), jnp.int32).at[
                    dest, lane_ix].set(row_ix, mode="drop")[:k_store]
                return jnp.take_along_axis(buf, src[:, None, :], axis=0)

            g = jax.lax.cond(fast_ok, _shifted_select, _row_gather, buf64)
            g = jax.lax.optimization_barrier(g)  # (k_store, n+1, b)
            x64 = jnp.where(mask[:, None, :], g[:, :n], 0.0)
            t64 = jnp.where(mask, g[:, n], 0.0)
            x64, t64 = jax.lax.optimization_barrier((x64, t64))
            out_x = jnp.transpose(x64, (2, 0, 1))
            out_t = jnp.transpose(t64, (1, 0))
            out_n = stored
            overflow = c["n_kept"][:b] != stored
        else:
            out_x = jnp.zeros((b, 1, n), dtype=f64)
            out_t = jnp.zeros((b, 1), dtype=f64)
            out_n = jnp.zeros(b, dtype=jnp.int32)
            overflow = jnp.zeros(b, dtype=bool)

        return TranOutput(
            out_x=out_x,
            out_t=out_t,
            out_n=out_n,
            fail=c["fail"][:b],
            accepted=c["accepted"][:b],
            attempts=c["attempts"][:b],
            nr_iters=c["nr_iters"][:b],
            t_final=c["t"][:b],
            state=state,
            jv=jv_out,
            store_overflow=overflow,
            dt_final=c["dt"][:b],
        )

    return tran_fused
