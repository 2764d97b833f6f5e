"""Whole-run fused transient Pallas kernel: the TIME LOOP itself in VMEM.

The attempt-loop engine (ops/pallas_tran.py make_tran_fused) runs one
kernel per attempt with the step control in XLA.  The round-4 attribution
(PARITY.md "Utilization attribution") measured what that costs: ~122 µs of
emulated-f64 source evaluation + ~110 µs of step-control glue + a ~24 µs
kernel launch PER ATTEMPT — ~1.3 ms/attempt on diode2 against 0.14 ms of
actual in-kernel Newton compute.  The reference pays none of this: its
whole loop runs in one process with zero per-step dispatch overhead
(tran.go:96-152).

This module is the TPU-first answer: ONE kernel launch per run.  The
entire tran.go:96-152 control flow — t/dt arithmetic, source waveform
evaluation (DC/SIN/PULSE/PWL), accept/reject, LTE-driven step growth and
halving, counters — runs as a ``lax.while_loop`` INSIDE the kernel, in
double-float, around the same per-attempt math the attempt-loop kernel
uses (``_attempt_core`` with in-kernel ``dyn_tables``).  Each grid block
loops until ITS lanes finish, so convergence-divergent Monte-Carlo lanes
decouple at block granularity instead of running global-lockstep.

Numerical class: double-float (~48-bit mantissa) for everything, now
including t/dt and the source waveforms (sin via ops/df_math.df_sin; the
attempt-loop engine computes those in exact f64 XLA).  The step-control
COMPARISONS (lte > trtol, dt > minstep, t+dt > tstop) are exact df
equivalents of the f64 forms for normalized pairs, so accepted/attempt
trajectories match the attempt-loop engine except when a value lands
within ~2^-48 relative of a decision threshold; the on-TPU A/B
(tests/tools/ab_fused_tran.py) asserts exact accepted/attempt-count parity
over the deck matrix.

Serves store='none' (the waveform buffer of store='full' exceeds scoped
VMEM) and BOTH semantics over the full fused device set.  Compat LM/K
decks fuse with frozen-core run constants (PLAN.md 1); physics magnetic
decks carry the LIVE Jiles-Atherton core in the in-kernel state stack —
the J-A update (magnetic.go:88-132, coth via df_exp) runs in df per
attempt and commits on accept, closing the last XLA-side state carry
(round-4 VERDICT missing #8).
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler import SRC_DC, SRC_SIN, SRC_PULSE, SRC_PWL
from .df_math import df_div, df_exp, df_floor, df_pow, df_sin, df_sqrt
from .pallas_solve import _df_add, _df_mul, _df_recip, _unpinned
from .pallas_tran import (_attempt_core, _build_plan, _const_stack64,
                          _df_abs, _df_const, _df_gt, _df_max, _df_neg,
                          _df_twice, _df_where, _hi_lo,
                          _init_state_stack64, _jv_stack64, _lanes,
                          _layout, _op_bias, _unpack_state_jv,
                          fused_ineligible_reason)


def run_ineligible_reason(cc, semantics: str, store: str, opts,
                          params=None):
    """Why this run can NOT use the whole-run kernel; None when it can."""
    why = fused_ineligible_reason(cc, semantics, store, opts, params)
    if why is not None:
        return why
    if store != "none":
        return (f"store={store!r} (whole-run kernel serves store='none'; "
                "waveform buffers exceed scoped VMEM)")
    return None


def run_eligible(cc, semantics: str, store: str, opts, params=None) -> bool:
    return run_ineligible_reason(cc, semantics, store, opts, params) is None


# ------------------------------------------------------- run-const stack


def _run_const64(cc, params, state0, counts, bp, temp, physics=False):
    """Run-invariant rows the whole-run kernel needs BEYOND the device
    const stack (_const_stack64): per-source waveform parameters (with
    omega/phase precombined in f64 exactly like models/sources.py), PWL
    knot tables flattened to (nS*P) rows, and the magnetic/mutual rows —
    compat: frozen J-A core values (PLAN.md 1 — L0/Leff/i0/i1 and the
    mutual M = k*sqrt(La*Lb) are run constants); physics: the J-A model
    parameters (the live core state rides the state stack and the J-A
    update runs IN-KERNEL per accepted step).

    Returns (rc64 (R, bp) f64, RL row-offset dict)."""
    from ..models import magnetic as mag_model

    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    f64 = jnp.float64
    RL = {}
    rows = []
    off = [0]

    def add(key, arr):
        arr = jnp.asarray(arr, dtype=f64)
        RL[key] = off[0]
        off[0] += arr.shape[0]
        rows.append(arr)

    def src_rows(kind, prefix, ns):
        p = params[kind]
        stype = np.asarray(cc.idx[kind]["stype"])
        kinds = set(int(v) for v in stype.tolist())
        add(prefix + "dc", _lanes(p["dc"], ns, bp))
        if SRC_SIN in kinds:
            freq = jnp.asarray(p["freq"], dtype=f64)
            # 2.0 * pi * freq and phase * pi / 180.0 in f64 with the same
            # association as eval_sources_lanes (models/sources.py)
            add(prefix + "omega", _lanes(2.0 * jnp.pi * freq, ns, bp))
            add(prefix + "ampl", _lanes(p["amplitude"], ns, bp))
            add(prefix + "phase",
                _lanes(jnp.asarray(p["phase"], dtype=f64) * jnp.pi / 180.0,
                       ns, bp))
        if SRC_PULSE in kinds:
            for key in ("v1", "v2", "delay", "rise", "fall", "width",
                        "period"):
                add(prefix + key, _lanes(p[key], ns, bp))
        if SRC_PWL in kinds:
            pt = jnp.asarray(p["pwl_t"], dtype=f64)
            pv_ = jnp.asarray(p["pwl_v"], dtype=f64)
            P = int(pt.shape[-1])
            RL[prefix + "pwlP"] = P  # static knot width, not a row

            def flat(tbl):
                if tbl.ndim == 2:  # (nS, P) shared
                    return _lanes(tbl.reshape(ns * P), ns * P, bp)
                # (B, nS, P) per-lane knot tables
                return _lanes(tbl.reshape(tbl.shape[0], ns * P), ns * P, bp)

            add(prefix + "pwlt", flat(pt))
            add(prefix + "pwlv", flat(pv_))

    if nv_:
        src_rows("V", "v_", nv_)
    if ni_:
        src_rows("I", "i_", ni_)

    if nlm_:
        pml_lm = {k: _lanes(params["LM"][k], nlm_, bp)
                  for k in ("turns", "ms", "alpha", "a", "c", "k",
                            "area", "len", "tc", "beta")}

        def lmrow(key):
            leaf = state0.get("LM", {}).get(key)
            return (jnp.zeros((nlm_, bp), dtype=f64)
                    if leaf is None else _lanes(leaf, nlm_, bp))

        add("lm_l0", jnp.broadcast_to(mag_model.l_zero(pml_lm), (nlm_, bp)))
        if physics:
            # J-A model parameter rows for the in-kernel core update
            # (magnetic.go:88-132 via models/magnetic.py ja_calculate)
            add("lm_turns", pml_lm["turns"])
            add("lm_len", pml_lm["len"])
            for key in ("ms", "alpha", "a", "c", "k", "tc", "beta"):
                add("lm_" + key, pml_lm[key])
        else:
            # compat frozen-core values (PLAN.md 1), exactly the
            # loop-invariant tables make_tran_fused computes
            lm_i0 = lmrow("i0")
            core0 = mag_model.CoreState(
                H=lmrow("H"), Hold=lmrow("Hold"), M=lmrow("M"),
                Mirr=lmrow("Mirr"), dMdH=lmrow("dMdH"))
            lm_leff, _ = mag_model.l_effective(pml_lm, core0, lm_i0,
                                               jnp.float64(temp))
            add("lm_leff", jnp.broadcast_to(lm_leff, (nlm_, bp)))
            add("lm_i0", lm_i0)
            add("lm_i1", lmrow("i1"))
    if nk_:
        kidx = cc.idx["K"]
        ka = np.asarray(kidx["kind_a"])
        ia = np.asarray(kidx["idx_a"])
        kb = np.asarray(kidx["kind_b"])
        ib = np.asarray(kidx["idx_b"])
        lval_lanes = _lanes(params["L"]["value"], nl_, bp) if nl_ else None
        kcoeff_lanes = _lanes(params["K"]["coeff"], nk_, bp)
        if physics:
            # per-attempt M = k*sqrt(La*Lb) is computed in-kernel from the
            # live core state; the coefficient (and linear partner L) are
            # the run constants
            add("k_coeff", kcoeff_lanes)
        else:
            lm_vm = (jnp.broadcast_to(
                mag_model.value_for_mutual(pml_lm, core0, lm_i0,
                                           jnp.float64(temp)),
                (nlm_, bp)) if nlm_ else None)

            def pick_pairs(kinds, idxs):
                return jnp.stack([lval_lanes[i] if kk == 0 else lm_vm[i]
                                  for kk, i in zip(kinds, idxs)])

            la_k = pick_pairs(ka, ia)
            lb_k = pick_pairs(kb, ib)
            add("k_mij", kcoeff_lanes * jnp.sqrt(la_k * lb_k))

    if not rows:
        return jnp.zeros((1, bp), dtype=f64), RL
    return jnp.concatenate(rows, axis=0), RL


# -------------------------------------------------------------- in-kernel


def _source_vals(stype, RL, rc, prefix, t, lanes):
    """Per-source waveform values at df time ``t`` — the in-kernel
    counterpart of models/sources.py eval_sources_lanes, with the waveform
    branch selected STATICALLY per source (stype is circuit metadata)."""
    f32 = jnp.float32
    zero = jnp.zeros(lanes, dtype=f32)
    one_df = (jnp.ones(lanes, dtype=f32), zero)
    out = []
    for k in range(len(stype)):
        s = int(stype[k])
        if s == SRC_SIN:
            dc = rc(RL[prefix + "dc"] + k)
            om = rc(RL[prefix + "omega"] + k)
            am = rc(RL[prefix + "ampl"] + k)
            ph = rc(RL[prefix + "phase"] + k)
            arg = _df_add(*_df_mul(*om, *t), *ph)
            out.append(_df_add(*dc, *_df_mul(*am, *df_sin(*arg))))
        elif s == SRC_PULSE:
            v1 = rc(RL[prefix + "v1"] + k)
            v2 = rc(RL[prefix + "v2"] + k)
            delay = rc(RL[prefix + "delay"] + k)
            rise = rc(RL[prefix + "rise"] + k)
            fall = rc(RL[prefix + "fall"] + k)
            width = rc(RL[prefix + "width"] + k)
            period = rc(RL[prefix + "period"] + k)
            tp = _df_add(*t, *_df_neg(delay))
            per_pos = period[0] > 0
            safe_per = _df_where(per_pos, period, one_df)
            # tp mod period = tp - floor(tp/per)*per (getPulseVoltage,
            # vsource.go:179-209 via jnp.mod in the XLA engine)
            nwrap = df_floor(*df_div(*tp, *safe_per))
            tpw = _df_add(*tp, *_df_neg(_df_mul(nwrap, zero, *safe_per)))
            tp = _df_where(per_pos, tpw, tp)
            rise0 = (rise[0] == 0) & (rise[1] == 0)
            fall0 = (fall[0] == 0) & (fall[1] == 0)
            rise_safe = _df_where(rise0, one_df, rise)
            fall_safe = _df_where(fall0, one_df, fall)
            fall_start = _df_add(*rise, *width)
            dv = _df_add(*v2, *_df_neg(v1))
            in_rise = _df_where(
                rise0, v2,
                _df_add(*v1, *df_div(*_df_mul(*dv, *tp), *rise_safe)))
            tmf = _df_add(*tp, *_df_neg(fall_start))
            in_fall = _df_where(
                fall0, v1,
                _df_add(*v2, *_df_neg(df_div(*_df_mul(*dv, *tmf),
                                             *fall_safe))))
            val = _df_where(
                _df_gt(rise, tp), in_rise,
                _df_where(_df_gt(fall_start, tp), v2,
                          _df_where(_df_gt(_df_add(*fall_start, *fall), tp),
                                    in_fall, v1)))
            out.append(_df_where(_df_gt(delay, t), v1, val))
        elif s == SRC_PWL:
            P = RL[prefix + "pwlP"]
            base_t = RL[prefix + "pwlt"] + k * P
            base_v = RL[prefix + "pwlv"] + k * P
            knt = [rc(base_t + p) for p in range(P)]
            knv = [rc(base_v + p) for p in range(P)]
            # segment index = #(knots < t), clipped to [1, P-1] — the
            # static-mask interpolation of models/sources.py _pwl_interp
            cnt = jnp.zeros(lanes, dtype=jnp.int32)
            for p in range(P):
                cnt = cnt + _df_gt(t, knt[p]).astype(jnp.int32)
            # int32 literals: x64 promotes Python ints to int64, which
            # Mosaic can't lower (CLAUDE.md invariant)
            idx = jnp.clip(cnt, jnp.int32(1), jnp.int32(P - 1))
            t1, t2 = knt[0], knt[1]
            w1, w2 = knv[0], knv[1]
            for p in range(2, P):
                sel = idx >= jnp.int32(p)
                t1 = _df_where(sel, knt[p - 1], t1)
                t2 = _df_where(sel, knt[p], t2)
                w1 = _df_where(sel, knv[p - 1], w1)
                w2 = _df_where(sel, knv[p], w2)
            eq = (t2[0] == t1[0]) & (t2[1] == t1[1])
            den = _df_where(eq, one_df, _df_add(*t2, *_df_neg(t1)))
            slope = df_div(*_df_add(*w2, *_df_neg(w1)), *den)
            val = _df_add(*w1, *_df_mul(*slope, *_df_add(*t, *_df_neg(t1))))
            out.append(_df_where(~_df_gt(t, knt[0]), knv[0], val))
        else:
            assert s == SRC_DC, f"unknown source type {s}"
            out.append(rc(RL[prefix + "dc"] + k))
    return out


def _run_core(n, counts, layout, cells, rhs_cells, cfgk, mode, runcfg,
              stype_v, stype_i, RL, kmeta, lm_phys,
              const_hi, const_lo, rc_hi, rc_lo, live_row,
              st_hi0, st_lo0, jv_hi0, jv_lo0, cpu_build=False):
    """The whole transient run as a pure array function over the df
    stacks; compiles as the Pallas kernel (``_run_kernel``) or as plain
    XLA for the CPU parity tests (cpu_build, TOYSPICE_TRAN_IMPL=xla).

    Control flow is a line-for-line counterpart of make_tran_fused's XLA
    body (itself engine/tran.py = tran.go:96-152), in df.  ``lm_phys``
    (physics magnetic decks) carries the static metadata for the LIVE
    in-kernel J-A core: the state-stack base of the 10 LM rows
    [i0 i1 v0 v1 flux0 H Hold M Mirr dMdH], winding nodes/branches and the
    core-sharing groups; the J-A update (magnetic.go:88-132) then runs in
    df per attempt and commits on accept.  Returns one (2, ks+kj+4,
    *lanes) stack: [state, jv, t, dt, (acc|att), (nri|fail)] with the
    counter rows packed hi/lo."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    tstop, minstep, tmax, trtol, max_attempts, trap = runcfg
    physics = mode != "compat"
    f32 = jnp.float32
    i32 = jnp.int32
    lanes = st_hi0.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)
    izero = jnp.zeros(lanes, dtype=i32)
    one_df = (jnp.ones(lanes, dtype=f32), zero)
    nonlin = bool(nd_ or nq_ or nm_)
    ks = st_hi0.shape[0]
    kj = jv_hi0.shape[0]
    extra = 2 if nonlin else 0

    def rc(r):
        return (rc_hi[r, :], rc_lo[r, :])

    def constf(r):
        return (const_hi[r, :], const_lo[r, :])

    live = live_row[0] > f32(0.5)
    tstop_c = _df_const(tstop, lanes)
    minstep_c = _df_const(minstep, lanes)
    tmax_c = _df_const(tmax, lanes)
    trtol_c = _df_const(trtol, lanes)
    trtol100_c = _df_const(trtol / 100.0, lanes)
    c11 = _df_const(1.1, lanes)
    c1en9 = _df_const(1e-9, lanes)
    max_att = i32(max_attempts)

    def _df_clip(p, lo, hi):
        lo_c = _df_const(lo, lanes)
        hi_c = _df_const(hi, lanes)
        return _df_where(_df_gt(lo_c, p), lo_c,
                         _df_where(_df_gt(p, hi_c), hi_c, p))

    def _df_coth(p):
        # coth(x) = (e^{2x}+1)/(e^{2x}-1); df_exp clamps its 2^k scale so
        # large |x| saturates to ±1 instead of overflowing
        e = df_exp(*_df_twice(p))
        return df_div(*_df_add(*e, *one_df), *_df_add(*e, *_df_neg(one_df)))

    # LM physics constants (attempt-invariant)
    if lm_phys is not None:
        lm_base = lm_phys["base"]
        lm_nodes = lm_phys["nodes"]
        lm_branch = lm_phys["branch"]
        lm_core_id = lm_phys["core_id"]
        temp_ja = _df_const(300.15, lanes)  # ja commit temp (tran loop)
        c_3 = _df_const(3.0, lanes)
        c1em12 = _df_const(1e-12, lanes)
        c1em6 = _df_const(1e-6, lanes)

    def body(c):
        (t_hi, t_lo, dt_hi, dt_lo, done, fail, acc, att, nri,
         st_hi, st_lo, jv_hi, jv_lo) = c
        t = (t_hi, t_lo)
        dt = (dt_hi, dt_lo)
        active = (done == 0) & (att < max_att)

        tpdt = _df_add(*t, *dt)
        over = _df_gt(tpdt, tstop_c)
        next_t = _df_where(over, tstop_c, tpdt)
        dt_eff = _df_where(over, _df_add(*tstop_c, *_df_neg(t)), dt)
        dtinv = _df_recip(*dt_eff)

        # sources at the OLD time t (PLAN.md 2); trapezoidal physics
        # evaluates at the END of the interval (engine/tran.py:147)
        t_src = next_t if trap else t
        vsrc = _source_vals(stype_v, RL, rc, "v_", t_src, lanes)
        isrc = _source_vals(stype_i, RL, rc, "i_", t_src, lanes)

        def st(r):
            return (st_hi[r, :], st_lo[r, :])

        def lm_st(row, k):
            # physics LM state rows: [i0 i1 v0 v1 flux0 H Hold M Mirr dMdH]
            return st(lm_base + row * nlm_ + k)

        def lm_lused_phys(k):
            # incremental inductance from the carried core state
            # (assemble.py LM physics branch)
            dmdh = _df_clip(lm_st(9, k), -1e3, 1e3)
            lraw = _df_mul(*rc(RL["lm_l0"] + k),
                           *_df_add(*one_df, *dmdh))
            return _df_max(c1em12, lraw)

        lmterm, lmrhs = [], []
        for k in range(nlm_):
            if lm_phys is not None:
                # physics: live incremental inductance, LM rows stay BE
                l_used = lm_lused_phys(k)
                i1 = lm_st(1, k)
            else:
                # compat magnetic branch value (assemble.py LM tran): the
                # t<dt gate and the |i0|<1e-9 guard, both honored exactly
                i0 = rc(RL["lm_i0"] + k)
                use_l0 = _df_gt(dt_eff, t) | _df_gt(c1en9, _df_abs(i0))
                l_used = _df_where(use_l0, rc(RL["lm_l0"] + k),
                                   rc(RL["lm_leff"] + k))
                i1 = rc(RL["lm_i1"] + k)
            lt = _df_mul(*l_used, *dtinv)
            lmterm.append(lt)
            lmrhs.append(_df_mul(*lt, *i1))
        kterm, krhsa, krhsb = [], [], []
        if nk_ and not physics:
            ka, ia, kb, ib = kmeta

            def partner_i0(kind, idx):
                # linear-L partners read the LIVE in-kernel committed i0
                # (mutual.go:114-115 junk-i0 memory); magnetic partners the
                # compat-frozen core i0
                if kind == 0:
                    return st(layout["l_i0"] + idx)
                return rc(RL["lm_i0"] + idx)

            for k in range(nk_):
                mij = rc(RL["k_mij"] + k)
                i0a = partner_i0(int(ka[k]), int(ia[k]))
                i0b = partner_i0(int(kb[k]), int(ib[k]))
                kterm.append(_df_mul(*mij, *dtinv))
                krhsa.append(_df_neg(_df_mul(*_df_mul(*mij, *i0b), *dtinv)))
                krhsb.append(_df_neg(_df_mul(*_df_mul(*mij, *i0a), *dtinv)))
        elif nk_:
            # physics mutual: per-attempt M = k*sqrt(La*Lb) from the live
            # core, consistent +M/dt*I1 memory; trap upgrades both-linear
            # pairs to 2M/dt after their windings have history
            # (assemble.py K physics/trap blocks)
            ka, ia, kb, ib = kmeta
            both_lin = lm_phys["both_linear"] if lm_phys is not None else \
                tuple(True for _ in range(nk_))

            def partner_lv(kind, idx):
                if kind == 0:
                    return constf(layout["lval"] + idx)
                return lm_lused_phys(idx)

            def partner_i1(kind, idx):
                if kind == 0:
                    return st(layout["l_i1"] + idx)
                return lm_st(1, idx)

            for k in range(nk_):
                la_p = partner_lv(int(ka[k]), int(ia[k]))
                lb_p = partner_lv(int(kb[k]), int(ib[k]))
                mij = _df_mul(*rc(RL["k_coeff"] + k),
                              *df_sqrt(*_df_mul(*la_p, *lb_p)))
                i1a = partner_i1(int(ka[k]), int(ia[k]))
                i1b = partner_i1(int(kb[k]), int(ib[k]))
                mcoef = _df_mul(*mij, *dtinv)
                if trap and nl_ and both_lin[k]:
                    ha = st(layout["l_hist"] + int(ia[k]))
                    hb = st(layout["l_hist"] + int(ib[k]))
                    started_k = (ha[0] > 0) & (hb[0] > 0)
                    mcoef = _df_where(started_k, _df_twice(mcoef), mcoef)
                kterm.append(mcoef)
                krhsa.append(_df_mul(*mcoef, *i1b))
                krhsb.append(_df_mul(*mcoef, *i1a))

        tables = dict(dt=dt_eff, act=active, vsrc=vsrc, isrc=isrc,
                      lmterm=lmterm, lmrhs=lmrhs, kterm=kterm,
                      krhsa=krhsa, krhsb=krhsb)
        xlte, stout, jvout = _attempt_core(
            n, counts, layout, cells, rhs_cells, cfgk, mode,
            const_hi, const_lo, None, None, st_hi, st_lo, jv_hi, jv_lo,
            cpu_build=cpu_build, dyn_tables=tables)

        if lm_phys is not None:
            # live magnetic commit candidates (engine/state.py make_commit
            # LM physics, the XLA-carry block of make_tran_fused): windings
            # on a shared core see the core's TOTAL magnetomotive force,
            # every J-A guard (magnetic.go:88-132) included — all in df.
            def xr(r):
                return (xlte[0, r], xlte[1, r])

            i_new = [_df_neg(xr(lm_branch[k])) for k in range(nlm_)]
            vd_lm = [_df_add(*xr(lm_nodes[k][0]),
                             *_df_neg(xr(lm_nodes[k][1])))
                     for k in range(nlm_)]
            lm_new_rows = []  # [i0 i1 v0 v1 flux0 H Hold M Mirr dMdH]
            ja_out = []
            for k in range(nlm_):
                # mmf = segment_sum(turns*i, core_id)[core_id] as static
                # adds over the winding's core group
                mmf = None
                for j in range(nlm_):
                    if lm_core_id[j] != lm_core_id[k]:
                        continue
                    term = _df_mul(*rc(RL["lm_turns"] + j), *i_new[j])
                    mmf = term if mmf is None else _df_add(*mmf, *term)
                h = _df_clip(df_div(*mmf, *rc(RL["lm_len"] + k)),
                             -1e6, 1e6)
                hold = lm_st(6, k)
                m_old = lm_st(7, k)
                mirr_old = lm_st(8, k)
                dh = _df_add(*h, *_df_neg(hold))
                small = _df_gt(c1em12, _df_abs(dh))
                neg_dh = dh[0] < 0
                tc = rc(RL["lm_tc"] + k)
                tc_pos = tc[0] > 0
                base = df_div(*_df_add(*tc, *_df_neg(temp_ja)), *tc)
                pw = df_pow(*_df_max(base, (zero + f32(1e-30), zero)),
                            *rc(RL["lm_beta"] + k))
                mst = _df_mul(*rc(RL["lm_ms"] + k),
                              *_df_where(tc_pos, pw, one_df))
                alpha = rc(RL["lm_alpha"] + k)
                a_p = rc(RL["lm_a"] + k)
                he = _df_add(*h, *_df_mul(*alpha, *m_old))
                he_small = _df_gt(c1em6, _df_abs(he))
                he_safe = _df_where(he_small, one_df, he)
                man_lin = _df_mul(*mst, *df_div(*he, *_df_mul(*c_3, *a_p)))
                # Langevin coth(x) - 1/x, the STABLE split of
                # models/magnetic.py ja_calculate mirrored term for term:
                # Bernoulli series below |x| < 0.25, direct difference
                # above (where the cancellation amplification is bounded)
                xq = df_div(*he_safe, *a_p)
                x2q = _df_mul(*xq, *xq)
                ser = _df_const(-1382.0 / 638512875.0, lanes)
                for coef in (2.0 / 93555.0, -1.0 / 4725.0, 2.0 / 945.0,
                             -1.0 / 45.0, 1.0 / 3.0):
                    ser = _df_add(*_df_mul(*ser, *x2q),
                                  *_df_const(coef, lanes))
                ser = _df_mul(*ser, *xq)
                direct = _df_add(*_df_coth(xq),
                                 *_df_neg(_df_recip(*xq)))
                lang = _df_where(_df_gt(_df_const(0.25, lanes),
                                        _df_abs(xq)), ser, direct)
                man = _df_where(he_small, man_lin,
                                _df_mul(*mst, *lang))
                kd = rc(RL["lm_k"] + k)
                k_delta = _df_where(neg_dh, _df_neg(kd), kd)
                mmr = _df_add(*man, *_df_neg(mirr_old))
                denom = _df_add(*k_delta, *_df_neg(_df_mul(*alpha, *mmr)))
                den_small = _df_gt(c1em12, _df_abs(denom))
                den_sign = _df_where(denom[0] < 0, _df_neg(c1em12),
                                     c1em12)
                denom = _df_where(den_small, den_sign, denom)
                dmirr_dh = df_div(*mmr, *denom)
                mirr_new = _df_add(*mirr_old, *_df_mul(*dmirr_dh, *dh))
                m_new = _df_add(
                    *mirr_new,
                    *_df_mul(*rc(RL["lm_c"] + k),
                             *_df_add(*man, *_df_neg(mirr_new))))
                dh_safe = _df_where(small, one_df, dh)
                dmdh_new = df_div(*_df_add(*m_new, *_df_neg(m_old)),
                                  *dh_safe)
                ja_out.append(dict(
                    H=_df_where(small, lm_st(5, k), h),
                    Hold=_df_where(small, hold, h),
                    M=_df_where(small, m_old, m_new),
                    Mirr=_df_where(small, mirr_old, mirr_new),
                    dMdH=_df_where(small, lm_st(9, k), dmdh_new)))
            flux = [_df_add(*lm_st(4, k),
                            *_df_mul(*vd_lm[k], *dt_eff))
                    for k in range(nlm_)]
            for row_vals in (
                    i_new,                                  # i0
                    [lm_st(0, k) for k in range(nlm_)],     # i1 <- old i0
                    vd_lm,                                  # v0
                    [lm_st(2, k) for k in range(nlm_)],     # v1 <- old v0
                    flux,                                   # flux0
                    [ja_out[k]["H"] for k in range(nlm_)],
                    [ja_out[k]["Hold"] for k in range(nlm_)],
                    [ja_out[k]["M"] for k in range(nlm_)],
                    [ja_out[k]["Mirr"] for k in range(nlm_)],
                    [ja_out[k]["dMdH"] for k in range(nlm_)]):
                lm_new_rows.extend(row_vals)
            lm_hi = jnp.stack([p[0] for p in lm_new_rows])
            lm_lo = jnp.stack([p[1] for p in lm_new_rows])
            stout = jnp.stack([
                jnp.concatenate([stout[0, :lm_base], lm_hi], axis=0),
                jnp.concatenate([stout[1, :lm_base], lm_lo], axis=0)])

        lte = (xlte[0, n], xlte[1, n])
        if nonlin:
            nr_ok = xlte[0, n + 2] > f32(0.5)
            nr_it = xlte[0, n + 1].astype(i32)
        else:
            fin = None
            for r in range(n):
                f = jnp.isfinite(xlte[0, r]) & jnp.isfinite(xlte[1, r])
                fin = f if fin is None else (fin & f)
            nr_ok = fin
            nr_it = jnp.ones(lanes, dtype=i32)

        can_halve = _df_gt(dt_eff, minstep_c)
        nr_fail = ~nr_ok
        hard_fail = nr_fail & ~can_halve
        reject = ((nr_fail & can_halve)
                  | (nr_ok & _df_gt(lte, trtol_c) & can_halve))
        accept = nr_ok & ~reject
        acc_act = accept & active

        st_hi_n = jnp.where(acc_act[None], stout[0], st_hi)
        st_lo_n = jnp.where(acc_act[None], stout[1], st_lo)
        # junction voltages persist across rejects too (tran.py:184)
        jv_hi_n = jnp.where(active[None], jvout[0], jv_hi)
        jv_lo_n = jnp.where(active[None], jvout[1], jv_lo)

        t_new = _df_where(acc_act, next_t, t)
        grow2 = _df_gt(trtol100_c, lte)  # lte < trtol/100 -> x2 else x1.1
        dt_g = _df_where(grow2, _df_twice(dt_eff), _df_mul(*dt_eff, *c11))
        dt_g = _df_where(_df_gt(dt_g, tmax_c), tmax_c, dt_g)
        grow_ok = _df_gt(tstop_c, next_t) & _df_gt(tmax_c, dt_eff)
        dt_grown = _df_where(grow_ok, dt_g, dt_eff)
        dt_half = (dt_eff[0] * f32(0.5), dt_eff[1] * f32(0.5))
        dt_sel = _df_where(accept, dt_grown, dt_half)
        dt_new = _df_where(active, dt_sel, dt)

        at_end = accept & ~_df_gt(tstop_c, next_t)  # next_t >= tstop
        done_n = done | (active & (at_end | hard_fail)).astype(i32)
        fail_n = fail | (hard_fail & active).astype(i32)
        return (t_new[0], t_new[1], dt_new[0], dt_new[1], done_n, fail_n,
                acc + acc_act.astype(i32), att + active.astype(i32),
                nri + nr_it * active.astype(i32),
                st_hi_n, st_lo_n, jv_hi_n, jv_lo_n)

    def cond(c):
        done, att = c[4], c[7]
        pending = ((done == 0) & (att < max_att)).astype(i32)
        return jnp.max(pending) > 0

    done0 = (~live).astype(i32)
    if tstop <= 0.0:
        done0 = jnp.ones(lanes, dtype=i32)
    dt0 = _df_const(minstep, lanes)
    init = (zero, zero, dt0[0], dt0[1], done0, izero, izero, izero, izero,
            st_hi0, st_lo0, jv_hi0, jv_lo0)
    (t_hi, t_lo, dt_hi, dt_lo, done, fail, acc, att, nri,
     st_hi, st_lo, jv_hi, jv_lo) = jax.lax.while_loop(cond, body, init)

    hi = jnp.concatenate(
        [st_hi, jv_hi, t_hi[None], dt_hi[None],
         acc.astype(f32)[None], nri.astype(f32)[None]], axis=0)
    lo = jnp.concatenate(
        [st_lo, jv_lo, t_lo[None], dt_lo[None],
         att.astype(f32)[None], fail.astype(f32)[None]], axis=0)
    return jnp.stack([hi, lo])


@_unpinned
def _run_kernel(n, counts, layout, cells, rhs_cells, cfgk, mode, runcfg,
                stype_v, stype_i, RL, kmeta, lm_phys, dus_build,
                const_hi_ref, const_lo_ref, rc_ref, live_ref,
                st0_ref, jv0_ref, out_ref):
    out_ref[...] = _run_core(
        n, counts, layout, cells, rhs_cells, cfgk, mode, runcfg,
        stype_v, stype_i, RL, kmeta, lm_phys,
        const_hi_ref[...], const_lo_ref[...], rc_ref[0], rc_ref[1],
        live_ref[...], st0_ref[0], st0_ref[1], jv0_ref[0], jv0_ref[1],
        cpu_build=dus_build)


# ----------------------------------------------------------------- wrapper


def make_tran_run(cc, cfg, opts, block: int | None = None,
                  semantics: str = "compat"):
    """Batched whole-run fused transient for eligible circuits:
    fn(params, state0) -> TranOutput (store='none' fields).  Semantics:
    exactly make_tran_fused(store='none') — same OP warm-up, same state
    and jv handling — with the attempt loop inside the kernel."""
    from ..engine.op import make_op
    from ..engine.state import make_op_seed
    from ..engine.tran import TranOutput
    from .pallas_op import _block_geometry, _infer_batch
    from .pallas_op import make_op_fused, op_fused_eligible

    physics = semantics == "physics"
    trap = physics and opts.integration == "trap"
    why = run_ineligible_reason(cc, semantics, "none", opts)
    if why is not None:
        raise ValueError(f"circuit not eligible for the whole-run kernel: "
                         f"{why}")
    mode = "phys_trap" if trap else ("phys_be" if physics else "compat")
    counts, layout, n_const, n_state = _layout(cc, physics=physics)
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    nonlin = bool(nd_ or nq_ or nm_)
    n = cc.np1
    cells, rhs_cells = _build_plan(cc)
    cells = {k: tuple(v) for k, v in cells.items()}
    rhs_cells = {k: tuple(v) for k, v in rhs_cells.items()}
    cfgk = (opts.reltol, opts.abstol, opts.max_iter)
    runcfg = (float(cfg.tstop), float(cfg.minstep), float(cfg.tmax),
              float(opts.trtol), int(cfg.max_attempts), bool(trap))
    stype_v = (tuple(int(v) for v in np.asarray(cc.idx["V"]["stype"]))
               if nv_ else ())
    stype_i = (tuple(int(v) for v in np.asarray(cc.idx["I"]["stype"]))
               if ni_ else ())
    if nk_:
        kidx = cc.idx["K"]
        kmeta = tuple(tuple(int(v) for v in np.asarray(kidx[key]))
                      for key in ("kind_a", "idx_a", "kind_b", "idx_b"))
    else:
        kmeta = ((), (), (), ())
    lm_phys_meta = None
    if physics and nlm_:
        # static metadata for the in-kernel live J-A core: the 10 LM state
        # rows sit AFTER the standard physics state stack (which is a
        # 1-row dummy when the deck has no other stateful devices)
        lm_base = n_state if n_state > 0 else 1
        lm_phys_meta = {
            "base": int(lm_base),
            "nodes": tuple(tuple(map(int, r))
                           for r in np.asarray(cc.idx["LM"]["nodes"])),
            "branch": tuple(int(v)
                            for v in np.asarray(cc.idx["LM"]["branch"])),
            "core_id": tuple(int(v)
                             for v in np.asarray(cc.idx["LM"]["core_id"])),
            "both_linear": tuple(bool(a == 0 and b == 0)
                                 for a, b in zip(kmeta[0], kmeta[2])),
        }
    need_op = nonlin or (physics and not cfg.uic)
    op_fused_fn = None
    if need_op and not cfg.uic:
        if (op_fused_eligible(cc, semantics, opts)
                and os.environ.get("TOYSPICE_OP", "auto") != "general"):
            op_fused_fn = make_op_fused(cc, opts, semantics=semantics)
    op_execute = (make_op(cc, opts, semantics=semantics)[0]
                  if need_op and op_fused_fn is None else None)
    op_seed = make_op_seed(cc, opts.temp) if physics else None
    if block is None:
        if nd_ and not (nq_ or nm_):
            block = int(os.environ.get("TOYSPICE_BLOCK_NL", "8192"))
        else:
            block = int(os.environ.get("TOYSPICE_BLOCK", "1024"))
    temp = opts.temp
    f64 = jnp.float64

    def tran_run(params, state0):
        b = _infer_batch(params, state0)
        blk, bp, w = _block_geometry(b, block)

        opr = None
        if need_op and not cfg.uic:
            opr, state0 = _op_bias(cc, op_fused_fn, op_execute, op_seed,
                                   physics, params, state0)

        const64 = _const_stack64(cc, params, state0, counts, bp, temp)
        const_hi, const_lo = _hi_lo(const64)
        rc64, RL = _run_const64(cc, params, state0, counts, bp, temp,
                                physics=physics)
        rc_hi, rc_lo = _hi_lo(rc64)
        jv64 = _jv_stack64(
            counts, (None if cfg.uic else opr.jv) if nonlin else None, bp)
        jvh0, jvl0 = _hi_lo(jv64)
        kj = jvh0.shape[0]
        st64 = _init_state_stack64(counts, physics, state0, bp)
        if lm_phys_meta is not None:
            # append the live J-A winding+core rows (the attempt-loop
            # engine carries these in its XLA loop; here they ride the
            # in-kernel state stack)
            def lmrow0(key):
                leaf = state0.get("LM", {}).get(key)
                return (jnp.zeros((nlm_, bp), dtype=f64) if leaf is None
                        else _lanes(leaf, nlm_, bp))

            st64 = jnp.concatenate(
                [st64] + [lmrow0(key) for key in
                          ("i0", "i1", "v0", "v1", "flux0",
                           "H", "Hold", "M", "Mirr", "dMdH")], axis=0)
        st_hi0, st_lo0 = _hi_lo(st64)
        ks = st_hi0.shape[0]

        lane = jnp.arange(bp)
        live64 = (lane < b).astype(f64)[None, :]
        live_hi, _ = _hi_lo(live64)

        def fold(x):
            return x.reshape(x.shape[0], 8, bp // 8)

        zero = np.int32(0)

        def vec(rows_):
            return pl.BlockSpec((rows_, 8, w), lambda i: (zero, zero, i),
                                memory_space=pltpu.VMEM)

        def vec2(rows_):
            return pl.BlockSpec((2, rows_, 8, w),
                                lambda i: (zero, zero, zero, i),
                                memory_space=pltpu.VMEM)

        kernel = functools.partial(
            _run_kernel, n, counts, layout, cells, rhs_cells, cfgk, mode,
            runcfg, stype_v, stype_i, RL, kmeta, lm_phys_meta,
            os.environ.get("TOYSPICE_TRAN_KERNEL_BUILD") == "dus")
        rows_out = ks + kj + 4
        impl = os.environ.get("TOYSPICE_TRAN_IMPL", "kernel")
        args = (fold(const_hi), fold(const_lo),
                jnp.stack([fold(rc_hi), fold(rc_lo)]), fold(live_hi),
                jnp.stack([fold(st_hi0), fold(st_lo0)]),
                jnp.stack([fold(jvh0), fold(jvl0)]))
        if impl == "xla":
            out = _run_core(
                n, counts, layout, cells, rhs_cells, cfgk, mode, runcfg,
                stype_v, stype_i, RL, kmeta, lm_phys_meta,
                args[0], args[1], args[2][0], args[2][1], args[3],
                args[4][0], args[4][1], args[5][0], args[5][1],
                cpu_build=True)
        else:
            out = pl.pallas_call(
                kernel,
                grid=(bp // blk,),
                in_specs=[vec(const_hi.shape[0])] * 2
                         + [vec2(rc_hi.shape[0]), vec(1), vec2(ks),
                            vec2(kj)],
                out_specs=vec2(rows_out),
                out_shape=jax.ShapeDtypeStruct((2, rows_out, 8, bp // 8),
                                               jnp.float32),
            )(*args)

        o_hi = out[0].reshape(rows_out, bp)
        o_lo = out[1].reshape(rows_out, bp)
        st64f = (o_hi[:ks].astype(f64) + o_lo[:ks].astype(f64))[:, :b]
        jvf = ((o_hi[ks:ks + kj].astype(f64)
                + o_lo[ks:ks + kj].astype(f64))[:, :b]
               if nonlin else None)
        t_final = (o_hi[ks + kj].astype(f64)
                   + o_lo[ks + kj].astype(f64))[:b]
        dt_final = (o_hi[ks + kj + 1].astype(f64)
                    + o_lo[ks + kj + 1].astype(f64))[:b]
        accepted = o_hi[ks + kj + 2].astype(jnp.int32)[:b]
        attempts = o_lo[ks + kj + 2].astype(jnp.int32)[:b]
        nr_iters = o_hi[ks + kj + 3].astype(jnp.int32)[:b]
        fail = o_lo[ks + kj + 3][:b] > 0.5

        state, jv_out = _unpack_state_jv(
            counts, layout, physics, st64f, jvf, state0, accepted, b, bp)
        if lm_phys_meta is not None:
            off = lm_phys_meta["base"]
            state["LM"] = {
                key: jnp.transpose(
                    st64f[off + i * nlm_: off + (i + 1) * nlm_], (1, 0))
                for i, key in enumerate(
                    ("i0", "i1", "v0", "v1", "flux0",
                     "H", "Hold", "M", "Mirr", "dMdH"))}

        return TranOutput(
            out_x=jnp.zeros((b, 1, n), dtype=f64),
            out_t=jnp.zeros((b, 1), dtype=f64),
            out_n=jnp.zeros(b, dtype=jnp.int32),
            fail=fail,
            accepted=accepted,
            attempts=attempts,
            nr_iters=nr_iters,
            t_final=t_final,
            state=state,
            jv=jv_out,
            store_overflow=jnp.zeros(b, dtype=bool),
            dt_final=dt_final,
        )

    return tran_run
