"""Fused transient-attempt Pallas kernel for LINEAR compat/BE circuits.

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
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solve import _df_add, _df_mul, _df_recip, _gj_eliminate
from ..consts import TEMP_DEFAULT

FUSED_KINDS = {"R", "C", "L", "V", "I"}


def fused_eligible(cc, semantics: str, store: str, opts, params=None) -> bool:
    """The fused path covers: linear device subset, compat semantics,
    backward Euler, store='none', default solver knobs that affect the
    in-kernel math only through f64 scalars (temp is supported)."""
    if semantics != "compat" or store != "none":
        return False
    if opts.integration != "be":
        return False
    if not set(cc.idx.keys()) <= FUSED_KINDS:
        return False
    if params is not None:
        # batched PWL knot tables are not supported by the lane evaluator
        for kind in ("V", "I"):
            if kind in params:
                for key in ("pwl_t", "pwl_v"):
                    leaf = params[kind].get(key)
                    if leaf is not None and jnp.asarray(leaf).ndim > 2:
                        return False
    return True


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
    return cells, rhs


# ------------------------------------------------------------------ kernel


def _df_neg(p):
    return (-p[0], -p[1])


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


def _fused_kernel(n, counts, layout, cells, rhs_cells,
                  const_hi_ref, const_lo_ref, dyn_hi_ref, dyn_lo_ref,
                  st_hi_ref, st_lo_ref,
                  xlte_ref, stout_ref):
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
    nr_, nc_, nl_, nv_, ni_ = counts
    f32 = jnp.float32
    lanes = dyn_hi_ref.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)

    def const(r):
        return (const_hi_ref[r, :], const_lo_ref[r, :])

    def dyn(r):
        return (dyn_hi_ref[r, :], dyn_lo_ref[r, :])

    def st(r):
        return (st_hi_ref[r, :], st_lo_ref[r, :])

    L = layout  # row-offset dict
    dt = dyn(0)
    dtinv = _df_recip(*dt)

    g = [const(L["g"] + k) for k in range(nr_)]
    geq = [_df_mul(*const(L["cadj"] + k), *dtinv) for k in range(nc_)]
    ceq = [_df_mul(*st(L["c_q1"] + k), *dtinv) for k in range(nc_)]
    lterm = [_df_mul(*const(L["lval"] + k), *dtinv) for k in range(nl_)]
    lrhs = [_df_mul(*lterm[k], *st(L["l_i1"] + k)) for k in range(nl_)]
    vsrc = [dyn(1 + k) for k in range(nv_)]
    isrc = [dyn(1 + nv_ + k) for k in range(ni_)]

    tables = {"g": g, "geq": geq, "ceq": ceq, "lterm": lterm, "lrhs": lrhs,
              "vsrc": vsrc, "isrc": isrc}

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
    row_his, row_los = [], []
    for i in range(n):
        col_his, col_los = [], []
        for j in range(n + 1):
            if i == 0:  # ground row: x[0] = 0
                col_his.append(one if j == 0 else zero)
                col_los.append(zero)
                continue
            if j == n:
                hi, lo = cell_sum(rhs_cells.get(i, []))
            else:
                hi, lo = cell_sum(cells.get((i, j), []))
            col_his.append(hi)
            col_los.append(lo)
        row_his.append(jnp.stack(col_his, axis=0))
        row_los.append(jnp.stack(col_los, axis=0))
    m_hi = jnp.stack(row_his, axis=0)
    m_lo = jnp.stack(row_los, axis=0)

    x_hi, x_lo = _gj_eliminate(n, m_hi, m_lo)

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

    xlte_ref[...] = jnp.stack([
        jnp.stack([x_hi[r] for r in range(n)] + [worst[0]]),
        jnp.stack([x_lo[r] for r in range(n)] + [worst[1]]),
    ])

    # --- commit candidates (compat: capacitor.go:155-171, inductor.go:81-114)
    # default: pass the input state through (also covers the dummy row when
    # the circuit has no C/L state at all)
    out_rows_hi = [st_hi_ref[r, :] for r in range(st_hi_ref.shape[0])]
    out_rows_lo = [st_lo_ref[r, :] for r in range(st_hi_ref.shape[0])]

    def put(r, p):
        out_rows_hi[r], out_rows_lo[r] = p

    for k in range(nc_):
        n1, n2 = layout["c_nodes"][k]
        vd = diff_x(n1, n2)
        put(L["c_v0"] + k, vd)
        put(L["c_v1"] + k, st(L["c_v0"] + k))
        put(L["c_q0"] + k, _df_mul(*const(L["craw"] + k), *vd))
        put(L["c_q1"] + k, st(L["c_q0"] + k))
    c1e9 = _df_const(1e-9, lanes)
    for k in range(nl_):
        n1, n2 = layout["l_nodes"][k]
        vd = diff_x(n1, n2)
        linv = const(L["linv"] + k)
        # LoadState then UpdateState: i1' = i1 + vd·dt/L ; i0' = vd·1e-9/L
        put(L["l_i1"] + k,
            _df_add(*st(L["l_i1"] + k), *_df_mul(*_df_mul(*vd, *dt), *linv)))
        put(L["l_i0"] + k, _df_mul(*_df_mul(*vd, *c1e9), *linv))
        put(L["l_v0"] + k, vd)
        put(L["l_v1"] + k, st(L["l_v0"] + k))
        put(L["l_flux0"] + k, _df_mul(*vd, *dt))

    stout_ref[...] = jnp.stack([jnp.stack(out_rows_hi, axis=0),
                                jnp.stack(out_rows_lo, axis=0)])


# ----------------------------------------------------------------- wrapper


def _layout(cc):
    """Row offsets inside the const and state stacks."""
    nr_ = cc.kind_count("R") if "R" in cc.idx else 0
    nc_ = cc.kind_count("C") if "C" in cc.idx else 0
    nl_ = cc.kind_count("L") if "L" in cc.idx else 0
    nv_ = cc.kind_count("V") if "V" in cc.idx else 0
    ni_ = cc.kind_count("I") if "I" in cc.idx else 0
    L = {"g": 0, "cadj": nr_, "craw": nr_ + nc_, "lval": nr_ + 2 * nc_,
         "linv": nr_ + 2 * nc_ + nl_}
    n_const = nr_ + 2 * nc_ + 2 * nl_
    # state stack rows (same layout for input and commit-candidate output)
    L.update({"c_q0": 0, "c_q1": nc_, "c_v0": 2 * nc_, "c_v1": 3 * nc_,
              "l_i0": 4 * nc_, "l_i1": 4 * nc_ + nl_, "l_v0": 4 * nc_ + 2 * nl_,
              "l_v1": 4 * nc_ + 3 * nl_, "l_flux0": 4 * nc_ + 4 * nl_})
    n_state = 4 * nc_ + 5 * nl_
    L["c_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["C"]["nodes"])]
                    if nc_ else [])
    L["l_nodes"] = ([tuple(map(int, r)) for r in np.asarray(cc.idx["L"]["nodes"])]
                    if nl_ else [])
    return (nr_, nc_, nl_, nv_, ni_), L, n_const, n_state


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


def make_tran_fused(cc, cfg, opts, block: int | None = None):
    """Batched fused transient for eligible circuits.

    Returns fn(params, state0) -> TranOutput with a leading batch axis on
    every per-instance field.  `params` leaves are (nk,) shared or (B, nk)
    batched; `state0` is the unbatched init_state(cc) dict (or (B, nk)
    leaves).  Semantics: exactly engine/tran.py compat/BE with store='none'
    (the control flow below is a line-for-line counterpart; state/LTE/solve
    run in-kernel).
    """
    from ..engine.tran import TranOutput
    from ..models.sources import eval_sources_lanes

    counts, layout, n_const, n_state = _layout(cc)
    nr_, nc_, nl_, nv_, ni_ = counts
    n = cc.np1
    cells, rhs_cells = _build_plan(cc)
    cells = {k: tuple(v) for k, v in cells.items()}
    rhs_cells = {k: tuple(v) for k, v in rhs_cells.items()}
    kernel = functools.partial(_fused_kernel, n, counts, layout, cells,
                               rhs_cells)
    # lanes per grid block (rounded up to a multiple of 1024 = 8 sublanes x
    # 128 lanes); measured on v5e at the 8192-way benchmark: 1024 -> 285.6M
    # steps/s, 2048 -> 264M, 4096 -> 243M, 8192 -> 223M.  The general solve
    # kernel keeps its own 1-D 512 default.
    if block is None:
        block = int(os.environ.get("TOYSPICE_BLOCK", "1024"))
    temp = opts.temp
    trtol = opts.trtol
    dtemp = temp - TEMP_DEFAULT

    def tadj(tbl, nk, b):
        v = _lanes(tbl["value"], nk, b)
        tc1 = _lanes(tbl["tc1"], nk, b)
        tc2 = _lanes(tbl["tc2"], nk, b)
        return v * (1.0 + tc1 * dtemp + tc2 * dtemp * dtemp)

    def tran_fused(params, state0):
        # infer batch size from any batched scalar-per-device leaf
        # (PWL knot tables are (nS, P) and unbatched — fused_eligible)
        b = 1
        for tbl in params.values():
            for key, leaf in tbl.items():
                if key in ("pwl_t", "pwl_v"):
                    continue
                leaf = jnp.asarray(leaf)
                if leaf.ndim == 2:
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
                    out[key] = leaf  # (nk, P), unbatched (fused_eligible)
                elif leaf.ndim == 2 and leaf.shape[0] != bp:
                    out[key] = jnp.pad(leaf, ((0, bp - leaf.shape[0]), (0, 0)))
                else:
                    out[key] = leaf
            return out

        pv = pad_src(params["V"]) if nv_ else None
        pi = pad_src(params["I"]) if ni_ else None

        # ---- const stack (attempt-invariant, split to df once) ----
        rows = []
        if nr_:
            rows.append(1.0 / tadj(params["R"], nr_, bp))
        if nc_:
            rows.append(tadj(params["C"], nc_, bp))
            rows.append(_lanes(params["C"]["value"], nc_, bp))
        if nl_:
            lv = _lanes(params["L"]["value"], nl_, bp)
            rows.extend([lv, 1.0 / lv])
        const64 = (jnp.concatenate(rows, axis=0) if rows
                   else jnp.zeros((1, bp), dtype=jnp.float64))
        const_hi, const_lo = _hi_lo(const64)

        # ---- initial state stack ----
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
        st64 = (jnp.concatenate(srows, axis=0) if srows
                else jnp.zeros((1, bp), dtype=jnp.float64))
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

        def attempt(dyn64, st_hi, st_lo):
            dyn_hi, dyn_lo = _hi_lo(dyn64)
            xlte, stout = pl.pallas_call(
                kernel,
                grid=(bp // blk,),
                in_specs=[vec(const_hi.shape[0])] * 2
                         + [vec(dyn_hi.shape[0])] * 2 + [vec(ks)] * 2,
                out_specs=(vec2(n + 1), vec2(ks)),
                out_shape=(
                    jax.ShapeDtypeStruct((2, n + 1, 8, bp // 8), jnp.float32),
                    jax.ShapeDtypeStruct((2, ks, 8, bp // 8), jnp.float32),
                ),
            )(const_hi, const_lo, fold(dyn_hi), fold(dyn_lo), st_hi, st_lo)
            return xlte[0], xlte[1], stout[0], stout[1]

        # pad lanes beyond b start done (their kernel output is never used)
        lane = jnp.arange(bp)
        pad = lane >= b
        f64 = jnp.float64
        carry0 = dict(
            t=jnp.zeros(bp, dtype=f64),
            dt=jnp.full(bp, cfg.minstep, dtype=f64),
            done=pad | jnp.full(bp, cfg.tstop <= 0.0),
            fail=jnp.zeros(bp, dtype=bool),
            st_hi=fold(st_hi0), st_lo=fold(st_lo0),
            accepted=jnp.zeros(bp, dtype=jnp.int32),
            attempts=jnp.zeros(bp, dtype=jnp.int32),
            nr_iters=jnp.zeros(bp, dtype=jnp.int32),
        )

        # The while cond is a cross-batch reduction whose value gates the next
        # dispatch — on TPU that serializes every iteration behind a scalar
        # round-trip (unroll=1 is pathological).  The body freezes finished
        # lanes via the `active` mask, so over-running is safe and the cond is
        # only checked every UNROLL attempts; beyond ~8 the returns vanish
        # (kernel compute dominates).
        unroll = int(os.environ.get("TOYSPICE_TRAN_UNROLL", "8"))

        def cond(c):
            return jnp.any((~c["done"]) & (c["attempts"] < cfg.max_attempts))

        def body(c):
            t, dt = c["t"], c["dt"]
            active = (~c["done"]) & (c["attempts"] < cfg.max_attempts)
            next_t = jnp.minimum(t + dt, cfg.tstop)
            dt_eff = jnp.where(t + dt > cfg.tstop, cfg.tstop - t, dt)

            # sources at the OLD time t (PLAN.md 2), exact f64
            drows = [dt_eff[None, :]]
            if nv_:
                drows.append(eval_sources_lanes(
                    cc.idx["V"]["stype"], pv, t, bp))
            if ni_:
                drows.append(eval_sources_lanes(
                    cc.idx["I"]["stype"], pi, t, bp))
            dyn64 = jnp.concatenate(drows, axis=0)

            xlte_hi, xlte_lo, stout_hi, stout_lo = attempt(
                dyn64, c["st_hi"], c["st_lo"])
            xlte_hi = xlte_hi.reshape(n + 1, bp)  # unfold lane tiles
            xlte_lo = xlte_lo.reshape(n + 1, bp)

            finite = jnp.all(jnp.isfinite(xlte_hi[:n])
                             & jnp.isfinite(xlte_lo[:n]), axis=0)
            lte = (xlte_hi[n].astype(f64) + xlte_lo[n].astype(f64))

            can_halve = dt_eff > cfg.minstep
            nr_fail = ~finite
            hard_fail = nr_fail & ~can_halve
            reject = (nr_fail & can_halve) | (finite & (lte > trtol) & can_halve)
            accept = finite & ~reject

            acc_act = accept & active
            acc3 = acc_act.reshape(8, bp // 8)[None]
            st_hi = jnp.where(acc3, stout_hi, c["st_hi"])
            st_lo = jnp.where(acc3, stout_lo, c["st_lo"])

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
            return dict(
                t=t_new, dt=dt_new, done=done,
                fail=c["fail"] | (hard_fail & active),
                st_hi=st_hi, st_lo=st_lo,
                accepted=c["accepted"] + acc_act.astype(jnp.int32),
                attempts=c["attempts"] + active.astype(jnp.int32),
                nr_iters=c["nr_iters"] + active.astype(jnp.int32),
            )

        def unrolled_body(c):
            for _ in range(unroll):
                c = body(c)
            return c

        c = jax.lax.while_loop(cond, unrolled_body, carry0)

        # ---- unpack state stack -> f64 dict (batch-leading) ----
        st64f = (c["st_hi"].astype(f64)
                 + c["st_lo"].astype(f64)).reshape(ks, bp)[:, :b]

        def grab(off, nk):
            return jnp.transpose(st64f[off:off + nk], (1, 0))

        state = {}
        if nc_:
            hist0 = srow("C", "hist", nc_)[:, :b].T
            i00 = srow("C", "i0", nc_)[:, :b].T
            started = (c["accepted"][:b] > 0)[:, None]
            state["C"] = {
                "q0": grab(layout["c_q0"], nc_), "q1": grab(layout["c_q1"], nc_),
                "v0": grab(layout["c_v0"], nc_), "v1": grab(layout["c_v1"], nc_),
                "i0": i00, "hist": jnp.where(started, 1.0, hist0),
            }
        if nl_:
            hist0 = srow("L", "hist", nl_)[:, :b].T
            started = (c["accepted"][:b] > 0)[:, None]
            state["L"] = {
                "i0": grab(layout["l_i0"], nl_), "i1": grab(layout["l_i1"], nl_),
                "v0": grab(layout["l_v0"], nl_), "v1": grab(layout["l_v1"], nl_),
                "flux0": grab(layout["l_flux0"], nl_),
                "hist": jnp.where(started, 1.0, hist0),
            }

        return TranOutput(
            out_x=jnp.zeros((b, 1, n), dtype=f64),
            out_t=jnp.zeros((b, 1), dtype=f64),
            out_n=jnp.zeros(b, dtype=jnp.int32),
            fail=c["fail"][:b],
            accepted=c["accepted"][:b],
            attempts=c["attempts"][:b],
            nr_iters=c["nr_iters"][:b],
            t_final=c["t"][:b],
            state=state,
            jv={},
        )

    return tran_fused
