"""Fused OP/Newton Pallas kernel: the reference's one hot loop, in VMEM.

Every analysis in the reference fronts the same Newton-Raphson loop —
clear → stamp → factor → solve per iteration (op.go:25-88 for OP, shared by
the AC bias at ac.go:37-44 and per DC sweep point at dc.go:142-187).  The
round-3 engine ran that loop as vmapped XLA with emulated-f64 HLOs: at the
8192-lane benchmark batch the OP warm-up dominated every short nonlinear
transient (diode2 4.8M vs rlc 297M agg steps/s), the AC bias dominated the
batched AC sweep, and the DC sweep never touched the fused Newton machinery
at all (round-3 VERDICT items 1-2 of "what's weak").

This module reuses the in-kernel Newton of ops/pallas_tran.py
(``_newton_in_kernel`` — pnjlim limiting, device evals, matrix build,
one-hot-pivot Gauss-Jordan, per-lane convergence freezing) with the OP/DC
static flavors:

* OP stamps (assemble.py mode="op"): no companion models; capacitors leak
  max(status_gmin, gmin_floor) (capacitor.go:67-83); inductors stamp the
  dt=1e-9 junk companion (inductor.go:38-79 at dt=0); magnetic branches a
  fixed +1e-3 diagonal (magnetic.go:216-217); mutuals early-out
  (mutual.go:57).  status_gmin rides a dynamic lane row so the XLA-side
  gmin ladder re-enters the SAME compiled kernel per rung.
* The linear-devices-only initial estimate (op.go:90-111) is one extra
  in-kernel Gauss-Jordan over the base cells, selected by a dynamic flag
  (ladder rungs warm-start from the carried solution instead).
* The rescue ladders stay XLA-side (engine/op.py structure, batch-native):
  per-lane active masks replace vmap's cond-as-select, while-loop conds are
  cross-lane reductions, so a batch where plain NR converges costs exactly
  ONE kernel dispatch and the ladder kernels never execute.
* The DC flavor (warm start + the CheckConvergence formula, dc.go:142-187)
  serves ``make_dc_fused``: a ``lax.scan`` over sweep points around the
  same kernel, junction voltages warm-started point to point.

Numerical class: double-float (~48-bit mantissa) — the same class as the
fused transient kernel, validated by the on-TPU A/B protocol
(tests/tools/ab_fused_op.py)."""

import functools
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solve import _df_add, _df_mul, _gj_eliminate, _unpinned
from .pallas_tran import (FUSED_KINDS, _build_plan, _const_stack64, _df_const,
                          _df_max, _df_neg, _hi_lo, _lanes, _layout,
                          _newton_in_kernel)


def op_fused_ineligible_reason(cc, semantics: str = "compat", opts=None,
                               params=None):
    """Why this circuit can NOT use the fused OP/Newton kernel; None when it
    can.  The fused path covers compat- and physics-semantics circuits over
    the kernel device set with at least one nonlinear device — a linear OP is a single
    assemble+solve through the already-fused stamped-solve kernel
    (engine/newton.py nr_linear), so there is nothing left to fuse."""
    if semantics not in ("compat", "physics"):
        return f"semantics={semantics!r}"
    extra = set(cc.idx.keys()) - FUSED_KINDS
    if extra:
        return f"device kinds {sorted(extra)} not supported by the kernel"
    if not any(k in cc.idx for k in ("D", "Q", "M")):
        return ("linear circuit (general OP is already one fused "
                "assemble+solve)")
    if (semantics == "physics" and params is not None
            and "D" in cc.idx and "D" in params):
        # same static-Rs-gate contract as the fused transient
        # (pallas_tran.fused_ineligible_reason): an override that ENABLES
        # Rs on a device whose deck leaves it 0 would be silently wrong
        rs_static = np.asarray(cc.params["D"]["rs"]) > 0
        leaf = params["D"].get("rs")
        if leaf is not None:
            try:
                arr = np.asarray(leaf)
            except Exception:
                return ("traced diode Rs params (cannot verify the static "
                        "Rs gate)")
            on = (arr != 0).reshape(-1, arr.shape[-1]).any(axis=0)
            if np.any(on & ~rs_static):
                return ("diode Rs override enables series resistance the "
                        "deck's model leaves off (static Rs gating)")
    return None


def op_fused_eligible(cc, semantics: str = "compat", opts=None,
                      params=None) -> bool:
    return op_fused_ineligible_reason(cc, semantics, opts, params) is None


# ------------------------------------------------------------------- core


def _op_core(n, counts, layout, cells, rhs_cells, cfgk, flavor, gmin_floor,
             mode, const_hi, const_lo, dyn_hi, dyn_lo, x0_hi, x0_lo, jv_hi, jv_lo,
             cpu_build=False):
    """One OP/DC Newton solve as a pure array function over the df stacks.

    dyn rows: [status_gmin, use_seed, act, vsrc(nv), isrc(ni), lrhs(nl)];
    returns (out, jvout) with out rows [x(n), nr_iters, converged] and a
    leading limb axis.  Compiles as the Pallas kernel (``_op_kernel``) or as
    plain XLA for the CPU parity tests (``cpu_build`` switches the matrix
    build exactly like _attempt_core)."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    f32 = jnp.float32
    lanes = dyn_hi.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)
    zz = (zero, zero)

    def const(r):
        return (const_hi[r, :], const_lo[r, :])

    def dyn(r):
        return (dyn_hi[r, :], dyn_lo[r, :])

    L = layout
    gmin_p = dyn(0)
    use_seed = dyn(1)[0] > f32(0.5)
    act_mask = dyn(2)[0] > f32(0.5)
    vsrc = [dyn(3 + k) for k in range(nv_)]
    isrc = [dyn(3 + nv_ + k) for k in range(ni_)]
    lrhs = [dyn(3 + nv_ + ni_ + k) for k in range(nl_)]

    # OP-mode linear tables for the shared stamp plan (_build_plan tags,
    # values per assemble.py mode="op"): C leaks max(status_gmin, floor);
    # L stamps -L/1e-9 with RHS (L/1e-9)·i1; LM a +1e-3 branch diagonal
    # (plan sign -1 → lmterm = -1e-3); K/ceq/lmrhs rows are zero.
    gc = _df_max(gmin_p, _df_const(gmin_floor, lanes))
    c1e9 = _df_const(1e9, lanes)
    g = [const(L["g"] + k) for k in range(nr_)]
    lterm = [_df_mul(*const(L["lval"] + k), *c1e9) for k in range(nl_)]
    tables = {"g": g, "geq": [gc] * nc_, "ceq": [zz] * nc_,
              "lterm": lterm, "lrhs": lrhs, "vsrc": vsrc, "isrc": isrc,
              "lmterm": [_df_const(-1e-3, lanes)] * nlm_,
              "lmrhs": [zz] * nlm_, "kterm": [zz] * nk_,
              "krhsa": [zz] * nk_, "krhsb": [zz] * nk_}

    def term_value(tag, k, s):
        if tag == "one":
            hi = jnp.full(lanes, f32(s))
            return (hi, zero)
        p = tables[tag][k]
        return p if s > 0 else _df_neg(p)

    def cell_sum(terms):
        if not terms:
            return zz
        acc = term_value(*terms[0])
        for t_ in terms[1:]:
            acc = _df_add(*acc, *term_value(*t_))
        return acc

    one = jnp.ones(lanes, dtype=f32)
    base = {}
    for i in range(1, n):
        for j in range(n + 1):
            terms = rhs_cells.get(i, []) if j == n else cells.get((i, j), [])
            if terms:
                base[(i, j)] = cell_sum(terms)

    def cell(i, j, extra):
        if i == 0:  # ground row: x[0] = 0
            return (one, zero) if j == 0 else zz
        p = base.get((i, j), zz)
        e = extra.get((i, j))
        if e is not None:
            p = _df_add(*p, *e)
        return p

    if cpu_build:
        # update-slice build for XLA CPU (see _attempt_core: the stack build
        # becomes one giant concatenate fusion whose LLVM opt explodes)
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
            row_his, row_los = [], []
            for i in range(n):
                col_his = [cell(i, j, extra)[0] for j in range(n + 1)]
                col_los = [cell(i, j, extra)[1] for j in range(n + 1)]
                row_his.append(jnp.stack(col_his, axis=0))
                row_los.append(jnp.stack(col_los, axis=0))
            return jnp.stack(row_his, axis=0), jnp.stack(row_los, axis=0)

    if flavor == "op":
        # linear-devices-only initial estimate (op.go:90-111): base cells
        # only — no nonlinear extras, no diagonal gmin — with the
        # singular/non-finite → zero-vector fallback; dynamic-selected
        # against the warm-start input (ladder rungs re-enter warm)
        s_hi, s_lo = _gj_eliminate(n, *build_matrix({}))
        fin = None
        for r in range(n):
            f = jnp.isfinite(s_hi[r]) & jnp.isfinite(s_lo[r])
            fin = f if fin is None else (fin & f)
        s_hi = jnp.where(fin[None], s_hi, f32(0.0))
        s_lo = jnp.where(fin[None], s_lo, f32(0.0))
        x0h = jnp.where(use_seed[None], s_hi, x0_hi)
        x0l = jnp.where(use_seed[None], s_lo, x0_lo)
        gmin_k = gmin_p
    else:  # dc: warm start from the carried jv, x0 = zeros, gmin = 0
        x0h, x0l = x0_hi, x0_lo
        gmin_k = None

    x_hi, x_lo, nr_k, nr_conv, jvout = _newton_in_kernel(
        n, nd_, nq_, nm_, layout, cfgk, build_matrix, const, jv_hi, jv_lo,
        zz, lanes, act_mask, flavor=flavor, gmin=gmin_k, x0=(x0h, x0l),
        transient_terms=False, mode=mode)

    hi_rows = ([x_hi[r] for r in range(n)]
               + [nr_k.astype(f32), nr_conv.astype(f32)])
    lo_rows = [x_lo[r] for r in range(n)] + [zero, zero]
    out = jnp.stack([jnp.stack(hi_rows), jnp.stack(lo_rows)])
    return out, jvout


@_unpinned
def _op_kernel(n, counts, layout, cells, rhs_cells, cfgk, flavor, gmin_floor,
               mode, dus_build, const_hi_ref, const_lo_ref, dyn_hi_ref,
               dyn_lo_ref, x0_ref, jv_ref, out_ref, jvout_ref):
    # x0/jv cross as (2, rows, 8, W) limb-paired stacks; outputs likewise
    # (limb pairs must leave through ONE ref — see _fused_kernel)
    out, jvout = _op_core(
        n, counts, layout, cells, rhs_cells, cfgk, flavor, gmin_floor, mode,
        const_hi_ref[...], const_lo_ref[...],
        dyn_hi_ref[...], dyn_lo_ref[...],
        x0_ref[0], x0_ref[1], jv_ref[0], jv_ref[1], cpu_build=dus_build)
    out_ref[...] = out
    jvout_ref[...] = jvout


def _default_block(cc):
    """Lanes per kernel block.  Small systems take the maximal block; n >= 6
    (BJT/MOSFET branch-row decks) drop to 2048: the OP kernel's scoped VMEM
    grows with n^2 x blk and a bjt2-shaped n=7 block at 8192 lanes exceeds
    the 16M scoped-vmem limit by 3M (measured OOM at compile, 2026-08-21)."""
    n = cc.np1
    if n >= 6:
        return int(os.environ.get("TOYSPICE_BLOCK", "2048"))
    return int(os.environ.get("TOYSPICE_BLOCK_NL", "8192"))


def _dc_sweep_core(n, counts, layout, cells, rhs_cells, cfgk, gmin_floor,
                   mode, n_pts, const_hi, const_lo, dyn_hi, dyn_lo,
                   vs_hi, vs_lo, jv_hi, jv_lo, cpu_build=False):
    """The ENTIRE DC sweep in one kernel: a ``fori_loop`` over sweep points
    around the in-kernel Newton (warm-started jv carried point to point in
    VMEM), exactly the lax.scan-of-kernels semantics of ``make_dc_fused``'s
    scan path — but ONE launch instead of P, and none of the ~1 ms/point
    XLA-side glue the round-4 attribution measured (PARITY.md).

    dyn rows: [act, isrc(ni), lrhs(nl)]; ``vs`` rows are the PER-POINT
    voltage-source values, (n_pts*nv, lanes) — only the RHS vsrc slots
    change across points, so the matrix base cells are built once and the
    per-point values ride the extra dict into the shared build.
    Returns (out, jvout): out rows = n_pts * (x(n), iters, conv)."""
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    f32 = jnp.float32
    lanes = dyn_hi.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)
    zz = (zero, zero)

    def const(r):
        return (const_hi[r, :], const_lo[r, :])

    def dyn(r):
        return (dyn_hi[r, :], dyn_lo[r, :])

    L = layout
    act_mask = dyn(0)[0] > f32(0.5)
    isrc = [dyn(1 + k) for k in range(ni_)]
    lrhs = [dyn(1 + ni_ + k) for k in range(nl_)]

    # OP-mode linear tables (assemble.py mode="op"); status_gmin is 0 for
    # DC points (dc.go:142-187 runs plain NR), so C leaks the floor
    gc = _df_const(gmin_floor, lanes)
    c1e9 = _df_const(1e9, lanes)
    g = [const(L["g"] + k) for k in range(nr_)]
    lterm = [_df_mul(*const(L["lval"] + k), *c1e9) for k in range(nl_)]
    tables = {"g": g, "geq": [gc] * nc_, "ceq": [zz] * nc_,
              "lterm": lterm, "lrhs": lrhs, "vsrc": [zz] * nv_,
              "isrc": isrc,
              "lmterm": [_df_const(-1e-3, lanes)] * nlm_,
              "lmrhs": [zz] * nlm_, "kterm": [zz] * nk_,
              "krhsa": [zz] * nk_, "krhsb": [zz] * nk_}

    def term_value(tag, k, sg):
        if tag == "one":
            return (jnp.full(lanes, f32(sg)), zero)
        v = tables[tag][k]
        return v if sg > 0 else _df_neg(v)

    def cell_sum(terms):
        acc = None
        for t_ in terms:
            v = term_value(*t_)
            acc = v if acc is None else _df_add(*acc, *v)
        return acc if acc is not None else zz

    one = jnp.ones(lanes, dtype=f32)
    base = {}
    for i in range(1, n):
        for j in range(n + 1):
            terms = rhs_cells.get(i, []) if j == n else cells.get((i, j), [])
            # vsrc terms are per-point: stripped from the base, re-added via
            # the extra dict inside the point loop
            terms = [t_ for t_ in terms if t_[0] != "vsrc"]
            if terms:
                base[(i, j)] = cell_sum(terms)
    vsrc_slots = [(i, k, sg) for i, terms in rhs_cells.items()
                  for (tag, k, sg) in terms if tag == "vsrc"]

    def cell(i, j, extra):
        if i == 0:
            return (one, zero) if j == 0 else zz
        v = base.get((i, j), zz)
        e = extra.get((i, j))
        if e is not None:
            v = _df_add(*v, *e)
        return v

    if cpu_build:
        def build_matrix(extra):
            m_hi = jnp.zeros((n, n + 1) + lanes, dtype=f32)
            m_lo = jnp.zeros_like(m_hi)
            for i in range(n):
                for j in range(n + 1):
                    v = cell(i, j, extra)
                    if v[0] is not zero:
                        m_hi = m_hi.at[i, j].set(v[0])
                    if v[1] is not zero:
                        m_lo = m_lo.at[i, j].set(v[1])
            return m_hi, m_lo
    else:
        def build_matrix(extra):
            row_his, row_los = [], []
            for i in range(n):
                col_his = [cell(i, j, extra)[0] for j in range(n + 1)]
                col_los = [cell(i, j, extra)[1] for j in range(n + 1)]
                row_his.append(jnp.stack(col_his, axis=0))
                row_los.append(jnp.stack(col_los, axis=0))
            return jnp.stack(row_his, axis=0), jnp.stack(row_los, axis=0)

    zn = jnp.zeros((n,) + lanes, dtype=f32)
    kj = nd_ + 2 * nq_ + 3 * nm_
    # vs rows viewed as (P, nv, lanes): Mosaic has no dynamic_slice on
    # register arrays, so per-point reads are STATIC select chains and the
    # per-point output write is ONE broadcast select over a (P, n+2, lanes)
    # carry (iota-vs-pt mask)
    vs_h4 = vs_hi.reshape((n_pts, nv_) + lanes)
    vs_l4 = vs_lo.reshape((n_pts, nv_) + lanes)

    def body(pt, carry):
        jh, jl, oh, ol = carry

        def vrow(k):
            # VECTOR predicate (scalar pt broadcast against a lane-shaped
            # iota-free constant): Mosaic's scalar-pred select and scalar
            # bool->f32 convert paths both recurse its lowering to death
            # (observed on real TPU, round 5)
            ah, al = vs_h4[0, k], vs_l4[0, k]
            for q in range(1, n_pts):
                selv = jnp.full(lanes, q, dtype=jnp.int32) == pt
                ah = jnp.where(selv, vs_h4[q, k], ah)
                al = jnp.where(selv, vs_l4[q, k], al)
            return (ah, al)

        vextra = {}
        for (i, k, sg) in vsrc_slots:
            v = vrow(k)
            if sg < 0:
                v = _df_neg(v)
            cur = vextra.get((i, n))
            vextra[(i, n)] = v if cur is None else _df_add(*cur, *v)

        def build_p(extra):
            e = dict(vextra)
            for key, v in extra.items():
                cur = e.get(key)
                e[key] = v if cur is None else _df_add(*cur, *v)
            return build_matrix(e)

        x_hi, x_lo, nr_k, nr_conv, jvout = _newton_in_kernel(
            n, nd_, nq_, nm_, layout, cfgk, build_p, const, jh, jl,
            zz, lanes, act_mask, flavor="dc", gmin=None, x0=(zn, zn),
            transient_terms=False, mode=mode)
        rows_hi = jnp.concatenate(
            [x_hi, nr_k.astype(f32)[None], nr_conv.astype(f32)[None]])
        rows_lo = jnp.concatenate([x_lo, zero[None], zero[None]])
        # Per-point output write as a STATIC loop of vector-predicate
        # selects (the Newton kernel's proven masking pattern).  The
        # alternatives all kill Mosaic: a captured numpy iota constant is
        # rejected by pallas_call, an (n_pts, 1, 1, 1) broadcast mask and
        # a scalar bool->f32 convert both recurse its lowering to death
        # (all observed on real TPU, round 5 — the CPU impl=xla tests
        # never exercise Mosaic).
        oh_rows, ol_rows = [], []
        for q in range(n_pts):
            selv = (jnp.full(lanes, q, dtype=jnp.int32) == pt)[None]
            oh_rows.append(jnp.where(selv, rows_hi, oh[q]))
            ol_rows.append(jnp.where(selv, rows_lo, ol[q]))
        oh = jnp.stack(oh_rows)
        ol = jnp.stack(ol_rows)
        return (jvout[0], jvout[1], oh, ol)

    out0 = jnp.zeros((n_pts, n + 2) + lanes, dtype=f32)
    # int32 bounds: Python-int fori bounds make the induction variable
    # int64 under x64, and Mosaic's i32->i64 convert helper recurses its
    # own lowering forever (observed on real TPU, round 5 — the CLAUDE.md
    # int32-literal invariant applies to loop bounds too)
    jh, jl, oh, ol = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_pts), body, (jv_hi, jv_lo, out0, out0))
    oh = oh.reshape((n_pts * (n + 2),) + lanes)
    ol = ol.reshape((n_pts * (n + 2),) + lanes)
    return jnp.stack([oh, ol]), jnp.stack([jh, jl])


@_unpinned
def _dc_sweep_kernel(n, counts, layout, cells, rhs_cells, cfgk, gmin_floor,
                     mode, n_pts, dus_build, const_hi_ref, const_lo_ref,
                     dyn_hi_ref, dyn_lo_ref, vs_ref, jv_ref,
                     out_ref, jvout_ref):
    out, jvout = _dc_sweep_core(
        n, counts, layout, cells, rhs_cells, cfgk, gmin_floor, mode, n_pts,
        const_hi_ref[...], const_lo_ref[...],
        dyn_hi_ref[...], dyn_lo_ref[...],
        vs_ref[0], vs_ref[1], jv_ref[0], jv_ref[1], cpu_build=dus_build)
    out_ref[...] = out
    jvout_ref[...] = jvout


# ---------------------------------------------------------------- wrappers


class FusedOPResult(NamedTuple):
    x: jnp.ndarray          # (b, np1) f64
    jv: dict                # nlstate pytree, (b, nk) f64 leaves
    converged: jnp.ndarray  # (b,) bool
    stage: jnp.ndarray      # (b,) int32: 0 plain NR, 1 gmin, 2 source step
    iters: jnp.ndarray      # (b,) int32: plain-NR (stage-0) iteration count


def _jv_tree(cc, jv64, counts):
    """(kj, b) f64 junction-voltage rows -> the nlstate pytree (batched
    leaves); vce synthesized as vbe - vbc (nlstate.py:83-85)."""
    nd_, nq_, nm_ = counts[7], counts[8], counts[9]
    jv = {}
    off = 0
    if nd_:
        jv["D"] = {"vd": jv64[off:off + nd_].T}
        off += nd_
    if nq_:
        vbe = jv64[off:off + nq_].T
        vbc = jv64[off + nq_:off + 2 * nq_].T
        jv["Q"] = {"vbe": vbe, "vbc": vbc, "vce": vbe - vbc}
        off += 2 * nq_
    if nm_:
        jv["M"] = {"vgs": jv64[off:off + nm_].T,
                   "vds": jv64[off + nm_:off + 2 * nm_].T,
                   "vbs": jv64[off + 2 * nm_:off + 3 * nm_].T}
    return jv


def _infer_batch(params, state0):
    b = 1
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
            if leaf.ndim == 2:
                b = max(b, leaf.shape[0])
    return b


def _pad_src(tbl, bp):
    out = {}
    for key, leaf in tbl.items():
        leaf = jnp.asarray(leaf, dtype=jnp.float64)
        if key in ("pwl_t", "pwl_v"):
            if leaf.ndim == 3 and leaf.shape[0] != bp:
                leaf = jnp.pad(leaf, ((0, bp - leaf.shape[0]), (0, 0), (0, 0)))
            out[key] = leaf
        elif leaf.ndim == 2 and leaf.shape[0] != bp:
            out[key] = jnp.pad(leaf, ((0, bp - leaf.shape[0]), (0, 0)))
        else:
            out[key] = leaf
    return out


def _block_geometry(b, block):
    blk = min(block, max(1024, ((b + 1023) // 1024) * 1024))
    blk = ((blk + 1023) // 1024) * 1024
    bp = ((b + blk - 1) // blk) * blk
    return blk, bp, blk // 8


def _make_call(cc, counts, layout, cfgk, flavor, gmin_floor, n, kj, bp,
               blk, mode="compat"):
    """Compile-shared kernel invoker: (const_hi, const_lo, dyn64, x0_st,
    jv_st) -> (x_st, iters, conv, jv_st') with folded (2, rows, 8, bp//8)
    stacks for x/jv and (bp,) unfolded iters/conv."""
    cells, rhs_cells = _build_plan(cc)
    cells = {k: tuple(v) for k, v in cells.items()}
    rhs_cells = {k: tuple(v) for k, v in rhs_cells.items()}
    kernel = functools.partial(
        _op_kernel, n, counts, layout, cells, rhs_cells, cfgk, flavor,
        gmin_floor, mode,
        os.environ.get("TOYSPICE_TRAN_KERNEL_BUILD") == "dus")
    w = blk // 8
    zero = np.int32(0)
    impl = os.environ.get("TOYSPICE_TRAN_IMPL", "kernel")

    def vec(rows_):
        return pl.BlockSpec((rows_, 8, w), lambda i: (zero, zero, i),
                            memory_space=pltpu.VMEM)

    def vec2(rows_):
        return pl.BlockSpec((2, rows_, 8, w),
                            lambda i: (zero, zero, zero, i),
                            memory_space=pltpu.VMEM)

    nd_rows = 3 + counts[4] + counts[5] + counts[2]  # gmin/seed/act + V/I/L

    def fold(x):
        return x.reshape(x.shape[0], 8, bp // 8)

    def call(const_hi, const_lo, dyn64, x0_st, jv_st):
        dyn_hi, dyn_lo = _hi_lo(dyn64)
        if impl == "xla":
            out, jvout = _op_core(
                n, counts, layout, cells, rhs_cells, cfgk, flavor,
                gmin_floor, mode,
                const_hi, const_lo, fold(dyn_hi), fold(dyn_lo),
                x0_st[0], x0_st[1], jv_st[0], jv_st[1], cpu_build=True)
        else:
            out, jvout = pl.pallas_call(
                kernel,
                grid=(bp // blk,),
                in_specs=[vec(const_hi.shape[0])] * 2
                         + [vec(nd_rows)] * 2 + [vec2(n), vec2(kj)],
                out_specs=(vec2(n + 2), vec2(kj)),
                out_shape=(
                    jax.ShapeDtypeStruct((2, n + 2, 8, bp // 8), jnp.float32),
                    jax.ShapeDtypeStruct((2, kj, 8, bp // 8), jnp.float32),
                ),
            )(const_hi, const_lo, fold(dyn_hi), fold(dyn_lo), x0_st, jv_st)
        x_st = out[:, :n]
        iters = out[0, n].reshape(bp).astype(jnp.int32)
        conv = out[0, n + 1].reshape(bp) > 0.5
        return x_st, iters, conv, jvout

    return call


def make_op_fused(cc, opts, semantics: str = "compat",
                  block: int | None = None, rescue: bool = True):
    """Batched fused operating point for eligible (nonlinear, compat)
    circuits: fn(params, state0) -> FusedOPResult with leading batch axes.
    Semantics: exactly engine/op.py op_execute under vmap — plain NR from
    the linear initial estimate, then the gmin ladder (op.go:192-214), then
    source stepping (op.go:113-169), with per-lane stage selection — but
    each NR is ONE kernel dispatch and the rescue while-loops never execute
    when every lane converges plainly.

    ``rescue=False`` builds only the plain-NR stage (lanes that would need
    a ladder report converged=False) — a compile-cost knob for the CPU
    parity tests, where the impl=xla trace of the full ladder costs many
    minutes per BJT/MOSFET deck on one core; the rescue path's parity is
    covered by the on-TPU A/B (tests/tools/ab_fused_op.py)."""
    from ..engine.op import GMIN_STEPS, SOURCE_FACTORS
    from ..models.sources import eval_sources_lanes

    why = op_fused_ineligible_reason(cc, semantics, opts)
    if why is not None:
        raise ValueError(f"circuit not eligible for the fused OP: {why}")
    mode = "phys_be" if semantics == "physics" else "compat"
    counts, layout, n_const, n_state = _layout(cc)
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    n = cc.np1
    kj = nd_ + 2 * nq_ + 3 * nm_
    cfgk = (opts.reltol, opts.abstol, opts.max_iter)
    if block is None:
        block = _default_block(cc)
    temp = opts.temp
    f64 = jnp.float64
    factors = jnp.asarray(SOURCE_FACTORS, dtype=jnp.float64)

    def op_fused(params, state0):
        b = _infer_batch(params, state0)
        blk, bp, w = _block_geometry(b, block)
        call = _make_call(cc, counts, layout, cfgk, "op", opts.gmin,
                          n, kj, bp, blk, mode=mode)
        const64 = _const_stack64(cc, params, state0, counts, bp, temp)
        const_hi, const_lo = _hi_lo(const64)
        const_hi = const_hi.reshape(-1, 8, bp // 8)
        const_lo = const_lo.reshape(-1, 8, bp // 8)

        pv = _pad_src(params["V"], bp) if nv_ else None
        t0 = jnp.zeros(bp, dtype=f64)
        if ni_:
            pi = _pad_src(params["I"], bp)
            isrc64 = eval_sources_lanes(cc.idx["I"]["stype"], pi, t0, bp)
        if nl_:
            lval = _lanes(params["L"]["value"], nl_, bp)
            i1 = (jnp.zeros((nl_, bp), dtype=f64)
                  if state0.get("L", {}).get("i1") is None
                  else _lanes(state0["L"]["i1"], nl_, bp))
            lrhs64 = lval / 1e-9 * i1

        lane = jnp.arange(bp)
        act_all = lane < b

        def dyn_rows(gmin_s, scale_s, act, seed_s):
            rows = [jnp.full((1, bp), gmin_s, dtype=f64),
                    jnp.full((1, bp), seed_s, dtype=f64),
                    act.astype(f64)[None, :]]
            if nv_:
                # dc_scale scales the dcValue field (DC level / SIN offset,
                # op.go:147 + models/sources.py eval_sources)
                pv2 = dict(pv)
                pv2["dc"] = pv["dc"] * scale_s
                rows.append(eval_sources_lanes(
                    cc.idx["V"]["stype"], pv2, t0, bp))
            if ni_:
                rows.append(isrc64)
            if nl_:
                rows.append(lrhs64)
            return jnp.concatenate(rows, axis=0)

        x_zero = jnp.zeros((2, n, 8, bp // 8), dtype=jnp.float32)
        jv_zero = jnp.zeros((2, kj, 8, bp // 8), dtype=jnp.float32)

        def fold_mask(m):
            return m.reshape(8, bp // 8)[None, None]

        # --- stage 0: plain NR from the in-kernel linear estimate ---
        r0x, r0it, r0conv, r0jv = call(
            const_hi, const_lo, dyn_rows(0.0, 1.0, act_all, 1.0),
            x_zero, jv_zero)
        need = act_all & ~r0conv

        if not rescue:
            x64 = (r0x[0].astype(f64)
                   + r0x[1].astype(f64)).reshape(n, bp)[:, :b].T
            jv64 = (r0jv[0].astype(f64)
                    + r0jv[1].astype(f64)).reshape(kj, bp)[:, :b]
            return FusedOPResult(x=x64, jv=_jv_tree(cc, jv64, counts),
                                 converged=r0conv[:b],
                                 stage=jnp.zeros(b, dtype=jnp.int32),
                                 iters=r0it[:b])

        def no_rescue(_):
            return r0x, r0jv, r0conv, jnp.zeros(bp, dtype=jnp.int32)

        def rescue_fn(_):
            # --- gmin ladder (op.go:192-214), per-lane masked ---
            start_gmin = cc.n * 0.001
            g0 = start_gmin * (10.0 ** GMIN_STEPS)

            def lcond(c):
                i, gmin, cur, jv, active = c
                return jnp.any(active) & (i <= GMIN_STEPS)

            def lbody(c):
                i, gmin, cur, jv, active = c
                rx, _, rconv, rjv = call(
                    const_hi, const_lo, dyn_rows(gmin, 1.0, active, 0.0),
                    cur, jv)
                upd = fold_mask(active & rconv)
                cur2 = jnp.where(upd, rx, cur)
                jv2 = jnp.where(upd, rjv, jv)
                return (i + 1, gmin / 10.0, cur2, jv2, active & rconv)

            _, _, cur, jv, _ = jax.lax.while_loop(
                lcond, lbody,
                (jnp.int32(0), jnp.float64(g0), r0x, r0jv, need))
            # final gmin=0 polish (op.go:214)
            rpx, _, rpconv, rpjv = call(
                const_hi, const_lo, dyn_rows(0.0, 1.0, need, 0.0), cur, jv)
            need2 = need & ~rpconv

            # --- source stepping (op.go:113-169): first step seeds from the
            # linear estimate at 10% scale, every step takes r.x
            # unconditionally, final full-scale polish ---
            def scond(c):
                j, cur_s, jv_s, ok = c
                return jnp.any(ok) & (j < len(SOURCE_FACTORS))

            def sbody(c):
                j, cur_s, jv_s, ok = c
                seed = (j == 0).astype(f64)
                rx, _, rconv, rjv = call(
                    const_hi, const_lo,
                    dyn_rows(0.0, factors[j], ok, seed), cur_s, jv_s)
                okf = fold_mask(ok)
                return (j + 1, jnp.where(okf, rx, cur_s),
                        jnp.where(okf, rjv, jv_s), ok & rconv)

            _, cur2, jv2, ok2 = jax.lax.while_loop(
                scond, sbody, (jnp.int32(0), rpx, rpjv, need2))
            rfx, _, rfconv, rfjv = call(
                const_hi, const_lo, dyn_rows(0.0, 1.0, need2, 0.0),
                cur2, jv2)

            n2f = fold_mask(need2)
            x_f = jnp.where(n2f, rfx, rpx)
            jv_f = jnp.where(n2f, rfjv, rpjv)
            conv_f = jnp.where(need2, ok2 & rfconv, rpconv)
            stage_f = jnp.where(need2, jnp.int32(2), jnp.int32(1))
            return x_f, jv_f, conv_f, stage_f

        xr, jvr, convr, stager = jax.lax.cond(
            jnp.any(need), rescue_fn, no_rescue, None)
        okf = fold_mask(r0conv)
        x_st = jnp.where(okf, r0x, xr)
        jv_st = jnp.where(okf, r0jv, jvr)
        converged = jnp.where(r0conv, True, convr)
        stage = jnp.where(r0conv, jnp.int32(0), stager)

        x64 = (x_st[0].astype(f64)
               + x_st[1].astype(f64)).reshape(n, bp)[:, :b].T
        jv64 = (jv_st[0].astype(f64)
                + jv_st[1].astype(f64)).reshape(kj, bp)[:, :b]
        return FusedOPResult(x=x64, jv=_jv_tree(cc, jv64, counts),
                             converged=converged[:b], stage=stage[:b],
                             iters=r0it[:b])

    return op_fused


def _dc_sweep_call(cc, counts, layout, cells, rhs_cells, cfgk, gmin_floor,
                   mode, src_slots, params, points, const_hi, const_lo,
                   pv, t0, isrc64, lrhs64, b, bp, blk, n, kj):
    """Invoke the whole-sweep kernel: builds the per-point vsrc value stack
    (natural width when sources are unbatched — the emulated-f64 waveform
    math then runs at (P, nv) instead of (P, nv, bp)), folds everything to
    lane tiles and returns (xs (b, P, n), conv (b, P))."""
    import functools as _ft

    from ..models.sources import eval_sources, eval_sources_lanes

    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    f64 = jnp.float64
    f32 = jnp.float32
    w = blk // 8
    n_pts = int(points.shape[0])
    stype = cc.idx["V"]["stype"]

    unbatched = all(jnp.asarray(v).ndim == (2 if k in ("pwl_t", "pwl_v")
                                            else 1)
                    for k, v in params["V"].items())
    if unbatched:
        pnat = {k: jnp.asarray(v, dtype=f64) for k, v in params["V"].items()}

        def at_point(vals):
            dc = pnat["dc"]
            if len(src_slots) == 1:
                dc = dc.at[src_slots[0]].set(vals)
            else:
                dc = dc.at[src_slots[0]].set(vals[0])
                dc = dc.at[src_slots[1]].set(vals[1])
            return eval_sources(stype, {**pnat, "dc": dc}, 0.0)

        vs_nat = jax.vmap(at_point)(points)  # (P, nv)
        vs64 = jnp.broadcast_to(vs_nat.reshape(n_pts * nv_)[:, None],
                                (n_pts * nv_, bp))
    else:
        def at_point(vals):
            pv2 = dict(pv)
            dc = pv["dc"]
            if len(src_slots) == 1:
                dc = dc.at[..., src_slots[0]].set(vals)
            else:
                dc = dc.at[..., src_slots[0]].set(vals[0])
                dc = dc.at[..., src_slots[1]].set(vals[1])
            pv2["dc"] = dc
            return eval_sources_lanes(stype, pv2, t0, bp)

        vs64 = jax.vmap(at_point)(points).reshape(n_pts * nv_, bp)
    vs_hi, vs_lo = _hi_lo(vs64)

    def fold(x):
        return x.reshape(x.shape[0], 8, bp // 8)

    vs_st = jnp.stack([fold(vs_hi), fold(vs_lo)])
    lane = jnp.arange(bp)
    drows = [(lane < b).astype(f64)[None, :]]
    if ni_:
        drows.append(isrc64)
    if nl_:
        drows.append(lrhs64)
    dyn64 = jnp.concatenate(drows, axis=0)
    dyn_hi, dyn_lo = _hi_lo(dyn64)
    jv_zero = jnp.zeros((2, kj, 8, bp // 8), dtype=f32)

    kernel = _ft.partial(
        _dc_sweep_kernel, n, counts, layout, cells, rhs_cells, cfgk,
        gmin_floor, mode, n_pts,
        os.environ.get("TOYSPICE_TRAN_KERNEL_BUILD") == "dus")
    zero_i = np.int32(0)

    def vec(rows_):
        return pl.BlockSpec((rows_, 8, w), lambda i: (zero_i, zero_i, i),
                            memory_space=pltpu.VMEM)

    def vec2(rows_):
        return pl.BlockSpec((2, rows_, 8, w),
                            lambda i: (zero_i, zero_i, zero_i, i),
                            memory_space=pltpu.VMEM)

    if os.environ.get("TOYSPICE_TRAN_IMPL", "kernel") == "xla":
        out, _jvout = _dc_sweep_core(
            n, counts, layout, cells, rhs_cells, cfgk, gmin_floor, mode,
            n_pts, const_hi, const_lo,
            fold(dyn_hi), fold(dyn_lo), vs_st[0], vs_st[1],
            jv_zero[0], jv_zero[1], cpu_build=True)
    else:
        out, _jvout = pl.pallas_call(
            kernel,
            grid=(bp // blk,),
            in_specs=[vec(const_hi.shape[0])] * 2
                     + [vec(dyn_hi.shape[0])] * 2
                     + [vec2(n_pts * nv_), vec2(kj)],
            out_specs=(vec2(n_pts * (n + 2)), vec2(kj)),
            out_shape=(
                jax.ShapeDtypeStruct((2, n_pts * (n + 2), 8, bp // 8), f32),
                jax.ShapeDtypeStruct((2, kj, 8, bp // 8), f32),
            ),
        )(const_hi, const_lo, fold(dyn_hi), fold(dyn_lo), vs_st, jv_zero)
    o64 = (out[0].astype(f64) + out[1].astype(f64)).reshape(-1, bp)[:, :b]
    o64 = o64.reshape(n_pts, n + 2, b)
    xs = jnp.transpose(o64[:, :n, :], (2, 0, 1))   # (b, P, n)
    conv = jnp.transpose(o64[:, n + 1, :] > 0.5)   # (b, P)
    return xs, conv


def make_dc_fused(cc, src_slots, opts, semantics: str = "compat",
                  block: int | None = None):
    """Batched fused DC sweep: fn(params, state0, points) -> (xs, conv) with
    xs (b, P, np1) and conv (b, P).  Each sweep point is one kernel dispatch
    of the DC-flavor Newton (warm start + CheckConvergence, dc.go:142-187),
    junction voltages carried point to point — semantics identical to
    vmap(make_dc(...)).  By default the ENTIRE sweep is ONE kernel launch
    (``_dc_sweep_core``: a fori_loop over points around the in-kernel
    Newton, jv carried in VMEM); TOYSPICE_DC_SWEEP=scan falls back to a
    ``lax.scan`` of per-point kernel dispatches (the round-4 attribution
    measured ~1 ms/point of launch+glue on the scan path).

    The whole-sweep kernel's per-point vsrc read is a static select chain
    over all P points and its output write a (P, n+2, lanes) broadcast
    mask, so Mosaic compile time and scoped VMEM grow ~O(P^2)/O(P): sweeps
    longer than TOYSPICE_DC_SWEEP_KERNEL_MAX_PTS (default 128) fall back
    to the scan path automatically instead of blowing the 16M scoped-VMEM
    limit."""
    from ..models.sources import eval_sources, eval_sources_lanes

    why = op_fused_ineligible_reason(cc, semantics, opts)
    if why is not None:
        raise ValueError(f"circuit not eligible for the fused DC sweep: {why}")
    mode = "phys_be" if semantics == "physics" else "compat"
    counts, layout, n_const, n_state = _layout(cc)
    nr_, nc_, nl_, nlm_, nv_, ni_, nk_, nd_, nq_, nm_ = counts
    n = cc.np1
    kj = nd_ + 2 * nq_ + 3 * nm_
    cfgk = (opts.reltol, opts.abstol, opts.max_iter)
    if block is None:
        block = _default_block(cc)
    temp = opts.temp
    f64 = jnp.float64

    cells_s, rhs_cells_s = _build_plan(cc)
    cells_s = {k: tuple(v) for k, v in cells_s.items()}
    rhs_cells_s = {k: tuple(v) for k, v in rhs_cells_s.items()}
    use_kernel = os.environ.get("TOYSPICE_DC_SWEEP", "kernel") != "scan"

    def dc_fused(params, state0, points):
        b = _infer_batch(params, state0)
        max_pts = int(os.environ.get("TOYSPICE_DC_SWEEP_KERNEL_MAX_PTS",
                                     "128"))
        use_k = use_kernel and int(points.shape[0]) <= max_pts
        blk_eff = block
        if use_k:
            # the whole-sweep kernel's VMEM footprint scales with
            # P*(n+2)*blk (the per-point output carry, which Mosaic
            # DOUBLE-BUFFERS as grid blocks) + the augmented matrix: cap
            # the block so scoped VMEM stays under the 16M limit
            # (measured: n=4, P=40 OOMs at blk=3072 with 24.6M; a 5M
            # single-copy budget keeps the double-buffered total safe)
            n_pts_i = int(points.shape[0])
            per_lane = (8 * n_pts_i * (n + 2)
                        + 8 * (n + 2) * (n + 1) + 2000)
            blk_eff = min(block,
                          max(1024, (5_000_000 // per_lane)
                              // 1024 * 1024))
        blk, bp, w = _block_geometry(b, blk_eff)
        call = _make_call(cc, counts, layout, cfgk, "dc", opts.gmin,
                          n, kj, bp, blk, mode=mode)
        const64 = _const_stack64(cc, params, state0, counts, bp, temp)
        const_hi, const_lo = _hi_lo(const64)
        const_hi = const_hi.reshape(-1, 8, bp // 8)
        const_lo = const_lo.reshape(-1, 8, bp // 8)

        pv = _pad_src(params["V"], bp)
        t0 = jnp.zeros(bp, dtype=f64)
        if ni_:
            pi = _pad_src(params["I"], bp)
            isrc64 = eval_sources_lanes(cc.idx["I"]["stype"], pi, t0, bp)
        if nl_:
            lval = _lanes(params["L"]["value"], nl_, bp)
            i1 = (jnp.zeros((nl_, bp), dtype=f64)
                  if state0.get("L", {}).get("i1") is None
                  else _lanes(state0["L"]["i1"], nl_, bp))
            lrhs64 = lval / 1e-9 * i1

        lane = jnp.arange(bp)
        act_all = lane < b
        act_row = act_all.astype(f64)[None, :]
        zrow = jnp.zeros((1, bp), dtype=f64)
        x_zero = jnp.zeros((2, n, 8, bp // 8), dtype=jnp.float32)
        jv_zero = jnp.zeros((2, kj, 8, bp // 8), dtype=jnp.float32)

        if use_k:
            return _dc_sweep_call(
                cc, counts, layout, cells_s, rhs_cells_s, cfgk, opts.gmin,
                mode, src_slots, params, points, const_hi, const_lo,
                pv, t0, isrc64 if ni_ else None, lrhs64 if nl_ else None,
                b, bp, blk, n, kj)

        def step(jv_st, vals):
            pv2 = dict(pv)
            dc = pv["dc"]
            if len(src_slots) == 1:
                dc = dc.at[..., src_slots[0]].set(vals)
            else:
                dc = dc.at[..., src_slots[0]].set(vals[0])
                dc = dc.at[..., src_slots[1]].set(vals[1])
            pv2["dc"] = dc
            rows = [zrow, zrow, act_row,
                    eval_sources_lanes(cc.idx["V"]["stype"], pv2, t0, bp)]
            if ni_:
                rows.append(isrc64)
            if nl_:
                rows.append(lrhs64)
            x_st, _, conv, jv2 = call(const_hi, const_lo,
                                      jnp.concatenate(rows, axis=0),
                                      x_zero, jv_st)
            x64 = (x_st[0].astype(f64)
                   + x_st[1].astype(f64)).reshape(n, bp)[:, :b].T
            return jv2, (x64, conv[:b])

        _, (xs, conv) = jax.lax.scan(step, jv_zero, points)
        # scan stacks the point axis first: (P, b, ...) -> (b, P, ...)
        return jnp.swapaxes(xs, 0, 1), jnp.swapaxes(conv, 0, 1)

    return dc_fused
