"""Attribute the in-kernel Newton iteration cost (bjt2-shaped, n=7, one BJT)
by timing the body with pieces toggled off, on real TPU.

Round-2 finding: bjt2 measures ~95 us per (8,128)-tile iteration while the
sum of measured per-op costs is ~25 us; the residual was unattributed and the
analytic-Jacobian rewrite (round 3) did not move end-to-end throughput —
so the eval is NOT the bottleneck and this script exists to find what is.

Pieces (cumulative, innermost first):
    gj       Gauss-Jordan eliminate at n=7 on the stacked matrix
    build    restacking the (n, n+1, 8, W) matrix from cells each iteration
    eval     analytic Ebers-Moll Jacobian (2 df_exp + chain)
    limit    two pnjlim junction updates
    conv     reference convergence test over n rows
    carry    per-lane freeze selects + while_loop w/ cross-lane cond

    python tests/tools/attrib_newton.py [W] [ITERS]
"""

import functools
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import toyspice_tpu  # noqa: F401
from toyspice_tpu.ops.pallas_solve import (_df_add, _df_mul, _df_recip,
                                           _gj_eliminate, _unpinned)
from toyspice_tpu.ops.df_math import df_exp
from toyspice_tpu.ops.pallas_tran import (_df_abs, _df_const, _df_gt,
                                          _df_max, _df_neg, _df_where,
                                          _pnjlim_df)

W = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
SHAPE = (8, W)
N = 7  # bjt2: 4 nodes + ground + 2 branch rows


def body_kernel(pieces, n_iter, xh_ref, xl_ref, oh_ref, ol_ref):
    f32 = jnp.float32
    lanes = SHAPE
    zero = jnp.zeros(lanes, dtype=f32)
    one_df = (jnp.ones(lanes, dtype=f32), zero)
    zz = (zero, zero)
    c40 = _df_const(40.0, lanes)
    # impossible tolerance: the timing loop must never converge-exit early
    # (the real kernel's x reaches its fixed point in a few iterations)
    rel_c = _df_const(-1.0, lanes)
    abs_c = _df_const(-1.0, lanes)
    vte = _df_const(0.02585, lanes)
    invvte = _df_const(1.0 / 0.02585, lanes)
    vcr = _df_const(0.7, lanes)
    invnfvt = invvte
    sies = _df_const(1e-14, lanes)
    invvaf = _df_const(0.01, lanes)
    invik = _df_const(1e3, lanes)
    alphaf = _df_const(0.98, lanes)

    # loop-invariant base cells (linear part), ~16 nonzero like bjt2
    x0 = (xh_ref[...], xl_ref[...])
    base = {}
    rng_cells = [(i, j) for i in range(1, N) for j in range(N + 1)][:16]
    for m, (i, j) in enumerate(rng_cells):
        base[(i, j)] = _df_mul(*x0, *_df_const(1.0 + 0.1 * m, lanes))

    def q_jac(vbe, vbc):
        """Analytic chain, same op mix as pallas_tran q_jacobian (one
        junction pair; forward Early + knee only to match bjt2's op count
        roughly — both junction paths are computed there, so double it)."""
        outs = []
        for v in (vbe, vbc):
            a1 = _df_mul(*v, *invnfvt)
            cl1 = _df_gt(a1, c40)
            e1 = df_exp(*_df_where(cl1, c40, a1))
            f0 = _df_mul(*sies, *_df_add(*e1, *_df_neg(one_df)))
            df0 = _df_where(cl1, zz, _df_mul(*_df_mul(*sies, *e1), *invnfvt))
            u = _df_add(*one_df, *_df_neg(_df_mul(*vbc, *invvaf)))
            f1 = _df_mul(*f0, *u)
            df1 = _df_mul(*df0, *u)
            absf1 = _df_abs(f1)
            iku = _df_mul(*invik, *u)
            den = _df_add(*one_df, *_df_mul(*absf1, *iku))
            invd = _df_recip(*den)
            f2 = _df_mul(*f1, *invd)
            dden = _df_where(f1[0] < 0, _df_neg(_df_mul(*df1, *iku)),
                             _df_mul(*df1, *iku))
            df2 = _df_mul(*_df_add(*df1, *_df_neg(_df_mul(*f2, *dden))),
                          *invd)
            outs.append((f2, df2))
        (f2, df2), (r2, dr2) = outs
        ic = _df_mul(*alphaf, *_df_add(*f2, *_df_neg(r2)))
        ib = _df_add(*f2, *_df_neg(ic))
        return ic, ib, df2, dr2, _df_mul(*alphaf, *df2), _df_mul(*alphaf, *dr2)

    def body(carry):
        k, conv, x_hi, x_lo, jbe_h, jbe_l, jbc_h, jbc_l = carry
        active = (conv == 0) & (k < jnp.int32(10 ** 9))

        vbe, vbc = (jbe_h, jbe_l), (jbc_h, jbc_l)
        if "limit" in pieces:
            vnew = _df_add(x_hi[1], x_lo[1], *_df_neg((x_hi[2], x_lo[2])))
            vbe = _pnjlim_df(vnew, vbe, vte, invvte, vcr, lanes)
            vnew2 = _df_add(x_hi[1], x_lo[1], *_df_neg((x_hi[3], x_lo[3])))
            vbc = _pnjlim_df(vnew2, vbc, vte, invvte, vcr, lanes)

        extra = {}
        if "eval" in pieces:
            ic, ib, g11, g12, g21, g22 = q_jac(vbe, vbc)
            for m, g in enumerate((g11, g12, g21, g22, ic, ib,
                                   _df_add(*g11, *g12), _df_add(*g21, *g22),
                                   _df_add(*ic, *ib))):
                extra[(1 + m % 3, 1 + (m * 2) % 5)] = g
            for m, r in enumerate((ic, ib, _df_add(*ic, *ib))):
                extra[(1 + m, N)] = r

        if "build" in pieces:
            rows_h, rows_l = [], []
            for i in range(N):
                ch, cl = [], []
                for j in range(N + 1):
                    if i == 0:
                        p = one_df if j == 0 else zz
                    else:
                        p = base.get((i, j), zz)
                        e = extra.get((i, j))
                        if e is not None:
                            p = _df_add(*p, *e)
                    ch.append(p[0])
                    cl.append(p[1])
                rows_h.append(jnp.stack(ch, axis=0))
                rows_l.append(jnp.stack(cl, axis=0))
            m_hi = jnp.stack(rows_h, axis=0)
            m_lo = jnp.stack(rows_l, axis=0)
        else:
            m_hi = jnp.broadcast_to(x_hi[0][None, None] + jnp.float32(3.0),
                                    (N, N + 1) + lanes)
            m_lo = jnp.zeros((N, N + 1) + lanes, jnp.float32)

        if "gj" in pieces:
            x2_hi, x2_lo = _gj_eliminate(N, m_hi, m_lo)
        else:
            x2_hi = x_hi + m_hi[0, 0][None] * jnp.float32(1e-20)
            x2_lo = x_lo

        if "conv" in pieces:
            allok = None
            finite = None
            for r in range(N):
                new = (x2_hi[r], x2_lo[r])
                old = (x_hi[r], x_lo[r])
                d = _df_abs(_df_add(*new, *_df_neg(old)))
                amax = _df_max(_df_abs(new), _df_abs(old))
                tol = _df_add(*_df_mul(*amax, *rel_c), *abs_c)
                okr = ~_df_gt(d, tol)
                fin = jnp.isfinite(x2_hi[r]) & jnp.isfinite(x2_lo[r])
                allok = okr if allok is None else (allok & okr)
                finite = fin if finite is None else (finite & fin)
            conv_new = (k > jnp.int32(0)) & finite & allok
        else:
            conv_new = k >= jnp.int32(10 ** 9)

        if "carry" in pieces:
            act_r = active[None]
            x_hi_n = jnp.where(act_r, x2_hi, x_hi)
            x_lo_n = jnp.where(act_r, x2_lo, x_lo)
            jbe_n = (jnp.where(active, vbe[0], jbe_h),
                     jnp.where(active, vbe[1], jbe_l))
            jbc_n = (jnp.where(active, vbc[0], jbc_h),
                     jnp.where(active, vbc[1], jbc_l))
            conv_n = jnp.where(active, conv_new.astype(jnp.int32), conv)
            k_n = k + active.astype(jnp.int32)
        else:
            x_hi_n, x_lo_n = x2_hi, x2_lo
            jbe_n, jbc_n = vbe, vbc
            conv_n = conv
            k_n = k + 1
        return (k_n, conv_n, x_hi_n, x_lo_n,
                jbe_n[0], jbe_n[1], jbc_n[0], jbc_n[1])

    zn = jnp.zeros((N,) + SHAPE, dtype=jnp.float32)
    jv0 = _df_const(0.65, lanes)
    # data-dependent zero: a literal-zeros int carry const-folds to a
    # replicated Mosaic layout and trips a relayout bug on the carry add
    zi = (xh_ref[...] * jnp.float32(0.0)).astype(jnp.int32)
    init = (zi, zi, zn, zn, jv0[0], jv0[1], jv0[0], jv0[1])

    if "carry" in pieces:
        def cond(c):
            pending = ((c[1] == 0)
                       & (c[0] < jnp.int32(n_iter))).astype(jnp.int32)
            return jnp.max(pending) > 0

        out = jax.lax.while_loop(cond, body, init)
    else:
        out = jax.lax.fori_loop(0, n_iter, lambda _, c: body(c), init)
    oh_ref[...] = out[2]
    ol_ref[...] = out[3]


def timed(pieces, n_iter):
    kern = _unpinned(functools.partial(body_kernel, pieces, n_iter))
    spec = pl.BlockSpec(SHAPE, lambda: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((N,) + SHAPE, lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    osh = (jax.ShapeDtypeStruct((N,) + SHAPE, jnp.float32),) * 2
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern, in_specs=[spec, spec], out_specs=(ospec, ospec), out_shape=osh,
    )(a, b))
    xh = jnp.full(SHAPE, 0.001, jnp.float32)
    xl = jnp.zeros(SHAPE, jnp.float32)
    r = f(xh, xl)
    float(np.asarray(r[0]).sum())
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        r = f(xh, xl)
    float(np.asarray(r[0]).sum())
    return (time.time() - t0) / reps


ALL = ("carry", "conv", "gj", "build", "eval", "limit")


def main():
    print(f"tile {SHAPE}, n={N}, iters {ITERS} (differenced vs {ITERS // 4})")
    results = {}
    # cumulative removal: full -> drop one piece at a time
    sets = [ALL]
    for cut in ("eval", "limit", "conv", "build", "gj"):
        sets.append(tuple(p for p in sets[-1] if p != cut))
    for pieces in sets:
        d_hi = timed(pieces, ITERS)
        d_lo = timed(pieces, ITERS // 4)
        per = (d_hi - d_lo) / (ITERS - ITERS // 4)
        results[pieces] = per
        print(f"{'+'.join(pieces) or '(empty)':>42}: {per*1e6:8.2f} us/iter",
              flush=True)
    keys = list(results)
    for a, b in zip(keys, keys[1:]):
        gone = set(a) - set(b)
        print(f"  cost of {gone}: {(results[a]-results[b])*1e6:8.2f} us/iter")


if __name__ == "__main__":
    main()
