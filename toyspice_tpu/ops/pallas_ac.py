"""Fused AC stamped-solve Pallas kernel.

The batched AC path (engine/ac.py make_ac_batch) was round-4's last
unfused analysis stage: it assembled the real 2N-block system
[[G, -ωB̂], [ωB̂, G]] with emulated-f64 XLA scatters at EVERY (instance,
frequency) pair — B·F dense (2N)² systems materialized through HBM — then
solved through the generic Pallas GJ (1.19M solves/s on the bjt3 row vs
330M transient in-kernel solves/s, BENCH_MATRIX round 4).

Two structural facts make the fused design simple:

1. The AC system is EXACTLY LINEAR in ω (ac.go:51-98 semantics): G (bias
   conductances, branch patterns, ground rows) and the susceptance base B̂
   (C_t, L, Leff, M, junction/Meyer caps at the bias) are ω-independent,
   and the RHS phasors don't depend on ω at all.  So ONE call of the
   existing ``assemble_system_ac`` at ω = 1 per INSTANCE (B lanes, f64,
   all device semantics shared verbatim) yields G = a2[:N,:N] and
   B̂ = a2[N:,:N] with the ground rows already baked.
2. Per (instance, frequency) all that remains is: scale B̂ by ω, place the
   four blocks, Gauss-Jordan-solve 2N — exactly the build+GJ machinery
   the transient kernel runs, so it lives in ONE kernel over the
   flattened B·F lane axis with ω as a per-lane row.  No (B, F, 2N, 2N)
   HBM tensor exists at all.

Numerical class: double-float solve (~48-bit), same as every other fused
analysis; the general path solves the same df GJ (ops/pallas_solve.py), so
A/B differences are confined to the in-kernel ω·B̂ product rounding.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_solve import _df_mul, _gj_eliminate, _unpinned
from .pallas_tran import FUSED_KINDS, _df_neg, _hi_lo


def ac_fused_ineligible_reason(cc, semantics: str = "compat", opts=None,
                               params=None):
    """Why this circuit can NOT use the fused AC solve; None when it can.
    Unlike the fused OP, linear circuits qualify too (the win is the
    per-frequency build+solve, not a Newton loop)."""
    if semantics not in ("compat", "physics"):
        return f"semantics={semantics!r}"
    extra = set(cc.idx.keys()) - FUSED_KINDS
    if extra:
        return f"device kinds {sorted(extra)} not supported by the kernel"
    return None


def ac_fused_eligible(cc, semantics: str = "compat", opts=None,
                      params=None) -> bool:
    return ac_fused_ineligible_reason(cc, semantics, opts, params) is None


def _ac_core(np1, g_hi, g_lo, b_hi, b_lo, r_hi, r_lo, om_hi, om_lo):
    """Per-lane AC system build + GJ solve as a pure array function.

    g/b: (N*N, *lanes) row-major dense G and B̂ stacks; r: (2N,) RHS rows;
    om: ω rows.  Returns the (2, 2N, *lanes) solution stack."""
    n2 = 2 * np1
    om = (om_hi[0], om_lo[0])

    def g(i, j):
        return (g_hi[i * np1 + j], g_lo[i * np1 + j])

    def bw(i, j):
        return _df_mul(*om, *(b_hi[i * np1 + j], b_lo[i * np1 + j]))

    row_his, row_los = [], []
    for i in range(n2):
        col_his, col_los = [], []
        for j in range(n2):
            if i < np1 and j < np1:
                p = g(i, j)
            elif i < np1:
                p = _df_neg(bw(i, j - np1))
            elif j < np1:
                p = bw(i - np1, j)
            else:
                p = g(i - np1, j - np1)
            col_his.append(p[0])
            col_los.append(p[1])
        col_his.append(r_hi[i])
        col_los.append(r_lo[i])
        row_his.append(jnp.stack(col_his, axis=0))
        row_los.append(jnp.stack(col_los, axis=0))
    m_hi = jnp.stack(row_his, axis=0)
    m_lo = jnp.stack(row_los, axis=0)
    x_hi, x_lo = _gj_eliminate(n2, m_hi, m_lo)
    return jnp.stack([jnp.stack([x_hi[i] for i in range(n2)]),
                      jnp.stack([x_lo[i] for i in range(n2)])])


@_unpinned
def _ac_kernel(np1, g_ref, b_ref, r_ref, om_ref, out_ref):
    out_ref[...] = _ac_core(
        np1, g_ref[0], g_ref[1], b_ref[0], b_ref[1],
        r_ref[0], r_ref[1], om_ref[0], om_ref[1])


def ac_solve_batch(cc, a2_1, b2, freqs, block: int | None = None):
    """Solve the AC sweep for every (instance, frequency) pair in ONE
    kernel launch.

    ``a2_1``: (B, 2N, 2N) block system assembled at ω = 1 (f64);
    ``b2``: (B, 2N) RHS; ``freqs``: (F,) Hz.  Returns x2 (B, F, 2N) f64."""
    np1 = cc.np1
    n2 = 2 * np1
    f64 = jnp.float64
    bsz = a2_1.shape[0]
    nf = freqs.shape[0]
    bf = bsz * nf
    if block is None:
        from .pallas_op import _default_block
        block = _default_block(cc)
    from .pallas_op import _block_geometry
    blk, bp, w = _block_geometry(bf, block)

    g64 = a2_1[:, :np1, :np1].reshape(bsz, np1 * np1)
    bh64 = a2_1[:, np1:, :np1].reshape(bsz, np1 * np1)

    def lanes(v):
        # (B, R) per-instance rows -> (R, B*F) with lane = b*F + f, padded
        out = jnp.repeat(v, nf, axis=0).T
        if out.shape[1] != bp:
            out = jnp.pad(out, ((0, 0), (0, bp - out.shape[1])))
        return out

    om64 = jnp.tile(2.0 * jnp.pi * jnp.asarray(freqs, dtype=f64), bsz)
    if om64.shape[0] != bp:
        om64 = jnp.pad(om64, (0, bp - om64.shape[0]))

    def fold(x):
        return x.reshape(x.shape[0], 8, bp // 8)

    def st(v64):
        hi, lo = _hi_lo(v64)
        return jnp.stack([fold(hi), fold(lo)])

    g_st = st(lanes(g64))
    b_st = st(lanes(bh64))
    r_st = st(lanes(b2))
    om_st = st(om64[None, :])

    zero = np.int32(0)

    def vec2(rows_):
        return pl.BlockSpec((2, rows_, 8, w),
                            lambda i: (zero, zero, zero, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_ac_kernel, np1)
    if os.environ.get("TOYSPICE_TRAN_IMPL", "kernel") == "xla":
        out = _ac_core(np1, g_st[0], g_st[1], b_st[0], b_st[1],
                       r_st[0], r_st[1], om_st[0], om_st[1])
    else:
        out = pl.pallas_call(
            kernel,
            grid=(bp // blk,),
            in_specs=[vec2(np1 * np1), vec2(np1 * np1), vec2(n2), vec2(1)],
            out_specs=vec2(n2),
            out_shape=jax.ShapeDtypeStruct((2, n2, 8, bp // 8),
                                           jnp.float32),
        )(g_st, b_st, r_st, om_st)
    x64 = (out[0].astype(f64) + out[1].astype(f64)).reshape(n2, bp)[:, :bf]
    return jnp.transpose(x64, (1, 0)).reshape(bsz, nf, n2)
