"""Pallas TPU kernel: batched double-float Gauss-Jordan solve.

The batched MNA solve is the hot op of every analysis (one solve per Newton
iteration per timestep per Monte-Carlo instance).  The XLA fallback in
ops/solve.py already lays the batch out in the lane axis, but each of its
~8 vector ops per elimination stage runs as a separate emulated-f64 HLO.
This kernel fuses the whole elimination into one Pallas program over a
(n, n+1, BLOCK) working set in VMEM, with f64 values carried as *double-float*
(hi, lo) f32 pairs and Dekker/Knuth error-free transforms for +/×/÷.

Precision: double-float has a 48-bit effective mantissa (~3.6e-15 relative)
vs f64's 53 bits.  Newton convergence needs solver noise ≪ abstol=1e-12
(anlysis.go:38-41) on volt-scale solutions, so ~1e-14·|x| noise is far inside
tolerance; the XLA f64 path remains the reference semantics (and is what runs
on CPU, where f64 is native).

Pivoting matches ops/solve.py: partial pivoting by |column| with first-match
tie-break, one-hot row extraction (no gathers), and zero-pivot poisoning so a
structurally singular system returns a non-finite solution (Newton callers
treat that as non-converged).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 Dekker split constant: 2^12 + 1
_SPLIT = 4097.0


def _two_sum(a, b):
    """Error-free a + b -> (s, err)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free a * b -> (p, err) via Dekker splitting (no hardware FMA)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _df_add(ahi, alo, bhi, blo):
    s, e = _two_sum(ahi, bhi)
    e = e + (alo + blo)
    return _quick_two_sum(s, e)


def _df_mul(ahi, alo, bhi, blo):
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return _quick_two_sum(p, e)


def _df_recip(bhi, blo):
    """Double-float reciprocal: f32 estimate + one df Newton step."""
    q = 1.0 / bhi
    # r = 1 - b*q  (df)
    phi, plo = _df_mul(bhi, blo, q, jnp.zeros_like(q))
    rhi, rlo = _df_add(1.0, jnp.zeros_like(q), -phi, -plo)
    # q' = q + q*r
    chi, clo = _df_mul(q, jnp.zeros_like(q), rhi, rlo)
    return _df_add(q, jnp.zeros_like(q), chi, clo)


def _gj_kernel(n, ahi_ref, alo_ref, bhi_ref, blo_ref, xhi_ref, xlo_ref):
    f32 = jnp.float32
    blk = ahi_ref.shape[-1]
    # augmented working matrix (n, n+1, blk) as a hi/lo pair of values
    m_hi = jnp.concatenate([ahi_ref[...], bhi_ref[...][:, None, :]], axis=1)
    m_lo = jnp.concatenate([alo_ref[...], blo_ref[...][:, None, :]], axis=1)
    used = jnp.zeros((n, blk), dtype=jnp.bool_)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, blk), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (n + 1, blk), 0)
    zero_row = jnp.zeros((n + 1, blk), dtype=f32)
    prows = []
    for k in range(n):  # n is static: unrolled elimination stages
        mk_hi = m_hi[:, k, :]
        mk_lo = m_lo[:, k, :]
        col = jnp.where(used, f32(-1.0), jnp.abs(mk_hi))
        mx = jnp.max(col, axis=0)
        elig = (col == mx[None, :]) & ~used
        # int32 literal: Python ints promote to int64 under x64, which Mosaic
        # cannot lower (infinite legalization recursion)
        pidx = jnp.min(jnp.where(elig, rowid, jnp.int32(n)), axis=0)
        onehot = rowid == pidx[None, :]
        oh = onehot.astype(f32)
        # one-hot contraction is exact: exactly one term is nonzero
        piv_row_hi = jnp.sum(oh[:, None, :] * m_hi, axis=0)  # (n+1, blk)
        piv_row_lo = jnp.sum(oh[:, None, :] * m_lo, axis=0)
        piv_hi = piv_row_hi[k]
        piv_lo = piv_row_lo[k]
        bad = piv_hi == 0.0
        piv_hi = jnp.where(bad, f32(1.0), piv_hi)
        piv_lo = jnp.where(bad, f32(0.0), piv_lo)
        rhi, rlo = _df_recip(piv_hi, piv_lo)
        piv_row_hi, piv_row_lo = _df_mul(
            piv_row_hi, piv_row_lo, rhi[None, :], rlo[None, :]
        )
        # zero pivot ⇒ singular: poison the normalized row (x goes non-finite)
        poison = (colid != k) & bad[None, :]
        piv_row_hi = jnp.where(poison, f32(jnp.inf), piv_row_hi)
        piv_row_lo = jnp.where(poison, f32(0.0), piv_row_lo)
        piv_row_hi = jnp.where((colid == k) & bad[None, :], f32(1.0), piv_row_hi)
        f_hi = jnp.where(onehot, f32(0.0), mk_hi)
        f_lo = jnp.where(onehot, f32(0.0), mk_lo)
        q_hi, q_lo = _df_mul(
            f_hi[:, None, :], f_lo[:, None, :],
            piv_row_hi[None, :, :], piv_row_lo[None, :, :],
        )
        m_hi, m_lo = _df_add(m_hi, m_lo, -q_hi, -q_lo)
        m_hi = jnp.where(onehot[:, None, :], piv_row_hi[None, :, :], m_hi)
        m_lo = jnp.where(onehot[:, None, :], piv_row_lo[None, :, :], m_lo)
        used = used | onehot
        prows.append(oh)
    rhs_hi = m_hi[:, n, :]
    rhs_lo = m_lo[:, n, :]
    xhi_ref[...] = jnp.stack(
        [jnp.sum(prows[k] * rhs_hi, axis=0) for k in range(n)], axis=0
    )
    xlo_ref[...] = jnp.stack(
        [jnp.sum(prows[k] * rhs_lo, axis=0) for k in range(n)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_solve_batched(a, b, block: int = 512):
    """Solve a[i] @ x[i] = b[i] for a batch; a: (B, n, n) f64, b: (B, n) f64.

    Returns (B, n) f64 computed in double-float on the TPU VPU.  The batch is
    padded to a lane-aligned block multiple with identity systems.
    """
    bsz, n = b.shape
    blk = min(block, max(128, ((bsz + 127) // 128) * 128))
    padded = ((bsz + blk - 1) // blk) * blk
    if padded != bsz:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (padded - bsz, n, n))
        a = jnp.concatenate([a, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((padded - bsz, n), b.dtype)], axis=0)

    # batch-last layout: lanes carry the Monte-Carlo batch
    at = jnp.transpose(a, (1, 2, 0))  # (n, n, B)
    bt = jnp.transpose(b, (1, 0))  # (n, B)
    a_hi = at.astype(jnp.float32)
    a_lo = (at - a_hi.astype(jnp.float64)).astype(jnp.float32)
    b_hi = bt.astype(jnp.float32)
    b_lo = (bt - b_hi.astype(jnp.float64)).astype(jnp.float32)

    grid = (padded // blk,)
    # int32 literals in the index maps: under x64 a Python 0 traces as i64,
    # which Mosaic cannot return from the index-map function (numpy scalar,
    # not jnp: index maps must not capture tracers)
    zero = np.int32(0)
    mat_spec = pl.BlockSpec((n, n, blk), lambda i: (zero, zero, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((n, blk), lambda i: (zero, i),
                            memory_space=pltpu.VMEM)
    x_hi, x_lo = pl.pallas_call(
        functools.partial(_gj_kernel, n),
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=(vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, padded), jnp.float32),
            jax.ShapeDtypeStruct((n, padded), jnp.float32),
        ),
    )(a_hi, a_lo, b_hi, b_lo)
    x = x_hi.astype(jnp.float64) + x_lo.astype(jnp.float64)
    return jnp.transpose(x, (1, 0))[:bsz]
