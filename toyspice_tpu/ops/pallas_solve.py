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

import contextlib
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# --- compiler-opaqueness for the error-free transforms -----------------
#
# The df algebra below is only correct if every marked sum/product is the
# IEEE-ROUNDED f32 value.  Two compiler behaviors break that (both proven
# on this toolchain by simulating the optimized HLO in strict per-op IEEE
# f32 — correct — vs executing it — corrupted lo limbs):
#
#  1. XLA's HLO algebraic simplifier rewrites ``(x + c) - c -> x`` for f32,
#     deleting the rounding that _two_sum exists to measure.
#  2. XLA:CPU fusion codegen (LLVM) contracts ``a*b`` into a consuming
#     add/sub as fma, skipping the product rounding that _two_prod
#     measures.  A plain bitcast round-trip does NOT help: it is an
#     identity, and the HLO simplifier strips it before codegen.
#
# `_pin(x)` defeats both by routing the value through the integer domain
# with a zero the compiler cannot prove to be zero (``min(|x|,1) * 0``:
# float mul-by-zero is not foldable without fast-math because the other
# operand could be NaN).  The min-abs keeps the derived zero actually zero
# for ALL x including ±inf, and for NaN x the pin output stays non-finite,
# preserving the zero-pivot poisoning contract.
#
# Inside Mosaic (real-TPU Pallas kernels) the pin is disabled: Mosaic
# lowers each jaxpr op separately and performs neither rewrite (validated
# by the on-TPU A/B over the full fixture matrix, PARITY.md), and the pin
# would cost ~30% extra VPU ops in the hottest kernels.  Kernel bodies are
# traced under `unpinned_trace()`; every XLA-traced use (the fused-tran
# XLA impl, CPU tests) keeps the default pinned mode.

_PIN_DF = True


@contextlib.contextmanager
def unpinned_trace():
    """Disable _pin while tracing a Mosaic kernel body (see note above)."""
    global _PIN_DF
    prev = _PIN_DF
    _PIN_DF = False
    try:
        yield
    finally:
        _PIN_DF = prev


def _pin(x):
    """Pin x's IEEE rounding against compiler rewrites (see note above)."""
    if not _PIN_DF:
        return x
    zf = jnp.minimum(jnp.abs(x), jnp.float32(1.0)) * jnp.float32(0.0)
    zi = jax.lax.bitcast_convert_type(zf, jnp.int32)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32) + zi, jnp.float32)


# Alias kept for df_math's transcendental seeds; same protection.
_exact = _pin


def _unpinned(fn):
    """Decorator: trace a Mosaic kernel body with _pin disabled."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with unpinned_trace():
            return fn(*args, **kwargs)
    return wrapper


def _two_sum(a, b):
    """Error-free a + b -> (s, err)."""
    s = _pin(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b|."""
    s = _pin(a + b)
    err = b - (s - a)
    return s, err


def _split(a):
    """Split a into hi (top 12 significand bits) + lo (bottom 12), exactly.

    Bitmask split instead of the classical Dekker `t = a*4097; hi = t-(t-a)`:
    XLA CPU's LLVM backend contracts the Dekker multiply into the subsequent
    subtract (fma), which silently breaks the split — measured as f32-class
    (2^-24 rel) noise on df results inside large jitted fusions, while the
    same optimized HLO simulated with strict per-op IEEE f32 rounding is
    correct.  Masking the low 12 mantissa bits has no multiply to contract,
    `a - hi` is exact (hi agrees with a's top bits), and both halves carry
    <= 12 significant bits so every product of halves in `_two_prod` is
    exactly representable in f32 — making the transform immune to fma
    contraction on every backend (XLA CPU, Mosaic) by construction.

    The mask rounds (adds the bit-11 carry before masking) rather than
    truncates: the rounded split leaves lo with 11 bits + sign, which is
    what Dekker's exactness theorem for the two_prod error sequence
    requires; a truncating mask (12-bit lo) loses it and the error term
    rounds at ~2^-34 relative.  A mantissa carry into the exponent is the
    correct round-up to the next binade."""
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        (bits + jnp.int32(2048)) & jnp.int32(-4096), jnp.float32)
    return hi, a - hi


def _two_prod(a, b):
    """Error-free a * b -> (p, err) via exact bitmask splitting (no fma).

    Only p needs pinning: every product of split halves is exactly
    representable, so contracting one into an add/sub changes nothing."""
    p = _pin(a * b)
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


def _gj_eliminate(n, m_hi, m_lo):
    """Shared one-hot pivoted Gauss-Jordan over a (n, n+1, *lanes) double-float
    augmented stack; returns (x_hi, x_lo) of shape (n, *lanes).  The lane
    shape is arbitrary trailing dims — 1-D (blk,) for the solve kernel, 2-D
    (8, W) sublane-dense tiles for the fused transient kernel."""
    f32 = jnp.float32
    lanes = m_hi.shape[2:]
    used = jnp.zeros((n,) + lanes, dtype=jnp.bool_)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n,) + lanes, 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (n + 1,) + lanes, 0)
    prows = []
    for k in range(n):  # n is static: unrolled elimination stages
        mk_hi = m_hi[:, k]
        mk_lo = m_lo[:, k]
        col = jnp.where(used, f32(-1.0), jnp.abs(mk_hi))
        mx = jnp.max(col, axis=0)
        elig = (col == mx[None]) & ~used
        # int32 literal: Python ints promote to int64 under x64, which Mosaic
        # cannot lower (infinite legalization recursion)
        pidx = jnp.min(jnp.where(elig, rowid, jnp.int32(n)), axis=0)
        onehot = rowid == pidx[None]
        oh = onehot.astype(f32)
        # one-hot contraction is exact: exactly one term is nonzero
        piv_row_hi = jnp.sum(oh[:, None] * m_hi, axis=0)  # (n+1, *lanes)
        piv_row_lo = jnp.sum(oh[:, None] * m_lo, axis=0)
        piv_hi = piv_row_hi[k]
        piv_lo = piv_row_lo[k]
        bad = piv_hi == 0.0
        piv_hi = jnp.where(bad, f32(1.0), piv_hi)
        piv_lo = jnp.where(bad, f32(0.0), piv_lo)
        rhi, rlo = _df_recip(piv_hi, piv_lo)
        piv_row_hi, piv_row_lo = _df_mul(
            piv_row_hi, piv_row_lo, rhi[None], rlo[None]
        )
        # zero pivot ⇒ singular: poison the normalized row (x goes non-finite)
        poison = (colid != k) & bad[None]
        piv_row_hi = jnp.where(poison, f32(jnp.inf), piv_row_hi)
        piv_row_lo = jnp.where(poison, f32(0.0), piv_row_lo)
        piv_row_hi = jnp.where((colid == k) & bad[None], f32(1.0), piv_row_hi)
        f_hi = jnp.where(onehot, f32(0.0), mk_hi)
        f_lo = jnp.where(onehot, f32(0.0), mk_lo)
        q_hi, q_lo = _df_mul(
            f_hi[:, None], f_lo[:, None],
            piv_row_hi[None], piv_row_lo[None],
        )
        m_hi, m_lo = _df_add(m_hi, m_lo, -q_hi, -q_lo)
        m_hi = jnp.where(onehot[:, None], piv_row_hi[None], m_hi)
        m_lo = jnp.where(onehot[:, None], piv_row_lo[None], m_lo)
        used = used | onehot
        prows.append(oh)
    rhs_hi = m_hi[:, n]
    rhs_lo = m_lo[:, n]
    x_hi = jnp.stack([jnp.sum(prows[k] * rhs_hi, axis=0) for k in range(n)],
                     axis=0)
    x_lo = jnp.stack([jnp.sum(prows[k] * rhs_lo, axis=0) for k in range(n)],
                     axis=0)
    return x_hi, x_lo


@_unpinned
def _gj_kernel(n, ahi_ref, alo_ref, bhi_ref, blo_ref, xhi_ref, xlo_ref):
    # augmented working matrix (n, n+1, *lanes) as a hi/lo pair of values
    m_hi = jnp.concatenate([ahi_ref[...], bhi_ref[...][:, None]], axis=1)
    m_lo = jnp.concatenate([alo_ref[...], blo_ref[...][:, None]], axis=1)
    xhi_ref[...], xlo_ref[...] = _gj_eliminate(n, m_hi, m_lo)


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_solve_batched(a, b, block: int | None = None):
    """Solve a[i] @ x[i] = b[i] for a batch; a: (B, n, n) f64, b: (B, n) f64.

    Returns (B, n) f64 computed in double-float on the TPU VPU.  The batch is
    padded to a lane-aligned block multiple with identity systems.  Batches
    >= 1024 fold lanes to sublane-dense (8, W) tiles (8x VPU issue density).
    """
    import os

    bsz, n = b.shape
    folded = bsz >= 1024
    if block is None:
        block = int(os.environ.get("TOYSPICE_BLOCK",
                                   "1024" if folded else "512"))
    if folded:
        blk = max(1024, ((min(block, bsz) + 1023) // 1024) * 1024)
    else:
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
    if folded:
        w = blk // 8
        a_hi = a_hi.reshape(n, n, 8, padded // 8)
        a_lo = a_lo.reshape(n, n, 8, padded // 8)
        b_hi = b_hi.reshape(n, 8, padded // 8)
        b_lo = b_lo.reshape(n, 8, padded // 8)
        mat_spec = pl.BlockSpec((n, n, 8, w), lambda i: (zero, zero, zero, i),
                                memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((n, 8, w), lambda i: (zero, zero, i),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n, 8, padded // 8), jnp.float32)
    else:
        mat_spec = pl.BlockSpec((n, n, blk), lambda i: (zero, zero, i),
                                memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((n, blk), lambda i: (zero, i),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n, padded), jnp.float32)
    x_hi, x_lo = pl.pallas_call(
        functools.partial(_gj_kernel, n),
        grid=grid,
        in_specs=[mat_spec, mat_spec, vec_spec, vec_spec],
        out_specs=(vec_spec, vec_spec),
        out_shape=(out_sds, out_sds),
    )(a_hi, a_lo, b_hi, b_lo)
    x = x_hi.astype(jnp.float64) + x_lo.astype(jnp.float64)
    if folded:
        x = x.reshape(n, padded)
    return jnp.transpose(x, (1, 0))[:bsz]


# ---------------------------------------------------------------------------
# Fused build+solve: consume the flat stamp-entry vectors directly.
#
# assemble_entries (ops/assemble.py) returns static (row, col) index arrays
# and traced per-entry values.  Scattering those into a dense (B, n, n) f64
# system and re-laying it out batch-last costs more XLA ops per Newton
# iteration than the solve itself.  Here the kernel receives the (nnz, B)
# value stack and builds the augmented double-float matrix directly in VMEM
# with exact per-cell compensated sums (cells have 1-4 contributions; the
# groups are unrolled host-side), applies the ground row and the gmin
# diagonal, and runs the shared elimination.
# ---------------------------------------------------------------------------


def _cell_groups(n, rows, cols, rrows):
    """Host-side grouping: (i, j) cell -> list of flat entry indices.
    Column n holds the RHS (indices into rvals)."""
    mat = {}
    for e, (i, j) in enumerate(zip(rows.tolist(), cols.tolist())):
        mat.setdefault((i, j), []).append(e)
    rhs = {}
    for e, i in enumerate(rrows.tolist()):
        rhs.setdefault(i, []).append(e)
    return mat, rhs


@_unpinned
def _build_solve_kernel(n, mat_cells, rhs_cells,
                        vhi_ref, vlo_ref, rhi_ref, rlo_ref,
                        ghi_ref, glo_ref, xhi_ref, xlo_ref):
    # Lane shape is the refs' trailing dims: 1-D (blk,) for small batches,
    # sublane-dense (8, W) for large ones (see pallas_path) — a 1-D layout
    # occupies 1 of 8 sublanes of the f32 vreg and issue-binds the kernel
    # at 1/8th VPU utilization.
    f32 = jnp.float32
    lanes = vhi_ref.shape[1:]
    zero = jnp.zeros(lanes, dtype=f32)
    one = jnp.ones(lanes, dtype=f32)
    g_hi = ghi_ref[0]
    g_lo = glo_ref[0]

    def cell_sum(src_hi, src_lo, entries, extra=None):
        if not entries and extra is None:
            return zero, zero
        if entries:
            hi, lo = src_hi[entries[0]], src_lo[entries[0]]
            for e in entries[1:]:
                hi, lo = _df_add(hi, lo, src_hi[e], src_lo[e])
        else:
            hi, lo = zero, zero
        if extra is not None:
            hi, lo = _df_add(hi, lo, extra[0], extra[1])
        return hi, lo

    row_his, row_los = [], []
    for i in range(n):
        col_his, col_los = [], []
        for j in range(n + 1):
            if i == 0:
                # ground row: x[0] = 0 (identity row, zero RHS)
                col_his.append(one if j == 0 else zero)
                col_los.append(zero)
                continue
            if j == n:
                hi, lo = cell_sum(rhi_ref, rlo_ref, rhs_cells.get(i, []))
            else:
                extra = (g_hi, g_lo) if i == j else None
                hi, lo = cell_sum(vhi_ref, vlo_ref,
                                  mat_cells.get((i, j), []), extra)
            col_his.append(hi)
            col_los.append(lo)
        row_his.append(jnp.stack(col_his, axis=0))
        row_los.append(jnp.stack(col_los, axis=0))
    m_hi = jnp.stack(row_his, axis=0)  # (n, n+1, *lanes)
    m_lo = jnp.stack(row_los, axis=0)
    xhi_ref[...], xlo_ref[...] = _gj_eliminate(n, m_hi, m_lo)


def _hi_lo(x64):
    hi = x64.astype(jnp.float32)
    return hi, (x64 - hi.astype(jnp.float64)).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _solve_stamped_cached(n, rows_b, cols_b, rrows_b):
    rows = np.frombuffer(rows_b, dtype=np.int32)
    cols = np.frombuffer(cols_b, dtype=np.int32)
    rrows = np.frombuffer(rrows_b, dtype=np.int32)
    nnz = len(rows)
    nrhs = len(rrows)
    diag = np.arange(1, n)
    mat_cells, rhs_cells = _cell_groups(n, rows, cols, rrows)
    kernel = functools.partial(_build_solve_kernel, n, mat_cells, rhs_cells)

    def dense(vals, rvals, gmin):
        """Batched dense build via scatter (the XLA path)."""
        bsz = vals.shape[0]
        a = jnp.zeros((bsz, n, n), dtype=vals.dtype)
        a = a.at[:, rows, cols].add(vals)
        b = jnp.zeros((bsz, n), dtype=vals.dtype)
        if nrhs:
            b = b.at[:, rrows].add(rvals)
        a = a.at[:, 0, :].set(0.0)
        a = a.at[:, 0, 0].set(1.0)
        b = b.at[:, 0].set(0.0)
        a = a.at[:, diag, diag].add(gmin[:, None])
        return a, b

    def pallas_path(vals, rvals, gmin, block=None):
        import os

        bsz = vals.shape[0]
        if nrhs == 0:  # keep the ref shapes static: one dummy zero row
            rvals = jnp.zeros((bsz, 1), vals.dtype)
        # >=1024 lanes: fold to sublane-dense (8, W) tiles (8x VPU issue
        # density); below that the padding waste outweighs the win, keep 1-D
        folded = bsz >= 1024
        if block is None:
            block = int(os.environ.get("TOYSPICE_BLOCK",
                                       "1024" if folded else "512"))
        if folded:
            blk = max(1024, ((min(block, bsz) + 1023) // 1024) * 1024)
        else:
            blk = min(block, max(128, ((bsz + 127) // 128) * 128))
        padded = ((bsz + blk - 1) // blk) * blk
        if padded != bsz:
            pad = padded - bsz
            vals = jnp.concatenate(
                [vals, jnp.zeros((pad, nnz), vals.dtype)], axis=0)
            rvals = jnp.concatenate(
                [rvals, jnp.zeros((pad, max(nrhs, 1)), rvals.dtype)], axis=0)
            gmin = jnp.concatenate([gmin, jnp.zeros(pad, gmin.dtype)], axis=0)
        v_hi, v_lo = _hi_lo(jnp.transpose(vals, (1, 0)))  # (nnz, B)
        r_hi, r_lo = _hi_lo(jnp.transpose(rvals, (1, 0)))
        g_hi, g_lo = _hi_lo(gmin[None, :])  # (1, B)

        zero = np.int32(0)
        if folded:
            w = blk // 8

            def fold(x):
                return x.reshape(x.shape[0], 8, padded // 8)

            v_hi, v_lo = fold(v_hi), fold(v_lo)
            r_hi, r_lo = fold(r_hi), fold(r_lo)
            g_hi, g_lo = fold(g_hi), fold(g_lo)

            def vec(rows_):
                return pl.BlockSpec((rows_, 8, w), lambda i: (zero, zero, i),
                                    memory_space=pltpu.VMEM)

            out_sds = jax.ShapeDtypeStruct((n, 8, padded // 8), jnp.float32)
        else:
            def vec(rows_):
                return pl.BlockSpec((rows_, blk), lambda i: (zero, i),
                                    memory_space=pltpu.VMEM)

            out_sds = jax.ShapeDtypeStruct((n, padded), jnp.float32)

        x_hi, x_lo = pl.pallas_call(
            kernel,
            grid=(padded // blk,),
            in_specs=[vec(nnz), vec(nnz), vec(max(nrhs, 1)), vec(max(nrhs, 1)),
                      vec(1), vec(1)],
            out_specs=(vec(n), vec(n)),
            out_shape=(out_sds, out_sds),
        )(v_hi, v_lo, r_hi, r_lo, g_hi, g_lo)
        x = x_hi.astype(jnp.float64) + x_lo.astype(jnp.float64)
        if folded:
            x = x.reshape(n, padded)
        return jnp.transpose(x, (1, 0))[:bsz]

    @jax.custom_batching.custom_vmap
    def solve_stamped(vals, rvals, gmin):
        """x from flat stamp entries: vals (nnz,), rvals (nrhs,), gmin scalar.
        Applies ground row, RHS scatter and the gmin diagonal itself.

        The body is deliberately CONST-FREE (python-int indexing over the
        static cell groups, no index-array scatter): jaxpr constants of a
        custom_vmap body get broadcast to batched by lax.cond's batching
        rule, which trips custom_vmap's unbatched-consts assertion — the OP
        rescue ladder wraps every Newton call in exactly such a cond."""
        from .solve import _solve_batched

        zero = jnp.float64(0.0)
        arows = []
        brows = []
        for i in range(n):
            acols = []
            if i == 0:  # ground row: x[0] = 0
                arows.append(jnp.stack(
                    [jnp.float64(1.0)] + [zero] * (n - 1)))
                brows.append(zero)
                continue
            for j in range(n):
                v = zero
                for e in mat_cells.get((i, j), ()):
                    v = v + vals[e]
                if i == j:
                    v = v + gmin
                acols.append(v)
            arows.append(jnp.stack(acols))
            bv = zero
            for e in rhs_cells.get(i, ()):
                bv = bv + rvals[e]
            brows.append(bv)
        a = jnp.stack(arows)
        b = jnp.stack(brows)
        return _solve_batched(a[None], b[None])[0]

    @solve_stamped.def_vmap
    def _solve_stamped_vmap(axis_size, in_batched, vals, rvals, gmin):
        vb, rb, gb = in_batched
        if not vb:
            vals = jnp.broadcast_to(vals, (axis_size,) + vals.shape)
        if not rb:
            rvals = jnp.broadcast_to(rvals, (axis_size,) + rvals.shape)
        if not gb:
            gmin = jnp.broadcast_to(gmin, (axis_size,))
        from .solve import _solver_backend, _solve_batched

        if _solver_backend() == "pallas":
            return pallas_path(vals, rvals, gmin), True
        a, b = dense(vals, rvals, gmin)
        return _solve_batched(a, b), True

    return solve_stamped


def solve_stamped_for(n, rows, cols, rrows):
    """Get (cached) the fused stamped-solve for a static stamp pattern."""
    return _solve_stamped_cached(
        int(n),
        np.asarray(rows, np.int32).tobytes(),
        np.asarray(cols, np.int32).tobytes(),
        np.asarray(rrows, np.int32).tobytes(),
    )
