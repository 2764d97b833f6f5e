"""Dense linear solve for small MNA systems, laid out for the TPU.

TPU constraints (measured on v5e):

* XLA's LuDecomposition supports only f32/c64, so ``jnp.linalg.solve`` cannot
  run at float64 there.  SPICE tolerances need f64 (abstol=1e-12), and MNA
  matrices here are tiny (≲ tens of rows), so we solve with one-hot
  Gauss-Jordan elimination with partial pivoting built purely from
  elementwise/broadcast ops and small reductions.
* Layout is everything.  TPU vector tiles are (8 sublanes, 128 lanes) on the
  last two axes; a vmapped per-instance solver leaves batch in the *leading*
  axis and the tiny (n, n+1) working matrix in the tiled axes — >90% of every
  lane wasted, plus batched gathers for row pivoting (measured 840 µs/solve at
  B=1024, n=6).  The batched rule below transposes to (n, n+1, B) so the
  Monte-Carlo batch fills the lanes, and replaces row swaps with one-hot
  contractions (no gathers at all): 164 µs at the same size, same results.

MNA needs pivoting: voltage-source branch rows have a structural zero on the
diagonal (reference sparse solver uses Markowitz pivoting, pkg/matrix/
circuit.go:21-31).  Pivot selection here is the classic partial-pivot rule —
argmax |column| over unused rows — expressed as a masked max + first-match
one-hot.  A structurally singular system yields a non-finite solution, which
Newton callers treat as non-converged (so the rescue ladders engage).
"""

import os

import jax
import jax.numpy as jnp


def _solver_backend() -> str:
    """'pallas' (fused double-float TPU kernel) or 'xla' (emulated-f64 ops).

    TOYSPICE_SOLVER=pallas|xla|auto overrides; auto picks the Pallas kernel
    exactly when the default backend is a real TPU (tests and the multichip
    dryrun force CPU, where f64 is native and Pallas-TPU is unavailable).
    """
    v = os.environ.get("TOYSPICE_SOLVER", "auto")
    if v in ("pallas", "xla"):
        return v
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _gj_batch_last(m):
    """Gauss-Jordan with one-hot partial pivoting on (n, n+1, B) stacks.

    ``m`` is the augmented working matrix with the batch in the lane axis.
    Returns x of shape (n, B).  No gathers, no scatters, no row swaps: the
    pivot row is extracted with a one-hot contraction and elimination updates
    every row at once (the classic vectorization of GJ).
    """
    n, np1, bsz = m.shape
    used = jnp.zeros((n, bsz), dtype=bool)
    prows = []
    for k in range(n):  # n is small and static: unroll for fusion
        mk = m[:, k, :]  # (n, B) current column
        col = jnp.where(used, -1.0, jnp.abs(mk))
        mx = jnp.max(col, axis=0)
        elig = (col == mx[None, :]) & ~used
        # first eligible row wins, matching argmax tie-breaking
        onehot = elig & (jnp.cumsum(elig, axis=0) == 1)
        oh = onehot.astype(m.dtype)
        pivot_row = jnp.einsum("ib,ijb->jb", oh, m)  # (n+1, B)
        piv = pivot_row[k]
        piv_safe = jnp.where(piv == 0.0, 1.0, piv)
        pivot_row = pivot_row / piv_safe[None, :]
        # zero pivot ⇒ singular: poison the row so the solution goes non-finite
        bad = piv == 0.0
        poison = jnp.where((jnp.arange(np1) == k)[:, None], 1.0, jnp.inf)
        pivot_row = jnp.where(bad[None, :], poison, pivot_row)
        factors = jnp.where(onehot, 0.0, mk)  # (n, B)
        m = m - factors[:, None, :] * pivot_row[None, :, :]
        m = jnp.where(onehot[:, None, :], pivot_row[None, :, :], m)
        used = used | onehot
        prows.append(oh)
    perm = jnp.stack(prows)  # (n, n, B): perm[k] = one-hot pivot row of col k
    return jnp.einsum("kib,ib->kb", perm, m[:, np1 - 1, :])


def _solve_batched(a, b):
    """a: (B, n, n), b: (B, n) → x: (B, n) via the batch-last core."""
    m = jnp.concatenate([a, b[..., None]], axis=-1)  # (B, n, n+1)
    x = _gj_batch_last(jnp.transpose(m, (1, 2, 0)))
    return x.T


@jax.custom_batching.custom_vmap
def linear_solve(a, b):
    """Solve a @ x = b for one (n, n) system; batches perfectly under vmap.

    Returns x with the same dtype as `a`.  Non-finite inputs propagate to the
    output (callers treat non-finite solutions as non-converged).
    """
    return _solve_batched(a[None], b[None])[0]


@linear_solve.def_vmap
def _linear_solve_vmap(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _solver_backend() == "pallas":
        from .pallas_solve import pallas_solve_batched

        return pallas_solve_batched(a, b), True
    return _solve_batched(a, b), True
