"""Dense linear solve for small MNA systems.

TPU constraint (measured on v5e): XLA's LuDecomposition supports only f32/c64,
so ``jnp.linalg.solve`` cannot run at float64 there.  SPICE tolerances need
f64, and MNA matrices here are tiny (≲ tens of rows), so we do Gaussian
elimination with partial pivoting built purely from elementwise/select ops —
those emulate fine in f64 on TPU and batch perfectly under vmap.

MNA needs pivoting: voltage-source branch rows have a structural zero on the
diagonal.  Row selection uses argmax of |column| over the remaining rows —
the classic partial-pivot rule, expressed as masked vector ops instead of row
swaps on a host matrix.
"""

import jax
import jax.numpy as jnp


def linear_solve(a, b):
    """Solve a @ x = b for one (n, n) system; vmap for batches.

    Returns x with the same dtype as `a`.  Non-finite inputs propagate to the
    output (callers treat non-finite solutions as non-converged).
    """
    n = a.shape[-1]
    m = jnp.concatenate([a, b[..., None]], axis=-1)  # (n, n+1) working matrix
    rows = jnp.arange(n)

    def eliminate(k, m):
        col = jnp.abs(m[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col)
        # swap rows k and p (as two masked row writes)
        rk = m[k]
        rp = m[p]
        m = m.at[k].set(rp).at[p].set(rk)
        piv = m[k, k]
        piv_safe = jnp.where(piv == 0, 1.0, piv)
        factors = jnp.where(rows > k, m[:, k] / piv_safe, 0.0)
        return m - factors[:, None] * m[k][None, :]

    m = jax.lax.fori_loop(0, n, eliminate, m)

    def back_substitute(i, x):
        k = n - 1 - i
        s = jnp.sum(jnp.where(rows > k, m[k, :n] * x, 0.0))
        piv = m[k, k]
        piv_safe = jnp.where(piv == 0, 1.0, piv)
        xk = (m[k, n] - s) / piv_safe
        # a structurally singular row yields inf/nan via 0-pivot detection
        xk = jnp.where(piv == 0, jnp.inf, xk)
        return x.at[k].set(xk)

    x = jnp.zeros(n, dtype=m.dtype)
    return jax.lax.fori_loop(0, n, back_substitute, x)
