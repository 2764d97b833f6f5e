"""Junction-voltage limiting (SPICE3F5 DEVpnjlim).

The reference planned this (the empty pkg/device/limiter.go stub) but never
wrote it — with an unclamped exponential its BJT Newton iteration overflows to
Inf/NaN on ordinary fixtures like bjt1.cir (PLAN.md 10).  We implement the
classic pnjlim: when a junction tries to jump past the critical voltage by
more than 2·Vt in one Newton step, pull it back logarithmically.  The limiter
only engages on large steps, so converged fixed points are unchanged.
"""

import jax.numpy as jnp


def vcrit(vte, is_):
    """Critical voltage vte·ln(vte/(√2·Is))."""
    return vte * jnp.log(vte / (jnp.sqrt(2.0) * is_))


def pnjlim(vnew, vold, vte, vc):
    """SPICE3F5 DEVpnjlim, vectorized.

    if vnew > vcrit and |vnew - vold| > 2·vte:
        vold > 0:  vnew = vold + vte·ln(1 + (vnew-vold)/vte)   (arg>0)
                   vnew = vcrit                                 (arg<=0)
        vold <= 0: vnew = vte·ln(vnew/vte)
    """
    limit = (vnew > vc) & (jnp.abs(vnew - vold) > 2.0 * vte)
    arg = 1.0 + (vnew - vold) / vte
    pos = jnp.where(arg > 0, vold + vte * jnp.log(jnp.maximum(arg, 1e-300)), vc)
    neg = vte * jnp.log(jnp.maximum(vnew, 1e-300) / vte)
    limited = jnp.where(vold > 0, pos, neg)
    return jnp.where(limit, limited, vnew)
