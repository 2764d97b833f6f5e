"""DC sweep (reference dc.go): one or two nested V-source sweeps.

Each sweep point is a fresh Newton solve warm-started from the previous
point's linearization voltages (the reference gets this implicitly from
device state persisting between points; dc.go:155-187 skips the voltage
update on iteration 0).  The point loop is a ``lax.scan`` so the whole sweep
is one compiled program; with a Monte-Carlo batch it vmaps across instances.
"""

import jax
import jax.numpy as jnp

from .newton import make_nr
from .nlstate import init_jv
from .options import DEFAULTS, SimOptions


def sweep_values(start: float, stop: float, inc: float):
    """Go-exact accumulation: for v := start; v <= stop; v += inc
    (dc.go:36-42) — float64 rounding decides the point count."""
    vals = []
    v = start
    while v <= stop:
        vals.append(v)
        v += inc
    return vals


def make_dc(cc, src_slots, opts: SimOptions = DEFAULTS,
            semantics: str = "compat"):
    """src_slots: tuple of indices into the V table for the swept sources
    (1 = single sweep, 2 = nested)."""
    np1 = cc.np1
    nr = make_nr(cc, mode="op", warm_start=True, conv="dc",
                 semantics=semantics, opts=opts)

    def set_source(params, slot, val):
        p2 = dict(params)
        pv = dict(p2["V"])
        pv["dc"] = pv["dc"].at[slot].set(val)
        p2["V"] = pv
        return p2

    def dc_execute(params, state, points):
        """points: (P,) for a single sweep or (P, 2) for a nested sweep
        (already cartesian-expanded host-side)."""
        zeros = jnp.zeros(np1, dtype=jnp.float64)

        def step(jv, vals):
            p2 = params
            if len(src_slots) == 1:
                p2 = set_source(p2, src_slots[0], vals)
            else:
                p2 = set_source(p2, src_slots[0], vals[0])
                p2 = set_source(p2, src_slots[1], vals[1])
            res = nr(p2, state, jv, zeros, t=0.0, dt=0.0, gmin=0.0, dc_scale=1.0)
            return res.jv, (res.x, res.converged)

        _, (xs, conv) = jax.lax.scan(step, init_jv(cc), points)
        return xs, conv

    return dc_execute
