"""Operating-point analysis with the reference's three-stage rescue ladder
(op.go): plain NR seeded by a linear-devices-only solve, then gmin stepping,
then source stepping.  All stages live inside one jitted function; stages are
skipped at runtime via ``lax.cond`` when convergence is already reached, so
the common case costs exactly one Newton loop.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.assemble import assemble_system
from ..ops.solve import linear_solve
from .newton import make_nr
from .nlstate import init_jv
from .options import DEFAULTS, SimOptions

# Source-stepping scale factors, generated with the same float accumulation
# the reference uses (op.go:147: for factor := 0.1; factor <= 1.0; factor += 0.1)
# — note the accumulated rounding: the last factor is 0.9999999999999999.
def _go_factors():
    out = []
    f = 0.1
    while f <= 1.0:
        out.append(f)
        f += 0.1
    return out


SOURCE_FACTORS = _go_factors()
GMIN_STEPS = 10  # op.go:193


class OPResult(NamedTuple):
    x: jnp.ndarray
    jv: dict
    converged: jnp.ndarray
    stage: jnp.ndarray  # rescue stage that converged: 0 plain NR, 1 gmin
    #                     stepping, 2 source stepping (observability only)


def make_op(cc, opts: SimOptions = DEFAULTS, semantics: str = "compat"):
    np1 = cc.np1
    nr = make_nr(cc, mode="op", warm_start=False, conv="op",
                 semantics=semantics, opts=opts)

    def initial_estimate(params, state, dc_scale):
        """Linear-devices-only solve (op.go:90-111), stamped with the
        zero-value status (Time=0, Gmin=0).  A singular/non-finite solve
        falls back to the zero vector (the reference returns nil there)."""
        zeros = jnp.zeros(np1, dtype=jnp.float64)
        a, b = assemble_system(
            cc, params, state, None, t=0.0, dt=0.0, mode="op",
            status_gmin=0.0, dc_scale=dc_scale, linear_only=True,
            temp=opts.temp, gmin_floor=opts.gmin,
        )
        x = linear_solve(a, b)
        return jnp.where(jnp.all(jnp.isfinite(x)), x, zeros)

    def op_execute(params, state) -> OPResult:
        jv0 = init_jv(cc)
        seed = initial_estimate(params, state, 1.0)
        r0 = nr(params, state, jv0, seed, t=0.0, dt=0.0, gmin=0.0, dc_scale=1.0)

        def done(_):
            return OPResult(x=r0.x, jv=r0.jv, converged=r0.converged,
                            stage=jnp.int32(0))

        def rescue(_):
            # --- gmin stepping (op.go:192-214) ---
            start_gmin = cc.n * 0.001
            g0 = start_gmin * (10.0 ** GMIN_STEPS)

            def ladder_cond(c):
                i, gmin, cur, jv, active = c
                return active & (i <= GMIN_STEPS)

            def ladder_body(c):
                i, gmin, cur, jv, active = c
                r = nr(params, state, jv, cur, t=0.0, dt=0.0, gmin=gmin,
                       dc_scale=1.0)
                cur2 = jnp.where(r.converged, r.x, cur)
                jv2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(r.converged, new, old), r.jv, jv
                )
                return (i + 1, gmin / 10.0, cur2, jv2, r.converged)

            init = (jnp.int32(0), jnp.float64(g0), r0.x, r0.jv, jnp.asarray(True))
            _, _, cur, jv, _ = jax.lax.while_loop(ladder_cond, ladder_body, init)

            rp = nr(params, state, jv, cur, t=0.0, dt=0.0, gmin=0.0, dc_scale=1.0)

            def after_gmin(_):
                return OPResult(x=rp.x, jv=rp.jv, converged=rp.converged,
                                stage=jnp.int32(1))

            def source_stepping(_):
                # op.go:113-169 — scale all V-source dcValues 10% -> 100%
                seed01 = initial_estimate(params, state, SOURCE_FACTORS[0])
                factors = jnp.asarray(SOURCE_FACTORS, dtype=jnp.float64)

                def step_cond(c):
                    j, cur, jv, ok = c
                    return ok & (j < len(SOURCE_FACTORS))

                def step_body(c):
                    j, cur, jv, ok = c
                    r = nr(params, state, jv, cur, t=0.0, dt=0.0,
                           gmin=0.0, dc_scale=factors[j])
                    return (j + 1, r.x, r.jv, r.converged)

                j, cur, jv2, ok = jax.lax.while_loop(
                    step_cond, step_body,
                    (jnp.int32(0), seed01, rp.jv, jnp.asarray(True)),
                )
                # final full-scale polish (op.go:224: doNRiter after restore)
                rf = nr(params, state, jv2, cur, t=0.0, dt=0.0, gmin=0.0,
                        dc_scale=1.0)
                return OPResult(x=rf.x, jv=rf.jv, converged=ok & rf.converged,
                                stage=jnp.int32(2))

            return jax.lax.cond(rp.converged, after_gmin, source_stepping, None)

        return jax.lax.cond(r0.converged, done, rescue, None)

    return op_execute, initial_estimate
