"""Newton-Raphson as a ``lax.while_loop`` over assemble+solve.

Three NR flavors exist in the reference and all are reproduced here via two
static switches:

* OP NR (op.go:25-88): device linearization voltages updated from the previous
  solution EVERY iteration (seeded by the initial estimate); convergence
  |Δ| ≤ reltol·max(|new|,|old|) + abstol.
* Transient NR (tran.go:157-216): iteration 0 stamps with the *carried*
  device voltages (warm start from the previous timestep); same convergence.
* DC-sweep NR (dc.go:142-187): warm start like transient, but convergence is
  CheckConvergence (anlysis.go:46-59): diff ≤ abstol OR diff ≤ reltol·|new|.

The per-device linearization state is the ``jv`` pytree (engine/nlstate.py);
updates go through the pnjlim junction limiter — the one capability the
reference stubbed out (limiter.go) and visibly needed (PLAN.md 10).

Convergence is only ever tested from iteration 1, so every call costs at
least two assemble+solve rounds — exactly like the reference.  Non-finite
solutions are treated as non-converged so the rescue ladders engage.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.assemble import assemble_entries
from ..ops.pallas_solve import solve_stamped_for
from .nlstate import update_jv
from .options import DEFAULTS, SimOptions

MAX_ITER = 100  # reference convergence.maxIter (anlysis.go:38)
ABSTOL = 1e-12
RELTOL = 1e-6


class NRResult(NamedTuple):
    x: jnp.ndarray  # last solution
    jv: dict  # device linearization state on exit
    converged: jnp.ndarray  # bool scalar
    iters: jnp.ndarray  # int32


def make_nr(cc, mode: str, warm_start: bool, conv: str = "op",
            semantics: str = "compat", opts: SimOptions = DEFAULTS):
    """Build an NR solver for the given stamp mode.

    warm_start=False → OP flavor (jv from x every iteration; x0 = seed).
    warm_start=True  → transient/DC flavor (iteration 0 uses carried jv).
    conv: 'op' or 'dc' convergence formula.
    """
    max_iter = opts.max_iter
    abstol = opts.abstol
    reltol = opts.reltol

    # Linear fast path: with no NonLinear devices the assembled system is
    # independent of x, so the reference's two mandatory NR rounds (converge
    # check only from iteration 1) solve the SAME system twice and compare
    # identical solutions.  One assemble+solve produces the identical result;
    # convergence reduces to "solution is finite" (non-finite = singular
    # system, exactly when the reference's diff check would see inf/nan).
    linear = not any(k in cc.idx for k in ("D", "Q", "M"))

    def solve_iteration(params, state, jv_used, t, dt, gmin, dc_scale):
        """One assemble+solve through the fused stamped-solve: devices emit
        flat entry values over a static (row, col) pattern; the solver (one
        Pallas kernel on TPU) builds the system in VMEM, applies the ground
        row and the gmin diagonal (matrix/circuit.go:107-114), and
        eliminates."""
        rows, cols, vals, rrows, rvals = assemble_entries(
            cc, params, state, jv_used, t, dt, mode,
            status_gmin=gmin, dc_scale=dc_scale, semantics=semantics,
            temp=opts.temp, gmin_floor=opts.gmin,
            integration=opts.integration,
        )
        solver = solve_stamped_for(cc.np1, rows, cols, rrows)
        return solver(vals, rvals, jnp.asarray(gmin, dtype=jnp.float64))

    def nr_linear(params, state, jv_carry, x_init, t, dt, gmin, dc_scale) -> NRResult:
        x = solve_iteration(params, state, jv_carry, t, dt, gmin, dc_scale)
        converged = jnp.all(jnp.isfinite(x))
        return NRResult(x=x, jv=jv_carry, converged=converged, iters=jnp.int32(1))

    def nr(params, state, jv_carry, x_init, t, dt, gmin, dc_scale) -> NRResult:
        def body(carry):
            k, x_prev, jv_prev, _ = carry
            jv_next = update_jv(cc, params, x_prev, jv_prev,
                                semantics=semantics)
            if warm_start:
                jv_used = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(k == 0, a, b), jv_carry, jv_next
                )
            else:
                jv_used = jv_next
            x = solve_iteration(params, state, jv_used, t, dt, gmin, dc_scale)

            finite = jnp.all(jnp.isfinite(x))
            diff = jnp.abs(x - x_prev)
            if conv == "dc":
                ok = (diff <= abstol) | (diff <= reltol * jnp.abs(x))
            else:
                ok = diff <= reltol * jnp.maximum(jnp.abs(x), jnp.abs(x_prev)) + abstol
            converged = (k > 0) & finite & jnp.all(ok)
            return (k + 1, x, jv_used, converged)

        def cond(carry):
            k, x, jv, converged = carry
            return jnp.logical_and(~converged, k < max_iter)

        init = (jnp.int32(0), x_init, jv_carry, jnp.asarray(False))
        k, x, jv, converged = jax.lax.while_loop(cond, body, init)
        return NRResult(x=x, jv=jv, converged=converged, iters=k)

    return nr_linear if linear else nr
