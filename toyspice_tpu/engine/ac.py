"""AC small-signal analysis (reference ac.go).

OP first for bias, then one complex solve per frequency — but where the
reference loops sequentially (ac.go:51-98), the entire frequency grid solves
in parallel under ``vmap``: frequencies are embarrassingly parallel and map
cleanly onto the TPU batch dimension.

The frequency grid reproduces the reference exactly, including the quirk that
``numPoints`` is the TOTAL point count for DEC/OCT/LIN alike (ac.go:100-126).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.assemble import assemble_system_ac
from ..ops.solve import linear_solve
from .op import make_op
from .options import DEFAULTS, SimOptions


def frequency_points(sweep: str, fstart: float, fstop: float, num_points: int):
    with np.errstate(divide="ignore", invalid="ignore"):
        n = np.float64(num_points - 1)
        i = np.arange(num_points, dtype=np.float64)
        if sweep == "DEC":
            lo, hi = np.log10(fstart), np.log10(fstop)
            return np.power(10.0, lo + i * ((hi - lo) / n))
        if sweep == "OCT":
            lo, hi = np.log2(fstart), np.log2(fstop)
            return np.power(2.0, lo + i * ((hi - lo) / n))
        # LIN
        return fstart + i * ((fstop - fstart) / n)


def make_ac(cc, opts: SimOptions = DEFAULTS, semantics: str = "compat"):
    np1 = cc.np1
    op_execute, _ = make_op(cc, opts, semantics=semantics)

    def solve_one(params, state, jv, freq):
        a2, b2 = assemble_system_ac(cc, params, state, jv, freq, temp=opts.temp,
                                    semantics=semantics)
        x2 = linear_solve(a2, b2)
        return x2[:np1], x2[np1:]

    def ac_execute(params, state, freqs):
        opr = op_execute(params, state)
        xr, xi = jax.vmap(solve_one, in_axes=(None, None, None, 0))(
            params, state, opr.jv, freqs
        )
        return xr, xi, opr

    return ac_execute
