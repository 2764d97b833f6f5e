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


def make_ac_batch(cc, in_axes, opts: SimOptions = DEFAULTS,
                  semantics: str = "compat", params=None):
    """Monte-Carlo-batched AC with the solver batch laid out correctly.

    ``vmap(ac_execute)`` over instances is catastrophically slow on TPU: the
    INNER frequency vmap (size F ~ 10) reaches the solver's custom_vmap rule
    first, so the Pallas solve kernel is built with F lanes and the
    8192-instance axis is then vmapped OVER the pallas_call — 8192 sequential
    grid steps of a 10/128-lane kernel (measured 825 solves/s at B=8192 x
    F=10 on v5e).  Here the (B, F) axes are flattened into ONE solver batch
    of B*F lane-resident systems before the solve: measured ~3 orders of
    magnitude faster on the same workload.

    The bias point runs through the fused OP/Newton kernel
    (ops/pallas_op.py) when the circuit is eligible and the Pallas solver
    backend is active — at the benchmark batch the vmapped general bias
    dominated the whole AC sweep (round-3 BENCH_MATRIX: 0.084 s of which
    the (B·F) solves are a small fraction).  TOYSPICE_OP=general forces the
    vmapped general bias.

    Returns fn(params, state0, freqs) -> (xr, xi, opr) with xr/xi of shape
    (B, F, np1); ``in_axes`` marks the batched param leaves (0) as in
    batch_params.  ``params`` (the concrete override pytree, pre-jit) lets
    the fused-bias gate see batched overrides that flip the kernel's static
    device gates (e.g. a physics diode Rs override — see
    op_fused_ineligible_reason)."""
    import os

    import numpy as np

    from ..ops.pallas_ac import ac_fused_ineligible_reason, ac_solve_batch
    from ..ops.pallas_op import make_op_fused, op_fused_ineligible_reason
    from ..ops.solve import _solver_backend

    np1 = cc.np1
    mode = os.environ.get("TOYSPICE_OP", "auto")
    fused_bias = (op_fused_ineligible_reason(cc, semantics, opts,
                                             params) is None
                  and mode != "general"
                  and (mode == "fused" or _solver_backend() == "pallas"))
    if fused_bias:
        op_fused = make_op_fused(cc, opts, semantics=semantics)
    else:
        op_execute, _ = make_op(cc, opts, semantics=semantics)

    # Fused AC stamped-solve (ops/pallas_ac.py): the system is exactly
    # linear in omega, so ONE per-instance assemble at omega = 1 (B lanes,
    # f64, every stamp semantic shared verbatim) feeds a single kernel
    # that builds + GJ-solves all (B, F) systems in VMEM — no
    # (B, F, 2N, 2N) HBM tensor.  TOYSPICE_AC=general|fused|auto.
    ac_mode = os.environ.get("TOYSPICE_AC", "auto")
    fused_solve = (ac_fused_ineligible_reason(cc, semantics, opts,
                                              params) is None
                   and ac_mode != "general"
                   and (ac_mode == "fused"
                        or _solver_backend() == "pallas"))

    def asm(params, state, jv, freq):
        return assemble_system_ac(cc, params, state, jv, freq, temp=opts.temp,
                                  semantics=semantics)

    def ac_batch_execute(params, state0, freqs):
        if fused_bias:
            opr = op_fused(params, state0)
        else:
            opr = jax.vmap(lambda p: op_execute(p, state0),
                           in_axes=(in_axes,))(params)
        if fused_solve:
            freq_unit = 1.0 / (2.0 * np.pi)
            omega_used = 2.0 * np.pi * freq_unit  # ~1.0 to the last ulp
            a2_1, b2 = jax.vmap(asm, in_axes=(in_axes, None, 0, None))(
                params, state0, opr.jv, freq_unit)
            if omega_used != 1.0:  # recover the exact unit susceptance
                a2_1 = a2_1.at[:, np1:, :np1].divide(omega_used)
            x2 = ac_solve_batch(cc, a2_1, b2, freqs)
            return x2[..., :np1], x2[..., np1:], opr
        a2, b2 = jax.vmap(
            jax.vmap(asm, in_axes=(None, None, None, 0)),
            in_axes=(in_axes, None, 0, None),
        )(params, state0, opr.jv, freqs)
        bsz, nf = a2.shape[0], a2.shape[1]
        n2 = 2 * np1
        x2 = jax.vmap(linear_solve)(
            a2.reshape(bsz * nf, n2, n2), b2.reshape(bsz * nf, n2))
        x2 = x2.reshape(bsz, nf, n2)
        return x2[..., :np1], x2[..., np1:], opr

    return ac_batch_execute
