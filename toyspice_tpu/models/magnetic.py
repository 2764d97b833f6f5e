"""Jiles-Atherton magnetic core + magnetic inductor (reference magnetic.go).

Parity note (PLAN.md item 1): in the reference, MagneticInductor does not
satisfy the TimeDependent interface, so its committed current stays 0 forever,
the J-A state never evolves (Calculate's dH==0 early-out), and transient stamps
always take the linear branch with L0 = mu0·N²·A/len (magnetic.go:239-251).
``compat`` mode reproduces exactly that by never committing LM state.
``physics`` mode commits state each accepted step so the hysteresis model is
live.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..consts import MU0


class CoreState(NamedTuple):
    """Per-winding J-A state in compat mode (the reference keeps one core
    object per winding *chain* but the state is frozen in compat; physics mode
    reduces per-core via core_id)."""

    H: jnp.ndarray
    Hold: jnp.ndarray
    M: jnp.ndarray
    Mirr: jnp.ndarray
    dMdH: jnp.ndarray


def ja_calculate(p, st: CoreState, h, temp):
    """One J-A update step (magnetic.go:88-132): returns (M, dMdH, new_state).

    All guards of the reference are kept (|dH|<1e-12 early-out, small-he
    linearized anhysteretic, denominator clamp at ±1e-12); expressed with safe
    denominators so both `where` branches stay finite.
    """
    dH = h - st.Hold
    small = jnp.abs(dH) < 1e-12
    delta = jnp.where(dH < 0, -1.0, 1.0)

    mst = p["ms"] * jnp.where(
        p["tc"] > 0, jnp.power((p["tc"] - temp) / p["tc"], p["beta"]), 1.0
    )

    he = h + p["alpha"] * st.M
    he_safe = jnp.where(jnp.abs(he) < 1e-6, 1.0, he)
    man_lin = mst * he / (3.0 * p["a"])
    # Langevin L(x) = coth(x) - 1/x evaluated STABLY: the direct difference
    # cancels ~x^-2 digits for small x (at x ~ 1e-4 f64 keeps only ~8
    # digits and the hysteretic state LATCHES the noise), so |x| < 0.25
    # uses the Bernoulli series x/3 - x^3/45 + 2x^5/945 - ... instead.
    # The fused whole-run kernel mirrors this form exactly in double-float
    # (ops/pallas_run.py), which is what makes df-vs-f64 state parity hold.
    x = he_safe / p["a"]
    x2 = x * x
    series = x * (1.0 / 3.0 + x2 * (-1.0 / 45.0 + x2 * (
        2.0 / 945.0 + x2 * (-1.0 / 4725.0 + x2 * (
            2.0 / 93555.0 + x2 * (-1382.0 / 638512875.0))))))
    x_safe = jnp.where(jnp.abs(x) < 1e-30, 1.0, x)
    direct = 1.0 / jnp.tanh(x_safe) - 1.0 / x_safe
    langevin = jnp.where(jnp.abs(x) < 0.25, series, direct)
    man_coth = mst * langevin
    man = jnp.where(jnp.abs(he) < 1e-6, man_lin, man_coth)

    denom = p["k"] * delta - p["alpha"] * (man - st.Mirr)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12 * jnp.sign(denom + 1e-300), denom)
    d_mirr_dh = (man - st.Mirr) / denom

    mirr_new = st.Mirr + d_mirr_dh * dH
    m_new = mirr_new + p["c"] * (man - mirr_new)
    dh_safe = jnp.where(small, 1.0, dH)
    dmdh_new = (m_new - st.M) / dh_safe

    m_out = jnp.where(small, st.M, m_new)
    dmdh_out = jnp.where(small, st.dMdH, dmdh_new)
    new_state = CoreState(
        H=jnp.where(small, st.H, h),
        Hold=jnp.where(small, st.Hold, h),
        M=m_out,
        Mirr=jnp.where(small, st.Mirr, mirr_new),
        dMdH=dmdh_out,
    )
    return m_out, dmdh_out, new_state


def l_zero(p):
    """Vacuum-permeability inductance L0 = mu0·N²·A/len (magnetic.go:240-241)."""
    return MU0 * p["turns"] * p["turns"] * p["area"] / p["len"]


def l_effective(p, st: CoreState, i0, temp):
    """State-dependent effective inductance with the reference's clamps
    (magnetic.go:253-263); also returns the updated core state."""
    h = jnp.clip(p["turns"] * i0 / p["len"], -1e6, 1e6)
    _, dmdh, new_state = ja_calculate(p, st, h, temp)
    dmdh = jnp.clip(dmdh, -1e3, 1e3)
    leff = MU0 * (1.0 + dmdh) * p["turns"] * p["turns"] * p["area"] / p["len"]
    return jnp.maximum(1e-12, leff), new_state


def value_for_mutual(p, st: CoreState, i0, temp):
    """GetValue() as the Mutual stamp sees it (magnetic.go:147-154): a J-A
    evaluation at the winding's own current, no clamps."""
    h = p["turns"] * i0 / p["len"]
    _, dmdh, _ = ja_calculate(p, st, h, temp)
    return MU0 * p["turns"] * p["turns"] * p["area"] * (1.0 + dmdh) / p["len"]
