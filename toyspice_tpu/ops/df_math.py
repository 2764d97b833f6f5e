"""Double-float transcendentals for Pallas TPU kernels.

The fused nonlinear-transient kernel evaluates device models (diode
exponentials, pnjlim logs) inside the kernel, where values are carried as
(hi, lo) f32 pairs with a ~48-bit effective mantissa (ops/pallas_solve.py).
TPU f32 `exp`/`log` are only ~1e-7 accurate, so these implement the
classical double-float algorithms:

* exp: range-reduce x = k*ln2 + r with ln2 as a df constant, Taylor series
  for exp(r) on |r| <= ln2/2 in df arithmetic (degree 14: r^14/14! ~ 1e-17),
  then scale by 2^k via exponent-bit construction.
* log: f32 estimate + one Newton step in df: y1 = y0 + x*exp(-y0) - 1,
  which converges to df precision from the ~1e-7 f32 seed.

Accuracy: ~2-3 ulp of the 48-bit pair (~1e-14 relative) over the ranges the
device models use (exp arg clamped to <= 40 — diode.go:127-131; log args
are junction voltages scaled by Vt).  tests/test_df_math.py sweeps both
against f64.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .pallas_solve import (_df_add, _df_mul, _df_recip, _exact,
                           _quick_two_sum, _two_prod, _two_sum)

# ln2 split for exact range reduction: _LN2_HI has only 11 significant bits
# so k*_LN2_HI is EXACT in f32 for integer |k| <= 2^12; the remainder is a
# (mid, lo) f32 pair subtracted in df
_LN2_HI = np.float32(0.693359375)  # 0x3F318000
_LN2_MID = np.float32(np.float64(np.log(2.0)) - np.float64(0.693359375))
_LN2_LO = np.float32(np.float64(np.log(2.0)) - np.float64(0.693359375)
                     - np.float64(_LN2_MID))
_INV_LN2 = np.float32(1.0 / np.log(2.0))

# Taylor coefficients 1/k! for k = 2..14 as (hi, lo) f32 pairs
import math as _math

_FACT = []
for _k in range(2, 15):
    _c = 1.0 / _math.factorial(_k)
    _hi = np.float32(_c)
    _FACT.append((_hi, np.float32(np.float64(_c) - np.float64(_hi))))


def _df_from_const(c, like):
    hi = np.float32(c)
    lo = np.float32(np.float64(c) - np.float64(hi))
    return (jnp.full_like(like, hi), jnp.full_like(like, lo))


def df_exp(xhi, xlo):
    """exp of a df pair, elementwise.  Accurate to ~1e-14 rel for results in
    the f32 normal range; underflows to 0 below ~exp(-87) like f32."""
    f32 = jnp.float32
    # k = round(x / ln2) — integer-valued f32; |x| <= ~88 so k fits exactly
    k = jnp.round(xhi * _INV_LN2)
    # r = x - k*ln2: k*_LN2_HI is exact (11-bit constant), the remainder
    # k*(mid+lo) is removed in df via an exact product pair
    t_hi, t_lo = _two_sum(xhi, -k * _LN2_HI)
    pm_hi, pm_lo = _two_prod(k, jnp.full_like(xhi, _LN2_MID))
    s_hi, s_lo = _df_add(t_hi, t_lo, -pm_hi, -pm_lo)
    r_hi, r_lo = _df_add(s_hi, s_lo, xlo - k * _LN2_LO, jnp.zeros_like(xhi))

    # Taylor: exp(r) = 1 + r + sum_{j>=2} r^j/j!  via Horner in df
    # p = c14; p = p*r + c13; ...; p = p*r + c2; result = 1 + r + p*r^2
    p_hi = jnp.full_like(xhi, _FACT[-1][0])
    p_lo = jnp.full_like(xhi, _FACT[-1][1])
    for c_hi, c_lo in reversed(_FACT[:-1]):
        p_hi, p_lo = _df_mul(p_hi, p_lo, r_hi, r_lo)
        p_hi, p_lo = _df_add(p_hi, p_lo,
                             jnp.full_like(xhi, c_hi), jnp.full_like(xhi, c_lo))
    r2_hi, r2_lo = _df_mul(r_hi, r_lo, r_hi, r_lo)
    p_hi, p_lo = _df_mul(p_hi, p_lo, r2_hi, r2_lo)
    s_hi, s_lo = _df_add(r_hi, r_lo, p_hi, p_lo)
    e_hi, e_lo = _df_add(jnp.ones_like(xhi), jnp.zeros_like(xhi), s_hi, s_lo)

    # scale by 2^k via exponent bits; split k = k1 + k2 so each factor stays
    # in the normal range (|k| <= 176 after clamping below)
    k = jnp.clip(k, f32(-176.0), f32(176.0))
    k1 = jnp.round(k * f32(0.5))
    k2 = k - k1

    def pow2(ki):
        bits = (ki.astype(jnp.int32) + jnp.int32(127)) << jnp.int32(23)
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    s1 = pow2(k1)
    s2 = pow2(k2)
    # scaling by powers of two is exact
    return (e_hi * s1 * s2, e_lo * s1 * s2)


def df_log(xhi, xlo):
    """log of a positive df pair, elementwise.

    Reduce x = m * 2^e with m in [1, 2) via exponent bits (exact scaling),
    Newton-refine y = log(m) in df from the f32 seed (exp(-y0) stays in
    [0.5, 1], so the Dekker splits never overflow), then add e*ln2 in df.
    Non-positive inputs give garbage (callers clamp, as pnjlim does)."""
    f32 = jnp.float32
    x_safe = jnp.maximum(xhi, f32(1e-38))
    bits = jax.lax.bitcast_convert_type(x_safe, jnp.int32)
    e = ((bits >> jnp.int32(23)) & jnp.int32(0xFF)) - jnp.int32(127)
    scale = jax.lax.bitcast_convert_type(
        (jnp.int32(127) - e) << jnp.int32(23), jnp.float32)
    # m = x * 2^-e in [1, 2): power-of-two scaling is exact on both limbs
    m_hi = x_safe * scale
    m_lo = xlo * scale
    y0 = _exact(jnp.log(m_hi))
    emh, eml = df_exp(-y0, jnp.zeros_like(y0))
    p_hi, p_lo = _df_mul(m_hi, m_lo, emh, eml)
    d_hi, d_lo = _df_add(p_hi, p_lo, -jnp.ones_like(y0), jnp.zeros_like(y0))
    lm_hi, lm_lo = _df_add(y0, jnp.zeros_like(y0), d_hi, d_lo)
    # + e*ln2: e*_LN2_HI exact (11-bit constant, |e| <= 150), rest in df
    ef = e.astype(f32)
    t_hi, t_lo = _df_add(lm_hi, lm_lo, ef * _LN2_HI, jnp.zeros_like(y0))
    pm_hi, pm_lo = _two_prod(ef, jnp.full_like(y0, _LN2_MID))
    t_hi, t_lo = _df_add(t_hi, t_lo, pm_hi, pm_lo)
    return _df_add(t_hi, t_lo, ef * _LN2_LO, jnp.zeros_like(y0))


def df_div(ahi, alo, bhi, blo):
    """a / b in df: reciprocal + one refinement via _df_recip, then multiply."""
    r_hi, r_lo = _df_recip(bhi, blo)
    return _df_mul(ahi, alo, r_hi, r_lo)


def df_sqrt(xhi, xlo):
    """sqrt of a non-negative df pair, elementwise; x <= 0 returns 0.

    f32 seed + one Newton step carried in df: y = y0 + (x - y0^2)/(2*y0).
    The residual r = x - y0^2 is exact (two_prod), and the correction is
    ~6e-8 of y, so evaluating it in plain f32 leaves ~6e-15 rel error."""
    f32 = jnp.float32
    pos = xhi > 0
    xs = jnp.maximum(xhi, f32(1e-38))
    y0 = _exact(jnp.sqrt(xs))
    y2_hi, y2_lo = _two_prod(y0, y0)
    r_hi, r_lo = _df_add(xs, jnp.where(pos, xlo, jnp.zeros_like(xlo)),
                         -y2_hi, -y2_lo)
    corr = (r_hi + r_lo) * (f32(0.5) / y0)
    s_hi, s_lo = _quick_two_sum(y0, corr)
    zero = jnp.zeros_like(xhi)
    return (jnp.where(pos, s_hi, zero), jnp.where(pos, s_lo, zero))


def df_pow(xhi, xlo, yhi, ylo):
    """x**y for positive df x: exp(y * log(x)).  Relative error grows with
    |y*log(x)| (~1e-14 * |y*log x|); the MOSFET junction-cap and mobility
    exponents keep |y*log x| < ~100."""
    l_hi, l_lo = df_log(xhi, xlo)
    return df_exp(*_df_mul(yhi, ylo, l_hi, l_lo))


def df_floor(xhi, xlo):
    """floor of a df pair as an integer-valued f32 (exact for |result| <
    2^24; callers keep arguments in that range — the whole-run transient
    kernel uses it for PULSE period wrapping, where the wrap count is
    t/period).  Returns a plain f32 array, not a pair."""
    f = jnp.floor(xhi)
    # hi - floor(hi) is exact for |hi| < 2^23 (both representable, result in
    # [0, 1)); for larger |hi| the value is already integral and r == 0
    r = xhi - f
    fr_hi, fr_lo = _two_sum(r, xlo)
    f = f + jnp.floor(fr_hi)  # fr_hi in (-1, 2): adjustment in {-1, 0, 1}
    # fr_hi exactly integral but a negative lo limb pulls the true
    # fractional part below it: floor is one less
    exact_int = fr_hi == jnp.floor(fr_hi)
    return jnp.where(exact_int & (fr_lo < 0), f - 1.0, f)


# sin coefficients: sin(a) = a + a^3*P(a^2), cos(a) = 1 + a^2*Q(a^2) on
# |a| <= pi/4; terms through a^17/17! keep the truncation below the ~48-bit
# pair ulp (a^19/19! ~ 8e-20 at a = pi/4)
_SIN_C = []
for _k in range(1, 9):  # (-1)^k / (2k+1)!
    _c = (-1.0) ** _k / _math.factorial(2 * _k + 1)
    _hi = np.float32(_c)
    _SIN_C.append((_hi, np.float32(np.float64(_c) - np.float64(_hi))))
_COS_C = []
for _k in range(1, 9):  # (-1)^k / (2k)!
    _c = (-1.0) ** _k / _math.factorial(2 * _k)
    _hi = np.float32(_c)
    _COS_C.append((_hi, np.float32(np.float64(_c) - np.float64(_hi))))

# pi/2 as a df constant for the quadrant reconstruction
_PIO2_HI = np.float32(np.pi / 2)
_PIO2_LO = np.float32(np.float64(np.pi / 2) - np.float64(_PIO2_HI))
_TWO_OVER_PI_HI = np.float32(2.0 / np.pi)
_TWO_OVER_PI_LO = np.float32(np.float64(2.0 / np.pi)
                             - np.float64(_TWO_OVER_PI_HI))


def _poly_df(c_list, w_hi, w_lo):
    p_hi = jnp.full_like(w_hi, c_list[-1][0])
    p_lo = jnp.full_like(w_hi, c_list[-1][1])
    for c_hi, c_lo in reversed(c_list[:-1]):
        p_hi, p_lo = _df_mul(p_hi, p_lo, w_hi, w_lo)
        p_hi, p_lo = _df_add(p_hi, p_lo, jnp.full_like(w_hi, c_hi),
                             jnp.full_like(w_hi, c_lo))
    return p_hi, p_lo


def df_sin(xhi, xlo):
    """sin of a df pair, elementwise.

    Quadrant reduction y = x * 2/pi, k = round(y), a = (y - k) * pi/2 in
    df, then Taylor series for sin/cos on |a| <= pi/4 selected by k mod 4.
    The absolute error is ~|x| * 2^-48 from the argument's own pair ulp
    (inherent — the df argument only determines the angle to that
    precision), so the result's ABSOLUTE error grows with |x|; the
    whole-run transient kernel keeps |x| = |2*pi*f*t + phase| < ~1e6
    (SIN-source arguments over a deck's time span), where that is ~4e-9
    worst-case.  The wrap count k must stay exactly representable in f32
    (|k| < 2^24)."""
    f32 = jnp.float32
    y_hi, y_lo = _df_mul(xhi, xlo, jnp.full_like(xhi, _TWO_OVER_PI_HI),
                         jnp.full_like(xhi, _TWO_OVER_PI_LO))
    k = jnp.round(y_hi)
    # r = y - k exactly (two_sum), |r| <= 0.5 + pair ulp
    r_hi, r_lo = _df_add(y_hi, y_lo, -k, jnp.zeros_like(y_hi))
    a_hi, a_lo = _df_mul(r_hi, r_lo, jnp.full_like(xhi, _PIO2_HI),
                         jnp.full_like(xhi, _PIO2_LO))
    w_hi, w_lo = _df_mul(a_hi, a_lo, a_hi, a_lo)  # a^2
    # sin(a) = a + a*(a^2 * P(a^2))
    p_hi, p_lo = _poly_df(_SIN_C, w_hi, w_lo)
    t_hi, t_lo = _df_mul(p_hi, p_lo, w_hi, w_lo)
    t_hi, t_lo = _df_mul(t_hi, t_lo, a_hi, a_lo)
    s_hi, s_lo = _df_add(a_hi, a_lo, t_hi, t_lo)
    # cos(a) = 1 + a^2 * Q(a^2)
    q_hi, q_lo = _poly_df(_COS_C, w_hi, w_lo)
    q_hi, q_lo = _df_mul(q_hi, q_lo, w_hi, w_lo)
    c_hi, c_lo = _df_add(jnp.ones_like(xhi), jnp.zeros_like(xhi), q_hi, q_lo)
    # quadrant select: sin(x) = [sin, cos, -sin, -cos][k mod 4](a)
    q4 = k - f32(4.0) * jnp.floor(k * f32(0.25))  # exact: /4 is a scale
    use_cos = (q4 == f32(1.0)) | (q4 == f32(3.0))
    neg = (q4 == f32(2.0)) | (q4 == f32(3.0))
    o_hi = jnp.where(use_cos, c_hi, s_hi)
    o_lo = jnp.where(use_cos, c_lo, s_lo)
    return (jnp.where(neg, -o_hi, o_hi), jnp.where(neg, -o_lo, o_lo))
