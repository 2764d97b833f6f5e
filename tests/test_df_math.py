"""Accuracy sweeps for the double-float transcendentals (ops/df_math.py)
against f64, over the ranges the device models use."""

import numpy as np

import jax
import jax.numpy as jnp

from toyspice_tpu.ops.df_math import df_div, df_exp, df_log, df_pow, df_sqrt


def _to_df(x64):
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _from_df(hi, lo):
    return np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(np.float64)


def test_df_exp_sweep():
    rng = np.random.default_rng(0)
    # diode range: exp-arg clamped to <= 40 (diode.go:127-131); cover the
    # deep-reverse side down to f32 underflow territory
    x = np.concatenate([
        rng.uniform(-87.0, 40.0, 20000),
        rng.uniform(-1.0, 1.0, 5000),
        np.asarray([0.0, 40.0, -87.0, 1e-8, -1e-8, 0.5, -0.5]),
    ])
    got = _from_df(*df_exp(*_to_df(x)))
    ref = np.exp(x)
    rel = np.abs(got - ref) / np.maximum(ref, 1e-300)
    # full df precision where the lo limb is representable; near the f32
    # floor (results < ~1e-30) the pair degrades to hi-only (~1e-7) — the
    # device models never consume that region (diode exp args are >= -3
    # in the selected branch)
    assert np.max(rel[ref >= 1e-26]) < 2e-13, float(np.max(rel[ref >= 1e-26]))
    assert np.max(rel[ref < 1e-26]) < 1e-6, float(np.max(rel[ref < 1e-26]))


def test_df_exp_tiny_result_underflow():
    # far below the f32 normal range the pair degrades to 0 like f32; the
    # diode model only needs exp(<=-87) ~ 0 vs is_t scales
    x = np.asarray([-100.0, -200.0, -500.0])
    got = _from_df(*df_exp(*_to_df(x)))
    assert np.all(got >= 0) and np.all(got < 1e-37)


def test_df_log_sweep():
    rng = np.random.default_rng(1)
    x = np.concatenate([
        np.exp(rng.uniform(-80.0, 80.0, 20000)),
        rng.uniform(1e-6, 10.0, 5000),
        np.asarray([1.0, 2.0, 0.5, 1e-30, 1e30]),
    ])
    got = _from_df(*df_log(*_to_df(x)))
    ref = np.log(x)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    # inputs below ~1e-30 lose their own lo limb to f32 underflow, bounding
    # accuracy at the input-representation level (~1e-8 abs); pnjlim's log
    # arguments are junction voltages over Vt, never near that range
    big = x >= 1e-27
    assert np.max(err[big]) < 2e-13, float(np.max(err[big]))
    assert np.max(err[~big]) < 1e-8, float(np.max(err[~big]))


def test_df_sqrt_sweep():
    rng = np.random.default_rng(3)
    x = np.concatenate([
        np.exp(rng.uniform(-60.0, 60.0, 20000)),
        rng.uniform(0.0, 4.0, 5000),
        np.asarray([0.0, 1.0, 2.0, 0.25, 1e-30, 1e30]),
    ])
    got = _from_df(*df_sqrt(*_to_df(x)))
    ref = np.sqrt(x)
    rel = np.abs(got - ref) / np.maximum(ref, 1e-300)
    assert got[x == 0.0] == 0.0
    pos = x > 1e-27  # below that the input pair itself is hi-only
    assert np.max(rel[pos]) < 2e-13, float(np.max(rel[pos]))


def test_df_sqrt_negative_is_zero():
    x = np.asarray([-1.0, -1e-10, -1e10])
    got = _from_df(*df_sqrt(*_to_df(x)))
    np.testing.assert_array_equal(got, 0.0)


def test_df_pow_sweep():
    rng = np.random.default_rng(4)
    # MOSFET ranges: junction caps pow(1-v/pb, mj) with mj ~ 0.3-0.5 and
    # base in [1e-30, ~100]; mobility pow(eeff/ucrit, uexp), uexp ~ 0-2
    x = np.exp(rng.uniform(-60.0, 10.0, 20000))
    y = rng.uniform(0.0, 2.0, 20000)
    got = _from_df(*df_pow(*_to_df(x), *_to_df(y)))
    ref = np.power(x, y)
    rel = np.abs(got - ref) / np.maximum(ref, 1e-300)
    ok = ref >= 1e-26  # result above the pair's representable floor
    # rel error ~ eps_df * |y*log x| (<= 120 in this sweep -> ~1e-12)
    assert np.max(rel[ok]) < 2e-12, float(np.max(rel[ok]))


def test_df_div_sweep():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1e6, 1e6, 10000)
    b = np.where(np.abs(rng.uniform(-1e3, 1e3, 10000)) < 1e-9, 1.0,
                 rng.uniform(-1e3, 1e3, 10000))
    got = _from_df(*df_div(*_to_df(a), *_to_df(b)))
    ref = a / b
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30)
    assert np.max(rel) < 1e-13, float(np.max(rel))


def test_df_sin_vs_f64():
    from toyspice_tpu.ops.df_math import df_sin

    rng = np.random.default_rng(11)
    # SIN-source argument range: 2*pi*f*t + phase over deck time spans
    x = np.concatenate([
        rng.uniform(-10.0, 10.0, 300),
        rng.uniform(-1e4, 1e4, 300),
        np.asarray([0.0, np.pi / 2, np.pi, 1.5 * np.pi, 2 * np.pi,
                    -np.pi / 2, 0.25, 1e-8, -1e-8]),
    ])
    hi = jnp.asarray(x, dtype=jnp.float32)
    lo = jnp.asarray(x - np.asarray(hi, dtype=np.float64),
                     dtype=jnp.float32)
    sh, sl = jax.jit(df_sin)(hi, lo)
    got = np.asarray(sh, dtype=np.float64) + np.asarray(sl, dtype=np.float64)
    want = np.sin(x)
    # absolute error ~|x| * 2^-48 (argument pair ulp)
    tol = np.maximum(np.abs(x), 1.0) * 2.0 ** -46
    assert np.all(np.abs(got - want) <= tol)


def test_df_floor():
    from toyspice_tpu.ops.df_math import df_floor

    cases = np.asarray([0.0, 0.5, 1.0, -0.5, -1.0, 2.75, -2.75,
                        12345.678, -12345.678, 1e6 + 0.25])
    hi = jnp.asarray(cases, dtype=jnp.float32)
    lo = jnp.asarray(cases - np.asarray(hi, dtype=np.float64),
                     dtype=jnp.float32)
    got = np.asarray(jax.jit(df_floor)(hi, lo), dtype=np.float64)
    np.testing.assert_array_equal(got, np.floor(cases))
    # the lo limb decides at exact-integer hi values
    h2 = jnp.asarray([2.0, 2.0, -3.0], dtype=jnp.float32)
    l2 = jnp.asarray([-1e-9, 1e-9, -1e-9], dtype=jnp.float32)
    got2 = np.asarray(jax.jit(df_floor)(h2, l2), dtype=np.float64)
    np.testing.assert_array_equal(got2, [1.0, 2.0, -4.0])
