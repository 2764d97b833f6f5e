"""Pallas double-float solve kernel vs the XLA f64 path.

Runs the TPU kernel in Pallas interpret mode so the double-float arithmetic
and one-hot pivoting logic are exercised on the CPU test platform; on real
TPU hardware the same kernel is selected automatically (TOYSPICE_SOLVER=auto
→ pallas when default_backend()=='tpu', ops/solve.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from toyspice_tpu.ops.pallas_solve import pallas_solve_batched
from toyspice_tpu.ops.solve import _solve_batched


def _pallas(a, b):
    with pltpu.force_tpu_interpret_mode():
        return pallas_solve_batched(a, b)


@pytest.fixture(scope="module")
def systems():
    rng = np.random.default_rng(7)
    B, n = 160, 6  # non-multiple of 128: exercises the pad path
    a = rng.normal(size=(B, n, n)) + 4.0 * np.eye(n)
    b = rng.normal(size=(B, n))
    return jnp.asarray(a), jnp.asarray(b)


def test_matches_xla_f64(systems):
    a, b = systems
    x_ref = _solve_batched(a, b)
    x = _pallas(a, b)
    err = jnp.max(jnp.abs(x - x_ref) / (jnp.abs(x_ref) + 1e-30))
    # double-float carries ~48 mantissa bits; forward error is cond-amplified
    assert float(err) < 1e-9


def test_pivoting_zero_diagonal(systems):
    # voltage-source-style branch row: structural zero on the diagonal
    a, b = systems
    a = a.at[:, 3, 3].set(0.0)
    x_ref = _solve_batched(a, b)
    x = _pallas(a, b)
    err = jnp.max(jnp.abs(x - x_ref) / (jnp.abs(x_ref) + 1e-30))
    assert float(err) < 1e-9


def test_singular_goes_nonfinite(systems):
    a, b = systems
    a = a.at[:, 2, :].set(0.0)  # rank-deficient row
    x = _pallas(a, b)
    assert not bool(jnp.any(jnp.isfinite(x[:, 2])) and jnp.all(jnp.isfinite(x)))


def test_residual_backward_error(systems):
    a, b = systems
    x = _pallas(a, b)
    r = jnp.einsum("bij,bj->bi", a, x) - b
    scale = jnp.max(jnp.abs(a), axis=(1, 2)) * jnp.max(jnp.abs(x), axis=1)
    assert float(jnp.max(jnp.abs(r) / scale[:, None])) < 1e-12
