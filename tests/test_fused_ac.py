"""Fused AC stamped-solve (ops/pallas_ac.py) vs the general assemble+solve.

The fused path extracts G/B̂ from ONE per-instance assemble at omega = 1
and builds+solves every (instance, frequency) system in-kernel; here the
kernel math runs as plain XLA (TOYSPICE_TRAN_IMPL=xla) on the CPU test
platform, against the general path's f64 assemble + solve.  Real-kernel
parity runs on TPU (tests/tools/ab_fused_op.py AC stage)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.ac import frequency_points, make_ac_batch
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.options import DEFAULTS
from toyspice_tpu.engine.state import init_state


@pytest.fixture(autouse=True)
def _env():
    saved = {k: os.environ.get(k)
             for k in ("TOYSPICE_TRAN_IMPL", "TOYSPICE_AC")}
    os.environ["TOYSPICE_TRAN_IMPL"] = "xla"
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


BJT_AC = """* bjt3-style AC amplifier
.ac DEC 10 10 100k
VCC 1 0 DC 12
VIN 4 0 DC 0 AC 1
CIN 4 2 10u
RB1 1 2 100k
RB2 2 0 22k
Q1 3 2 5 QN
RC 1 3 4.7k
RE 5 0 1k
.model QN NPN(Bf=150 Cje=10p Cjc=5p Tf=0.5n)
"""

RLC_AC = """* passive RLC AC
.ac LIN 12 100 10k
Vin 1 0 DC 0 AC 1 0
R1 1 2 100
L1 2 3 10m
C1 3 0 1u
R2 3 0 1k
"""

DIODE_AC = """* diode AC (gd + jwCj at bias)
.ac DEC 8 100 1meg
Vin 1 0 DC 0.6 AC 0.01
R1 1 2 500
D1 2 0 DM
.model DM D (Is=1e-14 N=1.2 Cj0=4p Vj=0.8 M=0.4)
"""


def _ab(deck, batch=3):
    cc = compile_circuit(parse(deck))
    ap = cc.netlist.ac
    freqs = jnp.asarray(frequency_points(ap.sweep, ap.fstart, ap.fstop,
                                         ap.points))
    rng = np.random.default_rng(2)
    base = np.asarray(cc.params["R"]["value"])[None, :]
    params, axes = batch_params(cc, {"R": {"value": base * np.exp(
        rng.normal(0, 0.05, (batch, base.shape[1])))}})
    state0 = init_state(cc)

    os.environ["TOYSPICE_AC"] = "general"
    xr_g, xi_g, opr_g = jax.jit(make_ac_batch(cc, axes, DEFAULTS))(
        params, state0, freqs)
    os.environ["TOYSPICE_AC"] = "fused"
    xr_f, xi_f, opr_f = jax.jit(make_ac_batch(cc, axes, DEFAULTS))(
        params, state0, freqs)

    np.testing.assert_array_equal(np.asarray(opr_f.converged).ravel(),
                                  np.asarray(opr_g.converged).ravel())
    scale = max(float(np.max(np.abs(np.asarray(xr_g)))),
                float(np.max(np.abs(np.asarray(xi_g)))), 1e-12)
    np.testing.assert_allclose(np.asarray(xr_f), np.asarray(xr_g),
                               rtol=2e-9, atol=2e-9 * scale)
    np.testing.assert_allclose(np.asarray(xi_f), np.asarray(xi_g),
                               rtol=2e-9, atol=2e-9 * scale)


def test_ac_fused_bjt():
    _ab(BJT_AC)


def test_ac_fused_rlc_linear():
    _ab(RLC_AC)


def test_ac_fused_diode():
    _ab(DIODE_AC)


def test_ac_fused_eligibility():
    from toyspice_tpu.ops.pallas_ac import ac_fused_ineligible_reason

    cc = compile_circuit(parse(RLC_AC))
    assert ac_fused_ineligible_reason(cc) is None
    assert ac_fused_ineligible_reason(cc, "bogus") is not None
