"""Fused OP/Newton kernel (ops/pallas_op.py) vs the general engine.

Runs the IDENTICAL _op_core math through plain XLA (TOYSPICE_TRAN_IMPL=xla)
on the CPU test platform — Pallas interpret mode evaluates the in-kernel
Newton loop eagerly and is intractable here; the real-kernel parity runs on
TPU via tests/tools/ab_fused_op.py (regress_tpu.py).  Asserts convergence /
rescue-stage agreement and solution agreement within the double-float noise
class (the general engine solves in f64, the fused path in ~48-bit df).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.op import make_op
from toyspice_tpu.engine.dc import make_dc
from toyspice_tpu.engine.options import DEFAULTS, SimOptions
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.ops.pallas_op import (make_dc_fused, make_op_fused,
                                        op_fused_eligible,
                                        op_fused_ineligible_reason)


@pytest.fixture(autouse=True)
def _xla_impl():
    saved = os.environ.get("TOYSPICE_TRAN_IMPL")
    os.environ["TOYSPICE_TRAN_IMPL"] = "xla"
    yield
    if saved is None:
        os.environ.pop("TOYSPICE_TRAN_IMPL", None)
    else:
        os.environ["TOYSPICE_TRAN_IMPL"] = saved


D_DIV = """* diode divider
.op
Vin 1 0 DC 2
R1 1 2 1k
D1 2 0 DM
.model DM D (Is=1e-14 N=1.2)
"""

Q_BIAS = """* BJT bias (bjt1-like)
.op
VCC 1 0 DC 10
RB 1 2 47k
Q1 3 2 0 QN
RC 1 3 2.2k
.model QN NPN(Bf=100 Vaf=100)
"""

M_BIAS = """* MOSFET bias
.op
VDD 1 0 DC 5
VG 2 0 DC 2
RD 1 3 10k
M1 3 2 0 0 NM L=2u W=20u
.model NM NMOS(Level=1 VTO=0.7 KP=20u LAMBDA=0.01)
"""

D_DC = """* diode dc sweep (diode3-like)
.dc Vin 0 1.0 0.2
Vin 1 0 DC 0
D1 1 2 DM
R1 2 0 1k
.model DM D (Is=1e-14)
"""


def _ab_op(deck, overrides=None, rescue=True):
    """rescue=False skips tracing the fused rescue ladders — many minutes
    of XLA CPU compile per BJT/MOSFET deck (see make_op_fused); the ladder
    path is covered by the diode test here and the on-TPU A/B.  The decks
    converge at stage 0, so results are unaffected (asserted)."""
    cc = compile_circuit(parse(deck))
    assert op_fused_eligible(cc, "compat", DEFAULTS)
    params, axes = batch_params(cc, overrides or {})
    state0 = init_state(cc)
    op_g, _ = make_op(cc, DEFAULTS)
    if overrides:
        rg = jax.jit(jax.vmap(lambda p: op_g(p, state0),
                              in_axes=(axes,)))(params)
    else:
        rg = jax.jit(op_g)(params, state0)
    rf = jax.jit(make_op_fused(cc, DEFAULTS, rescue=rescue))(params, state0)
    if not rescue:
        assert bool(np.all(np.asarray(rg.stage) == 0)), (
            "rescue=False A/B needs a stage-0 deck")
    xg = np.atleast_2d(np.asarray(rg.x))
    xf = np.asarray(rf.x)
    np.testing.assert_array_equal(np.asarray(rf.converged).ravel(),
                                  np.asarray(rg.converged).ravel())
    np.testing.assert_array_equal(np.asarray(rf.stage).ravel(),
                                  np.asarray(rg.stage).ravel())
    np.testing.assert_allclose(xf, xg, rtol=1e-9,
                               atol=1e-9 * max(1.0, np.abs(xg).max()))
    # jv parity: the warm-start handoff consumers (AC bias, transient)
    for kind in rg.jv:
        for key in rg.jv[kind]:
            jg = np.atleast_2d(np.asarray(rg.jv[kind][key]))
            jf = np.asarray(rf.jv[kind][key])
            np.testing.assert_allclose(jf, jg, rtol=1e-9, atol=1e-11,
                                       err_msg=f"jv.{kind}.{key}")
    return rg, rf


def test_op_fused_diode():
    _ab_op(D_DIV)


def test_op_fused_bjt_batched():
    cc = compile_circuit(parse(Q_BIAS))
    rv = np.asarray(cc.params["R"]["value"])
    _ab_op(Q_BIAS, {"R": {"value": rv[None, :] * [[1.0], [0.9], [1.1]]}},
           rescue=False)


def test_op_fused_mosfet():
    _ab_op(M_BIAS, rescue=False)


def test_op_fused_eligibility():
    lin = compile_circuit(parse(
        "* lin\n.op\nV1 1 0 DC 1\nR1 1 0 1k\n"))
    assert op_fused_ineligible_reason(lin) is not None
    dcc = compile_circuit(parse(D_DIV))
    # round 4: the fused OP serves physics too (Rs/Bv eval in-kernel)
    assert op_fused_ineligible_reason(dcc, "physics") is None
    # same static-Rs-gate contract as the fused transient
    assert "Rs" in op_fused_ineligible_reason(
        dcc, "physics", params={"D": {"rs": np.ones((2, 1))}})


def test_dc_fused_diode():
    cc = compile_circuit(parse(D_DC))
    params, axes = batch_params(
        cc, {"R": {"value": np.asarray(cc.params["R"]["value"])[None, :]
                   * [[1.0], [0.8]]}})
    state0 = init_state(cc)
    pts = jnp.asarray(np.arange(0.0, 1.01, 0.2))
    dc_g = make_dc(cc, (0,), DEFAULTS)
    xs_g, conv_g = jax.jit(jax.vmap(lambda p: dc_g(p, state0, pts),
                                    in_axes=(axes,)))(params)
    xs_f, conv_f = jax.jit(
        lambda p: make_dc_fused(cc, (0,), DEFAULTS)(p, state0, pts))(params)
    np.testing.assert_array_equal(np.asarray(conv_f), np.asarray(conv_g))
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_g),
                               rtol=1e-9, atol=1e-10)


def test_select_op_engine_sees_param_overrides():
    """The PRODUCTION dispatch (select_op_engine), not just the raw gate,
    must reject a physics-mode batched Rs override that enables series
    resistance the deck's model leaves off — otherwise the fused kernel's
    static d_rs_on gate silently skips the Rs inner Newton (round-4
    ADVICE.md medium finding)."""
    from toyspice_tpu.engine.batch import select_op_engine

    cc = compile_circuit(parse(D_DIV))
    params, _ = batch_params(cc, {"D": {"rs": np.full((2, 1), 0.5)}})
    engine, reason = select_op_engine(cc, "physics", DEFAULTS, params=params)
    assert engine == "general"
    assert "Rs" in reason
    # without the override the gate itself passes (the backend check may
    # still route to general on the CPU test platform, but not because of
    # the Rs gate)
    base, _ = batch_params(cc, {})
    _, reason2 = select_op_engine(cc, "physics", DEFAULTS, params=base)
    assert "Rs" not in reason2


D_PWL_OP = """* pwl-driven diode op
.op
Vin 1 0 PWL(0 0.5 1m 2)
R1 1 2 1k
D1 2 0 DM
.model DM D (Is=1e-14 N=1.2)
"""

D_PWL_DC = """* dc sweep with a pwl aux source
.dc Vs 0 1 0.25
Vs 1 0 DC 0
Vaux 3 0 PWL(0 0.2 1m 1)
R1 1 2 1k
Raux 3 2 2k
D1 2 0 DM
.model DM D (Is=1e-14 N=1.2)
"""


def test_op_fused_batched_pwl_knots():
    """Lane-varying PWL knot tables (Monte-Carlo corners on the waveform)
    flow through the fused OP's source rows — eligibility accepts them and
    the bias matches the general engine per lane (round-4 VERDICT missing
    #5 pinned by test)."""
    cc = compile_circuit(parse(D_PWL_OP))
    pt = np.asarray(cc.params["V"]["pwl_t"])[None]
    pv = np.asarray(cc.params["V"]["pwl_v"])[None]
    overrides = {"V": {"pwl_t": np.concatenate([pt, pt * 2.0]),
                       "pwl_v": np.concatenate([pv, pv * 0.5])}}
    assert op_fused_ineligible_reason(
        cc, "compat", DEFAULTS,
        params=batch_params(cc, overrides)[0]) is None
    rg, rf = _ab_op(D_PWL_OP, overrides, rescue=False)
    # the two lanes genuinely bias differently (different t=0 PWL values)
    x = np.asarray(rg.x)
    assert abs(x[0, 1] - x[1, 1]) > 0.1


def test_dc_fused_batched_pwl_knots():
    """Per-lane PWL knots on a NON-swept auxiliary source through the
    whole-sweep DC kernel (evaluated at t=0 per lane)."""
    cc = compile_circuit(parse(D_PWL_DC))
    pt = np.asarray(cc.params["V"]["pwl_t"])[None]
    pv = np.asarray(cc.params["V"]["pwl_v"])[None]
    params, axes = batch_params(
        cc, {"V": {"pwl_t": np.concatenate([pt, pt * 2.0]),
                   "pwl_v": np.concatenate([pv, pv * 0.6])}})
    state0 = init_state(cc)
    slot = cc.names["V"].index("Vs")
    pts = jnp.asarray(np.arange(0.0, 1.01, 0.25))
    paxes = {k: {kk: (0 if np.asarray(v).ndim
                      == (3 if kk in ("pwl_t", "pwl_v") else 2) else None)
                 for kk, v in tbl.items()} for k, tbl in params.items()}
    dc_g = make_dc(cc, (slot,), DEFAULTS)
    xs_g, conv_g = jax.jit(jax.vmap(lambda p: dc_g(p, state0, pts),
                                    in_axes=(paxes,)))(params)
    xs_f, conv_f = jax.jit(
        lambda p: make_dc_fused(cc, (slot,), DEFAULTS)(p, state0, pts))(
            params)
    np.testing.assert_array_equal(np.asarray(conv_f), np.asarray(conv_g))
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_g),
                               rtol=1e-9, atol=1e-10)
    # the aux PWL source actually differs per lane
    assert np.max(np.abs(np.asarray(xs_g)[0] - np.asarray(xs_g)[1])) > 0.01
