"""Whole-run fused transient kernel (ops/pallas_run.py) vs the general
engine.

Runs the IDENTICAL _run_core math through plain XLA
(TOYSPICE_TRAN_IMPL=xla) on the CPU test platform — the run kernel moves
the TIME LOOP itself into the kernel, so interpret mode would execute
hundreds of attempts eagerly.  Asserts EXACT accepted/attempt/fail parity
with the general vmapped engine (the step-control comparisons are exact df
equivalents of the f64 forms) and state agreement within the double-float
noise class; t_final is now df (~48-bit), so it is compared allclose, not
bitwise.  Nonlinear (D/Q/M) run-kernel parity is TPU-only
(tests/tools/ab_fused_tran.py) for the same compile-cost reason the heavy
tier was deleted (see tests/test_fused_tran.py header)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.options import DEFAULTS, SimOptions
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from toyspice_tpu.ops.pallas_run import (make_tran_run, run_eligible,
                                         run_ineligible_reason)


@pytest.fixture(autouse=True)
def _xla_impl():
    saved = os.environ.get("TOYSPICE_TRAN_IMPL")
    os.environ["TOYSPICE_TRAN_IMPL"] = "xla"
    yield
    if saved is None:
        os.environ.pop("TOYSPICE_TRAN_IMPL", None)
    else:
        os.environ["TOYSPICE_TRAN_IMPL"] = saved


RC_SIN = """* rc sin
.tran 0.02m 1m
Vin 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""

RL_PULSE = """* rl pulse
.tran 0.02m 1m
Vin 1 0 PULSE(0 5 0.1m 0.01m 0.01m 0.3m 0.8m)
R1 1 2 50
L1 2 0 10m
"""

RLC_TINY = """* rlc tiny
.tran 0.05m 0.5m
Vin 1 0 SIN(1 4 2k)
R1 1 2 100
L1 2 3 5m
C1 3 0 0.5u
R2 3 0 10k
"""

IPWL = """* isrc pwl into rc
.tran 0.02m 1m
I1 0 1 PWL(0 0 0.2m 3m 0.5m 1m)
R1 1 0 1k
C1 1 0 0.2u
C2 1 2 0.1u
R2 2 0 2k
"""

XFMR_MAG = """* J-A core transformer (transformer3.cir topology)
.tran 0.05m 1m
Vin 1 0 SIN(0 10 1k)
Rp 1 2 0.1
Lp 2 0 core=C1 turns=300
Rs 3 4 0.1
Ls 3 0 core=C1 turns=150
Rload 4 0 1000
.model C1 core(ms=1.6e6 alpha=1e-3 a=1000 c=0.1 k=2000 area=1e-4 len=0.1)
K1 Lp Ls 0.95
"""

XFMR_MIXED = """* mixed L-LM coupling
.tran 0.05m 1m
Vin 1 0 SIN(0 5 1k)
Rp 1 2 0.5
Lp 2 0 100m
Rs 3 4 0.2
Ls 3 0 core=C1 turns=200
Rload 4 0 500
.model C1 core(ms=1.2e6 alpha=2e-3 a=800 c=0.2 k=1500 area=2e-4 len=0.05)
K1 Lp Ls 0.9
"""

# Inductor decks pace at minstep in compat (junk-i0 LTE quirk, PLAN.md 4):
# high trtol keeps CPU attempt counts tractable, as in test_fused_tran.py.
_HI_TRTOL = SimOptions(trtol=1e9)


def _compare(deck, overrides=None, opts=DEFAULTS):
    cc = compile_circuit(parse(deck))
    assert run_eligible(cc, "compat", "none", opts), \
        run_ineligible_reason(cc, "compat", "none", opts)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    if not overrides:
        overrides = {
            "R": {"value": np.asarray(cc.params["R"]["value"])[None, :]}}
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(make_tran(cc, cfg, store="none", opts=opts),
                           in_axes=(axes, None)))
    og = gen(params, state0)

    orun = jax.jit(make_tran_run(cc, cfg, opts))(params, state0)

    np.testing.assert_array_equal(np.asarray(orun.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(orun.attempts),
                                  np.asarray(og.attempts))
    np.testing.assert_array_equal(np.asarray(orun.fail),
                                  np.asarray(og.fail))
    np.testing.assert_allclose(np.asarray(orun.t_final),
                               np.asarray(og.t_final), rtol=1e-11, atol=0)
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(orun.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            # the run kernel additionally evaluates SOURCES in df (the
            # attempt-loop engine feeds exact-f64 values into the kernel),
            # so the bound is the df waveform class, not pure solver noise
            np.testing.assert_allclose(f, a, rtol=1e-7, atol=1e-11 * scale,
                                       err_msg=f"{kind}.{key}")
    return og, orun


def test_run_rc_sin_batched():
    rv = np.asarray([[100.0], [130.0], [70.0]])
    _compare(RC_SIN, {"R": {"value": rv}})


def test_run_rl_pulse():
    _compare(RL_PULSE, opts=_HI_TRTOL)


def test_run_rlc_mixed():
    _compare(RLC_TINY, opts=_HI_TRTOL)


def test_run_current_source_pwl():
    _compare(IPWL)


def test_run_pwl_batched_knots():
    """Per-lane PWL knot tables (Monte-Carlo corners on the waveform
    itself) ride the run-const stack as lane rows."""
    cc = compile_circuit(parse(IPWL))
    pt = np.asarray(cc.params["I"]["pwl_t"])[None]  # (1, nS, P)
    pv = np.asarray(cc.params["I"]["pwl_v"])[None]
    overrides = {"I": {
        "pwl_t": np.concatenate([pt, pt * 1.3], axis=0),
        "pwl_v": np.concatenate([pv, pv * 0.7], axis=0)}}
    og, orun = _compare(IPWL, overrides)
    # the two lanes genuinely diverged (different waveforms)
    v = np.asarray(og.state["C"]["v0"])
    assert abs(v[0, 0] - v[1, 0]) > 1e-6


def test_run_transformer_magnetic():
    og, orun = _compare(XFMR_MAG, opts=_HI_TRTOL)
    assert "LM" in og.state
    assert int(np.asarray(og.accepted)[0]) >= 10


def test_run_transformer_mixed_kinds():
    og, orun = _compare(XFMR_MIXED, opts=_HI_TRTOL)
    assert "L" in og.state and "LM" in og.state


def test_run_eligibility_gates():
    cc = compile_circuit(parse(RC_SIN))
    assert run_eligible(cc, "compat", "none", DEFAULTS)
    assert "store" in run_ineligible_reason(cc, "compat", "full", DEFAULTS)
    mag = compile_circuit(parse(XFMR_MAG))
    assert run_eligible(mag, "compat", "none", DEFAULTS)
    phys_opts = SimOptions(integration="be")
    # physics magnetics fuse too: the live J-A core rides the in-kernel
    # state stack (round-5)
    assert run_eligible(mag, "physics", "none", phys_opts)
    assert run_eligible(cc, "physics", "none", phys_opts)


def test_run_physics_linear_be():
    """Physics/BE linear deck: bias-point state seeding + committed C
    current rows flow through the run kernel's state stack."""
    cc = compile_circuit(parse(RC_SIN))
    opts = SimOptions(integration="be")
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    rv = np.asarray([[100.0], [90.0]])
    params, axes = batch_params(cc, {"R": {"value": rv}})
    gen = jax.jit(jax.vmap(
        make_tran(cc, cfg, semantics="physics", store="none", opts=opts),
        in_axes=(axes, None)))
    og = gen(params, state0)
    orun = jax.jit(make_tran_run(cc, cfg, opts, semantics="physics"))(
        params, state0)
    np.testing.assert_array_equal(np.asarray(orun.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(orun.fail), np.asarray(og.fail))
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(orun.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            np.testing.assert_allclose(f, a, rtol=1e-6, atol=1e-10 * scale,
                                       err_msg=f"{kind}.{key}")


def test_run_dispatch():
    """select_tran_engine prefers the whole-run kernel when eligible on
    the Pallas backend (forced here via TOYSPICE_TRAN=fused), and
    TOYSPICE_TRAN_RUN=off falls back to the attempt-loop kernel."""
    from toyspice_tpu.engine.batch import select_tran_engine

    cc = compile_circuit(parse(RC_SIN))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    params, axes = batch_params(
        cc, {"R": {"value": np.asarray(cc.params["R"]["value"])[None, :]}})
    saved = {k: os.environ.get(k)
             for k in ("TOYSPICE_TRAN", "TOYSPICE_TRAN_RUN")}
    try:
        os.environ["TOYSPICE_TRAN"] = "fused"
        engine, reason, _ = select_tran_engine(cc, cfg, axes, params=params)
        assert engine == "run", reason
        os.environ["TOYSPICE_TRAN_RUN"] = "off"
        engine, reason, _ = select_tran_engine(cc, cfg, axes, params=params)
        assert engine == "fused", reason
        # store='full' keeps the attempt-loop engine (waveform buffer)
        os.environ.pop("TOYSPICE_TRAN_RUN")
        engine, _, _ = select_tran_engine(cc, cfg, axes, store="full",
                                          params=params)
        assert engine == "fused"
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


TRANS_PHYS = """* small 2-winding J-A transformer (physics live core)
Vin 1 0 sin(0 10 1k)
Rp 1 2 0.5
Lp 2 0 core=C1 turns=300
Ls 3 0 core=C1 turns=150
Rload 3 0 1000
.model C1 core(ms=1.6e6 alpha=1e-3 a=1000 c=0.1 k=2000 area=1e-4 len=0.1)
K1 Lp Ls 0.95
.tran 20u 0.2m
"""


def test_run_physics_magnetic_ja():
    """Physics magnetic deck through the run kernel: the LIVE J-A core
    (H/Hold/M/Mirr/dMdH) rides the in-kernel state stack, the update runs
    in df (coth via df_exp) and commits on accept — vs the general physics
    engine (round-4 VERDICT missing #8)."""
    cc = compile_circuit(parse(TRANS_PHYS))
    opts = SimOptions(integration="be")
    assert run_eligible(cc, "physics", "none", opts)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    rv = np.asarray(cc.params["R"]["value"])[None, :]
    params, axes = batch_params(
        cc, {"R": {"value": rv * [[1.0], [0.95]]}})
    gen = jax.jit(jax.vmap(
        make_tran(cc, cfg, semantics="physics", store="none", opts=opts),
        in_axes=(axes, None)))
    og = gen(params, state0)
    orun = jax.jit(make_tran_run(cc, cfg, opts, semantics="physics"))(
        params, state0)
    np.testing.assert_array_equal(np.asarray(orun.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(orun.attempts),
                                  np.asarray(og.attempts))
    np.testing.assert_array_equal(np.asarray(orun.fail), np.asarray(og.fail))
    assert int(np.asarray(og.accepted).min()) >= 5
    assert "LM" in og.state
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(orun.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            # J-A state quantities (H ~ 1e3-1e5, M ~ 1e5) pass through the
            # coth/denominator-clamp chain; df noise lands in the 1e-9
            # class on knife-edge-free trajectories
            np.testing.assert_allclose(f, a, rtol=1e-6, atol=1e-8 * scale,
                                       err_msg=f"{kind}.{key}")
