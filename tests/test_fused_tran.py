"""Fused transient-attempt kernel (ops/pallas_tran.py) vs the general engine.

Runs the Pallas kernel in interpret mode on the CPU test platform; asserts
EXACT accepted-step/attempt parity with the general vmapped engine and
state agreement within the double-float noise class (~1e-13 rel)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# Nonlinear (D/Q/M) kernel parity is NOT emulated on CPU: the impl=xla /
# interpret emulations cost 10-20+ minutes of XLA CPU compile per deck on
# this one-core box, so the former `heavy` tier (11 such tests) was deleted
# in round 4 — the AUTHORITATIVE coverage for the in-kernel Newton is the
# on-TPU A/B, tests/tools/ab_fused_tran.py (12 decks, ~6 min, exact
# accepted-trajectory parity) run via tests/tools/regress_tpu.py and
# recorded in PARITY.md.  This file keeps the linear/magnetic interpret
# parity (fast) plus eligibility/store/physics coverage.

import jax


@pytest.fixture(autouse=True)
def _restore_fused_env():
    keys = ("TOYSPICE_TRAN_UNROLL", "TOYSPICE_TRAN_IMPL",
            "TOYSPICE_FUSED_STORE_ATTEMPTS")
    saved = {k: os.environ.get(k) for k in keys}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.options import DEFAULTS, SimOptions
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from toyspice_tpu.ops.pallas_tran import fused_eligible, make_tran_fused

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


def _compare(deck, overrides=None, opts=DEFAULTS):
    cc = compile_circuit(parse(deck))
    assert fused_eligible(cc, "compat", "none", opts)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    if not overrides:  # vmap needs at least one batched axis: trivial B=1
        overrides = {"R": {"value": np.asarray(cc.params["R"]["value"])[None, :]}}
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(make_tran(cc, cfg, store="none", opts=opts),
                           in_axes=(axes, None)))
    og = gen(params, state0)

    fused = make_tran_fused(cc, cfg, opts)
    with pltpu.force_tpu_interpret_mode():
        of = jax.jit(fused)(params, state0)

    np.testing.assert_array_equal(np.asarray(of.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(of.attempts),
                                  np.asarray(og.attempts))
    np.testing.assert_array_equal(np.asarray(of.fail), np.asarray(og.fail))
    np.testing.assert_allclose(np.asarray(of.t_final), np.asarray(og.t_final),
                               rtol=0, atol=0)
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(of.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            # rtol 5e-7: under the TPU INTERPRETER the kernel's jaxpr is
            # jitted on XLA CPU, whose fusion codegen recomputes shared df
            # subexpressions per output element with inconsistent fma
            # contraction — a bounded 1-2 ulp-of-hi (2^-23 rel) wobble on
            # knife-edge lanes.  Real-TPU Mosaic codegen does not do this:
            # the on-TPU A/B (tests/tools/ab_fused_tran.py) holds the strict
            # df-noise bound (<=2e-11) and exact trajectory parity.
            np.testing.assert_allclose(f, a, rtol=5e-7, atol=5e-13 * scale,
                                       err_msg=f"{kind}.{key}")
    return og, of


def test_fused_rc_sin_batched():
    rv = np.asarray([[100.0], [130.0], [70.0]])
    _compare(RC_SIN, {"R": {"value": rv}})


# Inductor decks pace at minstep in compat (the junk-i0 LTE quirk, PLAN.md 4)
# — 15k+ attempts, intractable under Pallas interpret mode.  A huge trtol
# lets dt grow to tmax, exercising the L stamps/commit and the growth/clamp
# logic in a few dozen attempts; the full minstep-paced parity runs on real
# TPU hardware via the A/B protocol (PARITY.md).
_HI_TRTOL = SimOptions(trtol=1e9)


def test_fused_rl_pulse():
    lv = np.asarray([[10e-3], [7e-3]])
    _compare(RL_PULSE, {"L": {"value": lv}}, opts=_HI_TRTOL)


def test_fused_rlc_mixed():
    rng = np.random.default_rng(0)
    B = 3
    cc = compile_circuit(parse(RLC_TINY))
    ovr = {
        "C": {"value": np.asarray(cc.params["C"]["value"])[None, :]
              * np.exp(rng.normal(0, 0.1, (B, 1)))},
        "L": {"value": np.asarray(cc.params["L"]["value"])[None, :]
              * np.exp(rng.normal(0, 0.1, (B, 1)))},
    }
    og, of = _compare(RLC_TINY, ovr, opts=_HI_TRTOL)
    assert int(np.asarray(og.accepted)[0]) >= 20


def test_fused_reject_halve_path():
    """trtol tuned so the LTE controller mixes accepts and rejects (halving)
    — 137 attempts / 123 accepts measured on the general engine."""
    og, of = _compare(RC_SIN, opts=SimOptions(trtol=0.0125))
    assert int(np.asarray(og.attempts)[0]) > int(np.asarray(og.accepted)[0])


def test_fused_current_source_pwl():
    _compare(IPWL)


def test_fused_stateless_deck():
    """V+R only — no C/L state rows at all (isin/vpulse/vpwl fixture shape);
    the kernel's commit stack must pass its dummy row through."""
    deck = "* vr\n.tran 0.05m 1m\nVin 1 0 SIN(0 5 1k)\nR1 1 0 1k\n"
    _compare(deck)


def test_fused_temperature_option():
    """tc1/tc2-adjusted conductances flow through the const stack (tc is a
    programmatic parameter, as in the reference — resistor.go:77-81)."""
    ovr = {"R": {"value": np.asarray([[100.0]]),
                 "tc1": np.asarray([[0.01]]),
                 "tc2": np.asarray([[1e-4]])}}
    _compare(RC_SIN, ovr, opts=SimOptions(temp=350.0))


def test_fused_eligibility_gates():
    opts = DEFAULTS
    cc = compile_circuit(parse(RC_SIN))
    assert fused_eligible(cc, "compat", "none", opts)
    assert fused_eligible(cc, "physics", "none", opts)  # physics linear
    assert fused_eligible(cc, "compat", "full", opts)  # waveform store
    assert not fused_eligible(cc, "compat", "sparse", opts)
    assert not fused_eligible(cc, "compat", "none",
                              SimOptions(integration="trap"))
    dcc = compile_circuit(parse(
        "* d\n.tran 0.1m 1m\nV1 1 0 DC 1\nR1 1 2 1k\nD1 2 0 D\n"))
    assert fused_eligible(dcc, "compat", "none", opts)  # in-kernel Newton
    # round 4: physics nonlinear fuses too (Rs/Bv eval + committed
    # charge-memory companions in-kernel)
    assert fused_eligible(dcc, "physics", "none", opts)
    assert fused_eligible(dcc, "physics", "none",
                          SimOptions(integration="trap"))
    # ... but a batched override ENABLING Rs on a device whose deck leaves
    # it 0 would bypass the static Rs gate — rejected
    assert not fused_eligible(dcc, "physics", "none", opts,
                              params={"D": {"rs": np.ones((4, 1))}})
    assert fused_eligible(dcc, "compat", "none", opts,
                          params={"D": {"rs": np.ones((4, 1))}})
    qcc = compile_circuit(parse(
        "* q\n.tran 0.1m 1m\nV1 1 0 DC 1\nR1 1 2 1k\nQ1 1 2 0 QX\n"
        ".model QX NPN (Bf=100)\n"))
    assert fused_eligible(qcc, "compat", "none", opts)  # in-kernel Newton
    assert fused_eligible(qcc, "physics", "none", opts)
    mcc = compile_circuit(parse(
        "* m\n.tran 0.1m 1m\nV1 1 0 DC 1\nR1 1 2 1k\nM1 2 1 0 0 MX\n"
        ".model MX NMOS (Vto=1)\n"))
    assert fused_eligible(mcc, "compat", "none", opts)  # in-kernel Newton
    assert fused_eligible(mcc, "physics", "none", opts)
    lmcc = compile_circuit(parse(
        "* lm\n.tran 0.1m 1m\nV1 1 0 SIN(0 1 1k)\nL1 1 2 core=CX turns=50\n"
        "R1 2 0 10\n.model CX CORE (Ms=1.6meg)\n"))
    assert fused_eligible(lmcc, "compat", "none", opts)  # frozen J-A core
    assert fused_eligible(lmcc, "physics", "none", opts)  # live J-A core


# ---- transformer decks: mutual couplings + magnetic inductors ----
# Linear-inductor decks pace at minstep in compat (junk-i0 LTE, PLAN.md 4);
# high trtol keeps interpret-mode attempt counts tractable, as for RL above.

XFMR_LIN = """* 2-winding linear transformer (transformer1.cir topology)
.tran 0.05m 1m
Vin 1 0 SIN(0 10 1k)
Rp 1 2 0.1
Lp 2 0 200m
Ls 3 0 50m
Rs 3 4 0.05
Rload 4 0 10k
K1 Lp Ls 0.95
"""

XFMR_3W = """* 3-winding transformer: 3 pairwise couplings (transformer2.cir)
.tran 0.05m 1m
Vin 1 0 SIN(0 10 1k)
Rp 1 2 0.1
Lp 2 0 200m
Ls1 3 0 50m
R1 3 4 0.05
RloadA 4 0 100
Ls2 5 0 50m
R2 5 6 0.05
RloadB 6 0 100
K1 Lp Ls1 Ls2 0.95
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


def test_fused_transformer_linear():
    lv = np.asarray([[200e-3, 50e-3], [150e-3, 40e-3]])
    og, of = _compare(XFMR_LIN, {"L": {"value": lv}}, opts=_HI_TRTOL)
    assert int(np.asarray(og.accepted)[0]) >= 10


def test_fused_transformer_three_winding():
    _compare(XFMR_3W, opts=_HI_TRTOL)


def test_fused_transformer_magnetic():
    """LM branch rows (frozen J-A core, compat) + LM-LM mutual coupling:
    the L0/Leff gate and the frozen-i0 RHS memory flow through the dyn
    stack; state passthrough is asserted by the state comparison loop."""
    og, of = _compare(XFMR_MAG, opts=_HI_TRTOL)
    assert "LM" in og.state
    assert int(np.asarray(og.accepted)[0]) >= 10


def test_fused_transformer_mixed_kinds():
    """A mutual pair coupling a LINEAR inductor to a MAGNETIC winding: the
    per-pair static partner dispatch (live in-kernel junk i0 vs frozen LM
    i0) is exercised on both sides."""
    deck = """* mixed L-LM coupling
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
    og, of = _compare(deck, opts=_HI_TRTOL)
    assert "L" in og.state and "LM" in og.state


# ---- store='full' waveform storage from the fused path ----

RC_TSTART = """* rc sin with tstart
.tran 0.02m 1m 0.4m
Vin 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""


def _compare_store_full(deck, overrides=None, opts=DEFAULTS):
    """Waveform A/B: the fused path's attempt-indexed store + compaction
    must reproduce the general engine's accepted-indexed rows exactly in
    time and to df precision in values (general solves in f64 on the CPU
    test platform, fused in double-float)."""
    os.environ["TOYSPICE_TRAN_IMPL"] = "xla"
    os.environ["TOYSPICE_TRAN_UNROLL"] = "2"
    # small attempt buffer: these decks take <500 attempts, and the default
    # 2*max_store+256 would allocate ~100MB of lane-padded buffer per test
    os.environ["TOYSPICE_FUSED_STORE_ATTEMPTS"] = "2048"
    cc = compile_circuit(parse(deck))
    assert fused_eligible(cc, "compat", "full", opts)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    if not overrides:
        overrides = {"R": {"value": np.asarray(cc.params["R"]["value"])[None, :]}}
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(make_tran(cc, cfg, store="full", opts=opts),
                           in_axes=(axes, None)))
    og = gen(params, state0)
    of = jax.jit(make_tran_fused(cc, cfg, opts, store="full"))(params, state0)

    np.testing.assert_array_equal(np.asarray(of.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(of.out_n), np.asarray(og.out_n))
    assert not bool(np.any(np.asarray(of.store_overflow)))
    b = np.asarray(og.out_n).shape[0]
    for i in range(b):
        ns = int(og.out_n[i])
        np.testing.assert_array_equal(np.asarray(of.out_t[i, :ns]),
                                      np.asarray(og.out_t[i, :ns]))
        sc = max(1e-30, float(np.max(np.abs(np.asarray(og.out_x[i, :ns])))))
        np.testing.assert_allclose(np.asarray(of.out_x[i, :ns]),
                                   np.asarray(og.out_x[i, :ns]),
                                   rtol=5e-7, atol=5e-10 * sc)
        # masked padding rows are zeroed like a fresh buffer
        assert np.all(np.asarray(of.out_x[i, ns:]) == 0.0)
        assert np.all(np.asarray(of.out_t[i, ns:]) == 0.0)
    return og, of


def test_fused_store_full_linear():
    rv = np.asarray([[100.0], [130.0], [70.0]])
    _compare_store_full(RC_SIN, {"R": {"value": rv}})


def test_fused_store_full_reject_churn():
    """Mixed accept/reject trajectories: kept rows are interleaved with
    rejected attempts in the attempt buffer, so compaction must skip the
    rejects."""
    og, _ = _compare_store_full(RC_SIN, opts=SimOptions(trtol=0.0125))
    assert int(np.asarray(og.attempts)[0]) > int(np.asarray(og.accepted)[0])


def test_fused_store_full_tstart():
    """Rows before tstart are accepted but not stored (tran.go:141-143)."""
    og, of = _compare_store_full(RC_TSTART)
    assert int(np.asarray(og.out_n)[0]) < int(np.asarray(og.accepted)[0])
    assert float(np.asarray(of.out_t)[0, 0]) >= 0.4e-3



# ---- physics-mode fused transients (round 3): BE + trapezoidal companions,
# bias-point seeding, live J-A core state carried in the attempt loop ----

TRANS_SMALL = """* small 2-winding J-A transformer
Vin 1 0 sin(0 10 1k)
Rp 1 2 0.5
Lp 2 0 core=C1 turns=300
Ls 3 0 core=C1 turns=150
Rload 3 0 1000
.model C1 core(ms=1.6e6 alpha=1e-3 a=1000 c=0.1 k=2000 area=1e-4 len=0.1)
K1 Lp Ls 0.95
.tran 20u 1m
"""


def _compare_physics(deck, integration, overrides=None):
    opts = SimOptions(integration=integration)
    cc = compile_circuit(parse(deck))
    assert fused_eligible(cc, "physics", "none", opts)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    if not overrides:
        overrides = {"R": {"value": np.asarray(cc.params["R"]["value"])[None, :]}}
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(
        make_tran(cc, cfg, semantics="physics", store="none", opts=opts),
        in_axes=(axes, None)))
    og = gen(params, state0)

    fused = make_tran_fused(cc, cfg, opts, semantics="physics")
    with pltpu.force_tpu_interpret_mode():
        of = jax.jit(fused)(params, state0)

    np.testing.assert_array_equal(np.asarray(of.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(of.attempts),
                                  np.asarray(og.attempts))
    np.testing.assert_array_equal(np.asarray(of.fail), np.asarray(og.fail))
    np.testing.assert_allclose(np.asarray(of.t_final), np.asarray(og.t_final),
                               rtol=0, atol=0)
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(of.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            np.testing.assert_allclose(f, a, rtol=5e-7, atol=5e-13 * scale,
                                       err_msg=f"{kind}.{key}")
    return og, of


def test_fused_physics_be_rlc():
    rv = np.asarray([[100.0], [92.0]])
    _compare_physics(RLC_TINY, "be", {"R": {"value": np.concatenate(
        [rv, np.full((2, 1), 1e4)], axis=1)}})


def test_fused_physics_trap_rlc():
    rv = np.asarray([[100.0], [92.0]])
    _compare_physics(RLC_TINY, "trap", {"R": {"value": np.concatenate(
        [rv, np.full((2, 1), 1e4)], axis=1)}})


def test_fused_physics_magnetic_live_ja():
    og, of = _compare_physics(TRANS_SMALL, "be")
    # the live core actually evolved (compat would freeze it at zero)
    assert float(np.max(np.abs(np.asarray(og.state["LM"]["M"])))) > 0.0


def test_fused_physics_trap_magnetic():
    _compare_physics(TRANS_SMALL, "trap")
