"""`physics` semantics: the quirk-fixed mode (textbook BE companions, live
Jiles-Atherton state, consistent mutual-coupling memory terms)."""

import numpy as np
import pytest

import jax

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from tests.conftest import read_fixture


def run_physics(name_or_text, from_fixture=True):
    text = read_fixture(name_or_text) if from_fixture else name_or_text
    cc = compile_circuit(parse(text))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    tran = make_tran(cc, cfg, semantics="physics", store="full")
    out = jax.jit(tran)(_params(cc), init_state(cc))
    assert not bool(out.fail)
    n = int(out.out_n)
    return cc, np.asarray(out.out_t)[:n], np.asarray(out.out_x)[:n], out


def test_transformer1_physics_coupling():
    """With the consistent +M/dt·I_prev memory term the linear transformer
    actually transforms: k=0.95, Lp/Ls=4 -> open-ish secondary amplitude
    ≈ k·sqrt(Ls/Lp) = 0.475 of the primary winding voltage."""
    cc, t, x, _ = run_physics("transformer1.cir")
    vp = x[:, cc.node_map["2"]]  # primary winding node
    vs = x[:, cc.node_map["3"]]  # secondary winding node
    tail = t > 1.5e-3
    ratio = np.max(np.abs(vs[tail])) / np.max(np.abs(vp[tail]))
    assert 0.35 < ratio < 0.6, ratio


def test_transformer3_ja_core_evolves():
    """physics mode drives the Jiles-Atherton core: magnetization state must
    move and the waveform stay bounded."""
    cc, t, x, out = run_physics("transformer3.cir")
    lm = out.state["LM"]
    assert float(np.max(np.abs(np.asarray(lm["M"])))) > 0.0
    assert float(np.max(np.abs(np.asarray(lm["Mirr"])))) > 0.0
    # currents are live, not frozen at 0 (the compat quirk)
    assert float(np.max(np.abs(np.asarray(lm["i0"])))) > 0.0
    vload = x[:, cc.node_map["4"]]
    assert np.all(np.isfinite(vload))
    assert np.max(np.abs(vload)) < 100.0


D_RS = """* forward diode with series resistance
.tran 0.05m 0.5m
Vin 1 0 DC 5
R1 1 2 {R}
D1 2 0 DM
.model DM D (Is=1e-14 Rs={RS})
"""

D_BV = """* reverse diode into breakdown
.tran 0.05m 0.5m
Vin 1 0 DC -200
R1 1 2 1k
D1 2 0 DM
.model DM D (Is=1e-14 Bv=100)
"""


def test_diode_rs_physics_equals_external_resistor():
    """Rs folded into the characteristic must equal moving the same
    resistance into the external series resistor: identical steady current
    (diode.go:65-69 parses Rs and drops it; physics mode cashes the check)."""
    _, t1, x1, o1 = run_physics(D_RS.format(R="1k", RS="100"),
                                from_fixture=False)
    _, t2, x2, o2 = run_physics(D_RS.format(R="1.1k", RS="0"),
                                from_fixture=False)
    ccc = compile_circuit(parse(D_RS.format(R="1k", RS="100")))
    i1 = (x1[-1, ccc.node_map["1"]] - x1[-1, ccc.node_map["2"]]) / 1000.0
    i2 = (x2[-1, ccc.node_map["1"]] - x2[-1, ccc.node_map["2"]]) / 1100.0
    assert i1 == pytest.approx(i2, rel=1e-6)
    # and Rs genuinely reduces the current vs the compat (Rs-ignored) run
    tran_c = make_tran(ccc, build_config(0, 0.5e-3, 0.05e-3, 0, False),
                       semantics="compat", store="full")
    oc = jax.jit(tran_c)(_params(ccc), init_state(ccc))
    nsc = int(oc.out_n)
    ic = float((np.asarray(oc.out_x)[nsc - 1, ccc.node_map["1"]]
                - np.asarray(oc.out_x)[nsc - 1, ccc.node_map["2"]]) / 1000.0)
    assert i1 < 0.995 * ic


def test_diode_bv_physics_breakdown_conducts():
    """Beyond -Bv the physics-mode diode conducts: the junction clamps near
    -Bv and the rest of the source voltage drops across R.  Compat blocks
    (reverse current -Is) and the full -200 V lands on the junction."""
    cc, t, x, out = run_physics(D_BV, from_fixture=False)
    vd = x[-1, cc.node_map["2"]]
    assert -115.0 < vd < -99.0, vd
    i_r = (x[-1, cc.node_map["1"]] - vd) / 1000.0
    assert i_r == pytest.approx((-200.0 - vd) / 1000.0, rel=1e-9)
    assert abs(i_r) > 0.08  # ~ (200-|vd|)/1k, far beyond Is

    tran_c = make_tran(cc, build_config(0, 0.5e-3, 0.05e-3, 0, False),
                       semantics="compat", store="full")
    occ = jax.jit(tran_c)(_params(cc), init_state(cc))
    nc = int(occ.out_n)
    vd_c = float(np.asarray(occ.out_x)[nc - 1, cc.node_map["2"]])
    assert vd_c < -195.0  # compat: no breakdown, node follows the source


def test_rl_physics_inductor_current_is_real():
    """physics mode: I(L) = -x[branch] is the true BE-integrated current; the
    steady-state amplitude must match |V|/|R + jwL|."""
    cc, t, x, out = run_physics("rl.cir")
    i_l = -x[:, cc.branch_map["L1"]]
    w = 2 * np.pi * 1e3
    expect = 5.0 / np.hypot(100.0, w * 1e-3)
    tail = t > 1.5e-3
    assert np.max(np.abs(i_l[tail])) == pytest.approx(expect, rel=0.05)
