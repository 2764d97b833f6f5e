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


def test_rl_physics_inductor_current_is_real():
    """physics mode: I(L) = -x[branch] is the true BE-integrated current; the
    steady-state amplitude must match |V|/|R + jwL|."""
    cc, t, x, out = run_physics("rl.cir")
    i_l = -x[:, cc.branch_map["L1"]]
    w = 2 * np.pi * 1e3
    expect = 5.0 / np.hypot(100.0, w * 1e-3)
    tail = t > 1.5e-3
    assert np.max(np.abs(i_l[tail])) == pytest.approx(expect, rel=0.05)
