"""Engine vs oracle parity on the nonlinear fixtures: diode/BJT/MOSFET
transients, DC sweep, AC, and the transformer decks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params, run_dc, run_ac
from toyspice_tpu.engine.ac import frequency_points, make_ac
from toyspice_tpu.engine.dc import make_dc, sweep_values
from toyspice_tpu.engine.op import make_op
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from tests.conftest import read_fixture
from tests.oracle import OracleCircuit

RTOL = 3e-7  # XLA CPU size-1 transcendental precision (see test_parity_linear)


def tran_parity(name, rtol=RTOL):
    cc = compile_circuit(parse(read_fixture(name)))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    out = jax.jit(make_tran(cc, cfg, store="full"))(_params(cc), init_state(cc))
    assert not bool(out.fail), name
    n = int(out.out_n)
    t_e = np.asarray(out.out_t)[:n]
    x_e = np.asarray(out.out_x)[:n]
    t_o, x_o, acc_o = OracleCircuit(cc).tran(
        tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic
    )
    assert int(out.accepted) == acc_o, f"{name}: steps {int(out.accepted)} vs {acc_o}"
    assert n == len(t_o), name
    np.testing.assert_allclose(t_e, t_o, rtol=1e-9, atol=1e-12)
    scale = max(1.0, float(np.max(np.abs(x_o))))
    np.testing.assert_allclose(x_e, x_o, rtol=rtol, atol=rtol * scale, err_msg=name)


@pytest.mark.parametrize("name", ["diode2.cir", "diode4.cir"])
def test_diode_tran_parity(name):
    tran_parity(name)


def test_bjt2_tran_parity():
    tran_parity("bjt2.cir")


def test_mosfet1_tran_parity():
    tran_parity("mosfet1.cir")


@pytest.mark.parametrize("name", ["transformer1.cir", "transformer2.cir",
                                  "transformer3.cir"])
def test_transformer_tran_parity(name):
    tran_parity(name)


def test_bjt1_op_parity():
    cc = compile_circuit(parse(read_fixture("bjt1.cir")))
    op_execute, _ = make_op(cc)
    r = jax.jit(op_execute)(_params(cc), init_state(cc))
    assert bool(r.converged)
    x_o, ok = OracleCircuit(cc).op()
    assert ok
    np.testing.assert_allclose(np.asarray(r.x), x_o, rtol=RTOL, atol=1e-9)
    # physical sanity: VCC node at 10V, collector between 0 and 10
    assert np.asarray(r.x)[cc.node_map["1"]] == pytest.approx(10.0, abs=1e-9)
    vc = np.asarray(r.x)[cc.node_map["3"]]
    assert 0.0 < vc < 10.0


def test_diode3_dc_parity():
    cc = compile_circuit(parse(read_fixture("diode3.cir")))
    dp = cc.netlist.dc
    vals = sweep_values(dp.start1, dp.stop1, dp.increment1)
    dc_execute = make_dc(cc, (cc.names["V"].index(dp.source1),))
    xs, conv = jax.jit(dc_execute)(
        _params(cc), init_state(cc), jnp.asarray(np.asarray(vals))
    )
    assert bool(jnp.all(conv))
    pts_o, xs_o = OracleCircuit(cc).dc([dp.source1], [vals])
    scale = max(1.0, float(np.max(np.abs(xs_o))))
    np.testing.assert_allclose(np.asarray(xs), xs_o, rtol=RTOL, atol=RTOL * scale)
    # I-V curve sanity: diode forward current at Vin=3 is ~ (3-0.6)/1k
    r = run_dc(read_fixture("diode3.cir"))
    i_last = r["I(r1)"][-1]
    assert 0.0020 < i_last < 0.0026


def test_bjt3_ac_parity():
    cc = compile_circuit(parse(read_fixture("bjt3.cir")))
    ap = cc.netlist.ac
    freqs = frequency_points(ap.sweep, ap.fstart, ap.fstop, ap.points)
    ac_execute = make_ac(cc)
    xr, xi, opr = jax.jit(ac_execute)(
        _params(cc), init_state(cc), jnp.asarray(freqs)
    )
    assert bool(opr.converged)
    xr_o, xi_o = OracleCircuit(cc).ac(freqs)
    scale = max(1.0, float(np.max(np.abs(xr_o))), float(np.max(np.abs(xi_o))))
    np.testing.assert_allclose(np.asarray(xr), xr_o, rtol=1e-6, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(xi), xi_o, rtol=1e-6, atol=1e-6 * scale)


def test_ac_frequency_grid_quirk():
    """numPoints is the TOTAL point count (ac.go:100-126)."""
    f = frequency_points("DEC", 10.0, 1e6, 10)
    assert len(f) == 10
    assert f[0] == pytest.approx(10.0)
    assert f[-1] == pytest.approx(1e6)
    lin = frequency_points("LIN", 1.0, 10.0, 4)
    np.testing.assert_allclose(lin, [1.0, 4.0, 7.0, 10.0])


def test_dc_sweep_go_accumulation():
    """Point count follows Go's float accumulation exactly."""
    # float accumulation overshoots 3.0 by 1.3e-15 at the last point, so the
    # sweep has 40 points, not 41 — exactly like the Go loop (dc.go:38).
    vals = sweep_values(-1.0, 3.0, 0.1)
    assert len(vals) == 40
    assert vals[0] == -1.0
    assert vals[-1] == pytest.approx(2.9, abs=1e-9)
    # 0..1.2 step 0.05: accumulation error drops the last point?
    vals2 = sweep_values(0.0, 1.2, 0.05)
    v = 0.0
    n = 0
    while v <= 1.2:
        n += 1
        v += 0.05
    assert len(vals2) == n
