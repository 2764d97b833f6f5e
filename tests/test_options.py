"""SimOptions: the reference's hard-coded solver knobs exposed as config.

Defaults must reproduce the hard-coded behavior exactly; changed knobs must
actually reach the engine (temperature shifts a diode OP, a looser timestep
clamp changes the transient grid).
"""

import numpy as np
import pytest

import toyspice_tpu as ts
from toyspice_tpu.engine.options import DEFAULTS, SimOptions

DIODE_OP = """* diode bias
.op
V1 1 0 DC 5
R1 1 2 1k
D1 2 0 DMOD
.model DMOD D (IS=1e-14 N=1.0)
"""

RC_TRAN = """* rc
.tran 0.05m 1m
V1 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""


def test_defaults_match_hardcoded():
    r_default = ts.run_op(DIODE_OP)
    r_explicit = ts.run_op(DIODE_OP, options=SimOptions())
    assert r_default["V(2)"][0] == r_explicit["V(2)"][0]
    assert DEFAULTS.max_iter == 100
    assert DEFAULTS.reltol == 1e-6
    assert DEFAULTS.abstol == 1e-12
    assert DEFAULTS.trtol == 7.0
    assert DEFAULTS.temp == 300.15


def test_temperature_shifts_diode_drop():
    cold = ts.run_op(DIODE_OP, options=SimOptions(temp=250.0))["V(2)"][0]
    nom = ts.run_op(DIODE_OP)["V(2)"][0]
    hot = ts.run_op(DIODE_OP, options=SimOptions(temp=350.0))["V(2)"][0]
    # Reference-compat direction: diode.go:107-116 computes
    # egfact = -Eg/(2vt)·(T/Tnom - 1), so Is FALLS with temperature —
    # the opposite of physical SPICE (Is(T2)=Is(T1)·exp(Eg·q/(Nk)·(1/T1-1/T2))
    # ·(T2/T1)^(XTI/N)) — and the forward drop rises with T.  We reproduce
    # the reference formula; this test pins the quirk.
    assert cold < nom < hot
    assert 0.3 < cold < nom < hot < 1.0


def test_step_clamp_changes_grid():
    fine = ts.run_transient(RC_TRAN)  # tstep clamped to tstop/300
    coarse = ts.run_transient(
        RC_TRAN, options=SimOptions(tstep_divisor=20.0, minstep_divisor=10.0)
    )
    assert len(coarse["TIME"]) < len(fine["TIME"])
    # same circuit, same physics: endpoints agree loosely
    assert abs(coarse["TIME"][-1] - fine["TIME"][-1]) < 1e-9


def test_options_hashable_cache_key():
    a = SimOptions(temp=350.0)
    b = SimOptions(temp=350.0)
    assert a == b and hash(a) == hash(b)
    assert a != DEFAULTS


def test_tc_parity_across_backends():
    # the programmatic tc1/tc2 feature must agree between the XLA engine and
    # the host/parity backend at a non-default temperature
    from toyspice_tpu import hostsim
    from toyspice_tpu.compiler import compile_circuit
    from toyspice_tpu.netlist.parser import parse
    from toyspice_tpu.engine.op import make_op
    from toyspice_tpu.engine.state import init_state
    import jax
    import jax.numpy as jnp

    deck = """tc divider
.op
Vin in 0 DC 10
R1 in mid 1k
R2 mid 0 1k
"""
    cc = compile_circuit(parse(deck))
    cc.params["R"]["tc1"][0] = 0.01  # R1 drifts with temperature, R2 doesn't

    opts = SimOptions(temp=350.0)
    op_execute, _ = make_op(cc, opts)
    params = {k: {kk: jnp.asarray(vv) for kk, vv in t.items()}
              for k, t in cc.params.items()}
    r = jax.jit(op_execute)(params, init_state(cc))
    v_xla = float(np.asarray(r.x)[cc.node_map["mid"]])

    # host engine at the same simulation temperature
    from toyspice_tpu.hostsim.engine import OracleCircuit
    oc = OracleCircuit(cc, temp=350.0)
    x, ok = oc.op()
    assert ok
    v_host = float(x[cc.node_map["mid"]])

    # analytic: R1(350) = 1k*(1+0.01*49.85) = 1498.5, divider 10*R2/(R2+R1)
    expect = 10.0 * 1000.0 / (1000.0 + 1000.0 * (1 + 0.01 * (350.0 - 300.15)))
    np.testing.assert_allclose(v_xla, expect, rtol=1e-10)
    np.testing.assert_allclose(v_host, expect, rtol=1e-10)
