"""Convergence rescue ladders (op.go:113-214) on intentionally hard circuits
— the numerical fault-tolerance layer of a SPICE engine (SURVEY.md §5).

OPResult.stage records which rung converged: 0 plain NR, 1 gmin stepping,
2 source stepping (reaching stage 2 *proves* the gmin ladder ran and failed
first, so both rescue paths execute)."""

import numpy as np
import pytest

import jax

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params
from toyspice_tpu.engine.op import make_op
from toyspice_tpu.engine.state import init_state
from tests.oracle import OracleCircuit

EASY = """easy diode
.op
V1 1 0 DC 5
R1 1 2 1k
D1 2 0 DM
.model DM D (Is=1e-14 N=1.0)
"""

# Three junctions directly across 100 V with no series resistance: the
# linear-only initial estimate puts ~33 V per junction, Newton (even with
# pnjlim) cannot recover, and the gmin ladder does not help a voltage-driven
# exponential stack — only scaling the source down to 10% and walking it back
# up converges (the reference's performSourceStepping, op.go:113-169).
HARD_V = """diode stack
.op
V1 1 0 DC 100
D1 1 2 DM
D2 2 3 DM
D3 3 0 DM
.model DM D (Is=1e-15 N=1.0)
"""

# The same stack driven by a CURRENT source cannot be rescued: source
# stepping scales only V-source dcValues (op.go:147-153, vsource.go:241) —
# reference-compat behavior is a clean non-convergence, not a wrong answer.
HARD_I = """i-driven stack
.op
I1 0 1 DC 1
D1 1 2 DM
D2 2 3 DM
D3 3 0 DM
.model DM D (Is=1e-18 N=0.7)
"""


def _op(deck):
    cc = compile_circuit(parse(deck))
    op_execute, _ = make_op(cc)
    return cc, jax.jit(op_execute)(_params(cc), init_state(cc))


def test_easy_converges_plain():
    _, r = _op(EASY)
    assert bool(r.converged) and int(r.stage) == 0


def test_source_stepping_rescues_voltage_stack():
    cc, r = _op(HARD_V)
    assert bool(r.converged)
    assert int(r.stage) == 2  # gmin ladder ran and failed, source stepping won
    x = np.asarray(r.x)
    assert np.all(np.isfinite(x))
    v1, v2, v3 = x[cc.node_map["1"]], x[cc.node_map["2"]], x[cc.node_map["3"]]
    assert abs(v1 - 100.0) < 1e-9
    assert v1 > v2 > v3 > 0.0  # monotone drops down the stack


def test_source_stepping_matches_oracle():
    cc, r = _op(HARD_V)
    x_o, ok = OracleCircuit(cc).op()
    assert ok
    np.testing.assert_allclose(np.asarray(r.x), x_o, rtol=3e-7, atol=1e-9)


def test_current_driven_stack_fails_cleanly():
    _, r = _op(HARD_I)
    assert not bool(r.converged)  # no V source to step: reference-compat fail
    cc = compile_circuit(parse(HARD_I))
    _, ok = OracleCircuit(cc).op()
    assert not ok  # the sequential reference algorithm fails identically
