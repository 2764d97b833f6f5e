"""Larger-than-fixture circuits: an RC ladder pushes the MNA size well past
the reference decks (~24 rows) and checks all three backends agree —
vectorized XLA engine, sequential host engine, and (when built) the native
C++ sparse LU."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import toyspice_tpu as ts
from toyspice_tpu import hostsim, native
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse

N_STAGES = 20


def ladder_deck(stages=N_STAGES):
    lines = ["RC ladder", ".op", "Vin n0 0 DC 10"]
    for i in range(stages):
        lines.append(f"R{i} n{i} n{i+1} 1k")
    lines.append(f"Rload n{stages} 0 1k")
    return "\n".join(lines) + "\n"


def test_ladder_op_matches_analytic():
    # pure resistive ladder: solve the same system with numpy for truth
    deck = ladder_deck()
    cc = compile_circuit(parse(deck))
    assert cc.n >= N_STAGES + 2  # nodes + source branch
    r = ts.run_op(deck)
    # series chain of 21 equal resistors: V(n_k) divides linearly
    for k in range(N_STAGES + 1):
        expect = 10.0 * (N_STAGES + 1 - k) / (N_STAGES + 1)
        np.testing.assert_allclose(r[f"V(n{k})"][0], expect, rtol=1e-10)


def test_ladder_backends_agree():
    deck = ladder_deck()
    cc = compile_circuit(parse(deck))
    r_xla = ts.run_op(cc)
    hostsim.set_solver("numpy")
    r_host = hostsim.run_host_analysis(cc)
    for k in range(N_STAGES + 1):
        np.testing.assert_allclose(
            r_host[f"V(n{k})"], r_xla[f"V(n{k})"], rtol=1e-10)
    if native.available():
        hostsim.set_solver("native")
        try:
            r_nat = hostsim.run_host_analysis(cc)
        finally:
            hostsim.set_solver("numpy")
        for k in range(N_STAGES + 1):
            np.testing.assert_allclose(
                r_nat[f"V(n{k})"], r_xla[f"V(n{k})"], rtol=1e-9)


def test_ladder_transient_rc():
    # RC ladder step response: monotone voltage profile along the ladder,
    # every node finite, and the far end lags the near end.
    lines = ["RC ladder tran", ".tran 0.05m 1m", "Vin n0 0 PULSE(0 5 0 1u 1u 2m 4m)"]
    stages = 8
    for i in range(stages):
        lines.append(f"R{i} n{i} n{i+1} 1k")
        lines.append(f"C{i} n{i+1} 0 10n")
    deck = "\n".join(lines) + "\n"
    r = ts.run_transient(deck)
    last = {k: r[f"V(n{k})"][-1] for k in range(1, stages + 1)}
    vals = [last[k] for k in range(1, stages + 1)]
    assert all(np.isfinite(v) for v in vals)
    # near the source is at least as charged as the far end
    assert vals[0] >= vals[-1] - 1e-9
    assert vals[0] > 3.0  # mostly charged after 1 ms (tau/stage = 10 us)
