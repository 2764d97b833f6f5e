"""Checkpoint/resume: the transient state pytree round-trips through .npz
and a resumed run continues from the committed state (a capability the
single-process reference lacks entirely — SURVEY.md §5)."""

import numpy as np
import pytest

import toyspice_tpu as ts
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from toyspice_tpu.engine.state import init_state

RC = """* rc charge
.tran 0.02m 1m uic
V1 1 0 DC 5
R1 1 2 1k
C1 2 0 1u
"""


def test_roundtrip(tmp_path):
    cc = compile_circuit(parse(RC))
    r = ts.run_transient(RC)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, r.final_state, t=r.final_time, note=1.5)
    state, meta = load_checkpoint(path, cc)
    assert float(meta["t"]) == r.final_time
    assert float(meta["note"]) == 1.5
    for kind, tbl in r.final_state.items():
        for key, val in tbl.items():
            np.testing.assert_array_equal(state[kind][key], np.asarray(val))


def test_resume_continues_charging(tmp_path):
    # RC time constant 1 ms: after the first 1 ms window the cap is ~63%
    # charged; resuming for another window continues toward 5 V rather than
    # restarting from 0.
    r1 = ts.run_transient(RC)
    v_end1 = r1["V(2)"][-1]
    # compat semantics: the reference's one-step-lagged capacitor companion
    # undershoots the textbook 5(1-1/e)=3.16 V (PLAN.md 3)
    assert 1.5 < v_end1 < 4.0
    r2 = ts.run_transient(RC, initial_state=r1.final_state)
    v_end2 = r2["V(2)"][-1]
    assert v_end2 > v_end1  # kept charging from the checkpointed state
    assert r2["V(2)"][0] > 0.8 * v_end1  # started charged, not from zero


def test_structure_validation(tmp_path):
    cc = compile_circuit(parse(RC))
    path = str(tmp_path / "bad.npz")
    state = init_state(cc)
    state.pop("C")
    save_checkpoint(path, state)
    with pytest.raises(ValueError, match="missing"):
        load_checkpoint(path, cc)
