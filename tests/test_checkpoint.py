"""Checkpoint/resume: the transient state pytree round-trips through .npz
and a resumed run continues from the committed state AND the committed
simulation time (so time-varying sources keep their phase) — a capability
the single-process reference lacks entirely (SURVEY.md §5)."""

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

RC_SIN = """* rc sine drive
.tran 0.02m 1m uic
V1 1 0 SIN(0 5 2k)
R1 1 2 1k
C1 2 0 100n
"""


def test_roundtrip(tmp_path):
    cc = compile_circuit(parse(RC))
    r = ts.run_transient(RC)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, r.final_state, jv=r.final_jv, t=r.final_time, note=1.5)
    state, jv, meta = load_checkpoint(path, cc)
    assert float(meta["t"]) == r.final_time
    assert float(meta["note"]) == 1.5
    for kind, tbl in r.final_state.items():
        for key, val in tbl.items():
            np.testing.assert_array_equal(state[kind][key], np.asarray(val))


def test_resume_continues_charging(tmp_path):
    r1 = ts.run_transient(RC)
    v_end1 = r1["V(2)"][-1]
    # compat semantics: the reference's one-step-lagged capacitor companion
    # undershoots the textbook 5(1-1/e)=3.16 V (PLAN.md 3)
    assert 1.5 < v_end1 < 4.0
    assert abs(r1.final_time - 1e-3) < 1e-12
    r2 = ts.run_transient(RC, tstop=2e-3, initial_state=r1.final_state,
                          resume_t=r1.final_time)
    v_end2 = r2["V(2)"][-1]
    assert v_end2 > v_end1  # kept charging from the checkpointed state
    assert r2["V(2)"][0] > 0.8 * v_end1  # started charged, not from zero
    assert r2["TIME"][0] >= r1.final_time  # clock continued, not restarted


def test_resume_preserves_source_phase(tmp_path):
    # split run [0, 0.5ms] + [0.5ms, 1ms] must track the uninterrupted run:
    # with a SIN source, a resume that restarted the clock at 0 would replay
    # the waveform out of phase and diverge wildly.
    full = ts.run_transient(RC_SIN)
    half = ts.run_transient(RC_SIN, tstop=0.5e-3)
    rest = ts.run_transient(RC_SIN, tstop=1e-3,
                            initial_state=half.final_state,
                            resume_t=half.final_time,
                            initial_jv=half.final_jv)
    v_split = rest["V(2)"][-1]
    v_full = full["V(2)"][-1]
    # different step grids near the seam -> loose tolerance, but phase-correct
    assert abs(v_split - v_full) < 0.15 * max(1.0, abs(v_full))
    assert rest["TIME"][0] >= half.final_time


def test_structure_validation(tmp_path):
    cc = compile_circuit(parse(RC))
    path = str(tmp_path / "bad.npz")
    state = init_state(cc)
    state.pop("C")
    save_checkpoint(path, state)
    with pytest.raises(ValueError, match="missing"):
        load_checkpoint(path, cc)


def test_fill_missing_new_state_fields(tmp_path):
    # checkpoints written before a state field existed load with
    # fill_missing=True (zero-filled from the circuit template)
    cc = compile_circuit(parse(RC))
    state = init_state(cc)
    state["C"] = {k: v for k, v in state["C"].items() if k != "hist"}
    path = str(tmp_path / "old.npz")
    save_checkpoint(path, state)
    with pytest.raises(ValueError, match="fill_missing"):
        load_checkpoint(path, cc)
    loaded, _, _ = load_checkpoint(path, cc, fill_missing=True)
    assert "hist" in loaded["C"]
    np.testing.assert_array_equal(loaded["C"]["hist"],
                                  np.zeros_like(loaded["C"]["v0"]))


@pytest.mark.slow
def test_fused_resume_matches_general_resume():
    """make_tran_fused(resume=True) continues a checkpointed batched run
    with the same trajectories as the general engine's resume flavor
    (fused kernel in interpret mode on the CPU test platform)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from toyspice_tpu.engine.batch import batch_params
    from toyspice_tpu.engine.options import DEFAULTS
    from toyspice_tpu.engine.tran import build_config, make_tran
    from toyspice_tpu.ops.pallas_tran import make_tran_fused

    cc = compile_circuit(parse(RC_SIN))
    tp = cc.netlist.tran
    cfg_half = build_config(tp.tstart, tp.tstop / 2, tp.tstep, tp.tmax,
                            tp.uic)
    cfg_full = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)

    rv = np.asarray(cc.params["R"]["value"])[None, :] * np.array(
        [[1.0], [1.07]])
    params, axes = batch_params(cc, {"R": {"value": rv}})
    state0 = init_state(cc)

    leg1 = jax.jit(jax.vmap(make_tran(cc, cfg_half, store="none"),
                            in_axes=(axes, None)))(params, state0)
    state1 = leg1.state  # batched (B, nk) leaves
    t1 = leg1.t_final  # (B,)

    saxes = jax.tree_util.tree_map(lambda _: 0, state1)
    gen_r = jax.jit(jax.vmap(
        make_tran(cc, cfg_full, store="none", resume=True),
        in_axes=(axes, saxes, 0, None)))
    og = gen_r(params, state1, t1, {})

    fused_r = make_tran_fused(cc, cfg_full, DEFAULTS, resume=True)
    with pltpu.force_tpu_interpret_mode():
        of = jax.jit(fused_r)(params, state1, t1, {})

    np.testing.assert_array_equal(np.asarray(of.accepted),
                                  np.asarray(og.accepted))
    np.testing.assert_array_equal(np.asarray(of.attempts),
                                  np.asarray(og.attempts))
    np.testing.assert_array_equal(np.asarray(of.fail), np.asarray(og.fail))
    np.testing.assert_allclose(np.asarray(of.t_final),
                               np.asarray(og.t_final), rtol=0, atol=0)
    for kind in og.state:
        for key in og.state[kind]:
            a = np.asarray(og.state[kind][key])
            f = np.asarray(of.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(a))))
            np.testing.assert_allclose(f, a, rtol=5e-7, atol=5e-13 * scale,
                                       err_msg=f"{kind}.{key}")
