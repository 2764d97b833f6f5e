"""Streamed full-waveform store (engine/batch.py stream_transient_chunks).

The reference stores every accepted step of every run (tran.go:141-143); at
the 8192-way benchmark batch the complete waveform buffer exceeds HBM.  The
streamed store runs the fused engine with a small buffer and PAUSES lanes
when it fills; because the adaptive dt is carried exactly across re-entries
(TranOutput.dt_final -> dt0), the concatenated chunks must reproduce the
monolithic run step for step.  Verified here on the CPU test platform with
the kernel in interpret mode; the at-scale number lives in
BENCH_MATRIX.json (8192-way rlc via bench_matrix.py)."""

import numpy as np
import pytest

import jax
from jax.experimental.pallas import tpu as pltpu

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import (batch_params, run_transient_streamed,
                                       stream_transient_chunks)
from toyspice_tpu.engine.options import DEFAULTS
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran

RC_SIN = """* rc sin
.tran 0.02m 1m
Vin 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""

B = 2


def _setup():
    cc = compile_circuit(parse(RC_SIN))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    state0 = init_state(cc)
    rng = np.random.default_rng(3)
    base = np.asarray(cc.params["R"]["value"])[None, :]
    params, axes = batch_params(cc, {"R": {"value": base * np.exp(
        rng.normal(0, 0.05, (B, base.shape[1])))}})
    return cc, cfg, state0, params, axes


@pytest.mark.slow
def test_streamed_matches_monolithic_general():
    cc, cfg, state0, params, axes = _setup()
    gen = jax.jit(jax.vmap(make_tran(cc, cfg, store="full"),
                           in_axes=(axes, None)))
    og = gen(params, state0)
    with pltpu.force_tpu_interpret_mode():
        so = run_transient_streamed(cc, cfg, params, state0, chunk_store=16)
    # several re-entries actually happened (rc accepts ~60 rows/lane)
    assert int(np.max(so.out_n)) > 16
    np.testing.assert_array_equal(so.accepted, np.asarray(og.accepted))
    np.testing.assert_array_equal(so.out_n, np.asarray(og.out_n))
    assert not np.any(so.fail)
    assert not np.any(so.store_overflow)
    for lane in range(B):
        n = int(so.out_n[lane])
        np.testing.assert_allclose(so.out_t[lane, :n],
                                   np.asarray(og.out_t)[lane, :n],
                                   rtol=0, atol=0)  # dt carried exactly
        np.testing.assert_allclose(so.out_x[lane, :n],
                                   np.asarray(og.out_x)[lane, :n],
                                   rtol=1e-11, atol=1e-13)


@pytest.mark.slow
def test_stream_chunks_pause_not_truncate():
    cc, cfg, state0, params, axes = _setup()
    with pltpu.force_tpu_interpret_mode():
        outs = list(stream_transient_chunks(cc, cfg, params, state0,
                                            chunk_store=16))
    assert len(outs) > 1
    # every non-final chunk fills exactly its buffer; none overflows
    for out in outs[:-1]:
        np.testing.assert_array_equal(np.asarray(out.out_n), 16)
    for out in outs:
        assert not np.any(np.asarray(out.store_overflow))
    # final chunk ends the run at tstop
    np.testing.assert_allclose(np.asarray(outs[-1].t_final), cfg.tstop,
                               rtol=0, atol=0)


def test_stream_requires_store_full():
    from toyspice_tpu.ops.pallas_tran import make_tran_fused

    cc, cfg, state0, params, axes = _setup()
    with pytest.raises(ValueError, match="store='full'"):
        make_tran_fused(cc, cfg, DEFAULTS, store="none", stream=True)


@pytest.mark.slow
def test_streamed_max_attempts_binds_per_run():
    """cfg.max_attempts is a CUMULATIVE per-run budget: the attempt counter
    is carried into each streamed re-entry, so a streamed run can never
    spend more attempts than the monolithic run with the same cfg (round-4
    ADVICE.md finding: it previously reset per chunk)."""
    from toyspice_tpu.engine.batch import run_transient_batch

    cc, cfg, state0, params, axes = _setup()
    cfg = cfg._replace(max_attempts=30)  # binds mid-run (rc accepts ~60)
    with pltpu.force_tpu_interpret_mode():
        mono = run_transient_batch(cc, cfg, params, axes, state0,
                                   store="full", jit=False)
        so = run_transient_streamed(cc, cfg, params, state0, chunk_store=8)
    assert np.all(np.asarray(so.attempts) <= cfg.max_attempts)
    np.testing.assert_array_equal(np.asarray(so.attempts),
                                  np.asarray(mono.attempts))
    np.testing.assert_array_equal(np.asarray(so.accepted),
                                  np.asarray(mono.accepted))
    np.testing.assert_array_equal(so.out_n, np.asarray(mono.out_n))
    for lane in range(B):
        n = int(so.out_n[lane])
        np.testing.assert_allclose(so.out_t[lane, :n],
                                   np.asarray(mono.out_t)[lane, :n],
                                   rtol=0, atol=0)
