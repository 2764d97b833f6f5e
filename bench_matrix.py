#!/usr/bin/env python
"""Per-class TPU benchmark matrix: one JSON artifact with a throughput row
for every device class and analysis the reference produces waveforms for
(tran.go:141-143, ac.go:51-98, dc.go:88-140) — the per-class evidence the
single rlc headline number (bench.py) can't carry.

Rows (all on reference fixture decks, Monte-Carlo batched):
  transient  rlc (linear), diode2, bjt2, mosfet1, transformer3 (J-A compat)
             x store='none'; rlc additionally with store='full' waveforms
  AC         bjt3 batched bias + frequency sweep
  DC sweep   diode3 batched I-V sweep

Writes BENCH_MATRIX.json and prints one JSON line per row.  Timing protocol
per CLAUDE.md: one process, persistent compile cache, values fetched inside
the timed region (block_until_ready returns early on the tunneled TPU).

Run:  python bench_matrix.py            (~3-4 min warm-cache)
      BENCH_MATRIX_BATCH=1024 python bench_matrix.py   (quick smoke)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

import toyspice_tpu  # noqa: F401  (enables x64)
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.ac import frequency_points
from toyspice_tpu.engine.batch import batch_params, make_tran_batch
from toyspice_tpu.engine.dc import sweep_values
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config

CIRCUITS = "/root/reference/circuits"
BATCH = int(os.environ.get("BENCH_MATRIX_BATCH", 8192))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_MATRIX.json")


def _load(deck):
    with open(os.path.join(CIRCUITS, deck)) as f:
        return compile_circuit(parse(f.read()))


MIN_WALL = float(os.environ.get("BENCH_MATRIX_MIN_WALL", "0.5"))
REPEATS = int(os.environ.get("BENCH_MATRIX_REPEATS", "3"))


def _timed(invoke, min_wall=None, repeats=None, max_reps=64):
    """Trustworthy-row timing protocol (round-4 VERDICT weak #2): the
    tunneled TPU shows a >100x run-to-run spread on sub-0.5 s timed regions
    (PARITY.md variance caveat) while regions >= 0.5 s reproduce within
    ~20%.  So: scale the invocation count until every timed region clears
    ``min_wall``, run ``repeats`` independent regions, and report all of
    them — the caller publishes the median with min/max spread IN the row.

    ``invoke()`` enqueues ONE invocation and returns its (k,) device-side
    reduction; each timed region enqueues ``reps`` back-to-back and fetches
    once (the dev-tunnel scalar round trip costs ~23 ms)."""
    min_wall = MIN_WALL if min_wall is None else min_wall
    repeats = REPEATS if repeats is None else repeats
    t0 = time.perf_counter()
    _ = np.asarray(invoke())
    single = time.perf_counter() - t0
    reps = int(np.clip(round(min_wall * 1.4 / max(single, 0.01)), 1,
                       max_reps))
    while True:
        walls, tot = [], None
        for _r in range(repeats):
            t0 = time.perf_counter()
            acc = [invoke() for _ in range(reps)]
            st = np.asarray(jnp.stack(acc))
            walls.append(time.perf_counter() - t0)
            if tot is None:
                tot = st
        if min(walls) >= min_wall * 0.6 or reps >= max_reps:
            return reps, walls, tot
        # a region came in short (the single-shot estimate hit a stall):
        # rescale and restart the repeat collection
        reps = int(np.clip(round(reps * min_wall * 1.4 / max(min(walls),
                                                             1e-3)),
                           reps + 1, max_reps))


def _spread(row, count_per_region, walls, unit_key):
    """Publish median throughput + min/max spread from the per-region
    walls; the artifact row carries its own uncertainty (round-4 VERDICT
    weak #2: the >100x variance finding lived only in PARITY.md prose)."""
    thr = sorted(count_per_region / w for w in walls)
    med = float(np.median(thr))
    row[unit_key] = med
    row["wall_s"] = float(np.median(walls))
    row["repeats"] = len(walls)
    row[unit_key + "_min"] = thr[0]
    row[unit_key + "_max"] = thr[-1]
    row["spread_pct"] = ((thr[-1] - thr[0]) / med * 100.0) if med else 0.0
    return row


def _perturbed(cc, batch, spread=0.05, seed=0):
    """Log-normal R/C/L spread: per-instance dt trajectories genuinely
    diverge, so this is not a lockstep-identical rerun."""
    rng = np.random.default_rng(seed)
    overrides = {}
    for kind in ("R", "C", "L"):
        if kind in cc.params:
            base = np.asarray(cc.params[kind]["value"])[None, :]
            overrides[kind] = {"value": base * np.exp(
                rng.normal(0.0, spread, (batch, base.shape[1])))}
    return batch_params(cc, overrides)


def bench_tran_streamed(deck="rlc.cir", batch=BATCH, chunk_store=4096):
    """8192-way FULL-waveform transient via the streamed store: the fused
    engine pauses lanes when the chunk buffer fills; chunks are reduced on
    device (checksum) instead of shipped whole through the dev tunnel.
    This is the reference's store-every-accepted-step behavior
    (tran.go:141-143) at a batch whose complete waveform (~12 GB) exceeds
    HBM — round-3 VERDICT missing item 3."""
    from toyspice_tpu.engine.batch import (make_tran_stream,
                                           stream_transient_chunks)

    cc = _load(deck)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    params, axes = _perturbed(cc, batch)
    state0 = init_state(cc)
    fns = make_tran_stream(cc, cfg, chunk_store, params=params)
    # ONE stacked device reduction + fetch per chunk: separate counter
    # fetches would pay the 23 ms tunnel round trip each
    red = jax.jit(lambda o: jnp.stack(
        [jnp.sum(o.accepted).astype(jnp.float64),
         jnp.sum(o.out_n).astype(jnp.float64),
         jnp.sum(o.store_overflow).astype(jnp.float64),
         jnp.sum(o.fail).astype(jnp.float64),
         jnp.sum(o.nr_iters).astype(jnp.float64),
         jnp.sum(o.attempts).astype(jnp.float64),
         jnp.sum(o.out_t[:, -1]) + jnp.sum(o.out_x[:, 0])]))

    def drain():
        steps = rows = chunks = overflow = fails = iters = atts = 0
        chksum = 0.0
        for out in stream_transient_chunks(cc, cfg, params, state0,
                                           chunk_store, fns=fns):
            r = np.asarray(red(out))  # forces the chunk
            steps += int(r[0]); rows += int(r[1]); overflow += int(r[2])
            # fail is chunk-local (failed lanes are parked, never re-flagged
            # on re-entry), so accumulating never double-counts a lane;
            # attempts is carried INTO re-entries (cumulative budget), so
            # the last chunk's value is already the run total
            fails += int(r[3]); iters += int(r[4]); atts = int(r[5])
            chksum += float(r[6])
            chunks += 1
        return steps, rows, chunks, overflow, fails, iters, atts, chksum

    drain()  # compile + warm (fresh, cont and the chunk reductions)
    walls, res = [], None
    for _r in range(REPEATS):
        t0 = time.perf_counter()
        out = drain()
        walls.append(time.perf_counter() - t0)
        if res is None:
            res = out
    steps, rows, chunks, overflow, fails, iters, atts, _ = res
    row = _spread({
        "analysis": "tran", "deck": deck, "store": "full-streamed",
        "batch": batch, "chunk_store": chunk_store, "chunks": chunks,
        "engine": "fused-stream",
        "total_accepted_steps": steps, "stored_rows": rows,
        "failed_instances": fails, "store_overflow_instances": overflow,
    }, steps, walls, "agg_steps_per_s")
    return _util(row, iters, atts, batch, row["wall_s"])


def _util(row, nr_iters, attempts, batch, wall):
    """Utilization accounting (round-3 VERDICT weak #4): iteration/attempt
    ratios and in-kernel Newton solve rate alongside the headline steps/s,
    plus %-of-ceiling vs the measured per-iteration kernel floor
    (tests/tools/attrib_newton.py — see CEILING_US_PER_ITER)."""
    if not attempts:
        return row
    row["nr_iters_total"] = nr_iters
    row["attempts_total"] = attempts
    row["nr_iters_per_attempt"] = nr_iters / attempts
    # one attempt = one in-kernel system build+solve chain; nonlinear decks
    # run nr_iters of them
    solves = nr_iters if nr_iters else attempts
    row["solves_per_s"] = solves / wall
    # measured us per Newton iteration per (8,128) vreg tile: the kernel
    # processes the whole block as (8, blk/8) tiles = blk/1024 vregs wide,
    # iterations across lanes in lockstep (max over block)
    vregs = batch / 1024.0
    if nr_iters and vregs:
        row["us_per_iter_vreg"] = wall * 1e6 / (nr_iters / batch) / vregs
    return row


def bench_tran(deck, store="none", batch=BATCH, max_store=None):
    cc = _load(deck)
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    if max_store is not None:
        # cap the waveform buffer below the worst-case minstep pacing: the
        # full-batch demo would not fit HBM sized for max_store (the
        # overflow flag accounts for any run that outgrows the cap)
        cfg = cfg._replace(max_store=max_store)
    params, axes = _perturbed(cc, batch)
    state0 = init_state(cc)
    fn = make_tran_batch(cc, cfg, axes, store=store, params=params)
    # Per-invocation reductions run ON DEVICE and cross the tunnel as ONE
    # stacked array: a scalar dispatch+fetch round trip through the axon
    # dev tunnel measures 23 ms (2026-08-21) — more than the entire
    # device-side work of every short workload — so the timed region
    # enqueues K back-to-back invocations and fetches once (steady-state
    # throughput; single-shot latency is recorded as rt_floor_ms by main).
    red = jax.jit(lambda o: jnp.stack(
        [jnp.sum(o.accepted).astype(jnp.float64),
         jnp.sum(o.fail).astype(jnp.float64),
         jnp.sum(o.nr_iters).astype(jnp.float64),
         jnp.sum(o.attempts).astype(jnp.float64),
         (jnp.sum(o.out_t[:, -1]) + jnp.sum(o.out_x[:, 0]))
         if store == "full" else jnp.float64(0.0),
         jnp.sum(o.store_overflow).astype(jnp.float64)
         if o.store_overflow is not None else jnp.float64(0.0)]))
    out = fn(params, state0)  # compile + warm
    _ = np.asarray(red(out))
    reps, walls, tot = _timed(lambda: red(fn(params, state0)))
    steps = int(tot[:, 0].sum())
    fails = int(tot[-1, 1])
    row = {
        "analysis": "tran", "deck": deck, "store": store, "batch": batch,
        "engine": getattr(fn, "engine", "?"),
        "invocations": reps,
        "total_accepted_steps": steps, "failed_instances": fails,
    }
    if store == "full":
        row["store_overflow_instances"] = int(tot[-1, 5])
    row = _spread(row, steps, walls, "agg_steps_per_s")
    return _util(row, int(tot[:, 2].sum()), int(tot[:, 3].sum()), batch,
                 row["wall_s"])


def bench_ac(deck="bjt3.cir", batch=BATCH):
    from toyspice_tpu.engine.ac import make_ac_batch
    from toyspice_tpu.engine.batch import select_op_engine

    cc = _load(deck)
    ap = cc.netlist.ac
    freqs = jnp.asarray(frequency_points(ap.sweep, ap.fstart, ap.fstop,
                                         ap.points))
    params, axes = _perturbed(cc, batch)
    state0 = init_state(cc)
    fn = jax.jit(make_ac_batch(cc, axes, params=params))  # built ONCE
    red = jax.jit(lambda a, c, o: jnp.stack(
        [jnp.sum(a) + jnp.sum(c), jnp.sum(o.converged).astype(jnp.float64)]))
    xr, xi, opr = fn(params, state0, freqs)  # compile + warm
    _ = np.asarray(red(xr, xi, opr))

    def invoke():
        xr, xi, opr = fn(params, state0, freqs)
        return red(xr, xi, opr)

    reps, walls, tot = _timed(invoke)
    nf = int(freqs.shape[0])
    row = {
        "analysis": "ac", "deck": deck, "batch": batch, "freq_points": nf,
        "bias_engine": select_op_engine(cc, params=params)[0],
        "invocations": reps,
        "unconverged_bias": int(batch - tot[-1, 1]),
    }
    return _spread(row, batch * nf * reps, walls, "agg_solves_per_s")


def bench_dc(deck="diode3.cir", batch=BATCH):
    from toyspice_tpu.engine.batch import select_op_engine
    from toyspice_tpu.engine.dc import make_dc

    cc = _load(deck)
    dp = cc.netlist.dc
    pts = jnp.asarray(sweep_values(dp.start1, dp.stop1, dp.increment1))
    slots = (cc.names["V"].index(dp.source1),)
    params, axes = _perturbed(cc, batch)
    state0 = init_state(cc)
    engine, _reason = select_op_engine(cc, params=params)
    if engine == "fused":
        from toyspice_tpu.ops.pallas_op import make_dc_fused

        from toyspice_tpu.engine.options import DEFAULTS

        dcf = make_dc_fused(cc, slots, DEFAULTS)
        fn = jax.jit(lambda p: dcf(p, state0, pts))  # built ONCE
    else:
        dc_execute = make_dc(cc, slots)
        fn = jax.jit(jax.vmap(lambda p: dc_execute(p, state0, pts),
                              in_axes=(axes,)))  # built ONCE
    red = jax.jit(lambda a, c: jnp.stack(
        [jnp.sum(a), jnp.sum(c).astype(jnp.float64)]))
    xs, conv = fn(params)  # compile + warm
    _ = np.asarray(red(xs, conv))

    def invoke():
        xs, conv = fn(params)
        return red(xs, conv)

    reps, walls, tot = _timed(invoke)
    npts = int(pts.shape[0])
    row = {
        "analysis": "dc", "deck": deck, "batch": batch, "sweep_points": npts,
        "engine": engine,
        "invocations": reps,
        "unconverged_points": int(batch * npts - tot[-1, 1]),
    }
    return _spread(row, batch * npts * reps, walls, "agg_points_per_s")


def main():
    rows = []

    def run(label, fn, *a, **k):
        t0 = time.perf_counter()
        try:
            row = fn(*a, **k)
        except Exception as e:  # noqa: BLE001 - record and continue the matrix
            row = {"analysis": label, "error": f"{type(e).__name__}: {e}"}
        row["bench_wall_s"] = time.perf_counter() - t0
        rows.append(row)
        print(json.dumps(row), flush=True)

    run("tran", bench_tran, "rlc.cir", "none")
    run("tran", bench_tran, "rlc.cir", "full",
        batch=min(BATCH, int(os.environ.get("BENCH_MATRIX_FULL_BATCH", 1024))))
    # full-batch full-waveform demo: store buffer capped (vpulse accepts
    # ~305 rows/lane; worst-case max_store sizing would exceed HBM at 8192)
    run("tran", bench_tran, "vpulse.cir", "full", max_store=512)
    # 8192-way rlc with FULL waveforms via the streamed store (round-3
    # VERDICT missing #3: previously documented as infeasible at this batch)
    run("tran", bench_tran_streamed)
    run("tran", bench_tran, "diode2.cir", "none")
    run("tran", bench_tran, "bjt2.cir", "none")
    run("tran", bench_tran, "mosfet1.cir", "none")
    run("tran", bench_tran, "transformer3.cir", "none")
    run("ac", bench_ac)
    run("dc", bench_dc)

    # tunnel latency floor: one scalar dispatch+fetch round trip — the
    # context for every short-workload wall_s (rows amortize it over
    # `invocations` back-to-back runs; a single-shot caller pays it once)
    _f = jax.jit(lambda x: jnp.sum(x * 2.0))
    _ = float(_f(jnp.ones(8)))
    _t0 = time.perf_counter()
    for _i in range(10):
        _ = float(_f(jnp.ones(8)))
    rt_floor_ms = (time.perf_counter() - _t0) / 10 * 1e3

    doc = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "rt_floor_ms": rt_floor_ms,
        "timing_protocol": (
            f"per row: invocations scaled until every timed region >= "
            f"{MIN_WALL} s wall, {REPEATS} independent regions of K "
            "back-to-back invocations each (one stacked device-side "
            "reduction fetched per region); rows carry the median with "
            "min/max spread (spread_pct).  The dev-tunnel scalar round "
            "trip alone costs rt_floor_ms"),
        "results": rows,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
