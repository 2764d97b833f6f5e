#!/usr/bin/env python
"""Headline benchmark: 8192-way Monte-Carlo batched rlc.cir transient.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "timesteps/sec", "vs_baseline": N}

Baseline (BASELINE.json north star): >= 1e6 aggregate accepted timesteps/sec
on one TPU v5e chip.  Every instance runs the full reference-compat adaptive
transient (OP warm-up, per-step Newton, LTE step control) with its own
perturbed R/L/C values, so per-instance dt trajectories genuinely diverge —
this is not a lockstep-identical rerun.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache: repeat invocations (driver rounds, regress_tpu)
# skip the ~30 s TPU engine compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import toyspice_tpu  # noqa: F401  (enables x64)
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
BASELINE = 1e6  # aggregate timesteps/sec north star

RLC = """* RLC Test
.tran 0.01m 2ms
Vin 1 0 SIN(0 5 1k)
R1 1 2 100
L1 2 3 1m
C1 3 0 1u
"""


def main():
    cc = compile_circuit(parse(RLC))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)

    rng = np.random.default_rng(0)

    def perturb(base, spread=0.1):
        return base[None, :] * np.exp(
            rng.normal(0.0, spread, size=(BATCH, base.shape[0]))
        )

    overrides = {
        "R": {"value": perturb(np.asarray(cc.params["R"]["value"]))},
        "L": {"value": perturb(np.asarray(cc.params["L"]["value"]))},
        "C": {"value": perturb(np.asarray(cc.params["C"]["value"]))},
    }
    params, axes = batch_params(cc, overrides)
    state0 = init_state(cc)

    # make_tran_batch dispatches to the fused transient-attempt Pallas
    # kernel on TPU (TOYSPICE_TRAN=general forces the vmapped engine).
    # Built ONCE: the jitted callable is reused so the timed call pays
    # neither retrace nor compile.
    from toyspice_tpu.engine.batch import make_tran_batch

    fn = make_tran_batch(cc, cfg, axes, store="none", params=params)

    # compile + warm up.  NOTE: on the tunneled TPU backend
    # jax.block_until_ready returns before the result is actually
    # materialized host-side, so the timed region fetches values explicitly.
    out = fn(params, state0)
    _ = int(np.sum(np.asarray(out.accepted)))

    t0 = time.perf_counter()
    out = fn(params, state0)
    total_steps = int(np.sum(np.asarray(out.accepted)))
    fails = int(np.sum(np.asarray(out.fail)))
    wall = time.perf_counter() - t0
    rate = total_steps / wall

    attempts = int(np.sum(np.asarray(out.attempts)))
    result = {
        "metric": f"aggregate transient timesteps/sec, {BATCH}-way Monte-Carlo rlc.cir"
                  f" (compat semantics, f64, {fails} failed instances)",
        "value": rate,
        "unit": "timesteps/sec",
        "vs_baseline": rate / BASELINE,
        # utilization accounting (round-3 VERDICT weak #4): one attempt =
        # one in-kernel build+solve; us_per_attempt_vreg is the measured
        # per-(8,128)-vreg kernel cost to compare against the per-op floor
        # (tests/tools/bench_kernel_ops.py; PARITY.md utilization section)
        "util": {
            "engine": getattr(fn, "engine", "?"),
            "attempts_total": attempts,
            "accept_ratio": total_steps / max(1, attempts),
            "solves_per_s": attempts / wall,
            "us_per_attempt_vreg": (wall * 1e6 / (attempts / BATCH)
                                    / (BATCH / 1024.0)),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # The tunneled axon TPU worker occasionally crashes on a large first
    # compile ("TPU worker process crashed or restarted") and recovers in a
    # fresh process ~20s later; one re-exec keeps the benchmark run alive.
    if os.environ.get("TOYSPICE_BENCH_RETRIED") != "1":
        try:
            main()
        except Exception as e:  # noqa: BLE001 - deliberately broad: re-exec once
            print(f"bench attempt failed ({type(e).__name__}: {e}); "
                  "retrying in a fresh process", file=sys.stderr)
            time.sleep(20)
            os.environ["TOYSPICE_BENCH_RETRIED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
    else:
        main()
