"""On-TPU throughput A/B for the nonlinear (in-kernel Newton) fused
transient kernel.

Run on real TPU hardware (no conftest CPU forcing):

    python tests/tools/bench_diode.py [batch] [deck.cir]

Times a nonlinear reference fixture (default: diode2.cir, the half-wave
rectifier; pass e.g. bjt2.cir for the Ebers-Moll path) as a Monte-Carlo
batch through both transient paths — the general vmapped engine
(TOYSPICE_TRAN=general) and the fused kernel with the in-kernel Newton
loop — and prints aggregate accepted timesteps/sec plus the
Newton-iteration totals for each.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params, make_tran_batch
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config

DECK = """* Diode Test Circuit. Half wave rectifier (reference diode2.cir)
.tran 0.1ms 3ms
vin 1 0 sin(0 5 1k)
d1 1 2 D
r1 2 0 1k
"""

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
if len(sys.argv) > 2:
    DECK = open(os.path.join("/root/reference/circuits", sys.argv[2])).read()


def run(mode):
    os.environ["TOYSPICE_TRAN"] = mode
    cc = compile_circuit(parse(DECK))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    rng = np.random.default_rng(0)
    base = np.asarray(cc.params["R"]["value"])[None, :]
    overrides = {"R": {"value": base * np.exp(rng.normal(0, 0.1, (B, 1)))}}
    params, axes = batch_params(cc, overrides)
    state0 = init_state(cc)

    fn = make_tran_batch(cc, cfg, axes, store="none", params=params)
    t0 = time.perf_counter()
    out = fn(params, state0)
    _ = int(np.sum(np.asarray(out.accepted)))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = fn(params, state0)
    steps = int(np.sum(np.asarray(out.accepted)))
    iters = int(np.sum(np.asarray(out.nr_iters)))
    fails = int(np.sum(np.asarray(out.fail)))
    wall = time.perf_counter() - t0
    print(f"{mode:8s}: {steps/wall/1e6:8.2f}M steps/s  "
          f"({steps} steps, {iters} NR iters, {fails} fails, "
          f"wall {wall:.3f}s, compile {compile_s:.0f}s)", flush=True)
    return steps / wall


def main():
    print("devices:", jax.devices(), " batch:", B, flush=True)
    general = run("general")
    fused = run("auto")
    print(f"speedup: {fused / general:.2f}x", flush=True)


if __name__ == "__main__":
    main()
