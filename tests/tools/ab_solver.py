"""On-TPU solver A/B: XLA emulated-f64 backend vs the Pallas double-float
kernel over the CLAUDE.md invariant deck list, comparing accepted-step /
Newton-failure counts and final committed state (the protocol PARITY.md §2
was produced with).

    python tests/tools/ab_solver.py            # rlc/diode2/bjt2/mosfet1/transformer3
    python tests/tools/ab_solver.py all        # every fixture with a .tran card

Run after ANY change to the solve path (ops/solve.py, ops/pallas_solve.py,
ops/assemble.py) on real TPU hardware.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran

# batch axis: the Pallas solve engages through the vmap rule.  B >= 1024
# additionally exercises the sublane-dense folded lane layout (B=2048 run
# over diode2/bjt2/mosfet1 validated it on 2026-08-17).
B = int(os.environ.get("AB_BATCH", "16"))

REFERENCE_CIRCUITS = "/root/reference/circuits"

DECKS = ["rlc.cir", "diode2.cir", "bjt2.cir", "mosfet1.cir", "transformer3.cir"]
ALL = DECKS + ["rr.cir", "rc.cir", "rl.cir", "isin.cir", "ipulse.cir",
               "ipwl.cir", "vpulse.cir", "vpwl.cir", "diode1.cir", "bjt1.cir",
               "transformer1.cir", "transformer2.cir"]


def run_deck(name):
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        deck = f.read()
    cc = compile_circuit(parse(deck))
    tp = cc.netlist.tran
    if tp is None or tp.tstop <= 0 or tp.tstep <= 0:
        return f"{name}: SKIP (no .tran card)"
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    state0 = init_state(cc)
    rng = np.random.default_rng(7)
    kind = "R" if "R" in cc.params else next(iter(cc.params))
    base = np.asarray(cc.params[kind]["value"])[None, :]
    overrides = {kind: {"value": base * np.exp(
        rng.normal(0, 0.03, (B, base.shape[1])))}}
    params, axes = batch_params(cc, overrides)

    outs = {}
    for backend in ("xla", "pallas"):
        os.environ["TOYSPICE_SOLVER"] = backend
        tran = make_tran(cc, cfg, store="none")
        fn = jax.jit(jax.vmap(tran, in_axes=(axes, None)))
        outs[backend] = jax.block_until_ready(fn(params, state0))
    os.environ.pop("TOYSPICE_SOLVER", None)

    a, b = outs["xla"], outs["pallas"]
    for fld in ("accepted", "attempts", "nr_iters", "fail"):
        va, vb = np.asarray(getattr(a, fld)), np.asarray(getattr(b, fld))
        assert np.array_equal(va, vb), f"{name} {fld}: {va} vs {vb}"
    worst = 0.0
    for kind in a.state:
        for key in a.state[kind]:
            xa = np.asarray(a.state[kind][key])
            xb = np.asarray(b.state[kind][key])
            scale = max(1e-30, float(np.max(np.abs(xa))))
            rel = float(np.max(np.abs(xb - xa))) / scale
            worst = max(worst, rel)
            assert rel < 5e-7, f"{name} {kind}.{key}: rel {rel:.2e}"
    acc = np.asarray(a.accepted)
    return (f"{name}: OK  accepted {int(acc.min())}..{int(acc.max())}, "
            f"fails {int(np.asarray(a.fail).sum())}, state max rel {worst:.2e}")


def main():
    print("devices:", jax.devices())
    decks = ALL if (len(sys.argv) > 1 and sys.argv[1] == "all") else DECKS
    fails = 0
    for name in decks:
        try:
            print(run_deck(name), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails += 1
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
    if fails:
        sys.exit(1)
    print("solver A/B: all decks match")


if __name__ == "__main__":
    main()
