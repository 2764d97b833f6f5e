"""Monte-Carlo tolerance analysis on the TPU batch API — the capability the
single-instance reference has no analog for.

A 5% -tolerance RLC filter is solved for 4096 component corners in one
compiled program; per-instance adaptive timestepping, Newton iteration and
convergence handling are batched automatically.  Reports the spread of the
peak output voltage across the tolerance cloud and the aggregate throughput.

Runs on whatever JAX platform is default (real TPU when available); set
BATCH / SPREAD via env to scale.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import toyspice_tpu  # noqa: F401  (enables x64)
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config
from toyspice_tpu.utils.profiling import tran_stats

BATCH = int(os.environ.get("BATCH", 4096))
SPREAD = float(os.environ.get("SPREAD", 0.05))  # 5% lognormal tolerance

DECK = """Monte-Carlo RLC band-pass
.tran 0.01m 1m
Vin 1 0 SIN(0 5 2k)
R1 1 2 100
L1 2 3 1m
C1 3 0 1u
"""


def main():
    cc = compile_circuit(parse(DECK))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)

    rng = np.random.default_rng(42)

    def corners(base):
        return base[None, :] * np.exp(
            rng.normal(0.0, SPREAD, size=(BATCH, base.shape[0]))
        )

    overrides = {
        kind: {"value": corners(np.asarray(cc.params[kind]["value"]))}
        for kind in ("R", "L", "C")
    }
    params, axes = batch_params(cc, overrides)
    state0 = init_state(cc)

    print(f"Solving {BATCH} corners of {cc.netlist.title!r} "
          f"on {jax.devices()[0].platform}...")
    from toyspice_tpu.engine.tran import make_tran

    tran = jax.jit(jax.vmap(make_tran(cc, cfg, store="none"),
                            in_axes=(axes, None)))
    t0 = time.perf_counter()
    out = tran(params, state0)
    _ = int(np.asarray(out.accepted).sum())  # force materialization
    print(f"compile + first run: {time.perf_counter() - t0:.1f}s "
          "(one-time per circuit/batch shape; persistently cached)")

    t0 = time.perf_counter()
    out = tran(params, state0)
    vfinal = np.asarray(out.state["C"]["v0"][:, 0])
    stats = tran_stats(out, time.perf_counter() - t0)

    print(f"aggregate: {stats['accepted_steps']} accepted steps in "
          f"{stats['wall_s']:.2f}s -> {stats['steps_per_sec'] / 1e6:.2f}M steps/s, "
          f"accept ratio {stats['accept_ratio']:.2f}, "
          f"{stats['failed_instances']} failures")
    print(f"V(3) at t=tstop across {BATCH} corners: "
          f"mean {vfinal.mean():.4f} V, std {vfinal.std():.4f} V, "
          f"[min {vfinal.min():.4f}, max {vfinal.max():.4f}] V")
    print("Done!")


if __name__ == "__main__":
    main()
