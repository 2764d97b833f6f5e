"""Single-device shard_map smoke on the REAL TPU.

The multichip dryrun exercises the sharded path on a virtual CPU mesh,
where only the GENERAL engine runs (Pallas needs real TPU hardware) — so
Pallas-kernel-under-shard_map breakage was previously invisible without
multi-chip hardware (round-4 VERDICT weak #4).  This smoke runs the fused
engines through a ``Mesh((1,))`` shard_map on the one real chip and
asserts bitwise equality with the unsharded fused runs:

* transient: the whole-run kernel (rlc.cir) and the attempt-loop kernel
  via TOYSPICE_TRAN_RUN=off, plus the in-kernel-Newton diode2.cir
* OP: the fused OP/Newton kernel (diode2.cir bias)

    python tests/tools/ab_shard_smoke.py        (run on TPU, ~1-2 min warm)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..",
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import (batch_params, run_op_batch,
                                       select_tran_engine)
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config
from toyspice_tpu.parallel.mesh import (make_mesh, run_op_sharded,
                                        run_transient_sharded)

REFERENCE_CIRCUITS = "/root/reference/circuits"
B = 64


def _setup(name):
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        cc = compile_circuit(parse(f.read()))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    rng = np.random.default_rng(5)
    overrides = {}
    for kind in ("R", "C", "L"):
        if kind in cc.params:
            base = np.asarray(cc.params[kind]["value"])[None, :]
            overrides[kind] = {"value": base * np.exp(
                rng.normal(0, 0.05, (B, base.shape[1])))}
    params, axes = batch_params(cc, overrides)
    return cc, cfg, params, axes, init_state(cc)


def smoke_tran(name, run_kernel: bool):
    cc, cfg, params, axes, state0 = _setup(name)
    saved = os.environ.get("TOYSPICE_TRAN_RUN")
    try:
        if not run_kernel:
            os.environ["TOYSPICE_TRAN_RUN"] = "off"
        engine, reason, fn = select_tran_engine(cc, cfg, axes,
                                                params=params)
        want = "run" if run_kernel else "fused"
        assert engine == want, f"{name}: engine {engine} ({reason})"
        ref = jax.block_until_ready(jax.jit(fn)(params, state0))
        mesh = make_mesh(1)
        out, total = run_transient_sharded(cc, cfg, mesh, params, axes)
        out = jax.block_until_ready(out)
        assert run_transient_sharded.last_engine == want
        np.testing.assert_array_equal(np.asarray(out.accepted),
                                      np.asarray(ref.accepted))
        np.testing.assert_array_equal(np.asarray(out.attempts),
                                      np.asarray(ref.attempts))
        np.testing.assert_array_equal(np.asarray(out.fail),
                                      np.asarray(ref.fail))
        np.testing.assert_array_equal(np.asarray(out.t_final),
                                      np.asarray(ref.t_final))
        for kind in ref.state:
            for key in ref.state[kind]:
                np.testing.assert_array_equal(
                    np.asarray(out.state[kind][key]),
                    np.asarray(ref.state[kind][key]),
                    err_msg=f"{name} state.{kind}.{key}")
        assert int(total) == int(np.asarray(ref.accepted).sum())
        return (f"{name} [{want}] shard_map(1): OK bitwise vs unsharded, "
                f"psum accepted {int(total)}")
    finally:
        if saved is None:
            os.environ.pop("TOYSPICE_TRAN_RUN", None)
        else:
            os.environ["TOYSPICE_TRAN_RUN"] = saved


def smoke_op(name):
    cc, cfg, params, axes, state0 = _setup(name)
    ref = jax.block_until_ready(run_op_batch(cc, params, axes))
    mesh = make_mesh(1)
    out = jax.block_until_ready(run_op_sharded(cc, mesh, params, axes))
    assert run_op_sharded.last_engine == "fused", \
        run_op_sharded.last_reason
    np.testing.assert_array_equal(np.asarray(out.converged),
                                  np.asarray(ref.converged))
    np.testing.assert_array_equal(np.asarray(out.stage),
                                  np.asarray(ref.stage))
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(ref.x))
    return f"{name} fused-OP shard_map(1): OK bitwise vs unsharded"


def main():
    print("devices:", jax.devices())
    fails = 0
    for label, fn in [
        ("rlc run-kernel", lambda: smoke_tran("rlc.cir", True)),
        ("rlc attempt-loop", lambda: smoke_tran("rlc.cir", False)),
        ("diode2 run-kernel", lambda: smoke_tran("diode2.cir", True)),
        ("diode2 fused OP", lambda: smoke_op("diode2.cir")),
    ]:
        try:
            print(fn(), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            fails += 1
            print(f"{label}: FAIL {type(e).__name__}: {e}", flush=True)
    if fails:
        sys.exit(1)
    print("shard_map smoke: all PASS")


if __name__ == "__main__":
    main()
