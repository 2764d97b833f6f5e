"""On-TPU A/B: fused OP/Newton kernel (ops/pallas_op.py) vs the general
vmapped engine on every eligible nonlinear reference fixture deck, plus the
fused DC sweep on diode3.cir.

Run on real TPU hardware (no conftest CPU forcing):

    python tests/tools/ab_fused_op.py

Per deck, a 64-way Monte-Carlo batch (log-normal R spread) solves the
operating point through both paths; asserted: per-lane convergence AND
rescue-stage agreement, solution vectors and junction voltages within the
double-float noise class.  The same protocol as ab_fused_tran.py, applied
to the round-4 fused OP dispatch (the transient A/B covers the fused OP
indirectly through the warm-start handoff; this tool isolates it).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

# persistent compile cache (CLAUDE.md): repeat A/B invocations skip the
# ~30s-3min TPU engine compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..",
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.dc import make_dc, sweep_values
from toyspice_tpu.engine.op import make_op
from toyspice_tpu.engine.options import DEFAULTS
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.ops.pallas_op import (make_dc_fused, make_op_fused,
                                        op_fused_eligible)

REFERENCE_CIRCUITS = "/root/reference/circuits"

# every nonlinear fixture (the fused OP requires >= 1 of D/Q/M)
DECKS = ["diode1.cir", "diode2.cir", "diode3.cir", "diode4.cir",
         "diode5.cir", "bjt1.cir", "bjt2.cir", "bjt3.cir", "mosfet1.cir"]

B = 64


def _load(name):
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        deck = f.read()
    cc = compile_circuit(parse(deck))
    rng = np.random.default_rng(42)
    base = np.asarray(cc.params["R"]["value"])[None, :]
    overrides = {"R": {"value": base * np.exp(
        rng.normal(0, 0.05, (B, base.shape[1])))}}
    params, axes = batch_params(cc, overrides)
    return cc, params, axes, init_state(cc)


def run_deck(name):
    cc, params, axes, state0 = _load(name)
    if not op_fused_eligible(cc, "compat", DEFAULTS):
        return f"{name}: SKIP (not fused-OP-eligible)"

    op_g, _ = make_op(cc, DEFAULTS)
    rg = jax.block_until_ready(jax.jit(jax.vmap(
        lambda p: op_g(p, state0), in_axes=(axes,)))(params))
    rf = jax.block_until_ready(jax.jit(
        make_op_fused(cc, DEFAULTS))(params, state0))

    np.testing.assert_array_equal(np.asarray(rf.converged),
                                  np.asarray(rg.converged), err_msg=name)
    np.testing.assert_array_equal(np.asarray(rf.stage),
                                  np.asarray(rg.stage), err_msg=name)
    xg = np.asarray(rg.x)
    xf = np.asarray(rf.x)
    scale = max(1.0, float(np.max(np.abs(xg))))
    rel = float(np.max(np.abs(xf - xg))) / scale
    assert rel < 1e-9, f"{name}: x rel {rel:.2e}"
    for kind in rg.jv:
        for key in rg.jv[kind]:
            jg = np.asarray(rg.jv[kind][key])
            jf = np.asarray(rf.jv[kind][key])
            np.testing.assert_allclose(jf, jg, rtol=1e-8, atol=1e-10,
                                       err_msg=f"{name} jv.{kind}.{key}")
    stages = np.asarray(rg.stage)
    return (f"{name}: OK  stages {sorted(set(stages.tolist()))}, "
            f"nr_iters {int(np.min(np.asarray(rf.iters)))}.."
            f"{int(np.max(np.asarray(rf.iters)))}, x max rel {rel:.2e}")


def run_dc(name="diode3.cir"):
    cc, params, axes, state0 = _load(name)
    dp = cc.netlist.dc
    slot = cc.names["V"].index(dp.source1)
    pts = jnp.asarray(sweep_values(dp.start1, dp.stop1, dp.increment1))

    dc_g = make_dc(cc, (slot,), DEFAULTS)
    xs_g, conv_g = jax.block_until_ready(jax.jit(jax.vmap(
        lambda p: dc_g(p, state0, pts), in_axes=(axes,)))(params))
    xs_f, conv_f = jax.block_until_ready(jax.jit(
        lambda p: make_dc_fused(cc, (slot,), DEFAULTS)(p, state0, pts))(
            params))
    np.testing.assert_array_equal(np.asarray(conv_f), np.asarray(conv_g),
                                  err_msg=name)
    a = np.asarray(xs_g)
    f = np.asarray(xs_f)
    scale = max(1.0, float(np.max(np.abs(a))))
    rel = float(np.max(np.abs(f - a))) / scale
    assert rel < 1e-9, f"{name} dc: x rel {rel:.2e}"
    return (f"{name} DC sweep: OK  {len(pts)} pts x {B} lanes, "
            f"x max rel {rel:.2e}")


def run_ac(name="bjt3.cir"):
    """Fused AC stamped-solve (ops/pallas_ac.py, one in-kernel build+GJ
    per (instance, frequency)) vs the general (B, F)-flattened
    assemble+solve path, both over the same fused bias."""
    from toyspice_tpu.engine.ac import frequency_points, make_ac_batch

    cc, params, axes, state0 = _load(name)
    ap = cc.netlist.ac
    freqs = jnp.asarray(frequency_points(ap.sweep, ap.fstart, ap.fstop,
                                         ap.points))
    saved = os.environ.get("TOYSPICE_AC")
    try:
        os.environ["TOYSPICE_AC"] = "general"
        xr_g, xi_g, opr_g = jax.block_until_ready(jax.jit(
            make_ac_batch(cc, axes, DEFAULTS))(params, state0, freqs))
        os.environ["TOYSPICE_AC"] = "fused"
        xr_f, xi_f, opr_f = jax.block_until_ready(jax.jit(
            make_ac_batch(cc, axes, DEFAULTS))(params, state0, freqs))
    finally:
        if saved is None:
            os.environ.pop("TOYSPICE_AC", None)
        else:
            os.environ["TOYSPICE_AC"] = saved
    np.testing.assert_array_equal(np.asarray(opr_f.converged),
                                  np.asarray(opr_g.converged), err_msg=name)
    scale = max(float(np.max(np.abs(np.asarray(xr_g)))),
                float(np.max(np.abs(np.asarray(xi_g)))), 1.0)
    rel = max(float(np.max(np.abs(np.asarray(xr_f) - np.asarray(xr_g)))),
              float(np.max(np.abs(np.asarray(xi_f)
                                  - np.asarray(xi_g))))) / scale
    assert rel < 1e-9, f"{name} ac: x rel {rel:.2e}"
    return (f"{name} AC sweep: OK  {freqs.shape[0]} freqs x {B} lanes, "
            f"x max rel {rel:.2e}")


def main():
    print("devices:", jax.devices())
    fails = 0
    for name in DECKS:
        try:
            print(run_deck(name), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails += 1
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
    try:
        print(run_dc(), flush=True)
    except Exception as e:  # noqa: BLE001
        fails += 1
        print(f"diode3 DC: FAIL {type(e).__name__}: {e}", flush=True)
    try:
        print(run_ac(), flush=True)
    except Exception as e:  # noqa: BLE001
        fails += 1
        print(f"bjt3 AC: FAIL {type(e).__name__}: {e}", flush=True)
    if fails:
        sys.exit(1)
    print("fused-OP A/B sweep: all decks match")


if __name__ == "__main__":
    main()
