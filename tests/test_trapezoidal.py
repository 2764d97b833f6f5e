"""Trapezoidal integration (physics semantics): 2nd-order accuracy where the
reference's effective method is backward Euler order 1 (it only ever calls
GetIntegratorCoeffs(Gear, 1, dt) — integrator.go, SURVEY.md #22)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

import toyspice_tpu as ts
from toyspice_tpu import SimOptions
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran

# RC charge with tau = 1 ms, simulated one tau with uic: v(t) = 5(1 - e^-t/tau)
RC = """rc charge
.tran {dt} 1m uic
V1 1 0 DC 5
R1 1 2 1k
C1 2 0 1u
"""


def _rc_error(integration: str, dt: float) -> float:
    cc = compile_circuit(parse(RC.format(dt=dt)))
    tp = cc.netlist.tran
    # fixed grid: disable the tstep clamp (tstep > tstop/divisor triggers
    # it, so a tiny divisor turns it off), make the minimum step equal the
    # requested step, and set trtol huge so LTE never rejects
    opts = SimOptions(integration=integration, tstep_divisor=1e-9,
                      minstep_divisor=1.0, trtol=1e9)
    cfg = build_config(tp.tstart, tp.tstop, dt, dt, tp.uic, opts=opts)
    tran = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                             opts=opts))
    out = tran(_params(cc), init_state(cc))
    assert not bool(out.fail)
    n = int(out.out_n)
    t = np.asarray(out.out_t)[:n]
    v = np.asarray(out.out_x)[:n, cc.node_map["2"]]
    exact = 5.0 * (1.0 - np.exp(-t / 1e-3))
    return float(np.max(np.abs(v - exact)))


def test_trap_beats_be_and_converges_second_order():
    dt = 2e-5  # 50 steps per tau
    err_be = _rc_error("be", dt)
    err_tr = _rc_error("trap", dt)
    # TR error ~ (dt/tau)^2/12 vs BE ~ (dt/tau)/2: ~2 orders of magnitude here
    assert err_tr < err_be / 15.0, (err_be, err_tr)

    # order check: halving dt cuts BE error ~2x but TR error ~4x
    err_be2 = _rc_error("be", dt / 2)
    err_tr2 = _rc_error("trap", dt / 2)
    assert 1.5 < err_be / err_be2 < 3.0
    assert 3.0 < err_tr / err_tr2 < 6.0


# Forward-biased diode with a large transit time: the Tt diffusion charge
# dominates the dynamics (q = Tt·id), so the order of the charge companion
# is observable.  R2 keeps the matrix well-conditioned when the diode is off.
D_TT = """diode tt order
.tran {dt} 20u uic
V1 1 0 SIN(1.0 0.4 100k)
R1 1 2 1k
D1 2 0 DM
R2 2 0 100k
.model DM D (Is=1e-12 Tt=1u)
"""


def _dtt_v(dt: float, integration: str):
    cc = compile_circuit(parse(D_TT.format(dt=dt)))
    tp = cc.netlist.tran
    opts = SimOptions(integration=integration, tstep_divisor=1e-9,
                      minstep_divisor=1.0, trtol=1e9)
    cfg = build_config(tp.tstart, tp.tstop, dt, dt, tp.uic, opts=opts)
    tran = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                             opts=opts))
    out = tran(_params(cc), init_state(cc))
    assert not bool(out.fail)
    n = int(out.out_n)
    return (np.asarray(out.out_t)[:n],
            np.asarray(out.out_x)[:n, cc.node_map["2"]])


def test_trap_diode_tt_second_order():
    """VERDICT round-1 #7: nonlinear charge storage (diode Tt) must be
    genuinely 2nd-order in trap mode, not BE-held.  Self-convergence against
    a dt/8 trap reference on the shared time grid."""
    dt = 2e-7
    t_ref, v_ref = _dtt_v(dt / 8, "trap")

    def err(dtx, integration):
        t, v = _dtt_v(dtx, integration)
        idx = np.searchsorted(t_ref, t)
        idx = np.clip(idx, 0, len(t_ref) - 1)
        # measure the settled tail: uic starts with the inconsistent q=0
        # (exact q(0)=Tt·id(v0) != 0), and that O(1) initial transient decays
        # over ~Tt regardless of the method's order
        ok = (np.abs(t_ref[idx] - t) < 1e-12) & (t > 10e-6)
        return float(np.max(np.abs(v[ok] - v_ref[idx][ok])))

    e_tr = err(dt, "trap")       # measured 5.0e-5
    e_tr2 = err(dt / 2, "trap")  # measured 1.19e-5 -> ratio 4.2 (order 2)
    e_be = err(dt, "be")         # measured 6.2e-3
    assert e_tr < e_be / 20.0, (e_be, e_tr)
    assert 3.0 < e_tr / e_tr2 < 6.0, (e_tr, e_tr2)


M_TRAP = """nmos inverter trap
.tran {dt} 20u uic
VDD 1 0 DC 5
VG 2 0 SIN(2.5 2 100k)
RD 1 3 10k
M1 3 2 0 0 NM L=2u W=20u
.model NM NMOS(VTO=0.7 KP=20u CGSO=1n CGDO=1n)
"""


def test_trap_mosfet_meyer_runs_and_agrees_with_be():
    """Meyer-charge trap companions: stable, finite, and converging to the
    same waveform as BE as dt -> 0 (coarse-grid runs stay within the
    integration-error envelope of each other)."""
    dt = 2e-7

    def run(integration):
        cc = compile_circuit(parse(M_TRAP.format(dt=dt)))
        tp = cc.netlist.tran
        opts = SimOptions(integration=integration, tstep_divisor=1e-9,
                          minstep_divisor=1.0, trtol=1e9)
        cfg = build_config(tp.tstart, tp.tstop, dt, dt, tp.uic, opts=opts)
        out = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                                opts=opts))(_params(cc), init_state(cc))
        assert not bool(out.fail)
        n = int(out.out_n)
        return np.asarray(out.out_x)[:n, cc.node_map["3"]]

    v_tr = run("trap")
    v_be = run("be")
    assert np.all(np.isfinite(v_tr))
    assert np.max(np.abs(v_tr)) < 10.0
    # BE keeps the reference's old-time source evaluation while trap stamps
    # end-of-interval sources (engine/tran.py), so the BE waveform lags one
    # sample; aligned, the two differ only by integration error
    assert np.max(np.abs(v_tr[:-1] - v_be[1:])) < 0.5, \
        np.max(np.abs(v_tr[:-1] - v_be[1:]))


def test_trap_rejects_compat():
    cc = compile_circuit(parse(RC.format(dt=1e-5)))
    tp = cc.netlist.tran
    opts = SimOptions(integration="trap")
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic, opts=opts)
    with pytest.raises(ValueError, match="physics"):
        make_tran(cc, cfg, semantics="compat", opts=opts)


def test_trap_rlc_energy_conserving_tendency():
    # undamped-ish LC ringing: BE damps the oscillation artificially, TR
    # preserves amplitude far better over many periods
    deck = """lc ring
.tran 5u 2m uic
V1 1 0 DC 5
R1 1 2 10
L1 2 3 1m
C1 3 0 1u
"""
    cc = compile_circuit(parse(deck))
    tp = cc.netlist.tran

    def final_amp(integration):
        opts = SimOptions(integration=integration)
        cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic,
                           opts=opts)
        tran = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                                 opts=opts))
        out = tran(_params(cc), init_state(cc))
        n = int(out.out_n)
        t = np.asarray(out.out_t)[:n]
        v = np.asarray(out.out_x)[:n, cc.node_map["3"]]
        tail = t > 1.5e-3
        return float(np.max(np.abs(v[tail] - v[tail].mean())))

    amp_be = final_amp("be")
    amp_tr = final_amp("trap")
    assert amp_tr > amp_be  # less numerical damping


def test_trap_batched_matches_single():
    # trap mode under vmap: the hist-flag where() must batch cleanly
    import jax.numpy as jnp
    from toyspice_tpu.engine.batch import batch_params, run_transient_batch

    cc = compile_circuit(parse(RC.format(dt=1e-5)))
    tp = cc.netlist.tran
    opts = SimOptions(integration="trap")
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic,
                       opts=opts)
    B = 3
    overrides = {
        kind: {k: jnp.broadcast_to(jnp.asarray(v), (B,) + np.asarray(v).shape)
               for k, v in tbl.items()}
        for kind, tbl in cc.params.items()
    }
    params, axes = batch_params(cc, overrides)
    out = run_transient_batch(cc, cfg, params, axes, init_state(cc),
                              semantics="physics", opts=opts)
    acc = np.asarray(out.accepted)
    assert np.all(acc == acc[0]) and acc[0] > 0
    assert not bool(np.any(np.asarray(out.fail)))

    # must match a direct single-instance run, not merely be self-consistent
    single = jax.jit(make_tran(cc, cfg, semantics="physics", store="none",
                               opts=opts))(_params(cc), init_state(cc))
    assert int(np.asarray(single.accepted)) == int(acc[0])
    v_b = np.asarray(out.state["C"]["v0"])[:, 0]
    v_s = float(np.asarray(single.state["C"]["v0"])[0])
    np.testing.assert_allclose(v_b, v_s, rtol=1e-12)


def test_trap_mutual_coupling_not_halved():
    # trap-mode K stamps must be trapezoidal like the branch rows they join:
    # BE M/dt cross terms on 2L/dt rows converge to HALF the mutual
    # inductance.  The 2:1 transformer's open-secondary amplitude ratio
    # k*sqrt(Ls/Lp) = 0.475 pins it.
    from tests.conftest import read_fixture

    cc = compile_circuit(parse(read_fixture("transformer1.cir")))
    tp = cc.netlist.tran
    opts = SimOptions(integration="trap")
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic,
                       opts=opts)
    tran = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                             opts=opts))
    out = tran(_params(cc), init_state(cc))
    assert not bool(out.fail)
    n = int(out.out_n)
    t = np.asarray(out.out_t)[:n]
    x = np.asarray(out.out_x)[:n]
    vp = x[:, cc.node_map["2"]]
    vs = x[:, cc.node_map["3"]]
    tail = t > 1.5e-3
    ratio = np.max(np.abs(vs[tail])) / np.max(np.abs(vp[tail]))
    assert 0.35 < ratio < 0.6, ratio  # halved M would push this toward ~0.24


def test_physics_non_uic_starts_at_bias():
    # physics mode seeds the transient state from the OP solution: a
    # DC-biased RC must hold its bias, not re-charge from zero
    deck = """biased rc
.tran 0.02m 1m
V1 1 0 DC 5
R1 1 2 1k
C1 2 0 1u
"""
    for opts in (SimOptions(), SimOptions(integration="trap")):
        cc = compile_circuit(parse(deck))
        tp = cc.netlist.tran
        cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic,
                           opts=opts)
        tran = jax.jit(make_tran(cc, cfg, semantics="physics", store="full",
                                 opts=opts))
        out = tran(_params(cc), init_state(cc))
        n = int(out.out_n)
        v2 = np.asarray(out.out_x)[:n, cc.node_map["2"]]
        assert np.min(v2) > 4.99, (opts.integration, float(np.min(v2)))
