"""Randomized parity fuzz: generated decks through both engines.

The fixed reference fixture matrix (22 decks) exercises each device/analysis
pairing once; this fuzzer sweeps random topologies, component values, and
model parameters to catch stamp/topology/state corners the fixtures miss.
Every generated deck runs through the vectorized TPU engine AND the
sequential oracle (toyspice_tpu.hostsim — the reference re-implementation,
quirks included); accepted-step counts must match EXACTLY and waveforms
within the XLA-CPU transcendental tolerance (see test_parity_linear).

Seeds are fixed for reproducibility.  Transient decks exercise the OP
warm-up (incl. the rescue ladders when NR needs them) implicitly.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params
from toyspice_tpu.engine.ac import frequency_points, make_ac
from toyspice_tpu.engine.dc import make_dc, sweep_values
from toyspice_tpu.engine.op import make_op
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from tests.oracle import OracleCircuit

RTOL = 3e-7  # XLA CPU size-1 transcendental precision (see test_parity_linear)


def _lu(rng, lo, hi):
    """Log-uniform draw."""
    return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))


def _fmt(v):
    return f"{v:.6e}"


# ---------------------------------------------------------------- generators


def _source_line(rng, kind, node, tstop):
    """One V or I source from `node` to ground with a random waveform."""
    wf = rng.choice(["DC", "SIN", "PULSE", "PWL"])
    amp = _lu(rng, 1.0, 10.0)
    if wf == "DC":
        spec = f"DC {_fmt(amp)}"
    elif wf == "SIN":
        freq = rng.integers(2, 10) / tstop
        off = rng.uniform(-2.0, 2.0)
        spec = f"SIN({_fmt(off)} {_fmt(amp)} {_fmt(freq)})"
    elif wf == "PULSE":
        delay = rng.uniform(0.0, 0.2) * tstop
        rise = tstop * rng.uniform(0.005, 0.02)
        width = tstop * rng.uniform(0.05, 0.2)
        period = tstop * rng.uniform(0.25, 0.5)
        v1 = rng.uniform(-1.0, 1.0)
        spec = (f"PULSE({_fmt(v1)} {_fmt(amp)} {_fmt(delay)} {_fmt(rise)} "
                f"{_fmt(rise)} {_fmt(width)} {_fmt(period)})")
    else:  # PWL
        npts = int(rng.integers(3, 6))
        ts = np.sort(rng.uniform(0.0, tstop, size=npts))
        ts[0] = 0.0
        vs = rng.uniform(-amp, amp, size=npts)
        pairs = " ".join(f"{_fmt(t)} {_fmt(v)}" for t, v in zip(ts, vs))
        spec = f"PWL({pairs})"
    return f"{kind}src {node} 0 {spec}"


def gen_linear_deck(seed, force_l=False):
    """Random R spanning tree to ground + extra R/C(/L) + one random source."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 6))  # internal nodes 1..n
    tstop = 2e-4 if force_l else 1e-3
    lines = [f"* fuzz linear seed {seed}"]
    eid = {"R": 0, "C": 0, "L": 0}

    def nm(p):
        eid[p] += 1
        return f"{p}{eid[p]}"

    # spanning tree of resistors: every node gets a DC path to ground
    for i in range(1, n + 1):
        j = int(rng.integers(0, i))
        lines.append(f"{nm('R')} {i} {j} {_fmt(_lu(rng, 50.0, 50e3))}")

    kinds = ["R", "C", "C"] + (["L"] if force_l else [])
    for _ in range(int(rng.integers(1, 5))):
        k = rng.choice(kinds)
        a, b = rng.choice(n + 1, size=2, replace=False)
        if k == "R":
            v = _lu(rng, 50.0, 50e3)
        elif k == "C":
            v = _lu(rng, 1e-9, 1e-6)
        else:
            v = _lu(rng, 1e-3, 50e-3)
        lines.append(f"{nm(k)} {a} {b} {_fmt(v)}")
    if force_l and eid["L"] == 0:
        a, b = rng.choice(n + 1, size=2, replace=False)
        lines.append(f"{nm('L')} {a} {b} {_fmt(_lu(rng, 1e-3, 50e-3))}")

    lines.append(_source_line(rng, rng.choice(["V", "V", "I"]), 1, tstop))
    lines.append(f".tran {_fmt(tstop / 100)} {_fmt(tstop)}")
    return "\n".join(lines) + "\n"


def gen_diode_deck(seed):
    """Linear skeleton + 1-2 diodes with a randomized .model card."""
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(2, 5))
    tstop = 1e-3
    lines = [f"* fuzz diode seed {seed}"]
    for i in range(1, n + 1):
        j = int(rng.integers(0, i))
        lines.append(f"R{i} {i} {j} {_fmt(_lu(rng, 100.0, 20e3))}")
    # randomized model: Is/N always; junction cap and transit time sometimes
    parts = [f"Is={_fmt(_lu(rng, 1e-16, 1e-12))}",
             f"N={_fmt(rng.uniform(1.0, 2.0))}"]
    if rng.random() < 0.7:
        parts += [f"Cj0={_fmt(_lu(rng, 1e-12, 1e-9))}",
                  f"Vj={_fmt(rng.uniform(0.5, 1.0))}",
                  f"M={_fmt(rng.uniform(0.3, 0.5))}"]
    if rng.random() < 0.5:
        parts.append(f"Tt={_fmt(_lu(rng, 1e-9, 1e-7))}")
    lines.append(f".model DF D({' '.join(parts)})")
    for d in range(int(rng.integers(1, 3))):
        a, b = rng.choice(n + 1, size=2, replace=False)
        lines.append(f"D{d + 1} {a} {b} DF")
    lines.append(_source_line(rng, "V", 1, tstop))
    lines.append(f".tran {_fmt(tstop / 100)} {_fmt(tstop)}")
    return "\n".join(lines) + "\n"


def gen_bjt_op_deck(seed, pnp=False):
    """CE-amplifier bias template with randomized resistors and the model
    params that actually reach the reference device (vaf/ikf/cje/cjc/tf —
    netlist Is/Bf are quirk-ignored, PLAN.md item 9)."""
    rng = np.random.default_rng(2000 + seed)
    vcc = rng.uniform(8.0, 15.0) * (-1.0 if pnp else 1.0)
    mt = "PNP" if pnp else "NPN"
    parts = [f"Is={_fmt(_lu(rng, 1e-16, 1e-14))}",
             f"Bf={_fmt(rng.uniform(50, 400))}",
             f"Vaf={_fmt(rng.uniform(30, 150))}",
             f"Ikf={_fmt(_lu(rng, 1e-3, 1.0))}",
             f"Cje={_fmt(_lu(rng, 1e-12, 1e-11))}",
             f"Cjc={_fmt(_lu(rng, 1e-12, 1e-11))}",
             f"Tf={_fmt(_lu(rng, 1e-10, 1e-9))}"]
    lines = [
        f"* fuzz bjt {'pnp' if pnp else 'npn'} seed {seed}",
        f"VCC 1 0 DC {_fmt(vcc)}",
        f"RB 1 2 {_fmt(_lu(rng, 20e3, 200e3))}",
        f"RC 1 3 {_fmt(_lu(rng, 500.0, 5e3))}",
        f"RE 4 0 {_fmt(_lu(rng, 50.0, 1e3))}",
        f"Q1 3 2 4 QF",
        f".model QF {mt}({' '.join(parts)})",
        ".op",
    ]
    return "\n".join(lines) + "\n"


def gen_mosfet_deck(seed, level, pmos=False):
    """Resistor-loaded inverter with randomized geometry + model params."""
    rng = np.random.default_rng(3000 + seed)
    vdd = rng.uniform(3.0, 8.0) * (-1.0 if pmos else 1.0)
    mt = "PMOS" if pmos else "NMOS"
    tstop = 10e-6
    parts = [f"Level={level}",
             f"VTO={_fmt(rng.uniform(0.4, 1.2) * (-1.0 if pmos else 1.0))}",
             f"KP={_fmt(_lu(rng, 1e-5, 2e-4))}",
             f"GAMMA={_fmt(rng.uniform(0.2, 0.8))}",
             f"PHI={_fmt(rng.uniform(0.5, 0.8))}",
             f"LAMBDA={_fmt(rng.uniform(0.0, 0.05))}"]
    if level == 2:
        parts += [f"VMAX={_fmt(_lu(rng, 1e4, 1e5))}",
                  f"UCRIT={_fmt(_lu(rng, 1e4, 1e5))}"]
    if level == 3:
        parts += [f"THETA={_fmt(rng.uniform(0.0, 0.2))}",
                  f"ETA={_fmt(rng.uniform(0.0, 0.1))}",
                  f"KAPPA={_fmt(rng.uniform(0.1, 1.0))}"]
    w = _lu(rng, 5e-6, 50e-6)
    l = _lu(rng, 1e-6, 5e-6)
    amp = abs(vdd)
    gate = (f"VG 2 0 PULSE(0 {_fmt(amp * (-1 if pmos else 1))} 1u 100n 100n "
            f"{_fmt(tstop / 3)} {_fmt(tstop)})")
    lines = [
        f"* fuzz mosfet L{level} {'pmos' if pmos else 'nmos'} seed {seed}",
        f"VDD 1 0 DC {_fmt(vdd)}",
        gate,
        f"RD 1 3 {_fmt(_lu(rng, 1e3, 20e3))}",
        f"M1 3 2 0 0 MM L={_fmt(l)} W={_fmt(w)}",
        f".model MM {mt}({' '.join(parts)})",
        f".tran {_fmt(tstop / 50)} {_fmt(tstop)}",
    ]
    return "\n".join(lines) + "\n"


def gen_transformer_deck(seed, windings=2):
    rng = np.random.default_rng(4000 + seed)
    tstop = 3e-4
    freq = rng.integers(2, 6) / tstop
    k = rng.uniform(0.8, 0.99)
    lines = [f"* fuzz transformer seed {seed}",
             f"Vin 1 0 SIN(0 {_fmt(rng.uniform(5, 20))} {_fmt(freq)})",
             f"Rp 1 2 {_fmt(rng.uniform(0.1, 5.0))}",
             f"L1 2 0 {_fmt(_lu(rng, 1e-3, 1e-2))}"]
    names = ["L1"]
    for w in range(2, windings + 1):
        a = 2 * w - 1  # load node
        lines += [f"L{w} {a} 0 {_fmt(_lu(rng, 1e-3, 1e-2))}",
                  f"RL{w} {a} 0 {_fmt(_lu(rng, 100.0, 5e3))}"]
        names.append(f"L{w}")
    lines.append(f"K1 {' '.join(names)} {_fmt(k)}")
    lines.append(f".tran {_fmt(tstop / 30)} {_fmt(tstop)}")
    return "\n".join(lines) + "\n"


def gen_ac_deck(seed):
    """Random RCL ladder with an AC source and a random frequency grid."""
    rng = np.random.default_rng(5000 + seed)
    n = int(rng.integers(2, 5))
    lines = [f"* fuzz ac seed {seed}",
             f"Vin 1 0 AC {_fmt(rng.uniform(0.5, 5.0))} "
             f"{_fmt(rng.uniform(0.0, 90.0))}"]
    for i in range(1, n + 1):
        j = int(rng.integers(0, i))
        lines.append(f"R{i} {i} {j} {_fmt(_lu(rng, 100.0, 20e3))}")
    for e in range(int(rng.integers(1, 4))):
        a, b = rng.choice(n + 1, size=2, replace=False)
        if rng.random() < 0.6:
            lines.append(f"C{e + 1} {a} {b} {_fmt(_lu(rng, 1e-9, 1e-6))}")
        else:
            lines.append(f"L{e + 1} {a} {b} {_fmt(_lu(rng, 1e-4, 1e-2))}")
    sweep = rng.choice(["DEC", "OCT", "LIN"])
    pts = int(rng.integers(8, 25))
    lines.append(f".ac {sweep} {pts} 10 1e6")
    return "\n".join(lines) + "\n"


def gen_dc_deck(seed):
    """Diode/resistor network under a swept source."""
    rng = np.random.default_rng(6000 + seed)
    lines = [f"* fuzz dc seed {seed}",
             "Vin 1 0 DC 0",
             f"R1 1 2 {_fmt(_lu(rng, 200.0, 5e3))}",
             f"D1 2 0 DF",
             f"R2 2 0 {_fmt(_lu(rng, 1e3, 100e3))}",
             f".model DF D(Is={_fmt(_lu(rng, 1e-15, 1e-13))} "
             f"N={_fmt(rng.uniform(1.0, 2.0))})"]
    stop = rng.uniform(2.0, 5.0)
    inc = stop / int(rng.integers(20, 60))
    lines.append(f".dc Vin {_fmt(-1.0)} {_fmt(stop)} {_fmt(inc)}")
    return "\n".join(lines) + "\n"


# ----------------------------------------------------------------- checkers


def tran_fuzz_parity(deck, rtol=RTOL):
    cc = compile_circuit(parse(deck))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    out = jax.jit(make_tran(cc, cfg, store="full"))(_params(cc), init_state(cc))
    assert not bool(out.fail), deck
    n = int(out.out_n)
    t_e = np.asarray(out.out_t)[:n]
    x_e = np.asarray(out.out_x)[:n]
    t_o, x_o, acc_o = OracleCircuit(cc).tran(
        tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic
    )
    assert int(out.accepted) == acc_o, (
        f"steps {int(out.accepted)} vs {acc_o}\n{deck}")
    assert n == len(t_o), deck
    np.testing.assert_allclose(t_e, t_o, rtol=1e-9, atol=1e-12)
    scale = max(1.0, float(np.max(np.abs(x_o))))
    np.testing.assert_allclose(x_e, x_o, rtol=rtol, atol=rtol * scale,
                               err_msg=deck)


def op_fuzz_parity(deck, rtol=RTOL):
    cc = compile_circuit(parse(deck))
    op_execute, _ = make_op(cc)
    r = jax.jit(op_execute)(_params(cc), init_state(cc))
    x_o, ok = OracleCircuit(cc).op()
    assert bool(r.converged) == bool(ok), deck
    if ok:
        scale = max(1.0, float(np.max(np.abs(x_o))))
        np.testing.assert_allclose(np.asarray(r.x), x_o, rtol=rtol,
                                   atol=rtol * scale, err_msg=deck)


# -------------------------------------------------------------------- tests


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_linear_tran(seed):
    tran_fuzz_parity(gen_linear_deck(seed))


@pytest.mark.parametrize("seed", [10, 11])
def test_fuzz_linear_tran_with_l(seed):
    tran_fuzz_parity(gen_linear_deck(seed, force_l=True))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_diode_tran(seed):
    tran_fuzz_parity(gen_diode_deck(seed))


@pytest.mark.parametrize("seed,pnp", [(0, False), (1, False), (2, True)])
def test_fuzz_bjt_op(seed, pnp):
    op_fuzz_parity(gen_bjt_op_deck(seed, pnp=pnp))


@pytest.mark.parametrize("seed,level,pmos",
                         [(0, 1, False), (1, 2, False), (2, 3, False),
                          (3, 1, True)])
def test_fuzz_mosfet_tran(seed, level, pmos):
    tran_fuzz_parity(gen_mosfet_deck(seed, level, pmos=pmos))


@pytest.mark.parametrize("seed,windings", [(0, 2), (1, 3)])
def test_fuzz_transformer_tran(seed, windings):
    tran_fuzz_parity(gen_transformer_deck(seed, windings=windings))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_ac(seed):
    deck = gen_ac_deck(seed)
    cc = compile_circuit(parse(deck))
    ap = cc.netlist.ac
    freqs = frequency_points(ap.sweep, ap.fstart, ap.fstop, ap.points)
    xr, xi, opr = jax.jit(make_ac(cc))(
        _params(cc), init_state(cc), jnp.asarray(freqs))
    assert bool(opr.converged), deck
    xr_o, xi_o = OracleCircuit(cc).ac(freqs)
    scale = max(1.0, float(np.max(np.abs(xr_o))), float(np.max(np.abs(xi_o))))
    np.testing.assert_allclose(np.asarray(xr), xr_o, rtol=1e-6,
                               atol=1e-6 * scale, err_msg=deck)
    np.testing.assert_allclose(np.asarray(xi), xi_o, rtol=1e-6,
                               atol=1e-6 * scale, err_msg=deck)


def gen_mixed_deck(seed):
    """CE amplifier (randomized bias + model) with a diode and extra R/C
    sprinkled in — multiple nonlinear device kinds in one matrix."""
    rng = np.random.default_rng(7000 + seed)
    vcc = rng.uniform(6.0, 12.0)
    parts = [f"Vaf={_fmt(rng.uniform(40, 120))}",
             f"Ikf={_fmt(_lu(rng, 1e-2, 1.0))}",
             f"Cje={_fmt(_lu(rng, 1e-12, 8e-12))}",
             f"Cjc={_fmt(_lu(rng, 1e-12, 8e-12))}",
             f"Tf={_fmt(_lu(rng, 1e-10, 5e-10))}"]
    tstop = 5e-4
    freq = rng.integers(2, 6) / tstop
    lines = [
        f"* fuzz mixed seed {seed}",
        f"VCC 1 0 DC {_fmt(vcc)}",
        f"Vsig 5 0 SIN(0 {_fmt(rng.uniform(0.05, 0.3))} {_fmt(freq)})",
        f"Cc 5 2 {_fmt(_lu(rng, 1e-7, 1e-6))}",
        f"RB1 1 2 {_fmt(_lu(rng, 30e3, 150e3))}",
        f"RB2 2 0 {_fmt(_lu(rng, 5e3, 30e3))}",
        f"RC 1 3 {_fmt(_lu(rng, 1e3, 5e3))}",
        f"RE 4 0 {_fmt(_lu(rng, 200.0, 1e3))}",
        f"Q1 3 2 4 QF",
        f".model QF NPN({' '.join(parts)})",
        f"D1 4 0 DF",
        f".model DF D(Is={_fmt(_lu(rng, 1e-15, 1e-13))} "
        f"N={_fmt(rng.uniform(1.0, 1.8))})",
        f"CL 3 0 {_fmt(_lu(rng, 1e-10, 1e-9))}",
        f".tran {_fmt(tstop / 100)} {_fmt(tstop)}",
    ]
    return "\n".join(lines) + "\n"


def gen_magnetic_deck(seed):
    """Jiles-Atherton core transformer with randomized core params + turns.

    Compat semantics keeps the core linear at L0 = mu0*N^2*A/len (the
    reference never commits magnetic state, PLAN.md item 1), so this fuzzes
    the L0-from-core-params path plus the branch-row stamps."""
    rng = np.random.default_rng(8000 + seed)
    tstop = 3e-4
    freq = rng.integers(2, 5) / tstop
    np_turns = int(rng.integers(100, 500))
    ns_turns = int(rng.integers(50, 300))
    lines = [
        f"* fuzz magnetic seed {seed}",
        f"Vin 1 0 SIN(0 {_fmt(rng.uniform(5, 15))} {_fmt(freq)})",
        f"Rp 1 2 {_fmt(rng.uniform(0.1, 2.0))}",
        f"Lp 2 0 core=C1 turns={np_turns}",
        f"Ls 3 0 core=C1 turns={ns_turns}",
        f"RL 3 0 {_fmt(_lu(rng, 100.0, 5e3))}",
        f".model C1 core(ms={_fmt(_lu(rng, 1e5, 2e6))} "
        f"alpha={_fmt(_lu(rng, 1e-4, 1e-2))} a={_fmt(_lu(rng, 100, 5e3))} "
        f"c={_fmt(rng.uniform(0.05, 0.5))} k={_fmt(_lu(rng, 100, 5e3))} "
        f"area={_fmt(_lu(rng, 1e-5, 1e-3))} len={_fmt(rng.uniform(0.05, 0.5))})",
        f"K1 Lp Ls {_fmt(rng.uniform(0.85, 0.99))}",
        f".tran {_fmt(tstop / 30)} {_fmt(tstop)}",
    ]
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_mixed_tran(seed):
    tran_fuzz_parity(gen_mixed_deck(seed))


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_magnetic_tran(seed):
    tran_fuzz_parity(gen_magnetic_deck(seed))


def test_fuzz_nested_dc():
    """Two-source nested sweep (programmatic only: the reference's .dc card
    parses a single source, parser.go:263-283 — PLAN.md item 9)."""
    rng = np.random.default_rng(42)
    deck = "\n".join([
        "* fuzz nested dc",
        "V1 1 0 DC 0",
        "V2 3 0 DC 0",
        f"R1 1 2 {_fmt(_lu(rng, 500.0, 5e3))}",
        f"R2 3 2 {_fmt(_lu(rng, 500.0, 5e3))}",
        "D1 2 0 DF",
        f".model DF D(Is={_fmt(_lu(rng, 1e-15, 1e-13))} "
        f"N={_fmt(rng.uniform(1.0, 1.8))})",
        ".op",
    ]) + "\n"
    cc = compile_circuit(parse(deck))
    s1 = sweep_values(0.0, 3.0, 0.5)
    s2 = sweep_values(0.0, 2.0, 1.0)
    grid = np.array([(a, b) for a in s1 for b in s2])
    slots = (cc.names["V"].index("V1"), cc.names["V"].index("V2"))
    xs, conv = jax.jit(make_dc(cc, slots))(
        _params(cc), init_state(cc), jnp.asarray(grid))
    assert bool(jnp.all(conv))
    pts_o, xs_o = OracleCircuit(cc).dc(["V1", "V2"], [s1, s2])
    np.testing.assert_allclose(np.asarray(grid), pts_o)
    scale = max(1.0, float(np.max(np.abs(xs_o))))
    np.testing.assert_allclose(np.asarray(xs), xs_o, rtol=RTOL,
                               atol=RTOL * scale)


@pytest.mark.parametrize("seed", [1, 2])
def test_fuzz_batch_consistency(seed):
    """A vmapped batch of perturbed instances must equal per-instance single
    runs bitwise — on a NONLINEAR deck, where per-instance NR iteration
    counts diverge and while_loop batching must mask correctly."""
    from toyspice_tpu.engine.batch import batch_params

    deck = gen_diode_deck(seed)
    cc = compile_circuit(parse(deck))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    tran = make_tran(cc, cfg, store="full")
    state0 = init_state(cc)

    rng = np.random.default_rng(100 + seed)
    base = np.asarray(cc.params["R"]["value"])
    rvals = base[None, :] * np.exp(rng.normal(0, 0.2, size=(3, base.size)))
    bparams, axes = batch_params(cc, {"R": {"value": rvals}})
    out = jax.jit(jax.vmap(tran, in_axes=(axes, None)))(bparams, state0)

    jt = jax.jit(tran)
    for b in range(3):
        params = _params(cc)
        params["R"]["value"] = jnp.asarray(rvals[b])
        single = jt(params, state0)
        assert int(out.accepted[b]) == int(single.accepted), deck
        assert not bool(single.fail)
        n = int(single.out_n)
        np.testing.assert_array_equal(
            np.asarray(out.out_x[b])[:n], np.asarray(single.out_x)[:n])
        np.testing.assert_array_equal(
            np.asarray(out.out_t[b])[:n], np.asarray(single.out_t)[:n])


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_dc_diode(seed):
    deck = gen_dc_deck(seed)
    cc = compile_circuit(parse(deck))
    dp = cc.netlist.dc
    vals = sweep_values(dp.start1, dp.stop1, dp.increment1)
    dc_execute = make_dc(cc, (cc.names["V"].index(dp.source1),))
    xs, conv = jax.jit(dc_execute)(
        _params(cc), init_state(cc), jnp.asarray(np.asarray(vals)))
    assert bool(jnp.all(conv)), deck
    pts_o, xs_o = OracleCircuit(cc).dc([dp.source1], [vals])
    scale = max(1.0, float(np.max(np.abs(xs_o))))
    np.testing.assert_allclose(np.asarray(xs), xs_o, rtol=RTOL,
                               atol=RTOL * scale, err_msg=deck)
