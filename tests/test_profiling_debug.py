"""Profiling hooks and the verbose debug printers."""

import io

import numpy as np

import toyspice_tpu as ts
from toyspice_tpu import debug
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.utils import profiling

RR = """* divider
.op
Vin 1 0 DC 5
R1 1 2 1k
R2 2 0 1k
"""


def test_trace_report():
    profiling.report(reset=True)
    with profiling.trace("op"):
        ts.run_op(RR)
    with profiling.trace("op"):
        ts.run_op(RR)
    rep = profiling.report(reset=True)
    assert rep["op"]["calls"] == 2
    assert rep["op"]["total_s"] > 0


def test_tran_stats():
    cc = compile_circuit(parse("""* rc
.tran 0.05m 1m
V1 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""))
    import jax
    from toyspice_tpu.engine.state import init_state
    from toyspice_tpu.engine.tran import build_config, make_tran
    import jax.numpy as jnp

    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    tran = jax.jit(make_tran(cc, cfg, store="none"))
    params = {k: {kk: jnp.asarray(vv) for kk, vv in t.items()}
              for k, t in cc.params.items()}
    out = tran(params, init_state(cc))
    stats = profiling.tran_stats(out, wall_s=1.0)
    assert stats["accepted_steps"] >= 29
    assert 0 < stats["accept_ratio"] <= 1.0
    assert stats["nr_per_attempt"] >= 1.0
    assert stats["failed_instances"] == 0


def test_print_system_rr():
    cc = compile_circuit(parse(RR))
    buf = io.StringIO()
    debug.print_parse_report(cc, out=buf)
    debug.print_element_details(cc, out=buf)
    debug.print_system(cc, out=buf)
    text = buf.getvalue()
    # divider: g=0.001 stamps, branch row with RHS 5, density stats
    assert "Analysis type: OP" in text
    assert "Conductance: 0.001 Mho" in text
    assert "Circuit Equations (3x3):" in text
    assert "x3 = 5" in text
    assert "Density = " in text
    # expected stamp table of the V source branch
    assert "(3,1): +1" in text


def test_cli_verbose(capsys):
    from toyspice_tpu.cli import main
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".cir", delete=False) as f:
        f.write(RR)
        path = f.name
    try:
        assert main([path, "--verbose"]) == 0
        out = capsys.readouterr().out
        assert "=== Circuit Element Details ===" in out
        assert "MATRIX SUMMARY" in out
        assert "V(2) = 2.500 V" in out
    finally:
        os.unlink(path)
