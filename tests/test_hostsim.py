"""Host simulation backend: sequential engine + native C++ solver parity."""

import numpy as np
import pytest

import toyspice_tpu as ts
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu import hostsim
from toyspice_tpu import native

DIODE_OP = """diode bias
.op
V1 1 0 DC 5
R1 1 2 1k
D1 2 0 DMOD
.model DMOD D (IS=1e-14 N=1.0)
"""

RC = """rc
.tran 0.05m 1m
V1 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""


def teardown_module():
    hostsim.set_solver("numpy")


def test_host_matches_xla_op():
    cc = compile_circuit(parse(DIODE_OP))
    hostsim.set_solver("numpy")
    r_host = hostsim.run_host_analysis(cc)
    r_xla = ts.run_op(cc)
    np.testing.assert_allclose(r_host["V(2)"], r_xla["V(2)"], rtol=1e-9)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_solver_matches_numpy():
    cc = compile_circuit(parse(DIODE_OP))
    hostsim.set_solver("numpy")
    x_np = hostsim.run_host_analysis(cc)["V(2)"][0]
    hostsim.set_solver("native")
    x_nat = hostsim.run_host_analysis(cc)["V(2)"][0]
    hostsim.set_solver("numpy")
    assert abs(x_np - x_nat) < 1e-9


def test_host_transient_matches_xla():
    cc = compile_circuit(parse(RC))
    hostsim.set_solver("numpy")
    r_host = hostsim.run_host_analysis(cc)
    r_xla = ts.run_transient(RC)
    # identical algorithm, identical step decisions -> same grid & waveforms
    assert len(r_host["TIME"]) == len(r_xla["TIME"])
    np.testing.assert_allclose(r_host["V(2)"], r_xla["V(2)"], atol=1e-9)


def test_cli_host_engine(capsys):
    import tempfile, os
    from toyspice_tpu.cli import main

    with tempfile.NamedTemporaryFile("w", suffix=".cir", delete=False) as f:
        f.write(DIODE_OP)
        path = f.name
    try:
        assert main([path, "--engine", "host"]) == 0
        out = capsys.readouterr().out
        assert "V(2) = 692.868 mV" in out
    finally:
        os.unlink(path)
