import os

import pytest

from toyspice_tpu.netlist.data import AnalysisType
from toyspice_tpu.netlist.parser import parse
from tests.conftest import REFERENCE_CIRCUITS, read_fixture

ALL_FIXTURES = sorted(
    f for f in os.listdir(REFERENCE_CIRCUITS) if f.endswith(".cir")
)


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_all_fixtures_parse(name):
    data = parse(read_fixture(name))
    assert data.elements, name


def test_rlc():
    d = parse(read_fixture("rlc.cir"))
    assert d.title == "RLC Test"
    assert d.analysis == AnalysisType.TRAN
    assert d.tran.tstep == pytest.approx(0.01e-3)
    assert d.tran.tstop == pytest.approx(2e-3)
    assert d.tran.tmax == pytest.approx(0.01e-3)  # defaults to tstep
    types = [e.type for e in d.elements]
    assert types == ["V", "R", "L", "C"]
    vin = d.elements[0]
    assert vin.params["type"] == "sin"
    assert vin.params["sin"] == "0 5 1k"


def test_trailing_comment_and_semicolon():
    d = parse(read_fixture("isin.cir"))
    src = d.elements[0]
    assert src.params["type"] == "sin"
    assert src.params["sin"] == "0 2m 1k 0"


def test_continuation_and_model_paren_quirk():
    # diode5.cir: ".model D1N4148 D (Is=..." — space before '(' makes the
    # first pair parse under key "(is", so the default is=1e-14 survives.
    d = parse(read_fixture("diode5.cir"))
    m = d.models["D1N4148"]
    assert m.type == "D"
    assert m.params["is"] == 1e-14  # quirk: user Is ignored
    assert m.params["(is"] == pytest.approx(4.352e-9)
    assert m.params["n"] == pytest.approx(1.906)  # continuation line merged in
    assert m.params["m"] == pytest.approx(0.3333)
    assert m.params["vj"] == pytest.approx(0.869)


def test_bjt_model_defaults_and_parens():
    d = parse(read_fixture("bjt1.cir"))
    m = d.models["Q2N3904"]
    assert m.type == "NPN"
    assert m.params["is"] == pytest.approx(7.734e-15)
    assert m.params["vaf"] == pytest.approx(74.03)
    assert m.params["cje"] == pytest.approx(4.493e-12)
    assert m.params["tf"] == pytest.approx(0.1e-9)
    # defaults present
    assert m.params["br"] == 1.0
    assert "type" not in m.params  # NPN has no type key


def test_mosfet_element_params():
    d = parse(read_fixture("mosfet1.cir"))
    m1 = next(e for e in d.elements if e.type == "M")
    assert m1.nodes == ["3", "2", "0", "0"]
    assert m1.params["model"] == "NMOS_Test"
    assert m1.params["l"] == "2u"
    assert m1.params["w"] == "20u"
    model = d.models["NMOS_Test"]
    assert model.params["level"] == 1
    assert model.params["vto"] == pytest.approx(0.7)
    assert model.params["kp"] == pytest.approx(20e-6)
    assert model.params["lambda"] == pytest.approx(0.01)


def test_core_model_continuation():
    d = parse(read_fixture("transformer3.cir"))
    m = d.models["CORE1"]
    assert m.type == "CORE"
    assert m.params["ms"] == pytest.approx(1.6e6)
    assert m.params["len"] == pytest.approx(0.1)
    lp = next(e for e in d.elements if e.name == "Lp")
    assert lp.params["core"] == "CORE1"
    assert lp.params["turns"] == "300"
    k = next(e for e in d.elements if e.type == "K")
    assert k.params["ind1"] == "Lp"
    assert k.params["ind2"] == "Ls"
    assert k.value == pytest.approx(0.95)


def test_pulse_and_pwl_sources():
    d = parse(read_fixture("vpulse.cir"))
    v = d.elements[0]
    assert v.params["type"] == "pulse"
    assert v.params["pulse"] == "0 5 2ms 0.5ms 0.5ms 5ms 10ms"

    d = parse(read_fixture("vpwl.cir"))
    v = d.elements[0]
    assert v.params["type"] == "pwl"
    assert v.params["pwl"] == "0 0 2ms 0 2.5ms 3.3 5ms 3.3 5.5ms 0 10ms 0"


def test_dc_sweep_card():
    d = parse(read_fixture("diode3.cir"))
    assert d.analysis == AnalysisType.DC
    assert d.dc.source1 == "Vin"
    assert d.dc.start1 == pytest.approx(-1.0)
    assert d.dc.stop1 == pytest.approx(3.0)
    assert d.dc.increment1 == pytest.approx(0.1)
    assert d.dc.source2 == ""


def test_ac_card():
    d = parse(read_fixture("bjt3.cir"))
    assert d.analysis == AnalysisType.AC
    assert d.ac.sweep == "DEC"
    assert d.ac.points == 10
    assert d.ac.fstart == pytest.approx(10.0)
    assert d.ac.fstop == pytest.approx(1e6)
    vac = next(e for e in d.elements if e.name == "VAC")
    assert vac.params["type"] == "ac"
    assert vac.value == pytest.approx(0.01)
    assert vac.params["phase"] == "0"


def test_tran_uic_and_extras():
    d = parse("t\n.tran 1u 100u 10u 2u uic\nR1 1 0 1k\nV1 1 0 DC 1\n")
    assert d.tran.tstart == pytest.approx(10e-6)
    assert d.tran.tmax == pytest.approx(2e-6)
    assert d.tran.uic is True
