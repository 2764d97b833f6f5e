"""Formatter parity (formatter.go:8-59 — part of the algorithm: formatted
time collisions deduplicate transient rows) and parser/CLI error paths."""

import pytest

from toyspice_tpu.netlist.parser import NetlistError, parse
from toyspice_tpu.utils.formatter import (
    format_frequency,
    format_magnitude,
    format_phase,
    format_value_factor,
)


@pytest.mark.parametrize("value,unit,expect", [
    (2.5, "V", "2.500 V"),
    (-12.0, "V", "-12.000 V"),
    (0.0025, "A", "2.500 mA"),
    (-0.0025, "A", "-2.500 mA"),
    (4.7e-6, "F", "4.700 uF"),
    (3.3e-9, "s", "3.300 ns"),
    (8e-12, "F", "8.000 pF"),
    (5e-14, "A", "5.000e-14 A"),  # below pico: bare %.3e
    (0.0, "V", "0.000e+00 V"),    # abs(0) < 1e-12 -> default branch
    (1.0, "V", "1.000 V"),        # boundary: >= 1
    (1e-3, "V", "1.000 mV"),      # boundary: >= 1e-3
])
def test_format_value_factor(value, unit, expect):
    assert format_value_factor(value, unit) == expect


def test_format_frequency():
    assert format_frequency(50.0) == " 50.000 Hz "
    assert format_frequency(1e3) == "  1.000 kHz"
    assert format_frequency(2.5e6) == "  2.500 MHz"


def test_format_magnitude_phase():
    assert format_magnitude(1234.5) == "1.23e+03"
    assert format_magnitude(0.5).strip() == "0.5"
    assert format_magnitude(1e-5) == "1.00e-05"
    assert format_phase(-153.94) == "-153.9"


@pytest.mark.parametrize("deck,match", [
    ("t\n.tran 1u\nR1 1 0 1k\n", "tran parameters"),
    ("t\n.ac DEC 10\nR1 1 0 1k\n", "AC parameters"),
    ("t\n.ac WAT 10 1 1k\nR1 1 0 1k\n", "sweep type"),
    ("t\n.dc V1 0\nV1 1 0 DC 1\n", "DC sweep parameters"),
    ("t\n.op\nR1 1 0\n", "element format"),  # reference panics here
    ("t\n.op\nK1 L1 0.5\n", "mutual coupling"),
    ("t\n.op\n.model M1 XTYPE (a=1)\n", "model type"),
    ("t\n.op\nR1 1 0 abc\n", "value format"),
])
def test_parser_errors(deck, match):
    # NetlistError subclasses ValueError; parse_value raises plain ValueError
    with pytest.raises(ValueError, match=match):
        parse(deck)


def test_cli_reports_parse_error(capsys):
    import tempfile, os
    from toyspice_tpu.cli import main

    with tempfile.NamedTemporaryFile("w", suffix=".cir", delete=False) as f:
        f.write("bad deck\n.op\nR1 1 0 notanumber\n")
        path = f.name
    try:
        assert main([path]) == 1
        err = capsys.readouterr().err
        assert "Analysis failed" in err
    finally:
        os.unlink(path)
