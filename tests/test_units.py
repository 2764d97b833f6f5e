import pytest

from toyspice_tpu.utils.units import parse_value
from toyspice_tpu.utils.formatter import format_value_factor


@pytest.mark.parametrize(
    "text,expected",
    [
        ("1k", 1e3),
        ("1K", 1e3),
        ("2.5ms", 2.5e-3),
        ("0.1ms", 1e-4),
        ("20ns", 2e-8),
        ("1meg", 1e6),
        ("1M", 1.0),  # quirk: 'M' matches the regex but is not in the unit map
        ("3.3", 3.3),
        ("-1", -1.0),
        ("+2u", 2e-6),
        ("1e-3", 1e-3),
        ("4.493p", 4.493e-12),
        ("7.734e-15", 7.734e-15),
        ("100u", 1e-4),
        ("1f", 1e-15),
        ("1T", 1e12),
        ("1G", 1e9),
        ("5m", 5e-3),
        ("10us", 1e-5),
        ("1s", 1.0),
    ],
)
def test_parse_value(text, expected):
    assert parse_value(text) == pytest.approx(expected, rel=1e-15)


@pytest.mark.parametrize("bad", ["", "abc", "1x", "--3", "k1"])
def test_parse_value_rejects(bad):
    with pytest.raises(ValueError):
        parse_value(bad)


def test_format_value_factor():
    assert format_value_factor(2.5, "V") == "2.500 V"
    assert format_value_factor(0.0025, "A") == "2.500 mA"
    assert format_value_factor(2.5e-6, "s") == "2.500 us"
    assert format_value_factor(2.5e-9, "s") == "2.500 ns"
    assert format_value_factor(2.5e-12, "F") == "2.500 pF"
    assert format_value_factor(-0.005, "A") == "-5.000 mA"
