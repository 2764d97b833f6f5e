"""Operating-point smoke tests against analytically solvable circuits."""

import numpy as np
import pytest

from toyspice_tpu import run_op
from tests.conftest import read_fixture

DIVIDER = """* divider
Vsrc 1 0 DC 10
R1 1 2 1k
R2 2 0 1k
.op
"""


def test_divider():
    r = run_op(DIVIDER)
    assert r["V(1)"][0] == pytest.approx(10.0, abs=1e-9)
    assert r["V(2)"][0] == pytest.approx(5.0, abs=1e-9)
    # OP stores +x[branch] (op.go:244-246); the branch unknown is -I here,
    # so for a 5 mA source current the stored value is -5 mA.
    assert r["I(Vsrc)"][0] == pytest.approx(-5e-3, abs=1e-12)


def test_idc():
    r = run_op(read_fixture("idc.cir"))
    # 1 mA into 1k -> 1 V
    assert r["V(n1)"][0] == pytest.approx(1.0, abs=1e-9)


def test_diode1_op():
    """vin=5, R=1k, diode default Is=1e-14 N=1: solve independently."""
    r = run_op(read_fixture("diode1.cir"))
    # independent scalar Newton on f(v) = (5-v)/1k - Is(e^{v/vt}-1)
    vt = 1.3806226e-23 * 300.15 / 1.6021918e-19
    is_ = 1e-14
    v = 0.6
    for _ in range(200):
        arg = min(v / vt, 40.0)
        f = (5.0 - v) / 1e3 - is_ * (np.exp(arg) - 1.0)
        df = -1.0 / 1e3 - is_ * np.exp(arg) / vt
        v -= f / df
    # gmin (1e-12) in parallel shifts the answer by ~nV only
    assert r["V(2)"][0] == pytest.approx(v, abs=1e-6)
    assert r["V(1)"][0] == pytest.approx(5.0, abs=1e-9)


def test_diode5_op_uses_default_is():
    """diode5.cir's model Is is swallowed by the '(is' parser quirk, so the
    junction runs at the default Is=1e-14 with N=1.906."""
    r = run_op(read_fixture("diode5.cir"))
    vt = 1.3806226e-23 * 300.15 / 1.6021918e-19
    is_, nf = 1e-14, 1.906
    v = 0.8
    for _ in range(200):
        arg = min(v / (nf * vt), 40.0)
        f = (5.0 - v) / 1e3 - is_ * (np.exp(arg) - 1.0)
        df = -1.0 / 1e3 - is_ * np.exp(arg) / (nf * vt)
        v -= f / df
    assert r["V(n1)"][0] == pytest.approx(v, abs=1e-6)
