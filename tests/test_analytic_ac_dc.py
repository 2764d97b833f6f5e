"""Analytic checks for AC and DC sweep, plus a smoke run of every deck in
circuits/ (the project's own example collection)."""

import glob
import math
import os

import numpy as np
import pytest

import toyspice_tpu as ts

CIRCUITS_DIR = os.path.join(os.path.dirname(__file__), "..", "circuits")


def test_ac_rc_lowpass_matches_transfer_function():
    # |H(jw)| = 1/sqrt(1+(wRC)^2), phase = -atan(wRC).  R=1k, C=1u: fc=159Hz.
    deck = """RC low-pass AC
.ac DEC 13 1 1meg
Vin in 0 AC 1 0
R1 in out 1k
C1 out 0 1u
"""
    r = ts.run_ac(deck)
    f = np.asarray(r["FREQ"])
    mag = np.asarray(r["V(out)_MAG"])
    ph = np.asarray(r["V(out)_PHASE"])
    wrc = 2 * math.pi * f * 1e3 * 1e-6
    np.testing.assert_allclose(mag, 1.0 / np.sqrt(1.0 + wrc**2), rtol=1e-9)
    np.testing.assert_allclose(ph, -np.degrees(np.arctan(wrc)), rtol=1e-9)


def test_ac_rlc_inductor_branch_stamp():
    # Series RLC: |I| peaks at resonance f0 = 1/(2pi*sqrt(LC)) with |I|=V/R.
    # Exercises the corrected branch-row L stamp (the reference's plain-L AC
    # stamp is singular; PLAN.md 13).
    deck = """series RLC AC
.ac LIN 41 1k 10k
Vs in 0 AC 1 0
R1 in a 50
L1 a b 1m
C1 b 0 1u
"""
    r = ts.run_ac(deck)
    f = np.asarray(r["FREQ"])
    i_mag = np.asarray(r["I(Vs)_MAG"])
    f0 = 1.0 / (2 * math.pi * math.sqrt(1e-3 * 1e-6))  # ~5033 Hz
    # peak location on the grid
    assert abs(f[np.argmax(i_mag)] - f0) < 260  # grid spacing 225 Hz
    # analytic magnitude at every grid point
    w = 2 * math.pi * f
    z = np.sqrt(50.0**2 + (w * 1e-3 - 1.0 / (w * 1e-6)) ** 2)
    np.testing.assert_allclose(i_mag, 1.0 / z, rtol=1e-9)


def test_dc_sweep_linear_is_proportional():
    deck = """divider sweep
.dc Vin 0 10 0.5
Vin in 0 DC 0
R1 in mid 3k
R2 mid 0 1k
"""
    r = ts.run_dc(deck)
    sweep = np.asarray(r["SWEEP1"])
    vmid = np.asarray(r["V(mid)"])
    np.testing.assert_allclose(vmid, sweep * 0.25, atol=1e-12)


def test_dc_sweep_diode_shockley():
    # Through a tiny series resistor the diode current follows Shockley
    # closely at low bias; check slope on the log-I curve ~ 1/(N*Vt).
    deck = """diode iv
.dc Vb 0.45 0.62 0.01
Vb a 0 DC 0.45
Rs a d 1
D1 d 0 DM
.model DM D (Is=1e-14 N=1.0)
"""
    r = ts.run_dc(deck)
    v = np.asarray(r["SWEEP1"])
    # DC sweep reports I(name) = -x[branch] (circuit.go:253); for this
    # orientation that is already the positive current through the diode
    i = np.asarray(r["I(Vb)"])
    assert np.all(i > 0)
    # local log-slope between consecutive points ≈ q/(NkT) = 1/Vt
    slope = np.diff(np.log(i)) / np.diff(v)
    vt = 1.3806226e-23 * 300.15 / 1.6021918e-19
    np.testing.assert_allclose(slope, 1.0 / vt, rtol=0.02)


@pytest.mark.parametrize(
    "deck", sorted(glob.glob(os.path.join(CIRCUITS_DIR, "*.cir")))
)
def test_example_decks_run(deck):
    r = ts.run_analysis(open(deck).read())
    assert len(r) > 0
    for key, series in r.items():
        assert np.all(np.isfinite(np.asarray(series))), key
