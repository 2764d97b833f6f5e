"""Monte-Carlo batch API across all four analyses (the reference is strictly
single-instance; the batch axis is the TPU build's headline capability,
SURVEY.md §2.2).  Batched runs must match per-instance runs."""

import numpy as np
import jax.numpy as jnp

import toyspice_tpu as ts
from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.batch import (
    batch_params,
    run_ac_batch,
    run_dc_batch,
    run_op_batch,
)

DIVIDER = """divider
.op
Vin in 0 DC 5
R1 in mid 1k
R2 mid 0 1k
"""

RC_AC = """rc ac
.ac DEC 5 10 100k
Vin in 0 AC 1 0
R1 in out 1k
C1 out 0 1u
"""

DIODE_DC = """diode sweep
.dc Vb 0.3 0.7 0.1
Vb a 0 DC 0.3
Rs a d 100
D1 d 0 DM
.model DM D (Is=1e-14 N=1.0)
"""


def test_op_batch_scales_with_parameters():
    cc = compile_circuit(parse(DIVIDER))
    B = 8
    r2 = np.linspace(500.0, 4000.0, B)
    values = np.stack(
        [np.full(B, 1000.0), r2], axis=1
    )  # (B, 2) in R-table order R1, R2
    assert cc.names["R"] == ["R1", "R2"]
    params, axes = batch_params(cc, {"R": {"value": values}})
    out = run_op_batch(cc, params, axes)
    assert bool(np.all(np.asarray(out.converged)))
    vmid = np.asarray(out.x)[:, cc.node_map["mid"]]
    np.testing.assert_allclose(vmid, 5.0 * r2 / (1000.0 + r2), rtol=1e-12)


def test_ac_batch_matches_per_instance():
    cc = compile_circuit(parse(RC_AC))
    B = 4
    cvals = np.array([[0.5e-6], [1e-6], [2e-6], [4e-6]])
    params, axes = batch_params(cc, {"C": {"value": cvals}})
    from toyspice_tpu.engine.ac import frequency_points

    freqs = jnp.asarray(frequency_points("DEC", 10.0, 100e3, 5))
    xr, xi, opr = run_ac_batch(cc, params, axes, freqs)
    mag = np.hypot(np.asarray(xr), np.asarray(xi))[:, :, cc.node_map["out"]]
    w = 2 * np.pi * np.asarray(freqs)
    for b in range(B):
        expect = 1.0 / np.sqrt(1.0 + (w * 1e3 * cvals[b, 0]) ** 2)
        np.testing.assert_allclose(mag[b], expect, rtol=1e-9)


def test_dc_batch_matches_single_runs():
    cc = compile_circuit(parse(DIODE_DC))
    B = 3
    is_vals = np.array([[1e-15], [1e-14], [1e-13]])
    params, axes = batch_params(cc, {"D": {"is_": is_vals}})
    pts = jnp.asarray(np.arange(0.3, 0.7001, 0.1))
    xs, conv = run_dc_batch(cc, (0,), params, axes, pts)
    assert bool(np.all(np.asarray(conv)))
    vd = np.asarray(xs)[:, :, cc.node_map["d"]]
    # larger Is -> lower forward drop at the same drive, monotonic across batch
    assert np.all(vd[0] > vd[1]) and np.all(vd[1] > vd[2])
