"""Mesh-sharded analyses vs their unsharded batched runs.

All four analyses (OP, transient — covered in test_batch.py —, AC on the
2-D batch x sweep mesh, DC sweep) must produce the same results whether the
Monte-Carlo batch runs on one device or sharded over the virtual 8-CPU mesh
(conftest forces --xla_force_host_platform_device_count=8).  Instances are
embarrassingly parallel, so sharding must not change any per-instance
arithmetic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine.ac import frequency_points
from toyspice_tpu.engine.batch import (batch_params, run_ac_batch,
                                       run_dc_batch, run_op_batch)
from toyspice_tpu.parallel.mesh import (make_mesh, make_mesh_2d,
                                        run_ac_sharded, run_dc_sharded,
                                        run_op_sharded)
from tests.conftest import read_fixture

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 2,
    reason="needs the virtual multi-device CPU platform (conftest)")

RC_AC = """* rc ac
.ac DEC 4 10 100k
Vin 1 0 AC 1 0
R1 1 2 1k
C1 2 0 1u
"""


def _rbatch(cc, b, seed=3):
    rng = np.random.default_rng(seed)
    rv = (np.asarray(cc.params["R"]["value"])[None, :]
          * np.exp(rng.normal(0, 0.05, size=(b, 1))))
    return batch_params(cc, {"R": {"value": rv}})


@needs_mesh
def test_sharded_op_matches_unsharded():
    cc = compile_circuit(parse(read_fixture("diode1.cir")))
    b = len(jax.devices()) * 2
    params, axes = _rbatch(cc, b)

    mesh = make_mesh()
    opr_s = run_op_sharded(cc, mesh, params, axes)
    opr_u = run_op_batch(cc, params, axes)

    np.testing.assert_array_equal(np.asarray(opr_s.converged),
                                  np.asarray(opr_u.converged))
    assert bool(np.all(np.asarray(opr_u.converged)))
    np.testing.assert_allclose(np.asarray(opr_s.x), np.asarray(opr_u.x),
                               rtol=1e-12, atol=1e-15)


@needs_mesh
def test_sharded_ac_2d_mesh_matches_unsharded():
    n_dev = len(jax.devices())
    if n_dev % 2:
        pytest.skip("needs an even device count for the 2-D mesh")
    cc = compile_circuit(parse(RC_AC))
    b = n_dev  # (n_dev//2) x 2 mesh, batch axis length n_dev
    params, axes = _rbatch(cc, b)
    freqs = jnp.asarray(frequency_points("DEC", 10.0, 100e3, 16))

    mesh2 = make_mesh_2d((n_dev // 2, 2))
    xr_s, xi_s, opr_s = run_ac_sharded(cc, mesh2, params, axes, freqs)
    xr_u, xi_u, opr_u = run_ac_batch(cc, params, axes, freqs)

    np.testing.assert_array_equal(np.asarray(opr_s.converged),
                                  np.asarray(opr_u.converged))
    np.testing.assert_allclose(np.asarray(xr_s), np.asarray(xr_u),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(xi_s), np.asarray(xi_u),
                               rtol=1e-12, atol=1e-15)


@needs_mesh
def test_sharded_dc_matches_unsharded():
    cc = compile_circuit(parse(read_fixture("diode3.cir")))
    dp = cc.netlist.dc
    slot = cc.names["V"].index(dp.source1)
    from toyspice_tpu.engine.dc import sweep_values

    points = jnp.asarray(sweep_values(dp.start1, dp.stop1, dp.increment1))
    b = len(jax.devices()) * 2
    params, axes = _rbatch(cc, b)

    mesh = make_mesh()
    xs_s, conv_s = run_dc_sharded(cc, (slot,), mesh, params, axes, points)
    xs_u, conv_u = run_dc_batch(cc, (slot,), params, axes, points)

    np.testing.assert_array_equal(np.asarray(conv_s), np.asarray(conv_u))
    assert bool(np.all(np.asarray(conv_u)))
    np.testing.assert_allclose(np.asarray(xs_s), np.asarray(xs_u),
                               rtol=1e-12, atol=1e-15)
