"""Monte-Carlo batch axis: vmapped runs must reproduce single runs exactly,
and the mesh-sharded path must agree with the unsharded one."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toyspice_tpu.compiler import compile_circuit
from toyspice_tpu.netlist.parser import parse
from toyspice_tpu.engine import _params
from toyspice_tpu.engine.batch import batch_params
from toyspice_tpu.engine.state import init_state
from toyspice_tpu.engine.tran import build_config, make_tran
from tests.conftest import read_fixture

RC = """* RC batch test
.tran 0.02m 1m
Vin 1 0 SIN(0 5 1k)
R1 1 2 100
C1 2 0 1u
"""


def _build():
    cc = compile_circuit(parse(RC))
    tp = cc.netlist.tran
    cfg = build_config(tp.tstart, tp.tstop, tp.tstep, tp.tmax, tp.uic)
    return cc, cfg


def test_batched_identical_params_match_single():
    cc, cfg = _build()
    tran = make_tran(cc, cfg, store="full")
    params = _params(cc)
    state0 = init_state(cc)
    single = jax.jit(tran)(params, state0)

    B = 4
    overrides = {
        "R": {"value": np.tile(np.asarray(cc.params["R"]["value"]), (B, 1))}
    }
    bparams, axes = batch_params(cc, overrides)
    out = jax.jit(jax.vmap(tran, in_axes=(axes, None)))(bparams, state0)

    assert np.all(np.asarray(out.accepted) == int(single.accepted))
    n = int(single.out_n)
    for b in range(B):
        # identical parameters -> bitwise identical trajectories
        np.testing.assert_array_equal(
            np.asarray(out.out_x[b])[:n], np.asarray(single.out_x)[:n]
        )
        np.testing.assert_array_equal(
            np.asarray(out.out_t[b])[:n], np.asarray(single.out_t)[:n]
        )


def test_batched_perturbed_diverge_and_each_matches_its_single_run():
    cc, cfg = _build()
    tran = make_tran(cc, cfg, store="full")
    state0 = init_state(cc)

    rvals = np.array([[100.0], [150.0], [80.0]])
    bparams, axes = batch_params(cc, {"R": {"value": rvals}})
    out = jax.jit(jax.vmap(tran, in_axes=(axes, None)))(bparams, state0)

    # per-instance single runs
    jt = jax.jit(tran)
    for b in range(3):
        params = _params(cc)
        params["R"]["value"] = jnp.asarray(rvals[b])
        single = jt(params, state0)
        assert int(out.accepted[b]) == int(single.accepted)
        n = int(single.out_n)
        np.testing.assert_array_equal(
            np.asarray(out.out_x[b])[:n], np.asarray(single.out_x)[:n]
        )

    # different parameters genuinely diverge
    assert not np.array_equal(np.asarray(out.out_x[0]), np.asarray(out.out_x[1]))


def test_sharded_batch_matches_unsharded():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU platform")
    from toyspice_tpu.parallel.mesh import make_mesh, run_transient_sharded

    cc, cfg = _build()
    n_dev = len(jax.devices())
    B = n_dev * 2
    rng = np.random.default_rng(7)
    rvals = 100.0 * np.exp(rng.normal(0, 0.1, size=(B, 1)))
    bparams, axes = batch_params(cc, {"R": {"value": rvals}})

    mesh = make_mesh()
    out, total = run_transient_sharded(cc, cfg, mesh, bparams, axes)
    assert int(total) == int(np.sum(np.asarray(out.accepted)))
    assert not bool(np.any(np.asarray(out.fail)))

    # unsharded reference
    tran = make_tran(cc, cfg, store="none")
    out2 = jax.jit(jax.vmap(tran, in_axes=(axes, None)))(bparams, init_state(cc))
    np.testing.assert_array_equal(
        np.asarray(out.accepted), np.asarray(out2.accepted)
    )
