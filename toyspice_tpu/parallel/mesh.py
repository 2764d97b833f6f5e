"""Multi-chip scaling: shard the Monte-Carlo batch axis over a device mesh.

Per-instance circuits are tiny (≲ tens of MNA rows), so parallelism across
chips is pure data parallel over the batch axis — the scaling-book recipe:
pick a mesh, annotate shardings on the batched leaves, let XLA place the
compute; the only collective is a `psum` of accepted-step counters over ICI.
The reference has no distributed machinery at all (SURVEY.md §2.2); this
module is the TPU-native replacement.
"""

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.state import init_state
from ..engine.tran import TranConfig, make_tran


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh: asked for {n_devices} devices but the "
                f"{devs[0].platform} platform exposes only {len(devs)}; "
                "for a virtual CPU mesh set "
                "--xla_force_host_platform_device_count and force "
                'jax.config.update("jax_platforms", "cpu") before backend '
                "init (see tests/conftest.py)"
            )
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, params: Dict, in_axes: Dict, axis: str = "data"):
    """Place batched leaves (in_axes == 0) on the mesh's batch axis and
    replicate the rest."""
    batched = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def place(leaf, ax):
        return jax.device_put(leaf, batched if ax == 0 else replicated)

    return jax.tree_util.tree_map(place, params, in_axes)


def make_mesh_2d(shape, axes=("data", "sweep")) -> Mesh:
    """2-D device mesh: Monte-Carlo batch on one axis, an analysis sweep
    (AC frequencies / DC points) on the other."""
    import numpy as np

    devs = jax.devices()[: shape[0] * shape[1]]
    return Mesh(np.array(devs).reshape(shape), axes)


def run_ac_sharded(cc, mesh: Mesh, params, in_axes, freqs,
                   batch_axis: str = "data", sweep_axis: str = "sweep",
                   opts=None, semantics: str = "compat"):
    """Batched AC over a 2-D mesh: Monte-Carlo instances shard over the
    batch axis, the frequency grid over the sweep axis — the circuit-domain
    analog of combining data parallelism with sequence/sweep parallelism.
    Returns (xr, xi, opr) with xr/xi of shape (B, F, np1) laid out
    P(batch, sweep, None)."""
    from ..engine.ac import make_ac
    from ..engine.options import DEFAULTS
    from ..engine.state import init_state

    ac_execute = make_ac(cc, opts if opts is not None else DEFAULTS,
                         semantics=semantics)
    state0 = init_state(cc)
    sharded_params = shard_batch(mesh, params, in_axes, batch_axis)
    freqs = jax.device_put(freqs, NamedSharding(mesh, P(sweep_axis)))

    # input shardings (batch on params, sweep on freqs) propagate through
    # GSPMD; xr/xi come out laid out P(batch, sweep, None)
    vfn = jax.jit(jax.vmap(lambda p: ac_execute(p, state0, freqs),
                           in_axes=(in_axes,)))
    return vfn(sharded_params)


def _batch_pspec(in_axes, axis):
    return jax.tree_util.tree_map(
        lambda ax: P(axis) if ax == 0 else P(), in_axes,
        is_leaf=lambda x: x is None or x == 0)


def run_op_sharded(cc, mesh: Mesh, params, in_axes, axis: str = "data",
                   opts=None, semantics: str = "compat"):
    """Batched operating point sharded over the mesh's batch axis.  Each
    instance runs the full NR + rescue ladders on its own shard; there is no
    cross-instance communication (instances are embarrassingly parallel).

    Dispatches through ``select_op_engine`` like the single-chip batch API:
    an eligible nonlinear compat circuit on the Pallas backend runs the
    fused OP/Newton kernel per shard under ``shard_map`` (a Pallas kernel
    cannot be auto-partitioned by GSPMD); the general engine shards via
    vmap + input shardings.  The chosen engine is recorded on
    ``run_op_sharded.last_engine``/``.last_reason``."""
    from ..engine.batch import select_op_engine
    from ..engine.op import make_op
    from ..engine.options import DEFAULTS

    opts = opts if opts is not None else DEFAULTS
    engine, reason = select_op_engine(cc, semantics, opts)
    state0 = init_state(cc)
    sharded_params = shard_batch(mesh, params, in_axes, axis)
    if engine == "fused":
        from ..ops.pallas_op import make_op_fused

        opf = make_op_fused(cc, opts, semantics=semantics)
        fn = jax.jit(jax.shard_map(
            lambda p: opf(p, state0), mesh=mesh,
            in_specs=(_batch_pspec(in_axes, axis),), out_specs=P(axis),
            check_vma=False))
    else:
        op_execute, _ = make_op(cc, opts, semantics=semantics)
        fn = jax.jit(jax.vmap(lambda p: op_execute(p, state0),
                              in_axes=(in_axes,)))
    out = fn(sharded_params)
    run_op_sharded.last_engine = engine
    run_op_sharded.last_reason = reason
    return out


def run_dc_sharded(cc, src_slots, mesh: Mesh, params, in_axes, points,
                   axis: str = "data", opts=None, semantics: str = "compat"):
    """Batched DC sweep sharded over the mesh's batch axis.  The sweep-point
    dimension stays sequential per instance (each point warm-starts Newton
    from the previous solution — dc.py's scan — so, unlike AC frequencies,
    points cannot shard onto a second mesh axis without changing
    convergence behavior).  Returns (xs, conv) laid out P(batch, None,
    None).  Engine dispatch and recording as in ``run_op_sharded``."""
    from ..engine.batch import select_op_engine
    from ..engine.dc import make_dc
    from ..engine.options import DEFAULTS

    opts = opts if opts is not None else DEFAULTS
    engine, reason = select_op_engine(cc, semantics, opts)
    state0 = init_state(cc)
    sharded_params = shard_batch(mesh, params, in_axes, axis)
    points = jnp.asarray(points)
    if engine == "fused":
        from ..ops.pallas_op import make_dc_fused

        dcf = make_dc_fused(cc, tuple(src_slots), opts, semantics=semantics)
        fn = jax.jit(jax.shard_map(
            lambda p: dcf(p, state0, points), mesh=mesh,
            in_specs=(_batch_pspec(in_axes, axis),), out_specs=P(axis),
            check_vma=False))
        out = fn(sharded_params)
    else:
        pts_r = jax.device_put(points, NamedSharding(mesh, P()))
        dc_execute = make_dc(cc, src_slots, opts, semantics=semantics)
        fn = jax.jit(jax.vmap(lambda p: dc_execute(p, state0, pts_r),
                              in_axes=(in_axes,)))
        out = fn(sharded_params)
    run_dc_sharded.last_engine = engine
    run_dc_sharded.last_reason = reason
    return out


def run_transient_sharded(cc, cfg: TranConfig, mesh: Mesh, params, in_axes,
                          semantics: str = "compat", axis: str = "data",
                          store: str = "none", opts=None):
    """One compiled, mesh-sharded batched transient.  Returns the batched
    TranOutput plus the ICI-psum'd aggregate accepted-step count.

    Dispatches through ``select_tran_engine`` exactly like the single-chip
    batch API, so an eligible compat/BE run gets the fused Pallas kernel on
    every shard (the per-shard engine is identical; only the lane slice
    differs).  ``shard_map`` gives each device its own slice of the batch —
    the per-shard while_loop terminates on LOCAL lane completion, so no
    cross-chip sync happens per attempt; the only collective is the final
    accepted-step ``psum`` over ICI."""
    from ..engine.batch import select_tran_engine
    from ..engine.options import DEFAULTS

    opts = opts if opts is not None else DEFAULTS
    engine, reason, fn = select_tran_engine(
        cc, cfg, in_axes, semantics=semantics, store=store, opts=opts,
        params=params)
    state0 = init_state(cc)
    sharded_params = shard_batch(mesh, params, in_axes, axis)

    pspec = _batch_pspec(in_axes, axis)
    sspec = jax.tree_util.tree_map(lambda _: P(), state0)

    def step(p, s):
        out = fn(p, s)
        return out, jax.lax.psum(jnp.sum(out.accepted), axis)

    sfn = jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(pspec, sspec), out_specs=(P(axis), P()),
        check_vma=False))
    out, total = sfn(sharded_params, state0)
    run_transient_sharded.last_engine = engine
    run_transient_sharded.last_reason = reason
    return out, total
