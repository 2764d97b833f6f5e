"""Monte-Carlo / corner batching: vmap a whole analysis over a parameter batch.

This is the TPU-native capability the single-threaded Go reference has no
analog for (SURVEY.md §2.2): thousands of parameter instances of one circuit
solved in lockstep.  Per-instance adaptive timestepping, Newton iteration
counts and convergence rescue all come from JAX's ``while_loop`` batching
(masked carries) — no hand-written divergence handling.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .tran import TranConfig, make_tran


def batch_params(cc, overrides: Dict[str, Dict[str, jnp.ndarray]]) -> Tuple[dict, dict]:
    """Build (params, in_axes) for vmap from per-kind overrides with a leading
    batch axis, e.g. {"R": {"value": (B, nR) array}}.  Non-overridden leaves
    are shared (axis None)."""
    params = {
        kind: {k: jnp.asarray(v) for k, v in tbl.items()}
        for kind, tbl in cc.params.items()
    }
    axes = {kind: {k: None for k in tbl} for kind, tbl in cc.params.items()}
    for kind, tbl in overrides.items():
        for key, arr in tbl.items():
            params[kind][key] = jnp.asarray(arr)
            axes[kind][key] = 0
    return params, axes


def run_transient_batch(cc, cfg: TranConfig, params, in_axes, state0,
                        semantics: str = "compat", store: str = "none",
                        jit: bool = True):
    """vmapped transient over the batch axis.  Returns the batched TranOutput
    (out_* only populated when store='full')."""
    tran = make_tran(cc, cfg, semantics=semantics, store=store)
    fn = jax.vmap(tran, in_axes=(in_axes, None))
    if jit:
        fn = jax.jit(fn)
    return fn(params, state0)
