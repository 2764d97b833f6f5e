"""Checkpoint / resume for transient state.

The reference has no checkpointing: device state (capacitor charges,
inductor currents, J-A magnetization) lives in struct fields and dies with
the process (SURVEY.md §5, capacitor.go:11-16, magnetic.go:53-61).  Here the
whole committed transient state is one pytree of arrays, so serializing it is
a flat .npz write; a resumed run continues bit-exact because the engine's
state carry IS the checkpoint.

Use with the functional API::

    tran = make_tran(cc, cfg, store="none")
    out = jax.jit(tran)(params, init_state(cc))
    save_checkpoint("ckpt.npz", out.state, t=float(...))
    ...
    state, meta = load_checkpoint("ckpt.npz")
    out2 = jax.jit(tran2)(params, state)        # continue from the commit

Monte-Carlo batches checkpoint the same way — the leaves just carry the
leading batch axis.
"""

from typing import Dict, Optional, Tuple

import numpy as np

_META_PREFIX = "__meta__/"
_JV_PREFIX = "__jv__/"


def save_checkpoint(path: str, state: Dict, jv: Optional[Dict] = None,
                    **meta) -> None:
    """Write a state pytree (dict-of-dicts of arrays), the optional device
    linearization pytree `jv` (needed to resume nonlinear circuits without an
    OP re-bias), plus scalar metadata — e.g. ``t=result.final_time``."""
    flat = {}
    for kind, tbl in state.items():
        for key, val in tbl.items():
            flat[f"{kind}/{key}"] = np.asarray(val)
    for kind, tbl in (jv or {}).items():
        for key, val in tbl.items():
            flat[f"{_JV_PREFIX}{kind}/{key}"] = np.asarray(val)
    for key, val in meta.items():
        flat[_META_PREFIX + key] = np.asarray(val)
    np.savez(path, **flat)


def load_checkpoint(path: str, cc=None,
                    fill_missing: bool = False) -> Tuple[Dict, Optional[Dict], Dict]:
    """Read (state, jv, meta); jv is None if the checkpoint carries none.
    With a CompiledCircuit, validates that the checkpoint's structure and
    shapes match the circuit's state template.  fill_missing=True fills
    state fields absent from the file with the template's zero values (for
    checkpoints written before new state fields existed)."""
    with np.load(path) as data:
        state: Dict = {}
        jv: Dict = {}
        meta: Dict = {}
        for key in data.files:
            if key.startswith(_META_PREFIX):
                meta[key[len(_META_PREFIX):]] = data[key][()]
                continue
            if key.startswith(_JV_PREFIX):
                kind, field = key[len(_JV_PREFIX):].split("/", 1)
                jv.setdefault(kind, {})[field] = data[key]
                continue
            kind, field = key.split("/", 1)
            state.setdefault(kind, {})[field] = data[key]

    if cc is not None:
        from .state import init_state

        template = init_state(cc)
        t_keys = {(k, f) for k, tbl in template.items() for f in tbl}
        s_keys = {(k, f) for k, tbl in state.items() for f in tbl}
        if fill_missing:
            for kind, field in t_keys - s_keys:
                state.setdefault(kind, {})[field] = np.asarray(
                    template[kind][field])
            s_keys = {(k, f) for k, tbl in state.items() for f in tbl}
        if t_keys != s_keys:
            missing = t_keys - s_keys
            extra = s_keys - t_keys
            raise ValueError(
                f"checkpoint does not match circuit: missing={sorted(missing)} "
                f"extra={sorted(extra)} (fill_missing=True zero-fills fields "
                f"added after the checkpoint was written)"
            )
        for kind, tbl in template.items():
            for field, val in tbl.items():
                got = state[kind][field].shape
                want = np.asarray(val).shape
                # allow one leading batch axis on the checkpoint
                if got != want and got[1:] != want:
                    raise ValueError(
                        f"checkpoint shape mismatch for {kind}/{field}: "
                        f"{got} vs circuit {want}"
                    )
    return state, (jv or None), meta
