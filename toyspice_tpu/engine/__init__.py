"""Analysis drivers: parse -> compile -> jitted engine -> Results.

Top-level convenience API mirroring the reference CLI pipeline
(cmd/spice/main.go:187-362): ``run_analysis`` dispatches on the netlist's
dot-card; the ``run_op/run_transient/run_ac/run_dc`` functions run a specific
analysis.
"""

import os
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..compiler import CompiledCircuit, compile_circuit
from ..netlist.data import AnalysisType, NetlistData
from ..netlist.parser import parse
from . import results as results_mod
from .ac import frequency_points, make_ac
from .dc import make_dc, sweep_values
from .op import make_op
from .options import DEFAULTS, SimOptions
from .state import init_state
from .tran import build_config, make_tran
from .results import Results


def _to_compiled(src: Union[str, NetlistData, CompiledCircuit]) -> CompiledCircuit:
    if isinstance(src, CompiledCircuit):
        return src
    if isinstance(src, NetlistData):
        return compile_circuit(src)
    text = src
    if "\n" not in src and os.path.exists(src):
        with open(src) as f:
            text = f.read()
    return compile_circuit(parse(text))


def _params(cc) -> dict:
    return {
        kind: {k: jnp.asarray(v) for k, v in tbl.items()}
        for kind, tbl in cc.params.items()
    }


def _engine_cache(cc) -> dict:
    """Per-circuit cache of jitted engines (compiles are expensive; repeated
    run_* calls on the same CompiledCircuit must not re-trace)."""
    cache = getattr(cc, "_engines", None)
    if cache is None:
        cache = {}
        object.__setattr__(cc, "_engines", cache)
    return cache


def run_op(src, options: SimOptions = DEFAULTS,
           semantics: str = "compat") -> Results:
    cc = _to_compiled(src)
    cache = _engine_cache(cc)
    key = ("op", options, semantics)
    if key not in cache:
        op_execute, _ = make_op(cc, options, semantics=semantics)
        cache[key] = jax.jit(op_execute)
    params = _params(cc)
    state = init_state(cc)
    r = cache[key](params, state)
    if not bool(r.converged):
        raise RuntimeError("operating point failed to converge")
    return results_mod.from_op(cc, r.x)


def run_transient(src, tstart=None, tstop=None, tstep=None, tmax=None, uic=None,
                  semantics: str = "compat",
                  options: SimOptions = DEFAULTS,
                  initial_state=None, resume_t: float = 0.0,
                  initial_jv=None) -> Results:
    """Resume support: pass a checkpoint's (initial_state, resume_t,
    initial_jv) — from a prior run's .final_state/.final_time/.final_jv or
    engine/checkpoint.py — to continue a transient from its committed state:
    the clock starts at resume_t (so time-varying sources keep their phase),
    the OP re-bias is skipped, and tstart/tstop stay absolute.  The returned
    Results carries .final_state / .final_time / .final_jv."""
    cc = _to_compiled(src)
    tp = cc.netlist.tran
    cfg = build_config(
        tstart if tstart is not None else tp.tstart,
        tstop if tstop is not None else tp.tstop,
        tstep if tstep is not None else tp.tstep,
        tmax if tmax is not None else tp.tmax,
        uic if uic is not None else tp.uic,
        opts=options,
    )
    resume = initial_state is not None
    cache = _engine_cache(cc)
    key = ("tran", cfg, semantics, options, resume)
    if key not in cache:
        cache[key] = jax.jit(make_tran(cc, cfg, semantics=semantics, store="full",
                                       opts=options, resume=resume))
    params = _params(cc)

    def _as_jnp(tree):
        return {k: {kk: jnp.asarray(vv) for kk, vv in t.items()}
                for k, t in tree.items()}

    if resume:
        from .nlstate import init_jv

        state = _as_jnp(initial_state)
        jv0 = _as_jnp(initial_jv) if initial_jv is not None else init_jv(cc)
        out = cache[key](params, state, jnp.float64(resume_t), jv0)
    else:
        out = cache[key](params, init_state(cc))
    if bool(out.fail):
        raise RuntimeError("transient failed to converge at minimum timestep")
    r = results_mod.from_tran(cc, out.out_t, out.out_x, out.out_n)
    r.final_state = jax.tree_util.tree_map(np.asarray, out.state)
    r.final_jv = jax.tree_util.tree_map(np.asarray, out.jv)
    r.final_time = float(np.asarray(out.t_final))
    return r


def run_ac(src, sweep=None, fstart=None, fstop=None, points=None,
           options: SimOptions = DEFAULTS,
           semantics: str = "compat") -> Results:
    cc = _to_compiled(src)
    ap = cc.netlist.ac
    freqs = frequency_points(
        sweep or ap.sweep,
        fstart if fstart is not None else ap.fstart,
        fstop if fstop is not None else ap.fstop,
        points if points is not None else ap.points,
    )
    cache = _engine_cache(cc)
    key = ("ac", options, semantics)
    if key not in cache:
        cache[key] = jax.jit(make_ac(cc, options, semantics=semantics))
    ac_execute = cache[key]
    params = _params(cc)
    state = init_state(cc)
    xr, xi, opr = ac_execute(params, state, jnp.asarray(freqs))
    if not bool(opr.converged):
        raise RuntimeError("AC bias point failed to converge")
    return results_mod.from_ac(cc, freqs, xr, xi)


def run_dc(src, sources=None, starts=None, stops=None, increments=None,
           options: SimOptions = DEFAULTS,
           semantics: str = "compat") -> Results:
    cc = _to_compiled(src)
    dp = cc.netlist.dc
    if sources is None:
        sources = [dp.source1] + ([dp.source2] if dp.source2 else [])
        starts = [dp.start1] + ([dp.start2] if dp.source2 else [])
        stops = [dp.stop1] + ([dp.stop2] if dp.source2 else [])
        increments = [dp.increment1] + ([dp.increment2] if dp.source2 else [])

    slots = []
    for s in sources:
        if s not in cc.names["V"]:
            raise RuntimeError(f"source {s} not found")
        slots.append(cc.names["V"].index(s))

    sweeps = [sweep_values(a, b, c) for a, b, c in zip(starts, stops, increments)]
    nested = len(sources) == 2
    if nested:
        pts = np.array([(v1, v2) for v1 in sweeps[0] for v2 in sweeps[1]],
                       dtype=np.float64)
    else:
        pts = np.asarray(sweeps[0], dtype=np.float64)

    cache = _engine_cache(cc)
    key = ("dc", tuple(slots), options, semantics)
    if key not in cache:
        cache[key] = jax.jit(make_dc(cc, tuple(slots), options,
                                     semantics=semantics))
    dc_execute = cache[key]
    params = _params(cc)
    state = init_state(cc)
    xs, conv = dc_execute(params, state, jnp.asarray(pts))
    if not bool(jnp.all(conv)):
        bad = int(jnp.argmin(conv))
        raise RuntimeError(f"DC sweep failed to converge at point {bad}")
    return results_mod.from_dc(cc, pts, xs, nested=nested)


def run_analysis(src, semantics: str = "compat",
                 options: SimOptions = DEFAULTS) -> Results:
    cc = _to_compiled(src)
    if cc.analysis == AnalysisType.OP:
        return run_op(cc, options=options, semantics=semantics)
    if cc.analysis == AnalysisType.TRAN:
        return run_transient(cc, semantics=semantics, options=options)
    if cc.analysis == AnalysisType.AC:
        return run_ac(cc, options=options, semantics=semantics)
    if cc.analysis == AnalysisType.DC:
        return run_dc(cc, options=options, semantics=semantics)
    raise RuntimeError(f"unsupported analysis type: {cc.analysis}")
