"""Monte-Carlo / corner batching: vmap a whole analysis over a parameter batch.

This is the TPU-native capability the single-threaded Go reference has no
analog for (SURVEY.md §2.2): thousands of parameter instances of one circuit
solved in lockstep.  Per-instance adaptive timestepping, Newton iteration
counts and convergence rescue all come from JAX's ``while_loop`` batching
(masked carries) — no hand-written divergence handling.
"""

import logging
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_log = logging.getLogger("toyspice_tpu.engine")

from .ac import make_ac
from .dc import make_dc
from .op import make_op
from .options import DEFAULTS, SimOptions
from .state import init_state
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


def make_tran_batch(cc, cfg: TranConfig, in_axes,
                    semantics: str = "compat", store: str = "none",
                    jit: bool = True, opts: SimOptions = DEFAULTS,
                    params=None, resume: bool = False):
    """Build the batched transient callable fn(params, state0) -> TranOutput.

    Build ONCE and reuse: each call to this factory returns a fresh ``jax.jit``
    wrapper, so calling it per invocation pays a full retrace every time
    (the persistent compile cache hides the XLA compile, not tracing — a
    measured ~10x on the 8192-way benchmark).

    Eligible circuits with store='none' route through the WHOLE-RUN fused
    kernel (ops/pallas_run.py — the time loop itself in VMEM, one launch
    per run); store='full'/stream/resume through the per-attempt kernel
    (ops/pallas_tran.py); everything else through the general vmapped
    engine.  TOYSPICE_TRAN=general|fused|auto overrides the family and
    TOYSPICE_TRAN_RUN=off pins the attempt-loop kernel.  ``params`` is
    only consulted by the eligibility checks (static per-deck device
    gates vs batched overrides — see fused_ineligible_reason)."""
    engine, reason, fn = select_tran_engine(
        cc, cfg, in_axes, semantics=semantics, store=store, opts=opts,
        params=params, resume=resume)
    _log.info("transient engine: %s (%s)", engine, reason)
    fn = jax.jit(fn) if jit else fn
    try:
        fn.engine = engine
        fn.engine_reason = reason
    except AttributeError:  # jit wrappers that reject attribute assignment
        pass
    return fn


def select_tran_engine(cc, cfg: TranConfig, in_axes,
                       semantics: str = "compat", store: str = "none",
                       opts: SimOptions = DEFAULTS, params=None,
                       resume: bool = False):
    """Decide whole-run-kernel vs attempt-loop-kernel vs general engine
    for a batched transient.

    Returns (engine_name, reason, fn) with engine_name in
    {"run", "fused", "general"} and a human-readable reason — the dispatch
    is otherwise silent and a user benchmarking an ineligible configuration
    (e.g. store="full") would land on the ~50x slower general path with no
    signal.  "run" is the whole-run kernel (ops/pallas_run.py — the TIME
    loop itself in VMEM, one launch per run); "fused" the per-attempt
    kernel with XLA step control (ops/pallas_tran.py).
    TOYSPICE_TRAN_RUN=off forces the attempt-loop kernel for eligible
    decks (A/B harness)."""
    import os

    from ..ops.pallas_run import make_tran_run, run_ineligible_reason
    from ..ops.pallas_tran import fused_ineligible_reason, make_tran_fused
    from ..ops.solve import _solver_backend

    mode = os.environ.get("TOYSPICE_TRAN", "auto")
    why_not = fused_ineligible_reason(cc, semantics, store, opts, params)
    run_why = ("resume (checkpoint continuation)" if resume
               else run_ineligible_reason(cc, semantics, store, opts,
                                          params))
    if mode == "general":
        engine, reason = "general", "TOYSPICE_TRAN=general override"
    elif why_not is not None:
        engine, reason = "general", why_not
    elif mode != "fused" and _solver_backend() != "pallas":
        engine, reason = "general", (
            f"solver backend is {_solver_backend()!r}, not the TPU Pallas "
            "backend (set TOYSPICE_TRAN=fused to force)")
    elif (run_why is None
          and os.environ.get("TOYSPICE_TRAN_RUN", "auto") != "off"):
        engine, reason = "run", (f"whole-run kernel eligible ({semantics}/"
                                 f"{opts.integration})")
    else:
        engine, reason = "fused", (f"eligible ({semantics}/"
                                   f"{opts.integration}, store={store!r})")

    if engine == "run":
        fn = make_tran_run(cc, cfg, opts, semantics=semantics)
    elif engine == "fused":
        fn = make_tran_fused(cc, cfg, opts, store=store, resume=resume,
                             semantics=semantics)
    elif resume:
        tran = make_tran(cc, cfg, semantics=semantics, store=store, opts=opts,
                         resume=True)

        def fn(params_, state0, t0=0.0, jv0=None):
            # a checkpointed batch carries batched state/jv leaves (B, nk)
            # and possibly per-instance times (B,)
            saxes = jax.tree_util.tree_map(
                lambda l: 0 if jnp.asarray(l).ndim == 2 else None, state0)
            jaxes = jax.tree_util.tree_map(
                lambda l: 0 if jnp.asarray(l).ndim == 2 else None, jv0)
            taxis = 0 if jnp.ndim(t0) == 1 else None
            return jax.vmap(tran, in_axes=(in_axes, saxes, taxis, jaxes))(
                params_, state0, t0, jv0)
    else:
        tran = make_tran(cc, cfg, semantics=semantics, store=store, opts=opts)
        fn = jax.vmap(tran, in_axes=(in_axes, None))
    return engine, reason, fn


def run_transient_batch(cc, cfg: TranConfig, params, in_axes, state0,
                        semantics: str = "compat", store: str = "none",
                        jit: bool = True, opts: SimOptions = DEFAULTS):
    """One-shot batched transient (builds the callable and invokes it; for
    repeated invocation hold on to make_tran_batch's result instead).

    When the fused store='full' path truncates waveform rows (attempt-buffer
    overflow on a reject-churn-heavy run) the per-lane flag
    ``TranOutput.store_overflow`` records it; this one-shot runner checks it
    host-side and warns — callers holding a jitted ``make_tran_batch``
    result must check the flag themselves."""
    fn = make_tran_batch(cc, cfg, in_axes, semantics=semantics, store=store,
                         jit=jit, opts=opts, params=params)
    out = fn(params, state0)
    if store == "full" and out.store_overflow is not None:
        import numpy as np

        n_over = int(np.sum(np.asarray(out.store_overflow)))
        if n_over:
            import warnings

            warnings.warn(
                f"fused transient attempt buffer overflowed on {n_over} "
                "instance(s): stored waveforms dropped accepted rows "
                "(raise TOYSPICE_FUSED_STORE_ATTEMPTS, or check "
                "TranOutput.store_overflow per lane)", RuntimeWarning,
                stacklevel=2)
    return out


def make_tran_stream(cc, cfg: TranConfig, chunk_store: int,
                     semantics: str = "compat", opts: SimOptions = DEFAULTS,
                     params=None):
    """Build the (fresh, cont) compiled pair for the streamed store — build
    ONCE and pass to stream_transient_chunks via ``fns`` when draining
    repeatedly (each factory call returns fresh jit wrappers; re-building
    per drain pays a full retrace, same contract as make_tran_batch)."""
    from ..ops.pallas_tran import fused_ineligible_reason, make_tran_fused

    why = fused_ineligible_reason(cc, semantics, "full", opts, params)
    if why is not None:
        raise ValueError(f"streamed store requires the fused engine: {why}")
    cfg_c = cfg._replace(max_store=int(chunk_store))
    fresh = jax.jit(make_tran_fused(cc, cfg_c, opts, store="full",
                                    semantics=semantics, stream=True))
    cont = jax.jit(make_tran_fused(cc, cfg_c, opts, store="full",
                                   semantics=semantics, stream=True,
                                   resume=True))
    return fresh, cont


def stream_transient_chunks(cc, cfg: TranConfig, params, state0,
                            chunk_store: int, semantics: str = "compat",
                            opts: SimOptions = DEFAULTS, fns=None):
    """Generator: full-waveform transient in bounded-HBM chunks.

    The reference stores every accepted step of every run (tran.go:141-143);
    at the 8192-way benchmark batch the complete waveform buffer exceeds
    HBM.  This runs the FUSED engine with a ``chunk_store``-row buffer in
    stream mode — lanes PAUSE (not fail, not truncate) when their buffer
    fills — yields each drained ``TranOutput`` for the caller to copy to
    host (or reduce), and re-enters the same two compiled programs at the
    per-lane ``(t_final, dt_final, state, jv)``.  Because the adaptive step
    size is carried exactly, the concatenated chunks reproduce the
    monolithic run's trajectory step for step (A/B:
    tests/test_stream_store.py).

    ``cfg.max_attempts`` binds the CUMULATIVE per-lane budget across
    re-entries (the attempt counter is carried into each continuation), so
    each chunk's ``attempts`` counter is cumulative; a lane that exhausts
    the budget mid-run is parked like a hard-failed lane (its fail flag
    stays False, matching the monolithic run, which also just stops).
    Hard-failed lanes are excluded from re-entry (their fail flag is
    reported in the chunk where they failed)."""
    fresh, cont = fns if fns is not None else make_tran_stream(
        cc, cfg, chunk_store, semantics, opts, params)
    # continuation decision as ONE device-side scalar: separate t_final /
    # fail array fetches cost a 23 ms tunnel round trip each per chunk
    dec = jax.jit(lambda fa, f, t, att: (
        fa | f | (att >= cfg.max_attempts),
        jnp.any((~(fa | f | (att >= cfg.max_attempts))) & (t < cfg.tstop))))
    out = fresh(params, state0)
    yield out
    parked = out.fail
    while True:
        parked, more = dec(parked, out.fail, out.t_final, out.attempts)
        if not bool(more):
            return
        # park finished/failed/budget-exhausted lanes at tstop: they start
        # done and are frozen by the in-loop masks (their state/jv rows are
        # untouched)
        t_next = jnp.where((~parked) & (out.t_final < cfg.tstop),
                           out.t_final, cfg.tstop)
        out = cont(params, out.state, t_next, out.jv, out.dt_final,
                   out.attempts)
        yield out


def run_transient_streamed(cc, cfg: TranConfig, params, state0,
                           chunk_store: int, semantics: str = "compat",
                           opts: SimOptions = DEFAULTS):
    """Streamed full-waveform transient, concatenated on host.

    Drains ``stream_transient_chunks`` into host numpy arrays and stitches
    the per-lane ragged chunk rows into one (B, N, np1) waveform buffer
    (N = max accepted rows over lanes) — the same layout the monolithic
    store='full' path emits.  Counters: accepted/nr_iters accumulate across
    chunks; attempts is carried INTO each re-entry (cfg.max_attempts binds
    the whole run), so the final chunk's counter is already cumulative;
    fail latches."""
    import numpy as np

    from .tran import TranOutput

    xs, ts, ns = [], [], []
    accepted = nr_iters = 0
    fail = overflow = None
    last = None
    for out in stream_transient_chunks(cc, cfg, params, state0, chunk_store,
                                       semantics, opts):
        xs.append(np.asarray(out.out_x))
        ts.append(np.asarray(out.out_t))
        ns.append(np.asarray(out.out_n))
        accepted = accepted + np.asarray(out.accepted)
        nr_iters = nr_iters + np.asarray(out.nr_iters)
        f = np.asarray(out.fail)
        o = np.asarray(out.store_overflow)
        fail = f if fail is None else (fail | f)
        overflow = o if overflow is None else (overflow | o)
        last = out
    b = xs[0].shape[0]
    np1 = xs[0].shape[2]
    total = np.sum(np.stack(ns, axis=0), axis=0)  # (B,) stored rows
    n_max = int(total.max())
    out_x = np.zeros((b, n_max, np1), dtype=xs[0].dtype)
    out_t = np.zeros((b, n_max), dtype=ts[0].dtype)
    # vectorized ragged stitch: one masked fancy-index copy per chunk
    # instead of a per-lane Python loop (O(B x chunks) interpreted slice
    # copies — ~50k at the 8192-lane benchmark batch, round-4 VERDICT
    # weak #5)
    offs = np.zeros(b, dtype=np.int64)
    lane_col = np.arange(b)[:, None]
    for cx, ct, cn in zip(xs, ts, ns):
        kmax = int(cn.max())
        if kmax:
            j = np.arange(kmax)[None, :]
            valid = j < cn[:, None]              # (b, kmax) kept-row mask
            dest = offs[:, None] + j
            lanes = np.broadcast_to(lane_col, dest.shape)
            out_x[lanes[valid], dest[valid]] = cx[:, :kmax][valid]
            out_t[lanes[valid], dest[valid]] = ct[:, :kmax][valid]
        offs += cn.astype(np.int64)
    return TranOutput(
        out_x=out_x, out_t=out_t, out_n=total, fail=fail,
        accepted=accepted, attempts=np.asarray(last.attempts),
        nr_iters=nr_iters,
        t_final=np.asarray(last.t_final), state=last.state, jv=last.jv,
        store_overflow=overflow, dt_final=np.asarray(last.dt_final))


def select_op_engine(cc, semantics: str = "compat",
                     opts: SimOptions = DEFAULTS, params=None):
    """Decide fused-kernel vs general engine for a batched OP/DC-sweep.

    Returns (engine_name, reason) with engine_name in {"fused", "general"}.
    The fused OP/Newton kernel (ops/pallas_op.py) serves nonlinear compat
    circuits on the Pallas solver backend; TOYSPICE_OP=general|fused|auto
    overrides (same contract as TOYSPICE_TRAN).  ``params`` (the CONCRETE
    override pytree, pre-jit) lets the static-gate checks see batched
    overrides — e.g. a physics-mode diode Rs override enabling series
    resistance the deck's model leaves off must fall back to the general
    engine (the kernel's Rs gate is static per-deck)."""
    import os

    from ..ops.pallas_op import op_fused_ineligible_reason
    from ..ops.solve import _solver_backend

    mode = os.environ.get("TOYSPICE_OP", "auto")
    why_not = op_fused_ineligible_reason(cc, semantics, opts, params)
    if mode == "general":
        return "general", "TOYSPICE_OP=general override"
    if why_not is not None:
        return "general", why_not
    if mode != "fused" and _solver_backend() != "pallas":
        return "general", (
            f"solver backend is {_solver_backend()!r}, not the TPU Pallas "
            "backend (set TOYSPICE_OP=fused to force)")
    return "fused", f"eligible ({semantics})"


def run_op_batch(cc, params, in_axes, jit: bool = True,
                 opts: SimOptions = DEFAULTS, semantics: str = "compat"):
    """Batched operating point: each instance runs the full NR + rescue
    ladders on its own parameters.  Returns the batched OPResult
    (x: (B, np1), converged: (B,), stage: (B,)) — through the fused
    OP/Newton kernel when eligible (one kernel dispatch for the whole batch
    in the no-rescue case), else vmapped over the general engine."""
    engine, reason = select_op_engine(cc, semantics, opts, params=params)
    _log.info("op engine: %s (%s)", engine, reason)
    state0 = init_state(cc)
    if engine == "fused":
        from ..ops.pallas_op import make_op_fused

        fn = make_op_fused(cc, opts, semantics=semantics)
        fn = (lambda f: (lambda p: f(p, state0)))(fn)
    else:
        op_execute, _ = make_op(cc, opts, semantics=semantics)
        fn = jax.vmap(lambda p: op_execute(p, state0), in_axes=(in_axes,))
    if jit:
        fn = jax.jit(fn)
    return fn(params)


def run_ac_batch(cc, params, in_axes, freqs, jit: bool = True,
                 opts: SimOptions = DEFAULTS, semantics: str = "compat"):
    """Batched AC: per-instance bias point + frequency sweep.  Returns
    (xr, xi, opr) with leading batch axes; xr/xi are (B, F, np1).  Routed
    through make_ac_batch, which flattens the (B, F) axes into one solver
    batch — a naive vmap-of-vmap leaves the Monte-Carlo axis OUTSIDE the
    Pallas solve and is ~1000x slower on TPU (see make_ac_batch)."""
    from .ac import make_ac_batch

    fn = make_ac_batch(cc, in_axes, opts, semantics=semantics, params=params)
    state0 = init_state(cc)
    if jit:
        fn = jax.jit(fn)
    return fn(params, state0, freqs)


def run_dc_batch(cc, src_slots, params, in_axes, points, jit: bool = True,
                 opts: SimOptions = DEFAULTS, semantics: str = "compat"):
    """Batched DC sweep.  Returns (xs, conv) with leading batch axes;
    xs is (B, P, np1).  Eligible circuits run the fused DC-flavor Newton
    kernel — one kernel dispatch per sweep point for the whole batch,
    junction voltages warm-started point to point (dc.go:142-187) — else
    the general engine under vmap."""
    engine, reason = select_op_engine(cc, semantics, opts, params=params)
    _log.info("dc engine: %s (%s)", engine, reason)
    state0 = init_state(cc)
    if engine == "fused":
        from ..ops.pallas_op import make_dc_fused

        dcf = make_dc_fused(cc, tuple(src_slots), opts, semantics=semantics)
        fn = lambda p: dcf(p, state0, points)  # noqa: E731
    else:
        dc_execute = make_dc(cc, src_slots, opts, semantics=semantics)
        fn = jax.vmap(lambda p: dc_execute(p, state0, points),
                      in_axes=(in_axes,))
    if jit:
        fn = jax.jit(fn)
    return fn(params)
