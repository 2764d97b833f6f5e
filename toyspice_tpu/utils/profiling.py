"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference, which
has only leftover fmt.Println debug spam in hot paths — bjt.go:119, op.go:98).

Three layers:

* ``trace(label)`` — context manager stacking a wall-clock timer with a
  ``jax.profiler.TraceAnnotation`` so the region is visible both in the
  in-process report and in a TensorBoard/XProf trace.
* ``start_trace(logdir)`` / ``stop_trace()`` — passthroughs to the JAX
  profiler for full device traces (compile vs run time on TPU).
* ``tran_stats(out, wall_s)`` — throughput counters from a TranOutput
  (aggregate accepted steps/sec is the headline BASELINE metric).
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict

import numpy as np
import jax

_registry: Dict[str, Dict[str, float]] = defaultdict(
    lambda: {"calls": 0, "total_s": 0.0}
)


@contextlib.contextmanager
def trace(label: str):
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(label):
            yield
    finally:
        # count failed regions too — those are the runs worth profiling
        dt = time.perf_counter() - t0
        entry = _registry[label]
        entry["calls"] += 1
        entry["total_s"] += dt


def report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    """Snapshot of {label: {calls, total_s}} accumulated by trace()."""
    out = {k: dict(v) for k, v in _registry.items()}
    if reset:
        _registry.clear()
    return out


def start_trace(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


def tran_stats(out, wall_s: float) -> Dict[str, float]:
    """Throughput summary of a TranOutput (single instance or batch)."""
    accepted = int(np.sum(np.asarray(out.accepted)))
    attempts = int(np.sum(np.asarray(out.attempts)))
    nr_iters = int(np.sum(np.asarray(out.nr_iters)))
    fails = int(np.sum(np.asarray(out.fail)))
    return {
        "accepted_steps": accepted,
        "attempts": attempts,
        "nr_iters": nr_iters,
        "failed_instances": fails,
        "wall_s": wall_s,
        "steps_per_sec": accepted / wall_s if wall_s > 0 else float("inf"),
        "accept_ratio": accepted / attempts if attempts else 0.0,
        "nr_per_attempt": nr_iters / attempts if attempts else 0.0,
    }
