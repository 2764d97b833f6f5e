"""One-command on-TPU regression: the full solver A/B, the fused-transient
A/B, and the headline benchmark, with a dated result block appended to
PARITY.md.

    python tests/tools/regress_tpu.py            # ~10-15 min on the TPU
    python tests/tools/regress_tpu.py --no-log   # run, don't touch PARITY.md

This is the committed form of the CLAUDE.md invariant "any solver change
needs an on-TPU A/B" — one invocation instead of archaeology.  Each stage
runs in a fresh subprocess: the tunneled TPU worker occasionally dies on a
large first compile and recovers in a new process (~20 s), so a stage that
fails with a runtime error is retried once before being reported red.
"""

import datetime
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

STAGES = [
    ("solver A/B (22-deck sweep, XLA f64 vs Pallas df)",
     [sys.executable, "tests/tools/ab_solver.py", "all"]),
    # the transient A/B runs BOTH fused engines (attempt-loop + whole-run
    # kernel) per deck since round 5 — twice the compiles, longer stage
    ("fused transient A/B (12 compat decks + physics BE/trap incl. "
     "nonlinear, general vs attempt-loop vs whole-run kernels)",
     [sys.executable, "tests/tools/ab_fused_tran.py"], 4800),
    ("fused OP/DC A/B (nonlinear OP decks + DC sweep, general vs fused "
     "OP/Newton kernel)",
     [sys.executable, "tests/tools/ab_fused_op.py"]),
    ("single-device shard_map smoke (fused kernels under Mesh((1,)) vs "
     "unsharded, bitwise)",
     [sys.executable, "tests/tools/ab_shard_smoke.py"]),
    ("headline benchmark (bench.py)",
     [sys.executable, "bench.py"]),
    ("per-class benchmark matrix (bench_matrix.py -> BENCH_MATRIX.json)",
     [sys.executable, "bench_matrix.py"]),
]


def run_stage(title, cmd, timeout=2400):
    env = dict(os.environ)
    # persistent XLA compile cache across stages/retries (the TPU transient
    # engines take ~30 s each to compile cold)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache_tpu"))
    for attempt in (1, 2):
        try:
            r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                               timeout=timeout, env=env)
        except subprocess.TimeoutExpired:
            return False, f"TIMEOUT after {timeout}s"
        lines = [ln for ln in (r.stdout + r.stderr).strip().splitlines()
                 if "WARNING" not in ln and "Platform 'axon'" not in ln]
        tail = "\n".join(lines[-25:])
        if r.returncode == 0:
            return True, tail
        if attempt == 1:
            print(f"  retrying ({title}) after rc={r.returncode} — "
                  "TPU worker may have restarted", flush=True)
    return False, tail


def main():
    log = "--no-log" not in sys.argv
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC")
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    lines = [f"\n## TPU regression {stamp} @ {head}\n"]
    ok_all = True
    for stage in STAGES:
        title, cmd = stage[0], stage[1]
        timeout = stage[2] if len(stage) > 2 else 2400
        print(f"=== {title}", flush=True)
        ok, tail = run_stage(title, cmd, timeout=timeout)
        ok_all &= ok
        print(tail, flush=True)
        status = "PASS" if ok else "FAIL"
        summary = tail.strip().splitlines()[-1] if tail.strip() else "(no output)"
        lines.append(f"- **{status}** {title} — `{summary}`")
        print(f"=== {status}\n", flush=True)

    if log:
        with open(os.path.join(REPO, "PARITY.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended result block to PARITY.md")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
