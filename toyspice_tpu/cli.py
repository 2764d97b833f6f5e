"""Command-line entry point: ``python -m toyspice_tpu <netlist.cir>``.

Mirrors the reference CLI's result tables (cmd/spice/main.go:17-185): AC,
DC-sweep, operating-point and transient formats with the same engineering
notation and column conventions.
"""

import argparse
import sys

from .engine import run_analysis
from .utils.formatter import (
    format_frequency,
    format_magnitude,
    format_phase,
    format_value_factor,
)


def print_results(results, out=None):
    # resolve stdout at call time (an import-time default would pin whatever
    # stream was active when the module first loaded, e.g. a test capture)
    w = (out or sys.stdout).write
    w("\nAnalysis Results:\n")
    w("================\n")

    # AC
    if "FREQ" in results:
        freqs = results["FREQ"]
        w(f"\nAC Analysis Results ({len(freqs)} frequency points):\n")
        w("Frequency      Node Voltages (Magnitude/Phase)        "
          "Branch Currents (Magnitude/Phase)\n")
        w("-" * 77 + "\n")
        vnames = sorted(
            n[: -len("_MAG")] for n in results
            if n.endswith("_MAG") and n.startswith("V(")
        )
        inames = sorted(
            n[: -len("_MAG")] for n in results
            if n.endswith("_MAG") and n.startswith("I(")
        )
        for i, f in enumerate(freqs):
            w(f"{format_frequency(f):<13s}")
            for name in vnames + inames:
                mag = format_magnitude(results[name + "_MAG"][i])
                ph = format_phase(results[name + "_PHASE"][i])
                w(f"{name}={mag}<{ph}deg  ")
            w("\n")
        return

    # DC sweep
    if "SWEEP1" in results:
        sweep1 = results["SWEEP1"]
        w(f"\nDC Sweep Analysis Results ({len(sweep1)} points):\n")
        w("Sweep Values    Node Voltages        Branch Currents\n")
        w("-" * 48 + "\n")
        vnames = sorted(n for n in results if n.startswith("V("))
        inames = sorted(n for n in results if n.startswith("I("))
        nested = "SWEEP2" in results
        for i in range(len(sweep1)):
            if nested:
                w(f"V1={format_value_factor(sweep1[i], 'V'):<9s} "
                  f"V2={format_value_factor(results['SWEEP2'][i], 'V'):<9s}  ")
            else:
                w(f"V={format_value_factor(sweep1[i], 'V'):<9s}  ")
            for name in vnames:
                w(f"{name}={format_value_factor(results[name][i], 'V')}  ")
            for name in inames:
                w(f"{name}={format_value_factor(results[name][i], 'A')}  ")
            w("\n")
        return

    # operating point
    if len(results.get("TIME", [])) <= 1:
        vnames = sorted(n for n in results if n.startswith("V("))
        inames = sorted(n for n in results if n.startswith("I("))
        w("\nNode Voltages:\n")
        for name in vnames:
            w(f"{name} = {format_value_factor(results[name][0], 'V')}\n")
        w("\nBranch Currents:\n")
        for name in inames:
            w(f"{name} = {format_value_factor(results[name][0], 'A')}\n")
        return

    # transient
    times = results["TIME"]
    w(f"\nTransient Analysis Results ({len(times)} time points):\n")
    w("Time        Node Voltages        Branch Currents\n")
    w("-" * 48 + "\n")
    vnames = sorted(n for n in results if n.startswith("V("))
    inames = sorted(n for n in results if n.startswith("I("))
    for i, t in enumerate(times):
        w(f"{format_value_factor(t, 's'):>9s}  ")
        for name in vnames:
            w(f"{name}={format_value_factor(results[name][i], 'V')}  ")
        for name in inames:
            w(f"{name}={format_value_factor(results[name][i], 'A')}  ")
        w("\n")


def _run(src, engine: str, semantics: str = "compat"):
    if engine in ("host", "host-native"):
        if semantics != "compat":
            raise RuntimeError(
                "the host engines implement compat semantics only "
                "(they are the reference-behavior parity oracle); "
                "use --engine xla for --semantics physics")
        from .compiler import compile_circuit
        from .hostsim import run_host_analysis, set_solver
        from .netlist.parser import parse

        set_solver("native" if engine == "host-native" else "numpy")
        cc = src if not isinstance(src, str) else compile_circuit(parse(src))
        return run_host_analysis(cc)
    return run_analysis(src, semantics=semantics)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tspice",
        description="TPU-native SPICE circuit simulator "
                    "(toy-spice capabilities, JAX/XLA engine)",
    )
    parser.add_argument("netlist", help="netlist file (.cir)")
    parser.add_argument(
        "-v", "--verbose", action="store_true",
        help="print the parse report, per-element expected stamps and the "
             "assembled MNA system before solving (the reference CLI's "
             "procWithPrintSystem pipeline)",
    )
    parser.add_argument(
        "--engine",
        choices=["xla", "host", "host-native"],
        default="xla",
        help="xla (default): the compiled JAX engine.  host: the sequential "
             "host engine (no XLA compilation — milliseconds for a one-shot "
             "run).  host-native: host engine solving through the C++ sparse "
             "LU (native/sparse_lu.cc).",
    )
    parser.add_argument(
        "--semantics",
        choices=["compat", "physics"],
        default="compat",
        help="compat (default): reproduce the Go reference's observable "
             "behavior, quirks included (PLAN.md).  physics: the corrected "
             "variant (live J-A hysteresis, diode Rs/Bv, committed device "
             "charge memory; combine with trapezoidal integration via the "
             "library API).  xla engine only.",
    )
    parser.add_argument(
        "--debug-nans",
        action="store_true",
        help="enable jax_debug_nans: abort with a traceback at the first "
             "NaN-producing XLA op (slow; de-optimizes the jitted engines). "
             "For debugging non-convergence, not for normal runs — the "
             "rescue ladders legitimately pass through non-finite "
             "intermediate solves.",
    )
    parser.add_argument(
        "--platform",
        choices=["cpu", "tpu", "auto"],
        default="cpu",
        help="JAX platform for the solve.  Default cpu: a single-instance "
             "netlist is latency-bound and compiles in seconds on the host; "
             "the TPU surface is the Monte-Carlo batch API "
             "(toyspice_tpu.engine.batch) where thousands of instances "
             "amortize one compilation.  'auto' uses JAX's default device.",
    )
    args = parser.parse_args(argv)

    if args.platform != "auto":
        import jax

        try:
            jax.config.update("jax_platforms", args.platform)
        except Exception as e:  # backends already initialized elsewhere
            print(f"warning: could not select platform {args.platform}: {e}",
                  file=sys.stderr)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    try:
        with open(args.netlist) as f:
            text = f.read()
    except OSError as e:
        print(f"Error reading netlist file: {e}", file=sys.stderr)
        return 1

    try:
        if args.verbose:
            from .compiler import compile_circuit
            from .netlist.parser import parse
            from . import debug

            print(f"\n[1] Reading netlist file: {args.netlist}")
            print(f"File contents:\n{text}")
            print("\n[2] Parsing netlist")
            cc = compile_circuit(parse(text))
            debug.print_parse_report(cc)
            print("\n[3] Creating circuit structure")
            debug.print_element_details(cc)
            debug.print_system(cc)
            print("\n[4] Running analysis")
            if args.engine == "xla":
                from .ops.solve import _solver_backend

                print(f"engine: xla (solver backend: {_solver_backend()}; "
                      "single-instance runs use the general engine — the "
                      "fused transient kernel serves the batch API, see "
                      "engine/batch.py)")
            else:
                print(f"engine: {args.engine}")
            results = _run(cc, args.engine, args.semantics)
        else:
            results = _run(text, args.engine, args.semantics)
    except Exception as e:
        print(f"Analysis failed: {e}", file=sys.stderr)
        return 1

    print_results(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
