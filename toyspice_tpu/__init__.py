"""toyspice_tpu — a TPU-native analog circuit (SPICE) engine built on JAX.

Re-designed from scratch with the capabilities of the Go reference
``edp1096/toy-spice`` (see SURVEY.md): netlist parsing, MNA assembly, R/L/C,
diode, BJT, MOSFET (levels 1-3), mutual inductance, Jiles-Atherton magnetic
cores, DC/SIN/PULSE/PWL/AC sources, and operating-point / transient / AC /
DC-sweep analyses.

Host-side Python handles parsing and topology (reference pkg/netlist,
pkg/circuit); everything numeric compiles to a single XLA program: stamping is a
vectorized evaluate-and-scatter over a padded dense MNA matrix, Newton-Raphson
is a ``lax.while_loop`` over batched dense solves, and an entire transient is
one compiled loop.  The TPU win is the batch axis: thousands of Monte-Carlo
parameter instances of one circuit solved in lockstep (``vmap`` +
``shard_map`` over a device mesh).

SPICE needs float64 (abstol defaults to 1e-12, reference
pkg/analysis/anlysis.go:38-41), so x64 mode is enabled at import unless the
user already configured it.
"""

import os as _os
import sys as _sys

import jax as _jax

# The whole-sweep DC kernel's jaxpr (P unrolled points around the in-kernel
# Newton) exceeds CPython's default 1000-frame recursion limit during JAX
# tracing AND Mosaic's recursive lowering (both observed as RecursionError
# on real TPU, round 5).  Frames are small; 20000 is far below C-stack risk.
if _sys.getrecursionlimit() < 20000:
    _sys.setrecursionlimit(20000)

# f64 by default: the whole reference algorithm is float64; tolerances like
# abstol=1e-12 are meaningless in f32.  Users can opt out via the standard
# JAX_ENABLE_X64=0 environment variable.
if _os.environ.get("JAX_ENABLE_X64") is None:
    _jax.config.update("jax_enable_x64", True)

from .consts import CHARGE, BOLTZMANN, KELVIN  # noqa: E402,F401
from .netlist import (  # noqa: E402,F401
    parse,
    parse_value,
    NetlistData,
    Element,
    ModelParam,
    AnalysisType,
)
from .compiler import compile_circuit, CompiledCircuit  # noqa: E402,F401
from .engine import (  # noqa: E402,F401
    run_op,
    run_transient,
    run_ac,
    run_dc,
    run_analysis,
)
from .engine.options import SimOptions  # noqa: E402,F401
from .engine.batch import batch_params, run_transient_batch  # noqa: E402,F401

__version__ = "0.1.0"
