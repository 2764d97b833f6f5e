"""Micro-benchmark of the fused-kernel primitives on real TPU: double-float
mul chains vs df_exp / df_log / pnjlim vs the Gauss-Jordan eliminate, each
as a K-deep dependent chain inside one Pallas kernel over a (8, W) tile
block.  Separates "how expensive is one in-kernel Newton iteration" into
its parts (VERDICT round-1 weak #4: the nonlinear gap was unquantified).

    python tests/tools/bench_kernel_ops.py [W] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import toyspice_tpu  # noqa: F401  (enables x64)
from toyspice_tpu.ops.pallas_solve import _df_add, _df_mul, _gj_eliminate
from toyspice_tpu.ops.df_math import df_exp, df_log
from toyspice_tpu.ops.pallas_tran import _pnjlim_df, _df_const

W = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SHAPE = (8, W)


def chain_kernel(step, r_loops):
    def kern(xh_ref, xl_ref, oh_ref, ol_ref):
        x = (xh_ref[...], xl_ref[...])

        def outer(_, y):
            for _ in range(K):
                y = step(y, x)
            return y

        y = jax.lax.fori_loop(0, r_loops, outer, x)
        oh_ref[...] = y[0]
        ol_ref[...] = y[1]
    return kern


def _timed_call(kern_factory, args, specs, oshapes, r_loops):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern_factory(r_loops),
        in_specs=specs, out_specs=tuple(
            pl.BlockSpec(s.shape, lambda *i: (0,) * len(s.shape),
                         memory_space=pltpu.VMEM) for s in oshapes),
        out_shape=oshapes,
    )(*a))
    r = f(*args); np.asarray(r[0])
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        r = f(*args)
    float(np.asarray(r[0]).sum())  # fetch inside the timed region: the
    #                                tunnel's block_until_ready lies
    return (time.time() - t0) / reps


def run(name, step):
    # difference two in-kernel loop counts so call/dispatch overhead and
    # the tunnel latency cancel exactly
    xh = jnp.full(SHAPE, 0.001, jnp.float32)
    xl = jnp.zeros(SHAPE, jnp.float32)
    spec = pl.BlockSpec(SHAPE, lambda: (0, 0), memory_space=pltpu.VMEM)
    oshapes = (jax.ShapeDtypeStruct(SHAPE, jnp.float32),) * 2
    fac = lambda r_loops: chain_kernel(step, r_loops)
    r1, r2 = 50, 250
    d1 = _timed_call(fac, (xh, xl), [spec, spec], oshapes, r1)
    d2 = _timed_call(fac, (xh, xl), [spec, spec], oshapes, r2)
    per_op = (d2 - d1) / ((r2 - r1) * K)
    print(f"{name:>12}: {per_op*1e9:8.1f} ns/op on (8,{W}) tile "
          f"({per_op*1e9/ (8*W) * 1000:.2f} ps/lane-op)", flush=True)


def gj_kernel(n, r_loops):
    def kern(ah_ref, al_ref, oh_ref, ol_ref):
        ah0 = ah_ref[...]
        al0 = al_ref[...]

        def outer(_, carry):
            ah, al = carry
            xh, xl = _gj_eliminate(n, ah, al)
            # arithmetic dependency (scatter is not lowerable in Mosaic)
            return ah + xh[0][None, None] * 1e-20, al

        ah, al = jax.lax.fori_loop(0, r_loops, outer, (ah0, al0))
        xh, xl = _gj_eliminate(n, ah, al)
        oh_ref[...] = xh
        ol_ref[...] = xl
    return kern


def run_gj(n):
    ah = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, n + 1) + SHAPE).astype(np.float32)) + 3.0
    al = jnp.zeros((n, n + 1) + SHAPE, jnp.float32)
    spec = pl.BlockSpec((n, n + 1) + SHAPE, lambda: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    oshapes = (jax.ShapeDtypeStruct((n,) + SHAPE, jnp.float32),) * 2
    fac = lambda r_loops: gj_kernel(n, r_loops)
    r1, r2 = 50, 250
    d1 = _timed_call(fac, (ah, al), [spec, spec], oshapes, r1)
    d2 = _timed_call(fac, (ah, al), [spec, spec], oshapes, r2)
    per = (d2 - d1) / (r2 - r1)
    print(f"   gj n={n:>2}: {per*1e9:8.1f} ns/solve on (8,{W}) tile",
          flush=True)


def main():
    print(f"tile {SHAPE}, chain {K}")
    run("df_mul", lambda y, x: _df_mul(*y, *x))
    run("df_add", lambda y, x: _df_add(*y, *x))
    run("df_exp", lambda y, x: df_exp(*_df_mul(*y, *x)))
    def log_step(y, x):
        one = (jnp.full(SHAPE, 1.0, jnp.float32),
               jnp.zeros(SHAPE, jnp.float32))
        return df_log(*_df_add(*_df_mul(*y, *y), *one))

    run("df_log", log_step)

    def pnj_step(y, x):
        vte = _df_const(0.02585, SHAPE)
        invvte = _df_const(1.0 / 0.02585, SHAPE)
        vcr = _df_const(0.7, SHAPE)
        return _pnjlim_df(_df_add(*y, *x), y, vte, invvte, vcr, SHAPE)

    run("pnjlim", pnj_step)
    for n in (4, 6, 8):
        run_gj(n)


if __name__ == "__main__":
    main()
