"""Transient analysis: the reference's adaptive-timestep loop (tran.go:77-155)
as one compiled ``lax.while_loop`` over *attempts*.

Each attempt = clamp dt to tstop → Newton at the old time (sources are
evaluated at t, not t+dt — PLAN.md 2) → LTE check against committed C/L state
→ accept (commit + store + grow dt) or reject (halve dt).  Per the reference:

* dt starts at minStep = tStep/50 with tStep pre-clamped to tStop/300
  (tran.go:29-34, 93);
* reject on NR failure or LTE > trtol(=7) while dt > minStep, else accept
  (or hard-fail if NR failed at minStep);
* growth: ×2 if LTE < trtol/100 else ×1.1, capped at tMax, only while
  t < tstop and dt < tMax (tran.go:145-151);
* results are stored for t ≥ tstart; formatted-time dedup happens host-side
  (anlysis.go:61-72).

The whole loop — OP warm-up, Newton, stamping, solving, state commits, output
scatter — is a single XLA program; under ``vmap`` every Monte-Carlo instance
carries its own t/dt/convergence state in lockstep.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .newton import make_nr
from .op import make_op
from .nlstate import init_jv
from .options import DEFAULTS, SimOptions
from .state import make_commit, make_lte, make_op_seed

class TranConfig(NamedTuple):
    tstart: float
    tstop: float
    tstep: float  # already clamped to tstop/300
    tmax: float
    minstep: float
    uic: bool
    max_store: int
    max_attempts: int


def build_config(tstart, tstop, tstep, tmax, uic,
                 opts: SimOptions = DEFAULTS) -> TranConfig:
    if tstep > tstop / opts.tstep_divisor:
        tstep = tstop / opts.tstep_divisor
    minstep = tstep / opts.minstep_divisor
    if tmax == 0:
        tmax = tstep
    # Accepted steps can be as small as minstep/2: halving applies only while
    # dt > minstep, so the post-halving dt is > minstep/2 (plus O(1) clamped
    # steps near tstop) — the buffer is sized for that worst case.
    max_store = int(math.ceil(tstop / (minstep / 2.0) - 1e-9)) + 16
    max_attempts = 6 * max_store + 256
    return TranConfig(
        tstart=tstart, tstop=tstop, tstep=tstep, tmax=tmax, minstep=minstep,
        uic=bool(uic), max_store=max_store, max_attempts=max_attempts,
    )


class TranOutput(NamedTuple):
    out_x: jnp.ndarray  # (max_store, np1) solution vectors of accepted steps
    out_t: jnp.ndarray  # (max_store,)
    out_n: jnp.ndarray  # number of stored rows
    fail: jnp.ndarray  # bool: NR failed to converge at minStep
    accepted: jnp.ndarray  # accepted steps (incl. pre-tstart)
    attempts: jnp.ndarray
    nr_iters: jnp.ndarray  # total Newton iterations
    t_final: jnp.ndarray  # committed simulation time on exit
    state: dict
    jv: dict
    # fused store='full' only: True where the attempt buffer overflowed and
    # stored waveform rows were dropped (ops/pallas_tran.py); None elsewhere
    store_overflow: object = None
    # adaptive step size on exit — resume with dt0=dt_final to continue the
    # EXACT trajectory (a plain resume restarts dt at cfg.minstep); None on
    # engines predating the streamed-store work
    dt_final: object = None


def make_tran(cc, cfg: TranConfig, semantics: str = "compat", store: str = "full",
              opts: SimOptions = DEFAULTS, resume: bool = False):
    """resume=False: the reference flow (OP warm-up unless UIC, clock starts
    at 0; execute(params, state0)).  resume=True: continue a checkpointed
    run: execute(params, state0, t0, jv0) skips the OP re-bias, starts the
    clock at the checkpoint time t0 and carries the checkpointed device
    linearization jv0; cfg.tstart/tstop stay absolute."""
    if opts.integration == "trap" and semantics == "compat":
        raise ValueError("trapezoidal integration requires semantics='physics'"
                         " (compat reproduces the reference's backward Euler)")
    np1 = cc.np1
    trtol = opts.trtol
    # Trapezoidal physics mode evaluates sources at the END of the interval
    # (required for 2nd-order accuracy with driven circuits); BE modes keep
    # the reference's old-time evaluation (PLAN.md 2).
    trap = opts.integration == "trap" and semantics == "physics"
    nr = make_nr(cc, mode="tran", warm_start=True, conv="op",
                 semantics=semantics, opts=opts)
    op_execute, _ = make_op(cc, opts, semantics=semantics)
    commit = make_commit(cc, semantics, opts.integration, opts.temp)
    op_seed = make_op_seed(cc, opts.temp)
    lte_fn = make_lte(cc)
    physics = semantics == "physics"

    k_store = cfg.max_store if store == "full" else 1

    def tran_execute(params, state0, t0=0.0, jv0=None,
                     dt0=None) -> TranOutput:
        zeros = jnp.zeros(np1, dtype=jnp.float64)

        if resume:
            assert jv0 is not None, "resume=True requires the checkpointed jv"
        elif not cfg.uic:
            opr = op_execute(params, state0)
            jv0 = opr.jv
            if physics:
                # start the transient AT the bias point (see make_op_seed);
                # compat keeps the reference's zero state
                state0 = op_seed(params, state0, opr.x)
        else:
            jv0 = init_jv(cc)

        t0 = jnp.asarray(t0, dtype=jnp.float64)
        carry0 = dict(
            t=t0,
            dt=(jnp.float64(cfg.minstep) if dt0 is None
                else jnp.asarray(dt0, dtype=jnp.float64)),
            done=t0 >= cfg.tstop,
            fail=jnp.asarray(False),
            state=state0,
            jv=jv0,
            out_x=jnp.zeros((k_store, np1), dtype=jnp.float64),
            out_t=jnp.zeros(k_store, dtype=jnp.float64),
            out_n=jnp.int32(0),
            accepted=jnp.int32(0),
            attempts=jnp.int32(0),
            nr_iters=jnp.int32(0),
        )

        def cond(c):
            return (~c["done"]) & (c["attempts"] < cfg.max_attempts)

        def body(c):
            t, dt = c["t"], c["dt"]
            next_t = jnp.minimum(t + dt, cfg.tstop)
            # dt is only recomputed when clamped at tstop (tran.go:97-101);
            # (t+dt)-t != dt in floating point, so don't "simplify" this.
            dt_eff = jnp.where(t + dt > cfg.tstop, cfg.tstop - t, dt)

            res = nr(params, c["state"], c["jv"], jnp.zeros(np1, dtype=jnp.float64),
                     t=(next_t if trap else t), dt=dt_eff, gmin=0.0,
                     dc_scale=1.0)

            lte = lte_fn(params, c["state"], dt_eff)
            can_halve = dt_eff > cfg.minstep
            nr_fail = ~res.converged
            hard_fail = nr_fail & ~can_halve
            reject = (nr_fail & can_halve) | (res.converged & (lte > trtol) & can_halve)
            accept = res.converged & ~reject

            state2 = commit(params, c["state"], res.x, dt_eff)
            state_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), state2, c["state"]
            )

            t_new = jnp.where(accept, next_t, t)
            grow = jnp.where(lte < trtol / 100.0, 2.0, 1.1)
            dt_grown = jnp.where(
                (next_t < cfg.tstop) & (dt_eff < cfg.tmax),
                jnp.minimum(dt_eff * grow, cfg.tmax),
                dt_eff,
            )
            dt_new = jnp.where(accept, dt_grown, dt_eff / 2.0)

            out_x, out_t, out_n = c["out_x"], c["out_t"], c["out_n"]
            if store == "full":
                store_now = accept & (t_new >= cfg.tstart) & (out_n < k_store)
                slot = jnp.minimum(out_n, k_store - 1)
                out_x = out_x.at[slot].set(jnp.where(store_now, res.x, out_x[slot]))
                out_t = out_t.at[slot].set(jnp.where(store_now, t_new, out_t[slot]))
                out_n = out_n + store_now.astype(jnp.int32)

            done = c["done"] | (accept & (t_new >= cfg.tstop)) | hard_fail

            return dict(
                t=t_new,
                dt=dt_new,
                done=done,
                fail=c["fail"] | hard_fail,
                state=state_new,
                jv=res.jv,  # device linearization persists across rejects too
                out_x=out_x,
                out_t=out_t,
                out_n=out_n,
                accepted=c["accepted"] + accept.astype(jnp.int32),
                attempts=c["attempts"] + 1,
                nr_iters=c["nr_iters"] + res.iters,
            )

        c = jax.lax.while_loop(cond, body, carry0)
        return TranOutput(
            out_x=c["out_x"], out_t=c["out_t"], out_n=c["out_n"], fail=c["fail"],
            accepted=c["accepted"], attempts=c["attempts"], nr_iters=c["nr_iters"],
            t_final=c["t"], state=c["state"], jv=c["jv"], dt_final=c["dt"],
        )

    return tran_execute
