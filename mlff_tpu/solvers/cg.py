"""Preconditioned conjugate gradients, scipy-semantics-compatible, TPU-chunked.

Replaces the reference's ``scipy.sparse.linalg.cg`` call plus its
frame-introspection telemetry callback (reference:
sgdml/solvers/iterative_solver.py:874-1005).  Same math, same stopping rule
(||r|| <= tol * ||b||, recursively updated residual, checked before each
iteration), same iteration counting — so iteration-count parity with the
paper's measurements is preserved.

TPU design: the iteration runs on device in fixed-size chunks
(``lax.scan`` of ``chunk`` steps per dispatch) and returns a residual-norm
log per chunk.  The host loop between chunks handles convergence, stagnation
telemetry (the reference's 100-step efficiency window) and periodic
checkpointing — no per-iteration host/device sync.
"""

from __future__ import annotations

import collections
import functools
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Window length for the solver-effectiveness estimate
# (reference iterative_solver.py:57-63).
CG_STEPS_HIST_LEN = 100


class CGState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    rho: jnp.ndarray      # r^T z from the previous accepted step
    resid: jnp.ndarray    # ||r||
    it: jnp.ndarray       # global iteration counter
    done: jnp.ndarray     # convergence flag


@dataclass
class CGResult:
    x: np.ndarray
    converged: bool
    num_iters: int
    resid: float
    resid_hist: np.ndarray
    eff: int = 0
    time_s: float = 0.0
    stagnated: bool = False


def _identity_op(_state, v):
    return v


def _normalize_op(op):
    """Normalize an operator to (fn(state, v), state).

    Accepted forms:
      * an object with ``as_op()`` (e.g. WoodburyPreconditioner),
      * a tuple ``(fn, state)`` with fn(state, v) — the state pytree enters
        the jitted loop as an *argument*, which is essential on TPU: a plain
        closure embeds the operator's arrays as executable constants (a
        198 MB Woodbury factor became a 2 GB binary and a 5-minute compile),
      * a bare callable fn(v) — convenient for tests; arrays it closes over
        are baked into the executable.

    Pass MODULE-LEVEL functions in the (fn, state) form where possible: the
    chunk executable is memoized on function identity, so stable fns let
    repeated solves (sweeps, restarts) skip retracing entirely.
    """
    if op is None:
        return _identity_op, None
    if hasattr(op, "as_op"):
        return op.as_op()
    if isinstance(op, tuple) and len(op) == 2 and callable(op[0]):
        return op
    if callable(op):
        return (lambda s, v: op(v)), None
    raise TypeError(f"cannot interpret operator {op!r}")


@functools.lru_cache(maxsize=64)
def _pcg_chunk(matvec, precon, chunk: int):
    """One jitted dispatch advancing up to ``chunk`` PCG iterations.

    A ``while_loop`` writing residual norms into a fixed (chunk,)-buffer:
    the matvec appears exactly once in the compiled body (a scan-with-cond
    formulation would duplicate it per branch and burn tail iterations after
    convergence)."""

    @jax.jit
    def run(mv_state, pc_state, state: CGState, threshold: jnp.ndarray,
            max_steps: jnp.ndarray):
        # max_steps (dynamic, <= chunk) lets the host driver honor an exact
        # maxiter cap without a separate executable per remainder size.
        it0 = state.it

        def cond(carry):
            state, resid_log = carry
            return (~state.done) & (state.it - it0 < max_steps)

        def body(carry):
            state, resid_log = carry
            z = precon(pc_state, state.r)
            rho_new = jnp.vdot(state.r, z)
            # first iteration overall: p = z; afterwards p = z + beta p
            beta = jnp.where(state.it == 0, 0.0, rho_new / state.rho)
            p = z + beta * state.p
            q = matvec(mv_state, p)
            alpha = rho_new / jnp.vdot(p, q)
            x = state.x + alpha * p
            r = state.r - alpha * q
            resid = jnp.linalg.norm(r)
            resid_log = resid_log.at[state.it - it0].set(resid)
            done = resid <= threshold
            return (CGState(x, r, p, rho_new, resid, state.it + 1, done),
                    resid_log)

        state = state._replace(done=state.done | (state.resid <= threshold))
        resid_log = jnp.full((chunk,), jnp.nan, dtype=state.r.dtype)
        state, resid_log = jax.lax.while_loop(cond, body, (state, resid_log))
        return state, resid_log

    return run


class PCGSolver:
    """Reusable PCG solver: the chunked device loop is compiled once per
    (operator-structure, chunk) and shared across ``solve`` calls — repeated
    solves (warm starts, benchmarks, restarts) pay no retrace/recompile.

    Pass operators in ``(fn, state)`` form (see _normalize_op) so their
    arrays enter the compiled loop as arguments, not constants."""

    def __init__(self, matvec, precon=None, chunk: int = 25,
                 exact_matvec=None):
        self.mv_fn, self.mv_state = _normalize_op(matvec)
        self.pc_fn, self.pc_state = _normalize_op(precon)
        self.chunk = chunk
        self._run = _pcg_chunk(self.mv_fn, self.pc_fn, chunk)
        self.exact = None
        if exact_matvec is not None:
            ex_fn, ex_state = _normalize_op(exact_matvec)
            self.exact = lambda v: ex_fn(ex_state, v)

    def solve(self, b, **kwargs) -> CGResult:
        return _pcg_drive(
            lambda state, threshold, max_steps: self._run(
                self.mv_state, self.pc_state, state, threshold, max_steps
            ),
            lambda v: self.mv_fn(self.mv_state, v),
            b, chunk=self.chunk, exact_matvec=self.exact, **kwargs,
        )


def _to_host(x) -> np.ndarray:
    """Fetch an array to host; multi-process-safe.  Row-sharded CG state is
    not process-addressable under jax.distributed — allgather it."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    precon: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    chunk: int | None = None,
    exact_matvec=None,
    **kwargs,
) -> CGResult:
    """One-shot convenience wrapper around PCGSolver.

    ``chunk=None`` picks the iterations-per-dispatch by problem size: each
    chunk boundary costs one host round trip (~50-150 ms through the TPU
    tunnel), so large systems amortize it over more iterations; the bucketed
    values keep the number of distinct compiled loop shapes small.

    ``exact_matvec``: full-precision operator for residual replacement when
    ``matvec`` is an inexact (mixed-precision) fast operator — see
    _pcg_drive."""
    if chunk is None:
        n = b.shape[0]
        chunk = 25 if n < 16384 else (50 if n < 49152 else 100)
        if n >= 300_000:
            # huge-n regime: SECONDS per OTF matvec.  Keep each dispatch
            # under ~30 s of device time: both 504k chunk attempts (25 x
            # 3.85 s ozaki, 25 x 10.2 s f64) crashed the TPU worker while
            # every sub-35 s dispatch survives — consistent with a
            # per-dispatch execution watchdog on the axon tunnel.  The
            # host round trip (~0.1 s) is negligible against a 4 s matvec.
            chunk = 6
    return PCGSolver(matvec, precon, chunk, exact_matvec=exact_matvec
                     ).solve(b, **kwargs)


def _pcg_drive(
    run,
    matvec,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-4,
    maxiter: int | None = None,
    chunk: int = 25,
    callback: Callable | None = None,
    checkpoint_callback: Callable | None = None,
    checkpoint_every_s: float | None = None,
    it0: int = 0,
    break_on_stagnation: bool = False,
    exact_matvec: Callable | None = None,
    replace_every: int = 50,
) -> CGResult:
    """Host driver for the chunked device loop.

    callback(num_iters, resid, eff) is invoked once per chunk with host
    values; checkpoint_callback(x_np, num_iters, resid) roughly every
    ``checkpoint_every_s`` seconds (maps the reference's unconverged-model
    snapshots, iterative_solver.py:919-954).

    ``exact_matvec`` enables RESIDUAL REPLACEMENT for inexact (mixed-
    precision) operators: every ~``replace_every`` iterations, and before
    accepting convergence, the recursive residual is replaced by the true
    residual b - A_exact x and the search direction restarted (van der
    Vorst/Sleijpen-style).  Without it, an operator with ~1e-6 relative
    error drifts the recursive residual and CG "converges" to an iterate
    whose TRUE residual is orders of magnitude above tol (measured: 1.2e-2
    vs tol 1e-4 on the calibrated tiny benchmark).  Cost: one exact matvec
    per replacement — a few percent of the loop.
    """
    n = b.shape[0]
    if checkpoint_every_s is None:
        # Default 120 s mirrors the reference's snapshot cadence — but on
        # the axon tunnel each snapshot's d2h WAITS FOR DEVICE IDLE
        # (measured 67-253 s when CG chunks are in flight; round-5 504k
        # run: ~150 s stall every ~2 min, tripling effective s/iter).
        # MLFF_CKPT_EVERY_S raises the cadence for long tunnel runs.
        checkpoint_every_s = float(os.environ.get("MLFF_CKPT_EVERY_S",
                                                  "120"))
    if maxiter is None:
        maxiter = 10 * n

    t_r0 = time.perf_counter()
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r0 = b - matvec(x0)
    r0.block_until_ready()
    _dt_r0 = time.perf_counter() - t_r0
    if _dt_r0 > 1.0:
        import logging
        logging.getLogger("mlff_tpu").info(
            "pcg first matvec (executable load/compile): %.1fs", _dt_r0)
    state = CGState(
        x=x0, r=r0, p=jnp.zeros_like(b),
        rho=jnp.asarray(1.0, b.dtype),
        resid=jnp.linalg.norm(r0),
        it=jnp.asarray(it0, jnp.int64),
        done=jnp.asarray(False),
    )
    threshold = tol * jnp.linalg.norm(b)

    resid_hist: list[np.ndarray] = []
    steps_hist: collections.deque = collections.deque(maxlen=CG_STEPS_HIST_LEN)
    prev_resid = float(state.resid)
    eff = 0
    t_start = time.perf_counter()
    t_last_ckpt = t_start
    stagnated = False

    last_replace = it0
    while True:
        it_before = int(state.it)
        remaining = maxiter - (it_before - it0)
        if remaining <= 0:
            break
        state, resid_log = run(
            state, threshold, jnp.asarray(min(chunk, remaining), jnp.int64)
        )
        it_after = int(state.it)
        done = bool(state.done)

        if exact_matvec is not None and (
            done or it_after - last_replace >= replace_every
        ):
            # van der Vorst-style residual replacement: swap in the true
            # residual but KEEP the search direction and rho — a p = 0
            # direction restart here discards the Krylov space and was
            # measured to cost 3.5x iterations at the archived n = 15,741
            # operating point (591 vs 171), dwarfing the matvec error it
            # was guarding against.  The replacement difference is
            # O(matvec-error), so conjugacy degrades by the same small
            # amount the recursion had already drifted.
            r_true = b - exact_matvec(state.x)
            resid_true = jnp.linalg.norm(r_true)
            state = state._replace(
                r=r_true, resid=resid_true, done=resid_true <= threshold,
            )
            done = bool(state.done)
            last_replace = it_after

        log = np.asarray(resid_log)[: it_after - it_before]
        resid_hist.append(log)
        for rv in log:
            steps_hist.append(rv - prev_resid)
            prev_resid = float(rv)

        # solver effectiveness: fraction of downhill steps in the window,
        # rescaled to [-100, 100] (reference iterative_solver.py:886-897).
        arr = np.array(steps_hist)
        tot = np.abs(arr).sum()
        ratio = (-arr.clip(max=0).sum() / tot) if tot > 0 else 1.0
        eff = 0 if it_after == 0 else (int(100 * ratio) - 50) * 2
        if len(steps_hist) == CG_STEPS_HIST_LEN and eff <= 0:
            stagnated = True

        if callback is not None:
            callback(it_after, float(state.resid), eff)

        now = time.perf_counter()
        if (
            checkpoint_callback is not None
            and now - t_last_ckpt >= checkpoint_every_s
        ):
            t_last_ckpt = now
            checkpoint_callback(_to_host(state.x), it_after, float(state.resid))

        # The reference detects stagnation but its restart raise is disabled
        # (iterative_solver.py:958-965); breaking out is opt-in here so the
        # adaptive-restart driver can use it while plain solves keep going.
        if done or it_after - it0 >= maxiter or (stagnated and break_on_stagnation):
            break

    resid = float(state.resid)
    return CGResult(
        x=_to_host(state.x),
        converged=resid <= float(threshold),
        num_iters=int(state.it),
        resid=resid,
        resid_hist=np.concatenate(resid_hist) if resid_hist else np.zeros(0),
        eff=eff,
        time_s=time.perf_counter() - t_start,
        stagnated=stagnated and resid > float(threshold),
    )
