"""Mixed-precision iterative-refinement PCG.

TPU f64 is software-emulated (~10-20x slower GEMMs than f32), but plain CG
with an f32 matvec diverges on the production system (lam = 1e-10 demands ~9
significant digits; see ops.kernel.build_cache notes).  The classical fix is
iterative refinement: an *outer* f64 loop maintains the true residual and
solution while an *inner* reduced-precision PCG solves the correction
equation A e = r to a loose tolerance,

    x_{k+1} = x_k + e_k,   r_{k+1} = b - A x_{k+1}  (one f64 matvec each).

Each outer step contracts the residual by roughly the inner tolerance until
the f32 accuracy floor; reaching the production tol=1e-4 typically takes 2-4
outer steps, so >90% of matvecs run at f32 speed.

This has no counterpart in the reference (which is f64 throughout on
CPU/GPU); it exists to exploit the TPU's f32/bf16 compute advantage without
giving up solution quality.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernel as knl
from ..utils.log import get_logger
from .cg import CGResult  # noqa: F401 (part of the module's result API)

log = get_logger(__name__)


@dataclass
class IRResult:
    x: np.ndarray
    converged: bool
    outer_iters: int
    inner_iters_total: int
    resid: float
    time_s: float
    inner_resids: list


def ir_pcg(
    matvec_hi,
    matvec_lo,
    b: jnp.ndarray,
    precon_lo=None,
    tol: float = 1e-4,
    inner_tol: float = 1e-2,
    max_outer: int = 12,
    inner_maxiter: int = 500,
    x0: jnp.ndarray | None = None,
    chunk: int = 25,
) -> IRResult:
    """Solve A x = b with f64 outer refinement and reduced-precision inner PCG.

    ``matvec_hi`` is the f64 operator, ``matvec_lo``/``precon_lo`` the
    reduced-precision ones (typically from a compute_dtype=float32 cache).
    """
    from .cg import PCGSolver, _normalize_op

    t0 = time.perf_counter()
    mv_hi_fn, mv_hi_state = _normalize_op(matvec_hi)
    matvec_hi = lambda v: mv_hi_fn(mv_hi_state, v)
    inner_solver = PCGSolver(matvec_lo, precon=precon_lo, chunk=chunk)

    b = jnp.asarray(b)
    bnorm = float(jnp.linalg.norm(b))
    threshold = tol * bnorm

    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r = b - matvec_hi(x)

    inner_total = 0
    inner_resids = []
    resid = float(jnp.linalg.norm(r))
    outer = 0
    while resid > threshold and outer < max_outer:
        outer += 1
        rnorm = resid
        # inner correction solve at reduced precision, relative to ||r||.
        # HIGHEST keeps the f32 GEMMs true f32 (TPU default is bf16) — the
        # context applies at trace time of the lazily-compiled chunk.
        with jax.default_matmul_precision("highest"):
            inner = inner_solver.solve(
                r.astype(jnp.float64), tol=inner_tol, maxiter=inner_maxiter,
            )
        inner_total += inner.num_iters
        inner_resids.append(inner.resid / max(rnorm, 1e-300))
        e = jnp.asarray(inner.x)
        x = x + e
        r = b - matvec_hi(x)          # true residual, f64
        new_resid = float(jnp.linalg.norm(r))
        log.info(
            "IR outer %d: inner %d iters (rel %.2e), residual %.3e -> %.3e",
            outer, inner.num_iters, inner_resids[-1], rnorm, new_resid,
        )
        if new_resid >= 0.9 * resid:
            log.warning(
                "iterative refinement stalled at %.3e (f32 accuracy floor); "
                "continue in full f64 for the remaining digits", new_resid
            )
            resid = new_resid
            break
        resid = new_resid

    converged = resid <= threshold
    return IRResult(
        x=np.asarray(x),
        converged=converged,
        outer_iters=outer,
        inner_iters_total=inner_total,
        resid=resid,
        time_s=time.perf_counter() - t0,
        inner_resids=inner_resids,
    )


def ir_pcg_kernel(
    spec,
    cache64: knl.KernelCache,
    b: jnp.ndarray,
    precon_T: jnp.ndarray,
    lam: float,
    **kwargs,
) -> IRResult:
    """Convenience wrapper: derive the f32 operator/preconditioner from an
    f64 kernel cache + Woodbury factor and run ir_pcg."""
    cache32 = cache64._replace(
        Xq=cache64.Xq.astype(jnp.float32),
        Xqt=cache64.Xqt.astype(jnp.float32),
        A_exp=cache64.A_exp.astype(jnp.float32),
        A_exp1=cache64.A_exp1.astype(jnp.float32),
    )
    T32 = precon_T.astype(jnp.float32)

    def precon_lo_fn(T32, v):
        # HIGHEST: the TPU f32 matmul default is single-pass bf16, which
        # would stack a second precision loss onto the f32 experiment
        with jax.default_matmul_precision("highest"):
            v32 = v.astype(jnp.float32)
            out = (v32 - T32.T @ (T32 @ v32)) / jnp.float32(lam)
            return out.astype(jnp.float64)

    return ir_pcg(
        matvec_hi=(lambda c, v: knl.matvec_psd(c, v), cache64),
        matvec_lo=(lambda c, v: knl.matvec_psd(c, v), cache32),
        b=b,
        precon_lo=(precon_lo_fn, T32),
        **kwargs,
    )
