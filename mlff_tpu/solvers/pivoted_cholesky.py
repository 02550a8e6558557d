"""Matrix-free pivoted incomplete Cholesky, fully on device.

Rebuild of the reference's ``pivoted_cholesky``
(reference: sgdml/solvers/incomplete_cholesky.py:24-93) and its driver
(iterative_cholesky.py:115-156).  Same greedy largest-remaining-diagonal
pivoting, so pivot order — and hence preconditioner quality / CG iteration
counts — matches the reference up to fp roundoff.

TPU redesign:
  * Columns are extracted by **direct assembly** (ops.kernel.kernel_column,
    O(n * P * D) per column) instead of the reference's unit-vector matvec
    (O(n^2 * P * D / n_train) per column, iterative_cholesky.py:152-156) —
    an n_train-fold reduction of the dominant cost.
  * The whole k-step loop runs inside one jitted ``lax.fori_loop`` with a
    preallocated (n, k) factor; the Schur correction is a single (n, k) GEMV
    per pivot (rank-m row dot), not a Python-level einsum.
  * Pivot positivity cannot raise on device; the smallest pivot value is
    returned for host-side validation instead
    (reference asserts at incomplete_cholesky.py:62).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..ops import kernel as knl
from ..ops.descriptor import DescriptorSpec
from ..utils.log import get_logger

log = get_logger(__name__)


class PivotedCholeskyResult(NamedTuple):
    L: jnp.ndarray             # (n, k) low-rank factor
    pivots: jnp.ndarray        # (k,) chosen column indices (pivot order)
    pivot_values: jnp.ndarray  # (k,) diagonal value at each pivot
    remaining_diag: jnp.ndarray  # (n,) residual diagonal after k steps


@partial(jax.jit, static_argnums=(0, 3, 4))
def _pivoted_cholesky_device(
    spec_dim_i: int,
    cache: knl.KernelCache,
    diag0: jnp.ndarray,
    max_rank: int,
    compressed: bool = False,
) -> PivotedCholeskyResult:
    n = diag0.shape[0]
    dtype = diag0.dtype

    # numerical-rank floor: pivots this far below the initial diagonal scale
    # are roundoff; emit a zero column instead of dividing by ~0 (the host
    # wrapper still reports the raw pivot values for PSD validation).
    eps_floor = jnp.max(diag0) * 1e-30

    def body(m, state):
        L, diag, chosen, pivots, pvals = state
        # greedy pivot: largest remaining diagonal among unchosen columns
        masked = jnp.where(chosen, -jnp.inf, diag)
        p = jnp.argmax(masked)
        pval = diag[p]
        ok = pval > eps_floor
        l_mm = jnp.sqrt(jnp.maximum(pval, eps_floor))

        getcol = (knl.kernel_column_compressed if compressed
                  else knl.kernel_column)
        col = getcol(spec_dim_i, cache, p)             # includes +lam e_p

        # Schur correction from the m previous factors: one (n, k) x (k,) GEMV
        # (columns >= m are still zero, so the full product is exact).
        schur = L @ L[p, :]
        newcol = (col - schur) / l_mm
        # rows of already-chosen pivots are exactly zero in the true factor
        newcol = jnp.where(chosen & (jnp.arange(n) != p), 0.0, newcol)
        newcol = newcol.at[p].set(l_mm)
        newcol = jnp.where(ok, newcol, jnp.zeros_like(newcol))

        L = L.at[:, m].set(newcol)
        diag = diag - newcol**2
        chosen = chosen.at[p].set(True)
        pivots = pivots.at[m].set(p.astype(jnp.int32))
        pvals = pvals.at[m].set(pval)
        return (L, diag, chosen, pivots, pvals)

    init = (
        jnp.zeros((n, max_rank), dtype),
        diag0,
        jnp.zeros(n, dtype=bool),
        jnp.zeros(max_rank, dtype=jnp.int32),
        jnp.zeros(max_rank, dtype),
    )
    L, diag, chosen, pivots, pvals = jax.lax.fori_loop(0, max_rank, body, init)
    return PivotedCholeskyResult(L, pivots, pvals, diag)


@partial(jax.jit, static_argnums=(0, 5))
def _pivoted_cholesky_device_ecstr(
    spec_dim_i: int,
    cache: knl.KernelCache,
    diag0: jnp.ndarray,
    K_fe: jnp.ndarray,       # (n, N) dense E-constraint cross block
    K_ee: jnp.ndarray,       # (N, N) dense E-constraint block
    max_rank: int,
) -> PivotedCholeskyResult:
    """Greedy loop over the energy-constrained extended system (n + N,):
    force columns are assembled matrix-free as in the plain variant, energy
    columns are reads of the (dense, small) E-blocks."""
    n_ext = diag0.shape[0]
    n_f = n_ext - K_ee.shape[0]
    dtype = diag0.dtype
    eps_floor = jnp.max(diag0) * 1e-30

    def getcol(p):
        def force(p):
            colF = knl.kernel_column(spec_dim_i, cache, p)   # (n,) + lam e_p
            return jnp.concatenate([colF, K_fe[p]])
        def energy(p):
            j = p - n_f
            col = jnp.concatenate([K_fe[:, j], K_ee[:, j]])
            return col.at[p].add(cache.lam)
        return jax.lax.cond(p < n_f, force, energy, p)

    def body(m, state):
        L, diag, chosen, pivots, pvals = state
        masked = jnp.where(chosen, -jnp.inf, diag)
        p = jnp.argmax(masked)
        pval = diag[p]
        ok = pval > eps_floor
        l_mm = jnp.sqrt(jnp.maximum(pval, eps_floor))
        col = getcol(p)
        schur = L @ L[p, :]
        newcol = (col - schur) / l_mm
        newcol = jnp.where(chosen & (jnp.arange(n_ext) != p), 0.0, newcol)
        newcol = newcol.at[p].set(l_mm)
        newcol = jnp.where(ok, newcol, jnp.zeros_like(newcol))
        L = L.at[:, m].set(newcol)
        diag = diag - newcol**2
        chosen = chosen.at[p].set(True)
        pivots = pivots.at[m].set(p.astype(jnp.int32))
        pvals = pvals.at[m].set(pval)
        return (L, diag, chosen, pivots, pvals)

    init = (
        jnp.zeros((n_ext, max_rank), dtype),
        diag0,
        jnp.zeros(n_ext, dtype=bool),
        jnp.zeros(max_rank, dtype=jnp.int32),
        jnp.zeros(max_rank, dtype),
    )
    L, diag, chosen, pivots, pvals = jax.lax.fori_loop(0, max_rank, body, init)
    return PivotedCholeskyResult(L, pivots, pvals, diag)


def pivoted_cholesky(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    max_rank: int,
    diag: jnp.ndarray | None = None,
    use_E_cstr: bool = False,
) -> tuple[PivotedCholeskyResult, dict]:
    """Rank-``max_rank`` pivoted incomplete Cholesky of (K + lam I).

    The seed diagonal intentionally omits the ridge term, mirroring the
    reference's mixed convention (diag from
    iterative_cholesky._assemble_kernel_mat_diag has no +lam, the extracted
    columns do) so pivot order parity is exact.  With ``use_E_cstr`` the
    factorization runs over the energy-constrained extended system
    (n + n_train rows; reference iterative_cholesky.py:351-373).

    Returns the factor plus an info dict matching the reference's
    ``info_cholesky`` schema (incomplete_cholesky.py:86-88).
    """
    t0 = time.perf_counter()
    # large-D molecules: extract columns without Jacobian inflation
    compressed = (spec.dim * spec.dim_i * 8 * max(4, cache.n_perms)
                  > knl._INFLATION_BUDGET)
    if use_E_cstr:
        if diag is None:
            diag = knl.kernel_diag_ecstr(spec.dim_i, cache)
        K_fe, K_ee = knl.assemble_ecstr_blocks(spec.dim_i, cache)
        res = _pivoted_cholesky_device_ecstr(
            spec.dim_i, cache, diag, K_fe, K_ee, max_rank
        )
    else:
        if diag is None:
            diag = knl.kernel_diag_any(spec, cache)
        res = _pivoted_cholesky_device(spec.dim_i, cache, diag, max_rank,
                                       compressed)
    res.L.block_until_ready()
    elapsed = time.perf_counter() - t0

    min_pivot = float(res.pivot_values.min()) if max_rank > 0 else float("inf")
    if not min_pivot > 0:  # also catches NaN
        raise ValueError(
            f"matrix is not PSD: pivot value {min_pivot:.3e} encountered"
        )
    err = float(jnp.linalg.norm(res.remaining_diag, ord=1))
    info = {
        "time_cholesky": np.full(max_rank, elapsed / max(max_rank, 1)),
        "L.shape": tuple(res.L.shape),
        "index_columns": _full_index_order(res, res.remaining_diag.shape[0]),
        "pivots": np.asarray(res.pivots),
        "remaining_diag_error": err,
        "total_time_cholesky_s": elapsed,
    }
    return res, info


def block_rp_cholesky(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    max_rank: int,
    block: int = 128,
    seed: int = 0,
    diag: jnp.ndarray | None = None,
    use_E_cstr: bool = False,
) -> tuple[PivotedCholeskyResult, dict]:
    """Blocked randomly-pivoted Cholesky of (K + lam I).

    TPU-shaped alternative to the greedy sequential pivot loop: each round
    samples a block of pivots proportionally to the current residual
    diagonal, assembles those columns in ONE batched call, and applies a
    rank-``block`` update as GEMMs (cf. accelerated randomly pivoted
    Cholesky, arXiv:2410.03969 — reimplemented from the method description).
    k/block rounds of large matmuls replace k sequential rank-1 steps; the
    factor quality matches greedy pivoting closely in preconditioner use
    while running orders of magnitude faster on matrix hardware.
    """
    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    if diag is None:
        diag = (knl.kernel_diag_ecstr(spec.dim_i, cache) if use_E_cstr
                else knl.kernel_diag_any(spec, cache))
    assemble = (knl.assemble_columns_ecstr_any if use_E_cstr
                else knl.assemble_columns)
    n = diag.shape[0]
    dtype = diag.dtype

    L_blocks = []
    pivots_all: list[np.ndarray] = []
    pvals_all: list[np.ndarray] = []
    chosen = np.zeros(n, dtype=bool)
    diag_host = np.asarray(diag)

    L = jnp.zeros((n, 0), dtype)
    remaining = max_rank
    while remaining > 0:
        b = min(block, remaining)
        probs = np.clip(diag_host, 0.0, None)
        probs[chosen] = 0.0
        total = probs.sum()
        if total <= 0:
            break  # numerically exhausted
        # sample pivots ~ residual diagonal (without replacement)
        idx = rng.choice(n, size=min(b, int((probs > 0).sum())),
                         replace=False, p=probs / total)
        idx = np.sort(idx)
        b = len(idx)

        cols = assemble(spec, cache, idx)                    # (n, b), no ridge
        cols = cols.at[jnp.asarray(idx), jnp.arange(b)].add(float(cache.lam))
        Lb = _rp_block_update(L, cols, jnp.asarray(idx))     # (n, b)
        Lb_host_diag = np.asarray(jnp.sum(Lb * Lb, axis=1))
        diag_host = diag_host - Lb_host_diag
        pvals_all.append(np.clip(diag_host[idx] + Lb_host_diag[idx], 0, None))
        pivots_all.append(idx)
        chosen[idx] = True
        L = jnp.concatenate([L, Lb], axis=1)
        remaining -= b

    pivots = np.concatenate(pivots_all) if pivots_all else np.zeros(0, int)
    pvals = np.concatenate(pvals_all) if pvals_all else np.zeros(0)
    res = PivotedCholeskyResult(
        L=L,
        pivots=jnp.asarray(pivots, jnp.int32),
        pivot_values=jnp.asarray(pvals, dtype),
        remaining_diag=jnp.asarray(diag_host, dtype),
    )
    elapsed = time.perf_counter() - t0
    info = {
        "time_cholesky": np.full(max(len(pivots), 1), elapsed / max(len(pivots), 1)),
        "L.shape": tuple(L.shape),
        "index_columns": _full_index_order(res, n),
        "pivots": pivots,
        "remaining_diag_error": float(np.abs(diag_host[~chosen]).sum()),
        "total_time_cholesky_s": elapsed,
        "block": block,
    }
    return res, info


def panel_pivoted_cholesky(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    max_rank: int,
    block: int = 128,
    accept_tol: float = 0.25,
    diag: jnp.ndarray | None = None,
    use_E_cstr: bool = False,
) -> tuple[PivotedCholeskyResult, dict]:
    """Greedy *panel* pivoted Cholesky of (K + lam I).

    Each round takes the ``block`` largest entries of the residual diagonal
    as *candidates* (instead of one, like the exact greedy loop of
    ``pivoted_cholesky``), assembles those columns in one batched call,
    Schur-corrects them with a rank-``block`` GEMM, and then lets a host
    LAPACK **pivoted** Cholesky (``?pstrf``) of the small candidate block
    greedily order the candidates against each other — redundant candidates
    (large diagonal but nearly dependent on an earlier pick of the same
    round) get tiny within-block pivots and are dropped rather than
    accepted.  This cuts the sequential depth by the block size — the
    TPU-shaped answer to the inherently sequential reference algorithm
    (incomplete_cholesky.py:50-81; SURVEY.md §7.4.1) — while deviating from
    exact greedy order only through ranking staleness within one round
    (quality measured in tests/test_rpcholesky.py).
    """
    t0 = time.perf_counter()
    if diag is None:
        diag = (knl.kernel_diag_ecstr(spec.dim_i, cache) if use_E_cstr
                else knl.kernel_diag_any(spec, cache))
    assemble = (knl.assemble_columns_ecstr_any if use_E_cstr
                else knl.assemble_columns)
    n = diag.shape[0]
    dtype = diag.dtype

    pivots_all: list[np.ndarray] = []
    pvals_all: list[np.ndarray] = []
    chosen = np.zeros(n, dtype=bool)
    diag_host = np.asarray(diag)
    eps_floor = float(diag_host.max()) * 1e-30

    # STATIC-SHAPE factor: the loop below runs ~max_rank/block rounds; a
    # factor that grows a few columns per round would compile a fresh
    # executable per round (ruinous through the remote-compile tunnel).
    # Instead L is preallocated at the padded final width (zero columns are
    # inert in the Schur correction) and each round commits its panel with
    # a dynamic_update_slice at a traced offset — every round runs the SAME
    # two executables.
    K_pad = (max_rank // block + 2) * block
    L = jnp.zeros((n, K_pad), dtype)
    off = 0
    remaining = max_rank
    t_phase = {"assemble": 0.0, "schur+gather": 0.0, "host": 0.0,
               "commit": 0.0}
    while remaining > 0:
        b = min(block, remaining)
        masked = np.where(chosen, -np.inf, diag_host)
        order = np.argsort(masked)[::-1][:b]
        order = order[masked[order] > eps_floor]
        if len(order) == 0:
            break  # numerically exhausted
        idx = np.sort(order)
        b = len(idx)

        tr = time.perf_counter()
        cols = assemble(spec, cache, idx)                    # (n, b), no ridge
        cols = cols.at[jnp.asarray(idx), jnp.arange(b)].add(float(cache.lam))
        cols.block_until_ready()
        t_phase["assemble"] += time.perf_counter() - tr
        tr = time.perf_counter()
        corr = _schur_correct(L, cols, jnp.asarray(idx))     # (n, b)
        A_ss = np.asarray(_gather_block(corr, jnp.asarray(idx)))  # (b, b)
        t_phase["schur+gather"] += time.perf_counter() - tr
        tr = time.perf_counter()

        # within-block greedy pivoting on host (b x b, negligible): keep the
        # numerically independent prefix in pivot order
        F, piv, rank, _ = scipy.linalg.lapack.dpstrf(A_ss, lower=1)
        piv = piv - 1                                        # LAPACK is 1-based
        # acceptance threshold: keep only within-block pivots at least
        # ``accept_tol`` of the round's best — stale-ranked candidates whose
        # residual collapsed after earlier picks of the same round are
        # re-ranked next round instead of wasting rank budget (measured:
        # keep-all costs ~2x greedy's CG iterations, accept_tol=0.25 is
        # within ~20% at extreme k/n)
        fdiag = np.diagonal(F)[:rank] ** 2
        r = int(np.sum(fdiag >= fdiag[0] * accept_tol)) if rank > 0 else 0
        if rank > 0:
            r = max(r, 1)
        if r == 0:
            break
        perm = piv[:r]
        # combine matrix: Lb = corr[:, perm] tril(F_r)^-T = corr @ Tm with
        # zero columns for rejected candidates — keeps the commit shape
        # static at (n, block)
        Fr_inv = scipy.linalg.solve_triangular(
            np.tril(F[:r, :r]), np.eye(r), lower=True)
        Tm = np.zeros((b, block), dtype=np.float64)
        Tm[perm, :r] = Fr_inv.T
        t_phase["host"] += time.perf_counter() - tr
        tr = time.perf_counter()
        L, Lb_sumsq = _panel_commit(L, corr, jnp.asarray(Tm),
                                    jnp.asarray(off, jnp.int32))
        Lb_host_diag = np.asarray(Lb_sumsq)
        t_phase["commit"] += time.perf_counter() - tr

        pvals_all.append(np.clip(diag_host[idx[perm]], 0, None))
        diag_host = diag_host - Lb_host_diag
        pivots_all.append(idx[perm])
        chosen[idx[perm]] = True
        off += r
        remaining -= r

    pivots = np.concatenate(pivots_all) if pivots_all else np.zeros(0, int)
    pvals = np.concatenate(pvals_all) if pvals_all else np.zeros(0)
    res = PivotedCholeskyResult(
        L=L[:, :off],
        pivots=jnp.asarray(pivots, jnp.int32),
        pivot_values=jnp.asarray(pvals, dtype),
        remaining_diag=jnp.asarray(diag_host, dtype),
    )
    elapsed = time.perf_counter() - t0
    log.info("panel cholesky phases: %s",
             "  ".join(f"{k} {v:.1f}s" for k, v in t_phase.items()))
    info = {
        "time_cholesky": np.full(max(len(pivots), 1), elapsed / max(len(pivots), 1)),
        "L.shape": tuple(L.shape),
        "index_columns": _full_index_order(res, n),
        "pivots": pivots,
        "remaining_diag_error": float(np.abs(diag_host[~chosen]).sum()),
        "total_time_cholesky_s": elapsed,
        "block": block,
    }
    return res, info


@jax.jit
def _schur_correct(L: jnp.ndarray, cols: jnp.ndarray, idx: jnp.ndarray):
    """cols -= L L[idx]^T — rank-k_cur correction of the candidate panel."""
    return cols - L @ L[idx].T


@jax.jit
def _gather_block(corr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return corr[idx]


@jax.jit
def _panel_solve(Fr: jnp.ndarray, corr: jnp.ndarray, colperm: jnp.ndarray):
    """Lb = corr[:, perm] Fr^-T for the kept within-block pivot prefix."""
    return jax.scipy.linalg.solve_triangular(
        Fr, corr[:, colperm].T, lower=True
    ).T


@jax.jit
def _panel_commit(L: jnp.ndarray, corr: jnp.ndarray, Tm: jnp.ndarray, off):
    """Commit one panel round into the preallocated factor.

    Lb = corr @ Tm (host-built selection x triangular-solve combine, zero
    columns for rejected candidates) lands at column ``off`` of L via a
    dynamic slice — same executable for every round."""
    Lb = corr @ Tm                                      # (n, block)
    L_new = jax.lax.dynamic_update_slice(
        L, Lb, (jnp.zeros((), off.dtype), off))
    return L_new, jnp.sum(Lb * Lb, axis=1)


@jax.jit
def _rp_block_update(L: jnp.ndarray, cols: jnp.ndarray, idx: jnp.ndarray):
    """One RPCholesky block step: Schur-correct the sampled columns against
    the current factor and orthonormalize within the block."""
    # Schur correction: cols -= L L[idx]^T  (rank-k_cur GEMM)
    corr = cols - L @ L[idx].T
    A_ss = corr[idx]                                    # (b, b)
    b = A_ss.shape[0]
    # small relative jitter keeps the in-block factorization finite when the
    # sampled block is (nearly) rank-deficient; rejected directions then
    # contribute ~zero columns
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(A_ss))), 1e-300)
    F = jnp.linalg.cholesky(A_ss + (scale * 1e-12) * jnp.eye(b, dtype=A_ss.dtype))
    Lb = jax.scipy.linalg.solve_triangular(F, corr.T, lower=True).T
    return Lb


def _full_index_order(res: PivotedCholeskyResult, n: int) -> np.ndarray:
    """Pivot order extended to a full permutation of [0, n) — the reference's
    ``index_columns`` (chosen pivots first, remaining columns after, in the
    swap order its in-place algorithm leaves them)."""
    pivots = np.asarray(res.pivots)
    index_columns = np.arange(n)
    for m, p in enumerate(pivots):
        j = int(np.where(index_columns == p)[0][0])
        index_columns[m], index_columns[j] = index_columns[j], index_columns[m]
    return index_columns
