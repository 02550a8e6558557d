"""Iterative PCG solver with the full preconditioner zoo and restart logic.

Rebuild of the paper's main solver ``Iterative.solve``
(reference: sgdml/solvers/iterative_solver.py:620-1108) plus the adaptive
restart machinery of the upstream copy
(reference: sgdml/solvers/iterative_inpoints.py:1011-1066):

  * preconditioner dispatch over the strategy strings of
    iterative_solver.py:672-807,
  * scipy-parity PCG (solvers.cg) on the PSD system (K + lam I) a = y,
  * wall-time breakdown + info dict in the reference schema,
  * optional spectra diagnostics (flag_eigvals; reference dev_utils.py:8-58),
  * optional stagnation-triggered restarts that grow the inducing set and
    warm-start from the last iterate (disabled by default, exactly like the
    reference's commented-out raise at iterative_solver.py:965).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops import kernel as knl
from ..ops.descriptor import DescriptorSpec
from ..utils.log import get_logger
from . import preconditioners as pc
from .cg import pcg
from .pivoted_cholesky import (
    block_rp_cholesky, panel_pivoted_cholesky, pivoted_cholesky,
)

log = get_logger(__name__)

LEV_STRATEGIES = (
    "lev_scores", "random_scores", "inverse_lev", "lev_random",
    "truncated_cholesky", "truncated_cholesky_custom",
    "rank_k_lev_scores", "rank_k_lev_scores_custom",
)
ALL_STRATEGIES = LEV_STRATEGIES + (
    "cholesky", "cholesky_panel", "rpcholesky", "eigvec_precon",
    "eigvec_precon_block_diagonal", "eigvec_precon_atomic_interactions",
)


@dataclass
class IterativeResult:
    alphas: np.ndarray            # PSD convention
    num_iters: int
    resid: float
    train_rmse: float
    inducing_pts_idxs: np.ndarray
    is_conv: bool
    info: dict = field(default_factory=dict)


def build_preconditioner(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    strategy: str,
    k: int,
    lam: float,
    rng: np.random.Generator,
    task: dict | None = None,
    svd_cache: dict | None = None,
    n_inducing_pts: int = 25,
):
    """Build (P_apply, inducing_pts_idxs, info) for one strategy string."""
    use_E_cstr = bool((task or {}).get("use_E_cstr", False))
    n = cache.n + (cache.n_train if use_E_cstr else 0)
    info: dict = {}
    t0 = time.perf_counter()

    apply_impl = str((task or {}).get("apply_impl", "xla"))

    def _factor_precon(L):
        P = pc.woodbury_from_factor(L, lam)
        if apply_impl == "ozaki":
            return pc.ozaki_from_split(P)
        if apply_impl != "df64":
            return P
        # 3-component storage kills the frozen-quantization iteration
        # penalty but costs 1.5x the 2-component f32 factor memory; at
        # large (n, k) the conversion transient (f64 B + 3 f32 slices,
        # ~20 bytes/elem) must fit the post-d2h HBM ceiling (RESULTS.md)
        comps = 3 if P.B.size * 20 < int(8e9) else 2
        return pc.df64_from_split(P, components=comps)

    if strategy == "cholesky":
        res, info_chol = pivoted_cholesky(
            spec, cache, max_rank=k, use_E_cstr=use_E_cstr
        )
        P = _factor_precon(res.L)
        inducing = np.arange(k)  # reference uses a size marker here
        info.update(info_chol)

    elif strategy == "cholesky_panel":
        # greedy panel variant: top-`block` residual-diagonal pivots per
        # round, rank-block GEMM updates (TPU-shaped; SURVEY.md §7.4.1)
        res, info_chol = panel_pivoted_cholesky(
            spec, cache, max_rank=k, use_E_cstr=use_E_cstr
        )
        P = _factor_precon(res.L)
        inducing = np.sort(np.asarray(info_chol["pivots"]))
        info.update(info_chol)

    elif strategy == "rpcholesky":
        # TPU-native blocked randomly-pivoted variant (no reference
        # counterpart; arXiv:2410.03969-style block sampling)
        res, info_chol = block_rp_cholesky(
            spec, cache, max_rank=k, use_E_cstr=use_E_cstr
        )
        P = _factor_precon(res.L)
        inducing = np.sort(np.asarray(info_chol["pivots"]))
        info.update(info_chol)

    elif strategy in ("eigvec_precon", "eigvec_precon_block_diagonal",
                      "eigvec_precon_atomic_interactions"):
        P = pc.eigvec_preconditioner(
            spec, cache, k, lam, variant=strategy, svd_cache=svd_cache,
            use_E_cstr=use_E_cstr,
        )
        inducing = np.arange(k)

    elif strategy in LEV_STRATEGIES:
        n_Fcols = cache.n  # inducing columns are always force columns
        if strategy == "random_scores":
            inducing = pc.select_random(n_Fcols, k, rng)
        elif strategy in ("truncated_cholesky", "truncated_cholesky_custom"):
            # hybrid: first k_trunc columns by pivot order of an incomplete
            # Cholesky, rest uniformly from the remainder
            # (reference iterative_solver.py:687-712)
            k_trunc = int((task or {}).get("truncated_cholesky", 1500))
            k_trunc = min(k_trunc, k)
            res, info_chol = pivoted_cholesky(spec, cache, max_rank=k_trunc)
            order = info_chol["index_columns"]
            chosen = order[:k_trunc]
            rest = rng.choice(order[k_trunc:], size=k - k_trunc, replace=False) \
                if k > k_trunc else np.array([], dtype=int)
            inducing = np.sort(np.concatenate([chosen, rest]).astype(int))
            info["truncated_cholesky_k"] = k_trunc
        elif strategy in ("rank_k_lev_scores", "rank_k_lev_scores_custom"):
            lev = pc.rank_k_leverage_scores(spec, cache, k)
            p = lev / lev.sum()
            inducing = np.sort(rng.choice(n_Fcols, size=k, replace=False, p=p))
        else:  # lev_scores / inverse_lev / lev_random
            # with E constraints, scores are approximated on the force block
            lev, order = pc.leverage_scores(
                spec, cache, lam, n_inducing_pts, rng
            )
            inducing = pc.select_by_leverage(strategy, lev, order, k, rng)

        assert inducing.shape == (k,), "incorrect number of inducing points"
        P = pc.nystrom_preconditioner(
            spec, cache, inducing, lam, use_E_cstr=use_E_cstr,
            method=str((task or {}).get("nystrom_method", "chol_host")),
            rank_tol=float((task or {}).get("rank_tol", 1e-10)),
            apply_impl=apply_impl,
            # explicit column-block override: the auto trigger keys on the
            # per-buffer ceiling, but at n ~ 500k the MONOLITHIC whiten's
            # transients blow TOTAL HBM before the factor hits that
            # ceiling (measured: k=1536 compile needs 17.3 of 15.75 GB)
            block_cols=(int(task["nystrom_block_cols"])
                        if task and task.get("nystrom_block_cols")
                        else None),
        )

    else:
        raise NotImplementedError(f"str_preconditioner = {strategy!r}")

    info["total_time_preconditioner"] = time.perf_counter() - t0
    info["total_time_cholesky"] = info["total_time_preconditioner"]
    return P, inducing, info


def compute_precon_spectrum(spec, cache, P_apply=None) -> np.ndarray:
    """Eigenvalues of P^-1 (K + lam I) — preconditioner-quality diagnostic
    (reference dev_utils.py:8-58 materializes the operator column-by-column;
    here the dense products run on device)."""
    K = np.asarray(knl.assemble_full(spec, cache))
    A = K + float(cache.lam) * np.eye(K.shape[0])
    if P_apply is not None:
        PA = np.stack([np.asarray(P_apply(jnp.asarray(col))) for col in A.T], axis=1)
    else:
        PA = A
    return np.sort(np.real(np.linalg.eigvals(PA)))


def _square_matvec_wins(spec: DescriptorSpec, cache: knl.KernelCache) -> bool:
    """Pick the square all-pairs matvec when the packed layout's dense
    incidence-matrix contractions dominate.  The packed S-GEMMs cost
    ~N*D*3A flops/iteration against the square layout's ~N*P*A^2*3*4
    elementwise ops — the flop ratio is ~(A-1)/(4P).  The square layout
    also holds (N*P, A, A, 3) f64 fields; require those to fit comfortably
    in HBM."""
    N, A, P = cache.n_train, spec.n_atoms, cache.n_perms
    sq_bytes = (2 * N * P * A * A * 3 + 2 * N * P * A * A) * 8
    return A >= 64 * P and sq_bytes < int(4e9)


def solve_iterative(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    task: dict,
    y: np.ndarray,
    y_std: float,
    break_percentage: float | None = None,
    str_preconditioner: str = "random_scores",
    flag_eigvals: bool = False,
    callback=None,
    save_progr_callback=None,
    seed: int = 0,
    allow_restarts: bool = False,
    svd_cache: dict | None = None,
    mesh=None,
) -> IterativeResult:
    """Train alphas by PCG (reference Iterative.solve, iterative_solver.py:620-1108).

    ``mesh``: optional jax.sharding.Mesh.  The kernel cache is row-sharded
    over the mesh BEFORE the preconditioner build (so column assembly and
    the Nystrom whiten/Gram GEMMs run sharded), the Woodbury factors are
    placed row-sharded/replicated, and the CG state vectors ride sharded
    through the same PCGSolver path as single-device solves (the TPU
    mapping of the reference's row-partitioned matvec workers,
    predict.py:451-500, and DataParallel split, predict.py:336-341).
    """
    t_start = time.perf_counter()
    rng = np.random.default_rng(seed)

    if mesh is not None:
        from ..parallel import mesh as pmesh

        cache = pmesh.shard_cache(cache, mesh)

    use_E_cstr = bool(task.get("use_E_cstr", False))
    n = cache.n + (cache.n_train if use_E_cstr else 0)
    n_train = cache.n_train
    dim_i = spec.dim_i
    lam = float(cache.lam)

    # warm start from a previous model (resume path, reference :644-646, 969-976)
    alphas0 = None
    num_iters0 = int(task.get("solver_iters", 0) or 0)
    if task.get("alphas0_F") is not None:
        alphas0 = -np.asarray(task["alphas0_F"])  # stored in reference convention
        if use_E_cstr and task.get("alphas0_E") is not None:
            alphas0 = np.hstack([alphas0, -np.asarray(task["alphas0_E"])])

    if break_percentage is None:
        n_inducing_pts = min(n_train, int(task.get("n_inducing_pts_init", 25)))
        k = n_inducing_pts * dim_i
    else:
        n_inducing_pts = int(max(np.ceil(break_percentage * n_train), 1))
        k = int(break_percentage * n)
    k = max(1, min(k, n))

    P_apply, inducing, info_pc = build_preconditioner(
        spec, cache, str_preconditioner, k, lam, rng,
        task=task, svd_cache=svd_cache, n_inducing_pts=n_inducing_pts,
    )
    log.info(
        "preconditioner '%s' built: k=%d (%.1f%% of n=%d) in %.2fs",
        str_preconditioner, k, 100.0 * k / n, n,
        info_pc["total_time_preconditioner"],
    )

    info = dict(info_pc)
    if flag_eigvals:
        info["eigvals"] = compute_precon_spectrum(spec, cache, P_apply)
        info["eigvals_K"] = compute_precon_spectrum(spec, cache, None)

    # (fn, state) operator form with module-level fns: the kernel cache rides
    # into the compiled CG loop as an argument (not embedded constants) and
    # the chunk executable is shared across solves
    mv_fn = knl.matvec_psd_ecstr if use_E_cstr else knl.matvec_psd
    mv_cache = cache
    exact_matvec = None
    matvec_dtype = str(task.get("matvec_dtype", "float64"))
    if matvec_dtype == "float32":
        # plain-downcast CG matvec: GEMM operands stream as f32 (HIGHEST
        # precision passes), lam*v combination + Jacobian contractions stay
        # f64.  The preconditioner build above used the full-f64 cache.
        # The f64 operator rides along for periodic residual replacement
        # (solvers.cg._pcg_drive) — without it the ~5e-7 matvec error
        # drifts the recursive residual and fakes convergence.
        mv_cache = knl.downcast_cache(cache)
        exact_matvec = (mv_fn, cache)
        log.info("matvec: mixed precision (f32 GEMM operands, f64 residual "
                 "replacement)")
    elif matvec_dtype == "ozaki" and not use_E_cstr:
        # exact-slice df64-grade GEMMs (ops.ozaki): ~2^-48 matvec accuracy
        # — INSIDE the lam-floor bound that kills the f32-grade paths — at
        # native bf16 MXU speed.  Residual replacement stays on as a
        # correctness backstop (one f64 matvec per ~50 iterations) unless
        # the task disables it: at n ~ 500k the f64 OTF matvec's
        # 8-way-split transients crash the TPU worker inside the CG chunk
        # (measured round 4), so huge-n runs set residual_replacement=False
        # and verify the TRUE f64 residual with one standalone dispatch
        # after the solve instead.
        mv_fn = knl.matvec_psd_ozaki
        mv_cache = knl.ozaki_matvec_state(cache)
        if task.get("residual_replacement", True):
            exact_matvec = (knl.matvec_psd, cache)
        log.info("matvec: ozaki exact-slice (df64-grade bf16 GEMMs%s)",
                 ", f64 residual replacement"
                 if exact_matvec is not None else "")
    elif matvec_dtype == "mixed" and not use_E_cstr:
        # centered + chunk-accumulated f32 matvec (ops.kernel mixed-precision
        # notes): ~1e-7-grade accuracy at f32 MXU speed; the OTF variant
        # covers pairwise=False caches (n = 500k regime).  Residual
        # replacement stays on as a correctness backstop.
        #
        # WARNING (measured 2026-08-20, calibrated ethanol n = 31,482):
        # when the kernel spectrum reaches the ridge floor lam, the
        # preconditioner output carries 1/lam-amplified components and the
        # matvec needs relative accuracy ~lam/||K|| ~ 1e-12 to keep CG
        # descending; the ~5e-8 mixed error then DIVERGES the solve
        # (residual 3500x ||b|| by iteration 50).  Safe only on systems
        # whose preconditioned spectrum stays well above lam (the easy
        # synthetic workload); NOT the production default.
        mv_fn = knl.matvec_psd_mixed
        exact_matvec = (knl.matvec_psd, cache)
        log.info("matvec: mixed precision (centered f32 GEMMs, f64 chunk "
                 "accumulation)")
    matvec = (mv_fn, mv_cache)
    impl = str(task.get("matvec_impl", "auto"))
    if mesh is not None:
        from ..parallel import mesh as pmesh

        P_apply = pmesh.shard_preconditioner(P_apply, mesh)
    if not use_E_cstr and (
        impl == "square"
        or (impl == "auto" and _square_matvec_wins(spec, cache))
    ):
        # large-A fast path: square all-pairs layout replaces the dense
        # incidence-matrix GEMMs (see ops.kernel.SquareCache)
        sq = knl.build_cache_square(
            np.asarray(task["R_train"], dtype=np.float64),
            np.asarray(task.get("perms",
                                np.arange(spec.n_atoms)[None])),
            float(cache.sig), lam,
        )
        if mesh is not None:
            from ..parallel import mesh as pmesh

            # row-sharded like the packed cache, incl. the permuted
            # training side (parallel.mesh.square_cache_shardings)
            sq = pmesh.shard_square_cache(sq, mesh)
        matvec = (knl.matvec_psd_square, sq)
        log.info("matvec: square all-pairs layout (A=%d%s)", spec.n_atoms,
                 ", row-sharded" if mesh is not None else "")
    y_dev = jnp.asarray(y)
    if mesh is not None:
        from ..parallel import mesh as pmesh

        y_dev = pmesh.shard_vector(y_dev, mesh)
        if alphas0 is not None:
            alphas0 = pmesh.shard_vector(jnp.asarray(alphas0), mesh)
    maxiter = 3 * spec.n_atoms * n_train * 5 if not flag_eigvals else 10
    if task.get("solver_maxiter"):
        # explicit cap (probing / budgeted runs); reference semantics keep
        # the unconverged iterate (train.py:892-908).  flag_eigvals keeps
        # its 10-iteration diagnostic cap (iterative_solver.py:1002).
        maxiter = min(maxiter, int(task["solver_maxiter"])) if flag_eigvals \
            else int(task["solver_maxiter"])

    def ckpt(x_np, iters, resid):
        if save_progr_callback is not None:
            save_progr_callback(
                alphas_psd=x_np, num_iters=iters, resid=resid,
                inducing_pts_idxs=inducing,
            )

    num_restarts = 0
    idxs_ordered_by_lev_score = None
    x0 = jnp.asarray(alphas0) if alphas0 is not None else None
    it0_initial = num_iters0  # maxiter budgets TOTAL new iterations across restarts
    while True:
        result = pcg(
            matvec, y_dev, precon=P_apply, x0=x0,
            tol=float(task.get("solver_tol", 1e-4)),
            maxiter=max(0, maxiter - (num_iters0 - it0_initial)),
            callback=callback, checkpoint_callback=ckpt,
            it0=num_iters0,
            break_on_stagnation=allow_restarts,
            exact_matvec=exact_matvec,
        )
        if result.num_iters - it0_initial >= maxiter:
            break
        if not result.stagnated or not allow_restarts or n_inducing_pts >= n_train:
            break

        # adaptive restart: grow the inducing set and rebuild, warm-starting
        # from the current iterate (reference iterative_inpoints.py:1011-1066)
        num_restarts += 1
        n_inducing_pts = min(
            n_inducing_pts + (5 if result.eff <= 50 else 1), n_train
        )
        if num_restarts == 1 or num_restarts % 10 == 0 or idxs_ordered_by_lev_score is None:
            _, idxs_ordered_by_lev_score = pc.leverage_scores(
                spec, cache, lam, n_inducing_pts, rng,
                idxs_ordered_by_lev_score=idxs_ordered_by_lev_score,
            )
        dim_m = n_inducing_pts * dim_i
        inducing = np.sort(idxs_ordered_by_lev_score[-dim_m:])
        # rebuild with the SAME configuration as the initial build — a
        # restart must not silently change preconditioner semantics
        P_apply = pc.nystrom_preconditioner(
            spec, cache, inducing, lam, use_E_cstr=use_E_cstr,
            method=str(task.get("nystrom_method", "chol_host")),
            rank_tol=float(task.get("rank_tol", 1e-10)),
            apply_impl=str(task.get("apply_impl", "xla")),
        )
        if mesh is not None:
            from ..parallel import mesh as pmesh

            P_apply = pmesh.shard_preconditioner(P_apply, mesh)
        x0 = jnp.asarray(result.x)
        num_iters0 = result.num_iters
        log.info("CG restart %d: inducing points -> %d", num_restarts, n_inducing_pts)

    total_time_solve = time.perf_counter() - t_start
    info.update({
        "is_conv": result.converged,
        "total_time_cg": result.time_s,
        "total_time_solve": total_time_solve,
        "num_restarts": num_restarts,
    })

    train_rmse = result.resid / np.sqrt(len(y))
    return IterativeResult(
        alphas=result.x,
        num_iters=result.num_iters,
        resid=result.resid,
        train_rmse=train_rmse,
        inducing_pts_idxs=inducing,
        is_conv=result.converged,
        info=info,
    )
