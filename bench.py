"""Benchmark: end-to-end PCG time-to-solution at the paper's n = 31,400 scale.

Reproduces the reference's headline measurement on the HONEST workload:
ethanol at kernel size n = 31,482 (n_train = 1166, d = 9) with
  * difficulty-CALIBRATED synthetic data (make_benchmark_dataset: lev_random
    iteration counts at the archived n = 15,741 operating points match the
    reference's measured curves within ~30%; the default synthetic data is
    ~20x easier),
  * the molecule's REAL permutation group (P = 6 -> the reference's
    M = N * P per-iteration matvec workload, reference predict.py:420-447),
  * the paper's sig = 10 and tol = 1e-4,
trained to convergence.  The reference's recorded optimum is 0.8 min = 48 s
on a cluster GPU/CPU node (data/rule_of_thumb.csv row 0,
`optimal_runtime_min`; see BASELINE.md).

ACCOUNTING (round-4 restatement, scope-matched to the reference).  The
reference's 48 s is `total_time_solve` — the whole `Iterative.solve` call,
INCLUDING its kernel-operator init (plot_data.py:741,758 over
create_data.py:146-148; iterative_solver.py:633,1088-1098).  The reported
``value`` here is therefore kernel-cache build + preconditioner build + CG:
everything from raw descriptors to converged alphas.  What the reference's
number does NOT contain is Python/process startup — and on this rig the
SHARED axon TPU tunnel randomly wedges ONE early dispatch of a process for
minutes (measured 0.2 s / 62 s / 637 s / 650 s for the SAME
warm-compile-cache, 12 KB-executable dispatches; WHICH dispatch it lands
on varies run to run — tools/probe_tunnel_tax.py, probe_tunnel_tax2.py).
Two mitigations, both fully disclosed in the JSON: (1) a timed
problem-independent WARM-UP (``tunnel_warmup_s``) that sometimes absorbs
the stall; (2) the identical build dispatch is re-measured warm
(``t_cache_build_warm_s``) to bound the lottery's share.  ``value`` is
the COLD number — every second of one actually-executed run — with the
warm-substituted total reported alongside (``solve_warm_s``,
``vs_baseline_warm``; they differ by ~4% in clean weather).

Configuration choices (ours, measured on hardware — see RESULTS.md):
  * preconditioner 'lev_random' (uniform sampling is ~5x worse on the
    calibrated synthetic data; archived-MD17 ethanol shows them equal).
  * OZAKI exact-slice matvec (ops/ozaki.py: ~2^-48-grade GEMMs from
    native bf16 MXU passes — inside the lam-floor accuracy bound, unlike
    the f32-grade 'mixed' path which diverges here) with f64 residual
    replacement; measured 7.7 vs 19.7 ms/iter against the f64-emulated
    matvec at this scale, iteration count 292 vs 287.  BENCH_MATVEC
    selects 'float64' / 'mixed' for A/B.  XLA Woodbury apply.

Prints ONE JSON line, e.g.:
  {"metric": "time_to_solution_ethanol_n31482", "value": <s>, "unit": "s",
   "vs_baseline": <48/value>, "wall_total_s": <s>, "vs_baseline_wall": ...}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_S = 48.0  # 0.8 min, rule_of_thumb.csv row 0 (ethanol n = 31,400)
N_TRAIN, SIG = 1166, 10.0
K = int(os.environ.get("BENCH_K", "1536"))
STRATEGY = os.environ.get("BENCH_STRATEGY", "lev_random")
MATVEC = os.environ.get("BENCH_MATVEC", "ozaki")
APPLY = os.environ.get("BENCH_APPLY", "xla")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def warmup_tunnel():
    """Problem-independent dummy dispatches that absorb the per-process
    first-large-dispatch stall of the axon tunnel (see module docstring).
    Returns elapsed seconds."""
    import jax
    import jax.numpy as jnp

    # NOTE: on axon remote buffers block_until_ready (function AND method)
    # does not actually block; only a host fetch synchronizes — fetch one
    # scalar of each result.
    t0 = time.perf_counter()
    float((jnp.ones(8) + 1.0)[0])
    a32 = jnp.ones((4096, 4096), jnp.float32)
    float(jax.jit(jnp.matmul)(a32, a32)[0, 0])
    a64 = jnp.ones((2048, 2048), jnp.float64)
    float(jax.jit(lambda x: x @ x)(a64)[0, 0])
    return time.perf_counter() - t0


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache is configured by the package import below

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.experiments.rule_of_thumb import get_params, rule_of_thumb
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    log("devices:", jax.devices())
    t_warm = warmup_tunnel()
    log(f"[INFO] tunnel warmup (dummy dispatches): {t_warm:.1f}s")

    t_setup0 = time.perf_counter()
    ds, perms = make_benchmark_dataset("ethanol", n_samples=N_TRAIN + 60,
                                       seed=11, n_train=N_TRAIN)
    task = create_task(ds, N_TRAIN, ds, n_valid=50, sig=SIG,
                       solver="cg", perms=perms)
    task["matvec_dtype"] = MATVEC
    task["apply_impl"] = APPLY
    n = int(np.asarray(task["F_train"]).size)
    m, k_unity, _ = get_params("ethanol")
    k_rot = rule_of_thumb(n, k_unity, m)
    # The reference's 48 s baseline is its runtime at ITS empirically
    # optimal k; ours likewise uses OUR measured optimum (k-sweep on
    # hardware, RESULTS.md).
    log(f"n = {n}, P = {perms.shape[0]}, rule-of-thumb k = {k_rot}, "
        f"using k = {K} ({STRATEGY}, matvec={MATVEC}, apply={APPLY})")
    t_setup = time.perf_counter() - t_setup0

    t0 = time.perf_counter()
    model = Trainer().train(
        task, n_columns=K, str_preconditioner=STRATEGY,
        callback=lambda it, resid, eff: log(f"  cg it={it} resid={resid:.3e}"),
    )
    t_train = time.perf_counter() - t0
    t_pre = float(model.get("total_time_preconditioner", np.nan))
    t_cg = float(model.get("total_time_cg", np.nan))
    t_cache_cold = float(model.get("cache_build_s", np.nan))
    t_finalize = float(model.get("finalize_s", np.nan))

    # Warm re-measurement of the operator init: the COLD cache build above
    # rides the tunnel's random per-dispatch stall (0.2-650 s measured for
    # this same warm-compile-cache dispatch; executable is 12 KB, compute is
    # ~1 s — the variance is shared-tenant server contention, not our
    # program).  Re-dispatching the identical program in the now-loaded
    # process measures the actual operator-init COMPUTE, which is what the
    # reference's total_time_solve contains for its own init.  Both numbers
    # are reported; ``value`` uses the warm one.
    from mlff_tpu.models.gdml import CG_LAM
    from mlff_tpu.ops import kernel as knl
    import jax as _jax

    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    float(X[0, 0])  # synchronize (block_until_ready is a no-op on axon)
    t0c = time.perf_counter()
    cache2 = knl.build_cache(
        X, Jc, S, P_idx, float(task["sig"]), CG_LAM,
        R=tr._square_R(task, spec, P_idx),
        pairwise=tr._pairwise_fits(X.shape[0], P_idx.shape[0]))
    # fetch one scalar from the LAST-computed pairwise field: the only
    # genuine synchronization on axon remote buffers
    sync = cache2.A_exp1 if cache2.A_exp1 is not None else cache2.Xqt
    float(sync.ravel()[-1])
    t_cache_warm = time.perf_counter() - t0c
    del cache2
    log(f"[INFO] kernel cache rebuild (warm): {t_cache_warm:.2f}s "
        f"(cold: {t_cache_cold:.1f}s)")

    # scope-matched to the reference's total_time_solve: operator init
    # (cache build) + preconditioner + CG.  The PRIMARY ``value`` is the
    # cold number — every second of one actually-executed run (ADVICE r4:
    # the warm re-measure substitution made the headline correspond to no
    # single run); the warm re-measure stays as ``solve_warm_s`` to bound
    # how much of it is the tunnel's dispatch lottery.
    solve_warm_s = t_cache_warm + t_pre + t_cg
    solve_s = (t_cache_cold if np.isfinite(t_cache_cold) else
               t_cache_warm) + t_pre + t_cg
    wall = t_warm + t_setup + t_train

    # Matvec throughput + roofline accounting (BASELINE.md tracked metric).
    # The ozaki matvec's three (N, M)-shaped GEMMs move 2*N*M*D f64-
    # equivalent flops each; each digit-pair term is a native bf16 MXU
    # pass, so the MXU sees ~n_pairs x that.  t_cg/iter also contains the
    # Woodbury apply and loop overhead, so both rates are LOWER bounds on
    # the matvec-only throughput.
    iters = max(1, int(model["solver_iters"]))
    N_pts = int(X.shape[0])
    P = int(perms.shape[0])
    D = int(X.shape[1])
    M = N_pts * P
    s_iter = t_cg / iters
    nnz_per_s = float(n) * n / s_iter          # dense K is n x n
    f64_eq_flops = 3 * 2.0 * N_pts * M * D     # per iteration
    n_digit_pairs = 21                         # s = 6 cached digits
    mxu_bf16_flops = n_digit_pairs * f64_eq_flops
    V5E_BF16_PEAK = 197e12                     # v5e MXU peak (bf16 FLOP/s)
    mxu_util_pct = 100.0 * mxu_bf16_flops / s_iter / V5E_BF16_PEAK

    out = {
        "metric": f"time_to_solution_ethanol_n{n}",
        "value": round(solve_s, 2),
        "unit": "s",
        "workload": "calibrated+perms",
        "converged": bool(model["is_conv"]),
        "iters": int(model["solver_iters"]),
        "k": K,
        "strategy": STRATEGY,
        "matvec_dtype": MATVEC,
        "apply_impl": APPLY,
        "t_cache_build_warm_s": round(t_cache_warm, 2),
        "t_cache_build_cold_s": (round(t_cache_cold, 2)
                                 if np.isfinite(t_cache_cold) else None),
        "t_preconditioner_s": round(t_pre, 2),
        "t_cg_s": round(t_cg, 2),
        "t_finalize_s": round(t_finalize, 2) if np.isfinite(t_finalize) else None,
        "tunnel_warmup_s": round(t_warm, 2),
        "solve_warm_s": round(solve_warm_s, 2),
        "wall_total_s": round(wall, 2),
        "matvec_nnz_per_s": float(f"{nnz_per_s:.3g}"),
        "mxu_util_pct": round(mxu_util_pct, 2),
        "vs_baseline": round(BASELINE_S / solve_s, 2),
        "vs_baseline_warm": round(BASELINE_S / solve_warm_s, 2),
        "vs_baseline_wall": round(BASELINE_S / wall, 2),
        # North-star trajectory (BASELINE.md: >= 20x on a v5e-8).  With
        # ONE chip the honest budget is >= 2.5x/chip; vs_baseline is the
        # measured per-chip point on that trajectory.
        "north_star": {"target_vs_baseline": 20.0, "chips_assumed": 8,
                       "per_chip_budget": 2.5,
                       "per_chip_measured": round(BASELINE_S / solve_s, 2)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
