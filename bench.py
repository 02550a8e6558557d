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
of solver time at ITS empirically optimal k on a cluster GPU/CPU node
(data/rule_of_thumb.csv row 0, `optimal_runtime_min`; see BASELINE.md).

Configuration choices (ours, measured on hardware — see RESULTS.md):
  * preconditioner 'lev_random'.  NOT random_scores: although the archived
    MD17 curves show uniform sampling matching lev_random on ethanol (379
    vs 384 CG steps at k/n = 0.049), on the calibrated SYNTHETIC data
    uniform sampling is ~5x worse (1918 vs ~386 at n = 15,741) — the
    low-dimensional mode construction concentrates leverage on a few
    columns that uniform sampling misses.
  * FULL-f64 matvec and XLA Woodbury apply.  The mixed-precision matvec
    (~5e-8 relative error) DIVERGES on this workload: the preconditioner
    output carries components amplified by 1/lam = 1e10 wherever the
    kernel spectrum reaches the ridge floor, so the matvec needs relative
    accuracy ~lam/||K|| ~ 1e-12 — out of reach of f32-grade arithmetic.
    The easy (use_sym=False, sig=5) workload never hit this because its
    spectrum stays far above lam; measured divergence: residual 6.3e5 vs
    ||b|| = 177 by iteration 50 (2026-08-20, k = 1536).  The df64 apply
    adds a >4%% iteration penalty on top; both stay available via
    BENCH_MATVEC / BENCH_APPLY for A/B runs.

The reported value is the solver phase (preconditioner build + CG) — the
same accounting as the reference's `total_time_preconditioner +
total_time_cg` (src/sGDML/sgdml/solvers/iterative_solver.py:1088-1098).

Prints ONE JSON line:
  {"metric": "time_to_solution_ethanol_n31482", "value": <s>,
   "unit": "s", "workload": "calibrated+perms", "vs_baseline": <48/value>}
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
MATVEC = os.environ.get("BENCH_MATVEC", "float64")
APPLY = os.environ.get("BENCH_APPLY", "xla")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache is configured by the package import below

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.experiments.rule_of_thumb import get_params, rule_of_thumb
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    log("devices:", jax.devices())

    ds, perms = make_benchmark_dataset("ethanol", n_samples=N_TRAIN + 60,
                                       seed=11)
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

    t0 = time.perf_counter()
    model = Trainer().train(
        task, n_columns=K, str_preconditioner=STRATEGY,
        callback=lambda it, resid, eff: log(f"  cg it={it} resid={resid:.3e}"),
    )
    wall = time.perf_counter() - t0
    t_pre = float(model.get("total_time_preconditioner", np.nan))
    t_cg = float(model.get("total_time_cg", np.nan))
    solver_s = t_pre + t_cg

    print(json.dumps({
        "metric": f"time_to_solution_ethanol_n{n}",
        "value": round(solver_s, 2),
        "unit": "s",
        "workload": "calibrated+perms",
        "converged": bool(model["is_conv"]),
        "iters": int(model["solver_iters"]),
        "k": K,
        "strategy": STRATEGY,
        "matvec_dtype": MATVEC,
        "apply_impl": APPLY,
        "t_preconditioner_s": round(t_pre, 2),
        "t_cg_s": round(t_cg, 2),
        "wall_total_s": round(wall, 2),
        "vs_baseline": round(BASELINE_S / solver_s, 2),
    }))


if __name__ == "__main__":
    main()
