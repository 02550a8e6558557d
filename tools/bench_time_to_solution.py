"""Time-to-solution benchmark at the paper's kernel-size scales.

Trains a molecule-shaped system (default: ethanol, n_train = 1166,
n = 31,482) to the production tolerance with the rule-of-thumb
preconditioner rank and reports wall-clock phase times.  Reference
comparison: data/rule_of_thumb.csv records the per-molecule optimal PCG
solve times at n = 31,400 / 75,000 / 158,000 on a cluster GPU/CPU node
(`optimal_runtime_min`); the n = 500,000 ethanol entry comes from the
archived run pickles (data/data/rule_of_thumb/n = 500000/).

Usage: python tools/bench_time_to_solution.py [--molecule aspirin]
       [--n-train 2508] [--k 3072]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

from mlff_tpu.data.synthetic import MOLECULES, make_dataset  # noqa: E402
from mlff_tpu.experiments.rule_of_thumb import get_params, rule_of_thumb  # noqa: E402
from mlff_tpu.models.gdml import Trainer  # noqa: E402
from mlff_tpu.models.task import create_task  # noqa: E402

# Reference optimal PCG solve minutes per (molecule, kernel-size scale):
# data/rule_of_thumb.csv `optimal_runtime_min`, rows 0-6 (n=31,400),
# 7-13 (n=75,000), 14-18 (n=158,000); the ethanol n=500,000 entry is the
# best archived total_time_solve (data/data/rule_of_thumb/n = 500000/,
# 8,993 s at k/n=1.39%).
REFERENCE_MIN = {
    "ethanol": {31400: 0.8, 75000: 2.7, 158000: 12.0, 500000: 149.9},
    "uracil": {31400: 0.6, 75000: 1.4, 158000: 6.0},
    "toluene": {31400: 1.2, 75000: 2.8, 158000: 33.0},
    "aspirin": {31400: 4.5, 75000: 6.4, 158000: 127.0},
    "azobenzene": {31400: 2.3, 75000: 4.2, 158000: 28.0},
    "catcher": {31400: 4.9, 75000: 15.2},
    "nanotube": {31400: 17.9, 75000: 60.0},
}


def reference_seconds(molecule: str, n: int) -> float | None:
    """Reference optimum at the scale nearest to n (or None if unknown)."""
    table = REFERENCE_MIN.get(molecule)
    if not table:
        return None
    scale = min(table, key=lambda s: abs(s - n) / s)
    if abs(scale - n) / scale > 0.15:  # no comparable reference scale
        return None
    return table[scale] * 60.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--molecule", default="ethanol")
    p.add_argument("--n-train", type=int, default=None,
                   help="default: n = 3*d*n_train closest to 31,400")
    p.add_argument("--sig", type=float, default=5.0)
    p.add_argument("--benchmark-data", action="store_true",
                   help="difficulty-calibrated dataset + the molecule's real "
                        "permutation group (equal-footing workload)")
    p.add_argument("--matvec-dtype", default=None,
                   help="float64 (default) or float32 (mixed-precision CG "
                        "matvec)")
    p.add_argument("--nystrom-method", default=None,
                   help="eigh (default) or chol_host")
    p.add_argument("--rank-tol", type=float, default=None,
                   help="whitening eigenvalue clamp, relative (default 1e-10; "
                        "raise toward the device-assembly noise floor ~1e-8 "
                        "when K_mm is numerically rank-deficient)")
    p.add_argument("--apply-impl", default=None,
                   help="xla (default) or df64 (Pallas double-f32 kernels)")
    p.add_argument("--preconditioner", default="lev_random")
    p.add_argument("--k", type=int, default=None,
                   help="preconditioner rank (default: rule of thumb)")
    p.add_argument("--maxiter", type=int, default=None,
                   help="cap CG iterations (probe mode; reports s/iter)")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    d = MOLECULES[args.molecule]
    n_train = args.n_train or max(2, round(31400 / (3 * d)))
    if args.benchmark_data:
        # equal-footing workload: difficulty-calibrated data + the
        # molecule's real permutation group, at the paper's sig = 10
        from mlff_tpu.data.synthetic import make_benchmark_dataset

        ds, perms = make_benchmark_dataset(
            args.molecule, n_samples=n_train + 60, seed=11, n_train=n_train)
        task = create_task(ds, n_train, ds, n_valid=50, sig=10.0,
                           solver="cg", perms=perms)
    else:
        ds = make_dataset(args.molecule, n_samples=n_train + 60, seed=11)
        task = create_task(ds, n_train, ds, n_valid=50, sig=args.sig,
                           solver="cg", use_sym=False)
    if args.matvec_dtype:
        task["matvec_dtype"] = args.matvec_dtype
    if args.nystrom_method:
        task["nystrom_method"] = args.nystrom_method
    if args.rank_tol is not None:
        task["rank_tol"] = args.rank_tol
    if args.apply_impl:
        task["apply_impl"] = args.apply_impl
    if args.maxiter:
        task["solver_maxiter"] = args.maxiter
    n = int(np.asarray(task["F_train"]).size)
    m, k_unity, _ = get_params(args.molecule)
    k_rot = rule_of_thumb(n, k_unity, m)
    k = args.k or k_rot
    print(f"{args.molecule}: d = {d}, n = {n}, rule-of-thumb k = {k_rot}, "
          f"using k = {k}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()

    def progress(it, resid, eff):
        print(f"  cg it={it} resid={resid:.3e} eff={eff}",
              file=sys.stderr, flush=True)

    model = Trainer().train(
        task, n_columns=k, str_preconditioner=args.preconditioner,
        callback=progress,
    )
    total = time.perf_counter() - t0
    t_pre = float(model.get("total_time_preconditioner", np.nan))
    t_cg = float(model.get("total_time_cg", np.nan))
    solver_s = t_pre + t_cg  # the reference's minutes are solver-phase only
    ref_s = reference_seconds(args.molecule, n)
    out = {
        "metric": f"time_to_solution_{args.molecule}_n{n}",
        "value": round(solver_s, 2),
        "unit": "s",
        "converged": bool(model["is_conv"]),
        "iters": int(model["solver_iters"]),
        "k": k,
        "t_preconditioner_s": round(t_pre, 2),
        "t_cg_s": round(t_cg, 2),
        "wall_total_s": round(total, 2),
        # this run's iterations only: solver_iters is a global counter that
        # includes warm-start iterations on resumed tasks
        "workload": ("calibrated+perms" if args.benchmark_data
                     else "easy(use_sym=False)"),
        "s_per_iter": round(t_cg / max(
            1, int(model["solver_iters"]) - int(task.get("solver_iters", 0) or 0)
        ), 4),
        "vs_baseline": round(ref_s / solver_s, 2) if ref_s else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
