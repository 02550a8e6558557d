"""Sweep preconditioner rank k at the n = 31,482 headline scale.

The reference's rule-of-thumb k* balances ITS cost model (preconditioner
build = k sequential kernel matvecs; CG step = CPU-pool contraction).  Our
cost model is different (batched column assembly + two host eighs vs
8.9 ms/iter CG), so the wall-clock-optimal k on TPU need not match the
rule of thumb.  This sweeps k and reports solver-phase time per k.

Usage: python tools/bench_k_sweep_31k.py [--ks 1024 1536 2049 3072]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.models.gdml import Trainer  # noqa: E402
from mlff_tpu.models.task import create_task  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=1166)
    p.add_argument("--sig", type=float, default=5.0)
    p.add_argument("--ks", type=int, nargs="+",
                   default=[1024, 1536, 2049, 3072])
    p.add_argument("--precon", default="lev_random")
    p.add_argument("--benchmark-data", action="store_true",
                   help="honest workload: calibrated difficulty + real "
                        "P = 6 perm group + sig = 10 (the bench.py config)")
    p.add_argument("--matvec-dtype", default=None)
    p.add_argument("--apply-impl", default=None)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if args.benchmark_data:
        from mlff_tpu.data.synthetic import make_benchmark_dataset

        ds, perms = make_benchmark_dataset("ethanol", args.n_train + 60,
                                           seed=11)
        task = create_task(ds, args.n_train, ds, n_valid=50, sig=10.0,
                           solver="cg", perms=perms)
    else:
        ds = make_dataset("ethanol", n_samples=args.n_train + 60, seed=11)
        task = create_task(ds, args.n_train, ds, n_valid=50, sig=args.sig,
                           solver="cg", use_sym=False)
    if args.matvec_dtype:
        task["matvec_dtype"] = args.matvec_dtype
    if args.apply_impl:
        task["apply_impl"] = args.apply_impl
    n = int(np.asarray(task["F_train"]).size)

    rows = []
    for k in args.ks:
        t0 = time.perf_counter()
        model = Trainer().train(
            dict(task), n_columns=k, str_preconditioner=args.precon,
        )
        wall = time.perf_counter() - t0
        t_pre = float(model.get("total_time_preconditioner", np.nan))
        t_cg = float(model.get("total_time_cg", np.nan))
        row = {
            "k": k, "solver_s": round(t_pre + t_cg, 2),
            "t_pre_s": round(t_pre, 2), "t_cg_s": round(t_cg, 2),
            "iters": int(model["solver_iters"]),
            "converged": bool(model["is_conv"]),
            "wall_s": round(wall, 2),
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    best = min((r for r in rows if r["converged"]),
               key=lambda r: r["solver_s"], default=None)
    print(json.dumps({
        "metric": f"k_sweep_ethanol_n{n}", "rows": rows,
        "best_k": best["k"] if best else None,
        "best_solver_s": best["solver_s"] if best else None,
    }))


if __name__ == "__main__":
    main()
