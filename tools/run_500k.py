"""Ethanol n = 503,982 (n_train = 18,666): the reference's largest archived
scale point.

Reference numbers (/root/reference/data/data/rule_of_thumb/n = 500000/
2022320_0944_precon_size_ethanol_min18666_max18666, cluster node43):
  k/n     iters   t_pre      t_cg       total_time_solve
  1.39%     770   2,218 s    6,775 s    8,993 s   <- optimum (149.9 min)
  0.86%   1,157   1,175 s    8,110 s    9,285 s
  0.53%   1,696     637 s    9,756 s   10,393 s
  0.32%   2,325     373 s   11,906 s   12,279 s
  0.20%   4,681     227 s   22,473 s   22,700 s

Our configuration (single v5e chip, HBM-bounded):
  * difficulty-calibrated synthetic ethanol + the real P = 6 perm group
    (the same workload protocol as bench.py; settings transfer 15.7k->31.4k
    was verified by calibration, transfer to 504k is reported as measured
    iterations vs the archived curve);
  * OTF matvec (pairwise=False — the (N, M) caches alone would be 5.5 GB
    x2 at f64), lev_random, XLA Woodbury apply;
  * k bounded by the post-d2h HBM ceiling: the (n, k) f64 factor is
    4.1 GB at k = 1024 (k/n = 0.20%) — the archived 0.20% point is the
    comparison row;
  * 2-minute checkpoint snapshots -> --ckpt path (resume with --resume).

Usage:
  python tools/run_500k.py [--k 1024] [--maxiter N] [--probe]
      [--ckpt /tmp/eth500k.npz] [--resume]
  --probe: maxiter=20 timing probe (s/iter + build times, no convergence)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_TRAIN = 18666
SIG = 10.0
ARCHIVED = {  # k/n -> (iters, total_time_solve_s)
    0.0139: (770, 8993.2), 0.0086: (1157, 9284.8), 0.0053: (1696, 10392.7),
    0.0032: (2325, 12279.0), 0.0020: (4681, 22700.5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--maxiter", type=int, default=None)
    ap.add_argument("--probe", action="store_true")
    # 'ozaki' is the validated huge-n configuration: the emulated-f64 OTF
    # matvec both crashes the TPU worker inside the CG chunk at this scale
    # and is 368x LESS accurate vs the CPU IEEE-f64 oracle (RESULTS.md)
    ap.add_argument("--matvec", default="ozaki")
    ap.add_argument("--ckpt", default="/tmp/eth500k_ckpt.npz")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-replacement", action="store_true",
                    help="round-4 A/B config; known to fake convergence")
    ap.add_argument("--manufactured", action="store_true",
                    help="manufactured solution y = (K + lam I) alpha*: "
                         "the synthetic Morse labels at this scale load "
                         "near-null kernel directions (||alpha|| ~ 1/lam, "
                         "tol numerically unreachable even in exact f64 — "
                         "measured round 5: true residual 208x ||b|| at "
                         "iteration 50 while the recursion reads 1.1x); "
                         "same precedent as the nanotube benchmark "
                         "(RESULTS.md label honesty) — exercises the "
                         "exact production shapes with a reachable system")
    args = ap.parse_args()

    # leave transient headroom for the resident colblock factor (the
    # default 3e7 budget's tiles OOM-compiled next to a 6+ GB factor)
    os.environ.setdefault("MLFF_OTF_TILE_BUDGET", "1.5e7")

    import jax
    jax.config.update("jax_enable_x64", True)

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.utils.io import save_model

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ds, perms = make_benchmark_dataset("ethanol", n_samples=N_TRAIN + 60,
                                       seed=11, n_train=N_TRAIN)
    task = create_task(ds, N_TRAIN, ds, n_valid=50, sig=SIG,
                       solver="cg", perms=perms)
    task["matvec_dtype"] = args.matvec
    if args.k > 1024:
        # monolithic whiten transients blow TOTAL HBM past k~1024 at this
        # n (17.3 GB needed at k=1536); force column blocks
        task["nystrom_block_cols"] = 768
    # RESIDUAL REPLACEMENT MUST STAY ON (round-5 measured failure): with
    # it disabled, the recursive residual drifts from truth through the
    # 1/lam-amplified apply and "converges" while the TRUE f64 residual
    # sits at 92x ||b|| (943-iteration run, 2026-08-21).  The f64
    # replacement matvec is dispatched HOST-SIDE between CG chunks — the
    # op class that crashes the worker is the f64 matvec inside the
    # compiled chunk, not this standalone dispatch (the same dispatch ran
    # fine as the post-solve verifier in rounds 4-5, and the 158k honest
    # row ran ~17 replacements without incident).  --no-replacement
    # reproduces the round-4 configuration for A/B only.
    if args.no_replacement:
        task["residual_replacement"] = False
    if args.maxiter or args.probe:
        task["solver_maxiter"] = args.maxiter or 20
    n = int(np.asarray(task["F_train"]).size)
    print(f"n = {n}, P = {perms.shape[0]}, k = {args.k} "
          f"(k/n = {100.0 * args.k / n:.2f}%)  [setup "
          f"{time.perf_counter() - t0:.0f}s]", file=sys.stderr, flush=True)

    if args.manufactured:
        import jax.numpy as jnp

        from mlff_tpu.models.gdml import CG_LAM, Trainer as _Tr
        from mlff_tpu.ops import kernel as knl

        tr0 = _Tr()
        spec0, S0, X0, Jc0, P_idx0 = tr0.build_kernel_inputs(task)
        cache0 = knl.build_cache(X0, Jc0, S0, P_idx0, SIG, CG_LAM,
                                 pairwise=False)
        rngm = np.random.default_rng(7)
        alpha_star = rngm.normal(size=n) / np.sqrt(n)
        y_m = np.asarray(knl.matvec_psd(cache0, jnp.asarray(alpha_star)))
        del cache0, X0, Jc0
        task["F_train"] = y_m.reshape(np.asarray(task["F_train"]).shape)
        print(f"manufactured rhs: ||y|| = {np.linalg.norm(y_m):.3e} "
              f"(one OTF matvec)", file=sys.stderr, flush=True)

    if args.resume and os.path.exists(args.ckpt):
        from mlff_tpu.utils.io import load_model
        from mlff_tpu.models.task import create_task_from_model

        m_ck = load_model(args.ckpt)
        task_r = create_task_from_model(m_ck, ds)
        # carry EVERY huge-n task override into the resumed task: dropping
        # residual_replacement re-enables the in-loop f64 backstop that
        # crashes the worker at this scale, and dropping nystrom_block_cols
        # re-hits the measured 17.3 GB monolithic-whiten compile OOM
        for key in ("matvec_dtype", "solver_maxiter", "residual_replacement",
                    "nystrom_block_cols"):
            if key in task:
                task_r[key] = task[key]
        task = task_r
        print(f"resuming from {args.ckpt} at iter "
              f"{int(np.asarray(m_ck['solver_iters']))}",
              file=sys.stderr, flush=True)

    def save_progress(model):
        save_model(args.ckpt, {k: v for k, v in model.items()
                               if not isinstance(v, dict)})
        print(f"  [ckpt] iter {model.get('solver_iters')} -> {args.ckpt}",
              file=sys.stderr, flush=True)

    t1 = time.perf_counter()
    model = Trainer().train(
        task, n_columns=args.k, str_preconditioner="lev_random",
        callback=lambda it, r, eff: print(
            f"  cg it={it} resid={r:.3e} eff={eff} "
            f"[{time.perf_counter() - t1:.0f}s]",
            file=sys.stderr, flush=True),
        save_progr_callback=save_progress,
    )
    wall = time.perf_counter() - t1

    # post-solve TRUE-residual verification: one standalone f64 OTF matvec
    # (survives outside the CG chunk; 10.2 s measured) — the in-loop
    # backstop is disabled at this scale (see above)
    true_rel = None
    try:
        import jax.numpy as jnp

        from mlff_tpu.models.gdml import CG_LAM
        from mlff_tpu.ops import kernel as knl

        tr2 = Trainer()
        spec, S, X, Jc, P_idx = tr2.build_kernel_inputs(task)
        y, y_std, _ = tr2.labels(task)
        cache_v = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]),
                                  CG_LAM, pairwise=False)
        x = jnp.asarray(-np.asarray(model["alphas_F"]))
        r = np.asarray(knl.matvec_psd(cache_v, x)) - y
        true_rel = float(np.linalg.norm(r) / np.linalg.norm(y))
        print(f"true f64 residual: {true_rel:.3e} (tol "
              f"{task.get('solver_tol', 1e-4)})", file=sys.stderr, flush=True)
    except Exception as e:  # verification must not kill a finished run
        print(f"true-residual check failed: {e!r}", file=sys.stderr,
              flush=True)

    t_pre = float(model.get("total_time_preconditioner", np.nan))
    t_cg = float(model.get("total_time_cg", np.nan))
    t_cache = float(model.get("cache_build_s", np.nan))
    iters = int(model["solver_iters"])
    new_iters = iters - int(task.get("solver_iters", 0) or 0)
    kn = args.k / n
    arch_key = min(ARCHIVED, key=lambda p: abs(p - kn) / p)
    arch_iters, arch_solve = ARCHIVED[arch_key]
    solve_s = (t_cache if np.isfinite(t_cache) else 0.0) + t_pre + t_cg
    out = {
        "metric": f"time_to_solution_ethanol_n{n}",
        "value": round(solve_s, 1),
        "unit": "s",
        "workload": "calibrated+perms",
        "converged": bool(model["is_conv"]),
        "iters": iters,
        "k": args.k,
        "k_over_n_pct": round(100 * kn, 3),
        "matvec_dtype": args.matvec,
        "t_cache_build_s": round(t_cache, 1) if np.isfinite(t_cache) else None,
        "t_preconditioner_s": round(t_pre, 1),
        "t_cg_s": round(t_cg, 1),
        "s_per_iter": round(t_cg / max(1, new_iters), 3),
        "wall_s": round(wall, 1),
        "true_residual_rel": true_rel,
        "archived_at_same_kn": {"k_over_n": arch_key, "iters": arch_iters,
                                "total_time_solve_s": arch_solve},
        "vs_archived_best": round(8993.2 / solve_s, 2),
        "vs_archived_same_kn": round(arch_solve / solve_s, 2),
    }
    print(json.dumps(out))
    if model["is_conv"] and not args.probe:
        try:
            os.unlink(args.ckpt)
        except OSError:
            pass


if __name__ == "__main__":
    main()
