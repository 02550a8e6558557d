"""Time-to-solution on the AIMS-nanotube-sized system (d = 370).

The nanotube is the reference's hardest headline system: at n = 31,400 its
recorded optimal PCG solve time is 17.9 min (data/rule_of_thumb.csv row 6;
BASELINE.md).  n = 3 * 370 * n_train, so n_train = 28 gives n = 31,080.
The reference's AIMS nanotube has no symmetries beyond identity
(find_perms on the real geometry; synthetic random geometry likewise), so
the permutation group is trivial here.

Usage: python tools/bench_nanotube.py [--n-train 28] [--precon lev_random]
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
from mlff_tpu.experiments.rule_of_thumb import get_params, rule_of_thumb  # noqa: E402
from mlff_tpu.models.gdml import Trainer  # noqa: E402
from mlff_tpu.models.task import create_task  # noqa: E402

REFERENCE_MIN_N31400 = 17.9  # data/rule_of_thumb.csv row 6 (optimal_runtime_min)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=28)
    p.add_argument("--sig", type=float, default=10.0)
    p.add_argument("--precon", default="cholesky_panel",
                   help="best measured strategy for this system (the reference's own archived sweep shows pivoted Cholesky needs ~2x fewer iterations than lev_random on the nanotube)")
    p.add_argument("--k", type=int, default=None,
                   help="preconditioner rank (default: rule of thumb)")
    p.add_argument("--apply-impl", default=None,
                   help="xla (default) or df64 (Pallas double-f32 kernels)")
    p.add_argument("--labels", default="manufactured",
                   choices=["manufactured", "dataset"],
                   help="manufactured: y = (K + lam I) alpha* for a random "
                        "moderate alpha* — the synthetic random-blob "
                        "geometry's Morse forces put weight in the kernel's "
                        "~zero eigendirections, making ||alpha|| ~ 1/lam and "
                        "the tol=1e-4 system numerically unreachable even in "
                        "exact f64 (the REAL nanotube's physical forces are "
                        "smooth).  Manufactured labels exercise the solver "
                        "at exactly the production (n, d, D, k) shapes with "
                        "a reachable system.")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("nanotube", n_samples=args.n_train + 12, seed=3)
    task = create_task(ds, args.n_train, ds, n_valid=10, sig=args.sig,
                       solver="cg", use_sym=False)
    n = int(np.asarray(task["F_train"]).size)
    if args.apply_impl:
        task["apply_impl"] = args.apply_impl
    if args.labels == "manufactured":
        import jax.numpy as jnp
        from mlff_tpu.ops import descriptor as dsc
        from mlff_tpu.ops import kernel as knl

        spec = dsc.make_spec(int(len(task["z"])))
        S = dsc.incidence_matrix(spec)
        X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(task["R_train"]))
        P_idx = jnp.asarray(np.arange(spec.dim)[None, :])
        cache = knl.build_cache(X, Jc, S, P_idx, args.sig, 1e-10)
        rng = np.random.default_rng(5)
        alpha_star = jnp.asarray(rng.standard_normal(n))
        y = np.asarray(knl.matvec_psd(cache, alpha_star))
        # feed through the standard pipeline: train() uses
        # y = F_train.ravel()/std and solves the PSD system (K + lam I) a =
        # y (models/gdml.py labels()) — so F_train := (K+lam I) alpha* gives
        # the manufactured system directly
        task["F_train"] = y.reshape(np.asarray(task["F_train"]).shape)
        del cache
    m, k_unity, _ = get_params("nanotube")
    k_rot = rule_of_thumb(n, k_unity, m)
    k = args.k or k_rot
    print(f"n = {n}, rule-of-thumb k = {k_rot}, using k = {k}",
          file=sys.stderr, flush=True)

    def progress(it, resid, eff):
        print(f"  cg it={it} resid={resid:.3e} eff={eff}",
              file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    model = Trainer().train(
        task, n_columns=k, str_preconditioner=args.precon,
        callback=progress,
    )
    total = time.perf_counter() - t0
    t_pre = float(model.get("total_time_preconditioner", np.nan))
    t_cg = float(model.get("total_time_cg", np.nan))
    solver_s = t_pre + t_cg
    out = {
        "metric": f"time_to_solution_nanotube_n{n}",
        "value": round(solver_s, 2),
        "unit": "s",
        "converged": bool(model["is_conv"]),
        "iters": int(model["solver_iters"]),
        "k": k,
        "t_preconditioner_s": round(t_pre, 2),
        "t_cg_s": round(t_cg, 2),
        "wall_total_s": round(total, 2),
        "vs_baseline": round(REFERENCE_MIN_N31400 * 60 / solver_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
