"""Independent convergence check for the n=75k k-sweep surprise (k=2048
converging in ~1/3 the iterations of k=3753): train, then recompute the
TRUE relative residual ||(K+lam I)a - y|| / ||y|| through the matvec
operator, independent of the CG loop's recurrence residual.

Usage: python tools/check_75k_solution.py [--k 2048] [--n-train 2778]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.models.gdml import Trainer, CG_LAM  # noqa: E402
from mlff_tpu.models.task import create_task  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=2778)
    p.add_argument("--k", type=int, default=2048)
    args = p.parse_args()

    ds = make_dataset("ethanol", n_samples=args.n_train + 60, seed=11)
    task = create_task(ds, args.n_train, ds, n_valid=50, sig=5.0,
                       solver="cg", use_sym=False)
    trainer = Trainer()
    t0 = time.perf_counter()
    model = trainer.train(task, n_columns=args.k,
                          str_preconditioner="lev_random")
    print(f"train: {time.perf_counter() - t0:.1f}s  iters="
          f"{int(model['solver_iters'])}  conv={bool(model['is_conv'])}",
          file=sys.stderr, flush=True)

    # rebuild the operator exactly as the solver saw it
    task2 = dict(task)
    task2["lam"] = CG_LAM
    spec, S, X, Jc, P_idx = trainer.build_kernel_inputs(task2)
    y, y_std, _ = trainer.labels(task2)
    cache = knl.build_cache(X, Jc, S, P_idx, float(task2["sig"]), CG_LAM)

    # solver convention: alphas_psd solves (K + lam I) a = y/std; the model
    # stores alphas_F = -alphas_psd * ... check both signs/scales
    a = jnp.asarray(np.asarray(model["alphas_F"], dtype=np.float64))
    yv = jnp.asarray(y)  # labels() returns y already normalized by y_std
    for label, av in (("alphas_F", a), ("-alphas_F", -a)):
        r = knl.matvec_psd(cache, av) - yv
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(yv))
        print(f"{label}: true relative residual = {rel:.3e}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
