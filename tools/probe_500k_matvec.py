"""Standalone 504k matvec probe: timing + HBM viability per backend.

The f64 OTF matvec crashed the TPU worker inside the CG chunk at n=503,982
(its 8-way-split (tile, M) f64 transients + the 4.1 GB factor exceed HBM).
This probes ONE matvec dispatch per backend outside the loop, cheapest
first, fetching a scalar to synchronize (block_until_ready no-ops on axon).

python tools/probe_500k_matvec.py [--backends ozaki,float64] [--n-train N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=18666)
    ap.add_argument("--backends", default="ozaki,float64")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    nt = args.n_train
    ds, perms = make_benchmark_dataset("ethanol", nt + 60, seed=11,
                                       n_train=nt)
    task = create_task(ds, nt, ds, n_valid=50, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10, pairwise=False)
    float(cache.Xqt.ravel()[-1])
    out = {"n": cache.n, "M": int(cache.Xqt.shape[0])}
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=cache.n))

    results = {}
    for backend in args.backends.split(","):
        if backend == "ozaki":
            state = knl.ozaki_matvec_state(cache)
            fn, st = knl.matvec_psd_ozaki, state
        else:
            fn, st = knl.matvec_psd, cache
        t0 = time.perf_counter()
        y = fn(st, v)
        first = float(y.ravel()[0])
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            y = fn(st, v)
        float(y.ravel()[0])
        t_steady = (time.perf_counter() - t0) / reps
        results[backend] = {"first_s": round(t_first, 2),
                            "steady_s": round(t_steady, 3),
                            "y0": first}
        print(json.dumps({backend: results[backend]}),
              file=sys.stderr, flush=True)
    if len(results) == 2:
        a, b = (np.asarray(knl.matvec_psd_ozaki(knl.ozaki_matvec_state(cache),
                                                v)),
                np.asarray(knl.matvec_psd(cache, v)))
        results["rel_diff"] = float(np.linalg.norm(a - b) / np.linalg.norm(b))
    out.update(results)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
