"""A/B the CG matvec backends at bench scale on hardware.

One process, one tunnel lottery: builds the bench operator (calibrated
ethanol n = 31,482, P = 6), then times REPEATED matvec dispatches and a
maxiter-capped PCG run per backend:

  float64  — XLA f64-emulated GEMMs (the r3 production default)
  ozaki    — exact-slice bf16 digit GEMMs (ops/ozaki.py, ~2^-48)
  mixed    — centered f32 chunk-accumulated (diverges at conv., timing only)

Reports ms/matvec, ms/iter inside the chunked loop, and the ozaki-vs-f64
output agreement.  python tools/profile_ozaki_matvec.py [--n-train 1166]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_fn(fn, *args, reps=20, warmup=3):
    # NOTE: on axon remote buffers NEITHER jax.block_until_ready nor the
    # .block_until_ready() method actually blocks (measured: a ~8 ms
    # computation "times" at 0.03 ms with both).  Only a host fetch
    # synchronizes: fetch one scalar of the output.
    for _ in range(warmup):
        float(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=1166)
    ap.add_argument("--k", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    ds, perms = make_benchmark_dataset("ethanol", args.n_train + 60, seed=11,
                                       n_train=args.n_train)
    task = create_task(ds, args.n_train, ds, n_valid=50, sig=10.0,
                       solver="cg", perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    t0 = time.perf_counter()
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    jax.block_until_ready(cache.Xqt)
    print(f"cache build: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    out = {"n": cache.n, "M": int(cache.Xqt.shape[0])}
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=cache.n))

    # --- raw matvec timings
    t0 = time.perf_counter()
    state = knl.ozaki_matvec_state(cache)
    jax.block_until_ready(state.Ae1_sl[1][0])
    out["ozaki_slice_setup_s"] = round(time.perf_counter() - t0, 2)

    y64 = np.asarray(knl.matvec_psd(cache, v))
    yoz = np.asarray(knl.matvec_psd_ozaki(state, v))
    out["ozaki_vs_f64_rel"] = float(
        np.linalg.norm(yoz - y64) / np.linalg.norm(y64))

    out["matvec_f64_ms"] = round(
        1e3 * time_fn(knl.matvec_psd, cache, v), 2)
    out["matvec_ozaki_ms"] = round(
        1e3 * time_fn(knl.matvec_psd_ozaki, state, v), 2)
    cache32 = knl.downcast_cache(cache)
    out["matvec_mixed_ms"] = round(
        1e3 * time_fn(knl.matvec_psd_mixed, cache, v), 2)
    out["matvec_f32_ms"] = round(
        1e3 * time_fn(knl.matvec_psd, cache32, v), 2)
    print(json.dumps(out), file=sys.stderr, flush=True)

    # --- in-loop iteration times (preconditioned, maxiter-capped)
    for backend in ("float64", "ozaki"):
        t = dict(task, matvec_dtype=backend, solver_maxiter=args.iters)
        t0 = time.perf_counter()
        model = Trainer().train(t, n_columns=args.k,
                                str_preconditioner="lev_random")
        wall = time.perf_counter() - t0
        t_cg = float(model.get("total_time_cg", np.nan))
        iters = int(model["solver_iters"])
        out[f"loop_{backend}"] = {
            "iters": iters, "t_cg_s": round(t_cg, 2),
            "ms_per_iter": round(1e3 * t_cg / max(1, iters), 2),
            "resid": float(model.get("solver_resid", np.nan)),
            "t_pre_s": round(float(model.get(
                "total_time_preconditioner", np.nan)), 2),
            "wall_s": round(wall, 1),
        }
        print(json.dumps({backend: out[f"loop_{backend}"]}),
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
