"""Isolate the 504k CG-chunk worker crash.

The full run's FIRST chunk (while_loop of 25 x [ozaki OTF matvec +
colblock Woodbury apply + vector updates]) crashes the TPU worker at
n=503,982, k=1536, while the standalone ozaki matvec runs (3.85 s).
This probes, in order: (1) standalone colblock apply, (2) matvec+apply
chained once, (3) a 3-iteration while_loop chunk — fetching a scalar
after each stage so the failing stage is unambiguous.

python tools/probe_500k_loop.py [--k 1536] [--tile-budget 1.5e7]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1536)
    ap.add_argument("--tile-budget", default="1.5e7")
    args = ap.parse_args()
    os.environ.setdefault("MLFF_OTF_TILE_BUDGET", args.tile_budget)

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl
    from mlff_tpu.solvers import preconditioners as pc
    from mlff_tpu.solvers.iterative import build_preconditioner
    from mlff_tpu.ops.descriptor import make_spec

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    nt = 18666
    ds, perms = make_benchmark_dataset("ethanol", nt + 60, seed=11,
                                       n_train=nt)
    task = create_task(ds, nt, ds, n_valid=50, sig=10.0, solver="cg",
                       perms=perms)
    task["nystrom_block_cols"] = 768
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10, pairwise=False)
    float(cache.Xqt.ravel()[-1])
    print("cache ok", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    P_apply, inducing, info = build_preconditioner(
        spec, cache, "lev_random", args.k, 1e-10, rng, task=task)
    print("precon built", file=sys.stderr, flush=True)
    pc_fn, pc_state = P_apply.as_op()

    v = jnp.asarray(rng.normal(size=cache.n))
    t0 = time.perf_counter()
    z = pc_fn(pc_state, v)
    print("apply alone:", round(float(z.ravel()[0]), 6),
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    state = knl.ozaki_matvec_state(cache)
    t0 = time.perf_counter()
    q = knl.matvec_psd_ozaki(state, pc_fn(pc_state, v))
    print("matvec(apply):", round(float(q.ravel()[0]), 6),
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    @jax.jit
    def loop3(mv_state, p_state, v0):
        def body(c):
            x, i = c
            z = pc_fn(p_state, x)
            q = knl.matvec_psd_ozaki(mv_state, z)
            return (q / jnp.linalg.norm(q), i + 1)

        return jax.lax.while_loop(lambda c: c[1] < 3, body, (v0, 0))[0]

    t0 = time.perf_counter()
    out = loop3(state, pc_state, v)
    print("while_loop x3:", round(float(out.ravel()[0]), 6),
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
