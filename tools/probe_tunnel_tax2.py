"""Tunnel-tax probe, variant 2: does an in-flight async d2h wedge the next
large dispatch?

Both round-4 bench runs stalled 637-650 s inside the SAME warm-cache
build_cache dispatch that tools/probe_tunnel_tax.py measured at 0.16 s.
The one structural difference: Trainer.train issues
``jnp.zeros(8).copy_to_host_async()`` (preconditioners.warm_host_transfer)
immediately before the build.  This probe reproduces that exact ordering:

  tiny dispatch -> copy_to_host_async -> build_cache (timed)

If build_cache stalls here but not in probe 1, the async d2h is the
trigger and the fix is to force-complete the d2h (or drop it) before the
first large dispatch.  Run: python tools/probe_tunnel_tax2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    out = {}
    import mlff_tpu  # noqa: F401
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.ops import kernel as knl
    from mlff_tpu.solvers import preconditioners as pc

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    jax.block_until_ready(jnp.ones(8) + 1.0)

    t0 = time.perf_counter()
    pc.warm_host_transfer()          # async d2h, in flight
    out["warm_host_transfer_s"] = round(time.perf_counter() - t0, 2)

    ds, perms = make_benchmark_dataset("ethanol", n_samples=1226, seed=11,
                                       n_train=1166)
    task = create_task(ds, 1166, ds, n_valid=50, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    t0 = time.perf_counter()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    jax.block_until_ready(X)
    out["descriptors_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10, pairwise=True)
    t1 = time.perf_counter()
    jax.block_until_ready(cache.Xqt)
    t2 = time.perf_counter()
    out["build_cache"] = {"dispatch_s": round(t1 - t0, 2),
                          "block_s": round(t2 - t1, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
