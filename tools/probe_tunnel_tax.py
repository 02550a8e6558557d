"""Characterize the axon tunnel's first-dispatch tax.

TODO.md (round 3) records that the FIRST large dispatch of a process
intermittently blocks 3-10 min (same shape measured 0.2s/38s/176s/290s/
585s), even on a persistent-compile-cache hit.  This probe separates the
candidate mechanisms for the bench's 90.8 s "kernel cache build":

  phase 0: tiny dispatch (1-elem add)           -> client/device session setup
  phase 1: UNRELATED large f32 matmul (4096^2)  -> per-process first-LARGE tax?
  phase 2: UNRELATED large f64 matmul           -> f64-emulation executable tax?
  phase 3: the bench's real build_cache shape   -> what remains after warm-up

For each phase, the jit call (host-side trace/compile/executable-load) and
block_until_ready (device execution) are timed separately.  If phase 1/2
absorb the tax and phase 3 is fast, a problem-independent warm-up dispatch
can front-load the stall outside the solve window; if the tax re-appears at
phase 3, it is per-executable and only the seed cache/fewer-executables help.

Usage: python tools/probe_tunnel_tax.py  (writes one JSON line to stdout)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    t1 = time.perf_counter()
    import jax

    jax.block_until_ready(r)
    t2 = time.perf_counter()
    out[label] = {"dispatch_s": round(t1 - t0, 2), "block_s": round(t2 - t1, 2)}
    print(f"{label}: dispatch {t1-t0:.2f}s block {t2-t1:.2f}s",
          file=sys.stderr, flush=True)
    return r


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    out = {}
    t0 = time.perf_counter()
    import mlff_tpu  # noqa: F401  (configures the persistent cache)
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.ops import kernel as knl
    out["import_s"] = round(time.perf_counter() - t0, 2)
    print("devices:", jax.devices(), file=sys.stderr)

    t("tiny", lambda: jnp.ones(8) + 1.0, out)

    a32 = jnp.ones((4096, 4096), jnp.float32)
    t("large_f32_matmul", lambda: jax.jit(jnp.matmul)(a32, a32), out)

    a64 = jnp.ones((2048, 2048), jnp.float64)
    t("large_f64_matmul", lambda: jax.jit(lambda x: x @ x)(a64), out)

    ds, perms = make_benchmark_dataset("ethanol", n_samples=1226, seed=11,
                                       n_train=1166)
    task = create_task(ds, 1166, ds, n_valid=50, sig=10.0, solver="cg",
                      perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    jax.block_until_ready(X)

    t("build_cache", lambda: knl.build_cache(
        X, Jc, S, P_idx, 10.0, 1e-10, pairwise=True), out)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
