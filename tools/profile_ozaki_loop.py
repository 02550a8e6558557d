"""Why is the ozaki matvec 8 ms standalone but ~190 ms inside the CG loop?

Isolates the loop-compilation effect: times (a) the raw jitted matvec,
(b) a lax.scan of 25 chained matvecs (the while_loop-free analog of the
chunked CG body), (c) a lax.while_loop of 25 chained matvecs (exactly the
CG chunk's control flow), each per-iteration.  Also A/Bs the digit-pair
GEMM shape: per-pair matmuls vs weight-grouped concatenated GEMMs.

python tools/profile_ozaki_loop.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=5, warmup=2):
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
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    ds, perms = make_benchmark_dataset("ethanol", 1226, seed=11, n_train=1166)
    task = create_task(ds, 1166, ds, n_valid=50, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    jax.block_until_ready(cache.Xqt)
    state = knl.ozaki_matvec_state(cache)
    jax.block_until_ready(state.Ae1_sl[1][0])

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=cache.n))

    out = {}
    out["raw_ozaki_ms"] = round(1e3 * timeit(
        knl.matvec_psd_ozaki, state, v), 2)
    out["raw_f64_ms"] = round(1e3 * timeit(knl.matvec_psd, cache, v), 2)

    N_CH = 25

    @jax.jit
    def scan_oz(state, v0):
        def body(c, _):
            return knl.matvec_psd_ozaki(state, c) / jnp.linalg.norm(c), None
        return jax.lax.scan(body, v0, None, length=N_CH)[0]

    @jax.jit
    def scan_f64(cache, v0):
        def body(c, _):
            return knl.matvec_psd(cache, c) / jnp.linalg.norm(c), None
        return jax.lax.scan(body, v0, None, length=N_CH)[0]

    @jax.jit
    def while_oz(state, v0):
        def cond(c):
            return c[1] < N_CH
        def body(c):
            x, i = c
            return (knl.matvec_psd_ozaki(state, x) / jnp.linalg.norm(x), i + 1)
        return jax.lax.while_loop(cond, body, (v0, 0))[0]

    out["scan_ozaki_ms_per_iter"] = round(
        1e3 * timeit(scan_oz, state, v) / N_CH, 2)
    out["scan_f64_ms_per_iter"] = round(
        1e3 * timeit(scan_f64, cache, v) / N_CH, 2)
    out["while_ozaki_ms_per_iter"] = round(
        1e3 * timeit(while_oz, state, v) / N_CH, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
