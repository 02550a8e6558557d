"""Probe: grouped column assembly at aspirin n=158k, k=6144, in isolation.

Reproduces the HBM OOM seen in the full pipeline; prints live device
buffers before/after each phase to attribute the footprint.

RESOLVED (2026-08-19): the OOM is the axon runtime's one-time ~6-7 GB
d2h staging reserve — the lev phase's first host round trip drops the
allocatable ceiling to ~8 GB, under the 7.77 GB (158004, 6144) f64
K_nm.  Assembly itself is clean (fits in 0.6 s on a fresh process with
no prior d2h).  See utils/hbm.py and RESULTS.md.
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.models.task import create_task  # noqa: E402
from mlff_tpu.models.gdml import Trainer  # noqa: E402
from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def live():
    tot = 0
    big = []
    for a in jax.live_arrays():
        tot += a.nbytes
        if a.nbytes > 1e8:
            big.append((a.shape, str(a.dtype), a.nbytes / 1e9))
    return tot / 1e9, big


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    n_train = 2508
    log(f"devices: {jax.devices()}")
    ds = make_dataset("aspirin", n_samples=n_train + 60, seed=11)
    task = create_task(ds, n_train, ds, n_valid=50, sig=5.0,
                       solver="cg", use_sym=False)
    tr = Trainer()
    spec = dsc.make_spec(len(task["z"]))
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(task["R_train"]))
    S = dsc.incidence_matrix(spec)
    P_idx = jnp.asarray(dsc.desc_perms(np.asarray(task["perms"])))
    cache = knl.build_cache(X, Jc, S, P_idx, 5.0, 1e-10,
                            pairwise=tr._pairwise_fits(X.shape[0],
                                                       P_idx.shape[0]))
    jax.block_until_ready(cache.X)
    log(f"cache built; live = {live()}")

    rng = np.random.default_rng(0)
    reserve = None
    if "--reserve" in sys.argv:
        k_pad = -(-k // 512) * 512
        reserve = jnp.zeros((cache.n, k_pad), dtype=jnp.float64)
        reserve.block_until_ready()
        log(f"reserved {reserve.nbytes/1e9:.1f} GB up front")
    if "--lev" in sys.argv:
        from mlff_tpu.solvers import preconditioners as pc

        n_inducing_pts = max(2, int(round(k / spec.dim_i)))
        lev, order = pc.leverage_scores(
            spec, cache, 1e-10, n_inducing_pts, rng)
        cols = pc.select_by_leverage("lev_random", lev, order, k, rng)
        log(f"lev phase done; live = {live()}")
        if "--uniform-cols" in sys.argv:
            cols = np.sort(rng.choice(cache.n, size=k, replace=False))
        pts = np.unique(np.asarray(cols) // spec.dim_i)
        log(f"cols: uniq_points = {len(pts)}")
        if "--clear-caches" in sys.argv:
            jax.clear_caches()
            log(f"cleared jit caches; live = {live()}")
        if "--sleep" in sys.argv:
            time.sleep(15)
            log("slept 15s")
    if reserve is not None:
        del reserve
        log("dropped the reserve buffer")
    if "--bisect" in sys.argv:
        for gb in (2, 4, 6, 8, 10, 12, 14):
            try:
                z = jnp.zeros((int(gb * 1e9 / 8),), dtype=jnp.float64)
                z.block_until_ready()
                del z
                log(f"alloc {gb} GB: ok")
            except Exception as e:  # noqa: BLE001
                log(f"alloc {gb} GB: FAILED ({type(e).__name__})")
                break
        return
    else:
        cols = np.sort(rng.choice(cache.n, size=k, replace=False))
    t0 = time.perf_counter()
    K_nm = knl.assemble_columns(spec, cache, cols)
    K_nm.block_until_ready()
    log(f"assembled (n={cache.n}, k={k}) in {time.perf_counter()-t0:.1f}s; "
        f"live = {live()}")


if __name__ == "__main__":
    main()
