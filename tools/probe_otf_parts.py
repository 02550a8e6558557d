"""Per-piece cost breakdown of the OTF ozaki matvec tile at the 504k shapes.

The 504k OTF matvec measures 3.85 s/iter and is believed elementwise-
f64-bound (2.1G exps + per-tile digit slicing — RESULTS.md).  VERDICT r4
next 5 asks for an f32-pair digit-extraction rewrite; before building it,
this probe times each tile ingredient separately on the chip so the
rewrite targets the measured dominators, not the assumed ones.

Pieces, at the production tile shape (t, M) (t = 128 under the 504k
MLFF_OTF_TILE_BUDGET, M = 112k):
  exp64 / sqrt64 / mul64 — f64 elementwise over the tile
  slice7 — ops.ozaki.slice_digits(s=7) over the tile
  gemmD — exact-slice (t, D)x(D, M) product (GEMM1/dist-gram shape)
  gemmD_f64 — same shape through the emulated-f64 matmul (DIST64 gram)
  gemmM — exact-slice (t, M)x(M, D) product (GEMM2/3 shape, segmented)
  horner64 — the 28-term weighted f64 digit-pair accumulation alone

Usage: python tools/probe_otf_parts.py [--t 128] [--m 111996] [--reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, sync, reps):
    # first call compiles; time the following reps
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--m", type=int, default=111996)
    ap.add_argument("--d", type=int, default=36)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mlff_tpu.ops import ozaki

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    t, M, D = args.t, args.m, args.d
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(t, M)))          # tile-shaped f64
    Y = jnp.asarray(rng.normal(size=(t, M)) + 2.0)
    A = jnp.asarray(rng.normal(size=(t, D)))
    Bd = jnp.asarray(rng.normal(size=(D, M)))
    Bm = jnp.asarray(rng.normal(size=(M, D)))

    def sync(r):
        leaves = jax.tree_util.tree_leaves(r)
        float(np.asarray(leaves[0]).ravel()[0])

    s = 7
    A_sl = ozaki.slice_digits(A, axis=1, s=s)
    Bd_sl = ozaki.slice_digits(Bd, axis=0, s=s)
    Bm_sl = ozaki.slice_digits(Bm, axis=0, s=s)
    sync(A_sl); sync(Bd_sl); sync(Bm_sl)

    pieces = {
        "exp64": jax.jit(lambda: jnp.exp(-Y)),
        "sqrt64": jax.jit(lambda: jnp.sqrt(Y)),
        "mul64": jax.jit(lambda: X * Y),
        "slice7": jax.jit(lambda: ozaki.slice_digits(X, axis=1, s=s)),
        "gemmD": jax.jit(
            lambda: ozaki.gemm_presliced(A_sl, Bd_sl)),
        "gemmD_f64": jax.jit(
            lambda: jnp.matmul(A, Bd, precision=jax.lax.Precision.HIGHEST)),
        "gemmM": jax.jit(
            lambda: ozaki.gemm_presliced(
                ozaki.slice_digits(X, axis=1, s=s), Bm_sl)),
    }
    for name, fn in pieces.items():
        dt = timeit(fn, sync, args.reps)
        gb = t * M * 8 / 1e9
        print(f"{name:10s} {dt * 1e3:9.2f} ms   ({gb / max(dt, 1e-9):6.1f} "
              f"GB/s of tile f64)", flush=True)


if __name__ == "__main__":
    main()
