"""Stage-by-stage profile of the Nystrom eigh factorization at a given
(n, m) — identifies whether device GEMMs, d2h/h2d tunnel transfers, or host
eighs dominate the preconditioner-build time.

Usage: python tools/profile_factorization.py [--n 31482] [--m 2049]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import scipy.linalg  # noqa: E402

from mlff_tpu.solvers import preconditioners as pc  # noqa: E402


def timed(label, fn, repeat=2):
    out = None
    for i in range(repeat):
        t0 = time.perf_counter()
        out = fn()
        if hasattr(out, "block_until_ready"):
            out.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"  {label:34s} run{i}: {dt:7.3f}s", file=sys.stderr, flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=31482)
    p.add_argument("--m", type=int, default=2049)
    args = p.parse_args()
    n, m = args.n, args.m
    lam = 1e-10

    print(f"devices: {jax.devices()}  n={n} m={m}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # synthetic low-rank-ish PSD-column structure, f64
    K_nm_h = rng.standard_normal((n, m)) / np.sqrt(n)
    idxs = np.sort(rng.choice(n, size=m, replace=False))

    chunk = pc._GEMM_ROW_CHUNK
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    K_nm = jnp.asarray(K_nm_h)
    if pad:
        K_nm = jnp.concatenate(
            [K_nm, jnp.zeros((pad, m), K_nm.dtype)], axis=0)
    K_nm.block_until_ready()

    idxs_dev = jnp.asarray(idxs)
    tril = jnp.asarray(np.tril_indices(m))

    packed = timed("gather K_mm tril (device)",
                   lambda: pc._gather_rows_tril(K_nm, idxs_dev, tril))
    packed_h = timed("d2h packed m(m+1)/2",
                     lambda: np.asarray(packed))
    K_mm = pc._unpack_sym(packed_h, m)
    w1 = V1 = None

    def host_eigh():
        nonlocal w1, V1
        w1, V1 = scipy.linalg.eigh(K_mm.copy(), driver="evd")
        return None
    timed("host eigh evd (m x m)", host_eigh)

    W1_h = V1 * (1.0 / np.sqrt(np.abs(w1) + 1e-8))[None, :]
    W1 = timed("h2d W1 (m x m)", lambda: jnp.asarray(W1_h))

    Bt = None

    def whiten():
        nonlocal Bt
        Bt = pc._whiten_nm(jnp.array(K_nm), W1, n_chunks)
        return Bt
    timed("GEMM whiten K_nm @ W1", whiten)

    timed("GEMM gram B^T B (tril out)",
          lambda: pc._gram_nm_tril(Bt, tril, n_chunks))
    timed("GEMM project (B W2)^T",
          lambda: pc._project_factor_nm(jnp.array(Bt), W1, n_chunks))

    print("done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
