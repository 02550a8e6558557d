"""Is an ON-DEVICE f64 m x m Cholesky viable for the Nystrom build?

The build's host round trips (gather->d2h K_mm, host potrf+trtri, h2d W1,
then d2h inner, host chol, h2d W2) cost ~1.5-1.7 s of the 31k headline
build (stage logs in BENCH_r04) plus 2-core host LAPACK time that grows
m^3.  If jnp.linalg.cholesky + triangular inverse on the chip (emulated
f64) runs in <~0.5 s at m = 1536-4096, the m x m factors never leave the
device and both transfers and host LAPACK vanish from the critical path.
Round-3 measured on-device EIGH as hopeless (292 s compile at m=512);
cholesky/trsm are simpler blocked kernels — measure, don't assume.

  python tools/probe_device_chol.py [--m 1536] [--reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1536)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    m = args.m
    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, m))
    M = jnp.asarray(A @ A.T + m * np.eye(m))  # SPD, well-conditioned

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    @jax.jit
    def chol(M):
        return jnp.linalg.cholesky(M)

    @jax.jit
    def chol_inv(M):
        L = jnp.linalg.cholesky(M)
        eye = jnp.eye(M.shape[0], dtype=M.dtype)
        Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return Li.T  # W = L^-T, the whitening factor

    for name, fn in [("chol", chol), ("chol+trtri", chol_inv)]:
        t0 = time.perf_counter()
        r = fn(M)
        float(np.asarray(r)[0, 0])
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn(M)
            float(np.asarray(r)[-1, -1])
            ts.append(time.perf_counter() - t0)
        print(f"{name:12s} m={m}: compile+first {t_compile:.1f}s, "
              f"warm {min(ts) * 1e3:.0f} ms", flush=True)

    # accuracy: W^T M W ~ I
    W = np.asarray(chol_inv(M))
    err = np.abs(W.T @ np.asarray(M) @ W - np.eye(m)).max()
    print(f"whiten accuracy |W^T M W - I|_max = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
