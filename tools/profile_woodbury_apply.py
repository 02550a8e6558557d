"""Micro-benchmark of Woodbury-apply formulations at a given (n, m).

The split apply u = B^T v; y = B x is the per-iteration cost at large n.
Variants:
  a) VPU broadcast-reduce over axis 0 (current B^T v form)
  b) VPU broadcast-reduce over axis 1 (current B x form)
  c/d) the same two as dot_general GEMVs (MXU, f64-emulated)
  e/f) GEMVs against a pre-transposed copy of B (layout experiment)
  g) fused full apply (current woodbury_split_apply)

Usage: python tools/profile_woodbury_apply.py [--n 75006] [--m 3840]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from mlff_tpu.solvers import preconditioners as pc  # noqa: E402


def timeit(label, fn, iters=10):
    fn().block_until_ready()
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:40s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=75006)
    p.add_argument("--m", type=int, default=3840)
    args = p.parse_args()
    n, m = args.n, args.m
    print(f"devices: {jax.devices()}  n={n} m={m} "
          f"B bytes={n*m*8/1e9:.2f} GB", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, m)) / np.sqrt(n))
    Bt = jnp.asarray(np.asarray(B).T.copy())
    v = jnp.asarray(rng.standard_normal(n))
    x = jnp.asarray(rng.standard_normal(m))

    red0 = jax.jit(lambda B, v: jnp.sum(B * v[:, None], axis=0))
    red1 = jax.jit(lambda B, x: jnp.sum(B * x[None, :], axis=1))
    gemv_t = jax.jit(lambda B, v: v @ B)
    gemv = jax.jit(lambda B, x: B @ x)

    timeit("a) reduce axis0 (B^T v, VPU)", lambda: red0(B, v))
    timeit("b) reduce axis1 (B x, VPU)", lambda: red1(B, x))
    timeit("c) GEMV v @ B (MXU)", lambda: gemv_t(B, v))
    timeit("d) GEMV B @ x (MXU)", lambda: gemv(B, x))
    timeit("e) reduce axis1 on B^T (B^T v alt)", lambda: red1(Bt, v))
    timeit("f) GEMV B^T @ v (MXU, transposed copy)", lambda: gemv(Bt, v))

    P = pc.WoodburySplitPreconditioner(
        B=B, W2=jnp.asarray(rng.standard_normal((m, m)) / m),
        lam=jnp.asarray(1e-10))
    apply_jit = jax.jit(pc.woodbury_split_apply)
    timeit("g) full split apply", lambda: apply_jit(P, v))

    # f32 variants for reference (bandwidth ceiling check)
    B32 = B.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    red0_32 = jax.jit(lambda B, v: jnp.sum(B * v[:, None], axis=0))
    timeit("h) reduce axis0 f32", lambda: red0_32(B32, v32))
    gemv32 = jax.jit(lambda B, x: B @ x)
    timeit("i) GEMV B @ x f32 (MXU)", lambda: gemv32(B32, x32))
    timeit("j) GEMV v @ B f32 (MXU)", lambda: jax.jit(lambda B, v: v @ B)(B32, v32))


if __name__ == "__main__":
    main()
