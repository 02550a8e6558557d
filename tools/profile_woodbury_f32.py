"""f32 / f32-pair Woodbury-apply formulations at (n, m) — bandwidth and
accuracy, vs the current f64 VPU broadcast-reduce.

The f32-pair ("double-single") scheme stores B = Bh + Bl with Bh = f32(B),
Bl = f32(B - Bh); a product B^T v expands to Bh^T vh + Bh^T vl + Bl^T vh
(dropping the ~2^-48 Bl*vl term).  Accuracy is limited by f32 accumulation
over n — measured here against the f64 oracle.

Usage: python tools/profile_woodbury_f32.py [--n 75006] [--m 3840]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402


def timeit(label, fn, args_cycle, iters=8):
    # Measurement protocol for the axon tunnel (see verify skill):
    #   * sync with the buffer METHOD (.block_until_ready()); the module
    #     FUNCTION jax.block_until_ready is a no-op for remote buffers,
    #   * VARY the inputs each call — identical (executable, args)
    #     dispatches are memoized server-side and "run" in ~0.1 ms.
    fn(args_cycle[0]).block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(args_cycle[i % len(args_cycle)])
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:44s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=75006)
    p.add_argument("--m", type=int, default=3840)
    args = p.parse_args()
    n, m = args.n, args.m
    print(f"devices: {jax.devices()}  n={n} m={m}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    B_h = rng.standard_normal((n, m)) / np.sqrt(n)
    v_h = rng.standard_normal(n)
    x_h = rng.standard_normal(m)
    vN = [jnp.asarray(rng.standard_normal(n)) for _ in range(4)]
    xN = [jnp.asarray(rng.standard_normal(m)) for _ in range(4)]
    vN32 = [v.astype(jnp.float32) for v in vN]
    xN32 = [x.astype(jnp.float32) for x in xN]
    u_ref = B_h.T @ v_h
    y_ref = B_h @ x_h

    Bh = jnp.asarray(B_h.astype(np.float32))
    Bl = jnp.asarray((B_h - B_h.astype(np.float32)).astype(np.float32))
    B64 = jnp.asarray(B_h)
    v64 = jnp.asarray(v_h)
    x64 = jnp.asarray(x_h)

    # pure-read bandwidth probes (scale term varies to defeat memoization)
    sums = jax.jit(lambda B, s: jnp.sum(B) * s)
    timeit("read-sum f64 B (2.3 GB)", lambda a: sums(B64, a[0]), vN)
    timeit("read-sum f32 Bh (1.15 GB)", lambda a: sums(Bh, a[0]), vN)

    # current f64 VPU forms (baseline)
    red0 = jax.jit(lambda B, v: jnp.sum(B * v[:, None], axis=0))
    red1 = jax.jit(lambda B, x: jnp.sum(B * x[None, :], axis=1))
    t0 = timeit("f64 reduce axis0 (B^T v)", lambda v: red0(B64, v), vN)
    t1 = timeit("f64 reduce axis1 (B x)", lambda x: red1(B64, x), xN)

    # plain f32 GEMVs on the MXU
    v32 = v64.astype(jnp.float32)
    x32 = x64.astype(jnp.float32)
    gemv_t32 = jax.jit(lambda B, v: v @ B)
    gemv32 = jax.jit(lambda B, x: B @ x)
    timeit("f32 GEMV v @ B (MXU)", lambda v: gemv_t32(Bh, v), vN32)
    timeit("f32 GEMV B @ x (MXU)", lambda x: gemv32(Bh, x), xN32)
    timeit("f32 reduce axis0", lambda v: red0(Bh, v), vN32)
    timeit("f32 reduce axis1", lambda x: red1(Bh, x), xN32)

    # f32-pair 3-pass forms (hi/lo split of B and of the vector)
    @jax.jit
    def pair_bt_v(Bh, Bl, v):
        vh = v.astype(jnp.float32)
        vl = (v - vh.astype(jnp.float64)).astype(jnp.float32)
        u = vh @ Bh + vl @ Bh + vh @ Bl
        return u.astype(jnp.float64)

    @jax.jit
    def pair_b_x(Bh, Bl, x):
        xh = x.astype(jnp.float32)
        xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
        y = Bh @ xh + Bh @ xl + Bl @ xh
        return y.astype(jnp.float64)

    tp0 = timeit("f32-pair 3-GEMV B^T v", lambda v: pair_bt_v(Bh, Bl, v), vN)
    tp1 = timeit("f32-pair 3-GEMV B x", lambda x: pair_b_x(Bh, Bl, x), xN)

    # accuracy vs f64 oracle
    u64 = np.asarray(red0(B64, v64))
    y64 = np.asarray(red1(B64, x64))
    up = np.asarray(pair_bt_v(Bh, Bl, v64))
    yp = np.asarray(pair_b_x(Bh, Bl, x64))
    u32 = np.asarray(gemv_t32(Bh, v32)).astype(np.float64)
    y32 = np.asarray(gemv32(Bh, x32)).astype(np.float64)

    def rel(a, ref):
        return float(np.abs(a - ref).max() / np.abs(ref).max())

    print(f"  accuracy B^T v: f64 {rel(u64, u_ref):.2e}  "
          f"pair {rel(up, u_ref):.2e}  f32 {rel(u32, u_ref):.2e}", flush=True)
    print(f"  accuracy B x:   f64 {rel(y64, y_ref):.2e}  "
          f"pair {rel(yp, y_ref):.2e}  f32 {rel(y32, y_ref):.2e}", flush=True)
    print(f"  speedup vs f64: axis0 {t0/tp0:.2f}x  axis1 {t1/tp1:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
