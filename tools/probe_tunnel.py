"""Measure axon-tunnel transfer characteristics that the preconditioner
build depends on:

  * d2h and h2d bandwidth at the build's actual sizes (m x m f64 blocks),
  * the flat first-d2h setup cost and whether copy_to_host_async overlaps
    it with device compute,
  * whether two queued d2h transfers pipeline.

Usage: python tools/probe_tunnel.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    dev = jax.devices()[0]

    # --- h2d warm-up (device placement) -------------------------------
    t0 = time.perf_counter()
    small = jax.device_put(np.ones(8), dev)
    small.block_until_ready()
    log(f"first h2d (64 B): {time.perf_counter() - t0:.2f}s")

    # device-side compute to overlap against: a chunked f64 GEMM ~10 s
    a = jax.device_put(np.random.default_rng(0).standard_normal((8192, 2048)),
                       dev)
    a.block_until_ready()

    @jax.jit
    def burn(x):
        def body(i, acc):
            return acc + (x @ (x.T @ acc[:, :64]))[:, :64].sum() * 1e-20 + acc
        return jax.lax.fori_loop(0, 30, body, x)

    burn(a).block_until_ready()  # compile
    t0 = time.perf_counter()
    burn(a).block_until_ready()
    t_burn = time.perf_counter() - t0
    log(f"burn kernel: {t_burn:.2f}s")

    # --- first d2h: async issue + overlapped compute -------------------
    t0 = time.perf_counter()
    small.copy_to_host_async()
    t_async = time.perf_counter() - t0
    out = burn(a)
    t1 = time.perf_counter()
    x = np.asarray(small)
    t_fetch = time.perf_counter() - t1
    out.block_until_ready()
    t_total = time.perf_counter() - t0
    log(f"first d2h async issue: {t_async:.3f}s; fetch-after-burn-dispatch: "
        f"{t_fetch:.2f}s; total(with burn): {t_total:.2f}s  "
        f"[if fetch << 10s the setup overlapped]")

    # --- steady-state bandwidth ----------------------------------------
    for mb in (8, 32, 113):
        n_elem = mb * 1024 * 1024 // 8
        arr_h = np.random.default_rng(1).standard_normal(n_elem)
        t0 = time.perf_counter()
        arr_d = jax.device_put(arr_h, dev)
        arr_d.block_until_ready()
        t_h2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = np.asarray(arr_d)
        t_d2h = time.perf_counter() - t0
        log(f"{mb:4d} MB: h2d {t_h2d:6.2f}s ({mb / t_h2d:6.1f} MB/s)   "
            f"d2h {t_d2h:6.2f}s ({mb / t_d2h:6.1f} MB/s)")
        del back

    # --- does an async d2h overlap device compute? ---------------------
    big = jax.device_put(
        np.random.default_rng(2).standard_normal(4 * 1024 * 1024), dev)
    big.block_until_ready()  # 32 MB
    t0 = time.perf_counter()
    big.copy_to_host_async()
    t_issue = time.perf_counter() - t0
    out = burn(a)
    t1 = time.perf_counter()
    got = np.asarray(big)
    t_fetch = time.perf_counter() - t1
    out.block_until_ready()
    t_all = time.perf_counter() - t0
    log(f"32 MB async d2h under burn: issue {t_issue:.3f}s, fetch "
        f"{t_fetch:.2f}s, total {t_all:.2f}s vs burn-alone {t_burn:.2f}s "
        f"[total ~ burn-alone => overlapped]")

    # --- do two queued d2h pipeline? -----------------------------------
    b1 = jax.device_put(
        np.random.default_rng(3).standard_normal(4 * 1024 * 1024), dev)
    b2 = jax.device_put(
        np.random.default_rng(4).standard_normal(4 * 1024 * 1024), dev)
    jax.block_until_ready((b1, b2))
    t0 = time.perf_counter()
    g1 = np.asarray(b1)
    t1 = time.perf_counter() - t0
    g2 = np.asarray(b2)
    t2 = time.perf_counter() - t0 - t1
    log(f"serial d2h 32+32 MB: {t1:.2f}s + {t2:.2f}s")
    t0 = time.perf_counter()
    b1.copy_to_host_async()
    b2.copy_to_host_async()
    g1 = np.asarray(b1)
    g2 = np.asarray(b2)
    log(f"queued-async d2h 32+32 MB: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
