"""Accuracy + speed of the Pallas df64 GEMV kernels on hardware.

Timing is done by CHAINING applies (output feeds the next input), making
the measurement immune to the tunnel's async-sync and result-caching traps
(see verify skill).

Usage: python tools/profile_df64_kernels.py [--n 75006] [--m 3840]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from mlff_tpu.ops import df64, pallas_df64 as pdf  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=75006)
    p.add_argument("--m", type=int, default=3840)
    args = p.parse_args()
    n_pad = -(-args.n // pdf.TILE_N) * pdf.TILE_N
    m_pad = -(-args.m // pdf.TILE_M) * pdf.TILE_M
    print(f"devices: {jax.devices()} n_pad={n_pad} m_pad={m_pad}",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    B = np.zeros((n_pad, m_pad))
    B[: args.n, : args.m] = rng.standard_normal((args.n, args.m)) / np.sqrt(args.n)
    v = np.zeros(n_pad)
    v[: args.n] = rng.standard_normal(args.n)
    x = np.zeros(m_pad)
    x[: args.m] = rng.standard_normal(args.m)

    Bh, Bl = df64.split_f64(jnp.asarray(B))
    Bh.block_until_ready()
    v_d, x_d = jnp.asarray(v), jnp.asarray(x)

    # accuracy
    u = np.asarray(pdf.df64_bt_v(Bh, Bl, v_d))
    y = np.asarray(pdf.df64_b_x(Bh, Bl, x_d))
    u_ref, y_ref = B.T @ v, B @ x
    print(f"bt_v rel err: {np.abs(u-u_ref).max()/np.abs(u_ref).max():.2e}",
          flush=True)
    print(f"b_x rel err:  {np.abs(y-y_ref).max()/np.abs(y_ref).max():.2e}",
          flush=True)

    # chained speed: u -> pad to n via b_x -> u ...
    @jax.jit
    def chain(Bh, Bl, v, steps=10):
        def body(i, v):
            u = pdf.df64_bt_v(Bh, Bl, v)
            y = pdf.df64_b_x(Bh, Bl, u)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, steps, body, v)

    out = chain(Bh, Bl, v_d)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = chain(Bh, Bl, v_d)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"pair (bt_v + b_x): {dt*1e3:.2f} ms "
          f"(f64 XLA baseline ~30 ms at this shape)", flush=True)

    # f64 XLA baseline, same chained protocol
    B64 = jnp.asarray(B)
    @jax.jit
    def chain64(B, v, steps=10):
        def body(i, v):
            u = jnp.sum(B * v[:, None], axis=0)
            y = jnp.sum(B * u[None, :], axis=1)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, steps, body, v)
    out = chain64(B64, v_d)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = chain64(B64, v_d)
    out.block_until_ready()
    dt64 = (time.perf_counter() - t0) / 10
    print(f"f64 XLA pair:      {dt64*1e3:.2f} ms  -> speedup {dt64/dt:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
