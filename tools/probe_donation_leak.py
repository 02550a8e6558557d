"""Probe: do donated jit buffers leak HBM under the axon runtime?

Repeatedly calls a donated-identity jit on a 2 GB buffer, then bisects
how much HBM can still be allocated.

VERDICT (2026-08-19, measured with the chip otherwise idle): donation
does NOT leak — 12+ GB allocatable afterwards.  The capacity loss that
motivated this probe is the runtime's one-time ~6-7 GB d2h staging
reserve (see utils/hbm.py and RESULTS.md "Axon runtime memory model");
`float(x[-1])` below is a d2h, so a naive read of this probe conflates
the two.  Keep measurements single-process: concurrent processes on the
shared tunnel chip corrupt both timings and bisection results.
"""

import sys
from functools import partial

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@partial(jax.jit, donate_argnums=(0,))
def bump(x):
    return x + 1.0


def bisect(label):
    hi_ok = 0
    for gb in (2, 4, 6, 8, 10, 12, 14):
        try:
            z = jnp.zeros((int(gb * 1e9 / 8),), dtype=jnp.float64)
            z.block_until_ready()
            del z
            hi_ok = gb
        except Exception:  # noqa: BLE001
            break
    log(f"{label}: largest OK alloc = {hi_ok} GB")


def main():
    log(f"devices: {jax.devices()}")
    x = jnp.zeros((int(2e9 / 8),), dtype=jnp.float64)
    x.block_until_ready()
    for i in range(4):
        x = bump(x)
        x.block_until_ready()
        log(f"donated call {i} done")
    log(f"x[-1] = {float(x[-1])} (expect 4.0)")
    del x
    bisect("after 4 donated calls on a 2 GB buffer")


if __name__ == "__main__":
    main()
