"""Experiment: PCG iteration count with a reduced-precision Woodbury apply.

The preconditioner apply dominates per-iteration cost at large n (41 of
52 ms at n=75k: two passes over the f64 (n, m) factor at ~100 GB/s under
f64-emulated elementwise ops).  An f32 apply halves the bytes and drops the
emulation overhead — IF CG tolerates ~5e-7 relative apply error (fresh,
near-symmetric noise; the CG state and matvec stay f64).

Usage: python tools/exp_f32_apply.py [--n-train 1166] [--k 2049]
"""

import argparse
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402
from mlff_tpu.solvers import preconditioners as pc  # noqa: E402
from mlff_tpu.solvers.cg import pcg  # noqa: E402

N_ATOMS, SIG, LAM = 9, 5.0, 1e-10


def f32_apply(state, v):
    B32, W2, lam = state
    v32 = v.astype(jnp.float32)
    u = v32 @ B32                                   # (m,) f32 GEMV
    x = (W2 @ (W2.T @ u.astype(jnp.float64)))       # small, f64
    y = B32 @ x.astype(jnp.float32)                 # (n,) f32 GEMV
    return (v - y.astype(jnp.float64)) / lam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=1166)
    p.add_argument("--k", type=int, default=2049)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("ethanol", n_samples=args.n_train, seed=11)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    P_idx = jnp.asarray(np.arange(spec.dim)[None, :])
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    n = cache.n
    rng = np.random.default_rng(0)
    lev, order = pc.leverage_scores(spec, cache, LAM, 25, rng)
    idxs = pc.select_by_leverage("lev_random", lev, order, args.k, rng)
    y = np.asarray(ds["F"], dtype=np.float64).reshape(-1)[:n]
    y = jnp.asarray(y / y.std())

    P = pc.nystrom_preconditioner(spec, cache, idxs, LAM)
    print("built", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    r64 = pcg((knl.matvec_psd, cache), y, precon=P, tol=1e-4, maxiter=8000)
    t64 = time.perf_counter() - t0
    print(f"f64 apply: iters {r64.num_iters} conv {r64.converged} "
          f"{t64:.1f}s ({t64/max(r64.num_iters,1)*1e3:.1f} ms/iter)", flush=True)

    state32 = (P.B.astype(jnp.float32), P.W2, P.lam)
    t0 = time.perf_counter()
    r32 = pcg((knl.matvec_psd, cache), y, precon=(f32_apply, state32),
              tol=1e-4, maxiter=8000)
    t32 = time.perf_counter() - t0
    print(f"f32 apply: iters {r32.num_iters} conv {r32.converged} "
          f"{t32:.1f}s ({t32/max(r32.num_iters,1)*1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
