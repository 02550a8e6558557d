"""Per-iteration CG cost breakdown at nanotube shapes (A=370, D=68,265).

Times, warm: packed matvec, square-layout matvec, Woodbury apply at the
rule-of-thumb k, and the fused PCG chunk per-iteration cost.

Usage: python tools/profile_nanotube_iter.py [--n-train 28] [--k 4488]
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
from mlff_tpu.solvers.cg import PCGSolver  # noqa: E402

SIG, LAM = 10.0, 1e-10


def timeit(label, fn, iters=10):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:34s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=28)
    p.add_argument("--k", type=int, default=4488)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("nanotube", n_samples=args.n_train, seed=3)
    A = ds["R"].shape[1]
    spec = dsc.make_spec(A)
    S = dsc.incidence_matrix(spec)
    R = jnp.asarray(ds["R"])
    X, Jc = dsc.descriptors_from_R(spec, R)
    perms = np.arange(A)[None, :]
    P_idx = jnp.asarray(dsc.desc_perms(perms))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM, R=R)
    sq = knl.build_cache_square(R, perms, SIG, LAM)
    n = cache.n
    print(f"n = {n}, k = {args.k}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n))

    timeit("matvec_psd (packed)", lambda: knl.matvec_psd(cache, v))
    timeit("matvec_psd_square", lambda: knl.matvec_psd_square(sq, v))

    t0 = time.perf_counter()
    idxs = pc.select_random(n, args.k, rng)
    cols = knl.assemble_columns(spec, cache, idxs)
    cols.block_until_ready()
    print(f"  square assembly k={args.k}: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    P = pc.nystrom_preconditioner(spec, cache, idxs, LAM)
    jax.block_until_ready(P.B)
    print(f"  nystrom build total: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    apply_jit = jax.jit(pc.woodbury_split_apply)
    timeit("woodbury apply", lambda: apply_jit(P, v))
    try:
        P64 = pc.df64_from_split(P)
        apply64 = jax.jit(pc.df64_woodbury_apply)
        timeit("df64 woodbury apply", lambda: apply64(P64, v))
    except Exception as e:  # pallas unavailable off-TPU
        print(f"  df64 apply unavailable: {e}", file=sys.stderr)

    y = v / jnp.linalg.norm(v)

    def pcg_rate(label, precon):
        solver = PCGSolver((knl.matvec_psd_square, sq), precon, chunk=50)
        res = solver.solve(y, tol=1e-300, maxiter=50)
        t0 = time.perf_counter()
        res = solver.solve(y, tol=1e-300, maxiter=50)
        dt = (time.perf_counter() - t0) / res.num_iters
        print(f"  pcg {label}: {dt*1e3:8.3f} ms/iter",
              file=sys.stderr, flush=True)
        return dt

    t_all = pcg_rate("(square mv + xla apply)  ", P)
    t_mv = pcg_rate("(square mv, no precon)   ", None)
    print(f"  => apply cost {1e3*(t_all - t_mv):.1f} ms/iter",
          file=sys.stderr, flush=True)
    try:
        P64 = pc.df64_from_split(P)  # consumes P.B
        pcg_rate("(square mv + df64 apply) ", P64)
    except Exception as e:
        print(f"  df64 unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
