"""Per-iteration CG cost breakdown at a given system size.

Times, separately and warm:
  * the implicit kernel matvec (K + lam I) v,
  * the Woodbury preconditioner apply,
  * one fused PCG chunk (per-iteration amortized),
for the ethanol-shaped system used by tools/bench_time_to_solution.py.

Usage: python tools/profile_cg_iter.py [--n-train 1166] [--k 2049] [--chunks 25 50 100 200]
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

N_ATOMS, SIG, LAM = 9, 5.0, 1e-10


def timeit(label, fn, iters=20):
    fn().block_until_ready()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label:34s} {dt*1e3:8.3f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=1166)
    p.add_argument("--k", type=int, default=2049)
    p.add_argument("--chunks", type=int, nargs="+", default=[25, 50, 100, 200])
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("ethanol", n_samples=args.n_train, seed=11)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(N_ATOMS)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    n = cache.n
    print(f"n = {n}, k = {args.k}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(n))

    t_mv = timeit("matvec_psd", lambda: knl.matvec_psd(cache, v))

    idxs = pc.select_random(n, args.k, rng)
    P = pc.nystrom_preconditioner(spec, cache, idxs, LAM)
    apply_jit = jax.jit(pc.woodbury_split_apply)
    t_pc = timeit("woodbury apply", lambda: apply_jit(P, v))

    y = v / jnp.linalg.norm(v)
    for chunk in args.chunks:
        solver = PCGSolver((knl.matvec_psd, cache), P, chunk=chunk)
        # unreachable threshold => the chunk runs all its iterations
        res = solver.solve(y, tol=1e-300, maxiter=chunk)
        t0 = time.perf_counter()
        res = solver.solve(y, tol=1e-300, maxiter=chunk)
        dt = (time.perf_counter() - t0) / res.num_iters
        print(f"  pcg chunk={chunk:4d}: {dt*1e3:8.3f} ms/iter "
              f"(mv+pc = {(t_mv+t_pc)*1e3:.3f})",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
