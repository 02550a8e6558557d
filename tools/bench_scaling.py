"""Scaling study: per-iteration matvec cost vs kernel size on one chip.

Produces the BASELINE.json-style metrics (effective nnz/s of the implicit
K matvec, time per CG iteration) across kernel sizes n = 3*9*n_train for the
ethanol-shaped system.  Timing goes through the real PCG chunk loop (robust
against XLA algebraic simplification of microbenchmarks).

Usage: python tools/bench_scaling.py [--sizes 146 292 583 1166 2333]
"""

import argparse
import itertools
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402
from mlff_tpu.solvers.cg import PCGSolver  # noqa: E402
from mlff_tpu.solvers.preconditioners import WoodburyPreconditioner  # noqa: E402

N_ATOMS, SIG, LAM = 9, 10.0, 1e-10


def ethanol_perms():
    perms = []
    for p3 in itertools.permutations([0, 1, 2]):
        p = np.arange(N_ATOMS)
        p[:3] = p3
        perms.append(p)
    return np.stack(perms)


def measure(n_train: int, k_frac: float = 0.1, iters: int = 100) -> dict:
    ds = make_dataset("ethanol", n_samples=n_train, seed=7)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    P_idx = jnp.asarray(dsc.desc_perms(ethanol_perms()), dtype=jnp.int32)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    t0 = time.perf_counter()
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    cache.A_exp.block_until_ready()
    t_cache = time.perf_counter() - t0

    n = cache.n
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=n))
    k = max(1, int(k_frac * n))
    T = jnp.asarray(rng.normal(size=(k, n)) / np.sqrt(n))
    P = WoodburyPreconditioner(T=T, lam=jnp.asarray(LAM))

    solver = PCGSolver((lambda c, v: knl.matvec_psd(c, v), cache),
                       precon=P, chunk=50)
    solver.solve(b, tol=0.0, maxiter=50)  # compile + warm
    t0 = time.perf_counter()
    solver.solve(b, tol=0.0, maxiter=iters)
    s_per_iter = (time.perf_counter() - t0) / iters

    return {
        "n_train": n_train,
        "n": n,
        "k": k,
        "cache_build_s": round(t_cache, 3),
        "s_per_iter": round(s_per_iter, 6),
        "ms_per_iter": round(s_per_iter * 1e3, 3),
        # effective nnz/s of the implicit n x n operator
        "matvec_nnz_per_s": round(n * n / s_per_iter, 0),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="*",
                   default=[146, 292, 583, 1166])
    p.add_argument("--iters", type=int, default=100)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    results = []
    for n_train in args.sizes:
        r = measure(n_train, iters=args.iters)
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


if __name__ == "__main__":
    main()
