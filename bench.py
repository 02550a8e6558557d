"""Benchmark: PCG iteration time on an ethanol-sized kernel system.

Reproduces the reference's headline per-iteration measurement: ethanol,
n_train = 583, K = 15,741^2 (n = 3 * 9 * 583), 6-element permutation group —
the baseline `time_cg_step` is 0.130 s/iter on a cluster node
(reference: data/data/cg_performance_n=15750/2022-03-17_2333_ethanol_*,
computed at src/tools/create_data.py:129; see BASELINE.md).

Prints ONE JSON line:
  {"metric": "cg_iter_time_ethanol_n15741", "value": <s/iter>,
   "unit": "s/iter", "vs_baseline": <baseline / value>}
"""

import json
import sys
import time

import numpy as np

BASELINE_S_PER_ITER = 0.130
N_TRAIN, N_ATOMS = 583, 9
SIG, LAM = 10.0, 1e-10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ethanol_like_perms():
    """A closed 6-element permutation group (S3 on atoms 0,1,2 — like the
    methyl rotation x mirror symmetry of real ethanol, which also has 6)."""
    import itertools

    perms = []
    for p3 in itertools.permutations([0, 1, 2]):
        perm = np.arange(N_ATOMS)
        perm[:3] = p3
        perms.append(perm)
    return np.stack(perms)


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache is configured by the package import below
    import jax.numpy as jnp

    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.ops import descriptor as dsc
    from mlff_tpu.ops import kernel as knl
    from mlff_tpu.solvers import preconditioners as pc
    from mlff_tpu.solvers.cg import PCGSolver

    log("devices:", jax.devices())

    ds = make_dataset("ethanol", n_samples=N_TRAIN, seed=7)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    R = jnp.asarray(ds["R"])

    t0 = time.perf_counter()
    X, Jc = dsc.descriptors_from_R(spec, R)
    P_idx = jnp.asarray(dsc.desc_perms(ethanol_like_perms()), dtype=jnp.int32)
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    cache.A_exp.block_until_ready()
    log(f"cache built in {time.perf_counter() - t0:.2f}s  "
        f"(n={cache.n}, M={cache.Xqt.shape[0]}, D={spec.dim})")

    # Woodbury preconditioner with k/n = 10%.  The factor values are
    # synthetic: the benchmark metric is time PER CG ITERATION, which
    # depends only on the operator shapes (matvec + two (k, n) contractions
    # + vector ops), not on the factor's numerical content.  Real
    # preconditioner-build times are measured separately
    # (tools/bench_time_to_solution.py, RESULTS.md) — building here would
    # couple the timing metric to multi-minute remote-compile variance.
    t0 = time.perf_counter()
    k = int(0.10 * cache.n)
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.normal(size=(k, cache.n)) / np.sqrt(cache.n))
    P = pc.WoodburyPreconditioner(
        T=pc._pad_factor_rows(T), lam=jnp.asarray(LAM)
    )
    log(f"woodbury operator (k={k}) set up in {time.perf_counter() - t0:.2f}s")

    y = np.asarray(ds["F"], dtype=np.float64).ravel()
    y /= y.std()
    b = jnp.asarray(y)

    matvec = (lambda c, v: knl.matvec_psd(c, v), cache)

    # warmup (compile) — one solver instance so the timed run reuses the
    # compiled chunk executable
    CHUNK = 50
    solver = PCGSolver(matvec, precon=P, chunk=CHUNK)
    t0 = time.perf_counter()
    warm = solver.solve(b, tol=0.0, maxiter=CHUNK)
    log(f"warmup {warm.num_iters} iters (incl. compile) in "
        f"{time.perf_counter() - t0:.2f}s")

    # timed run: fixed iteration count (tol=0), measuring pure per-iteration
    # cost — the baseline time_cg_step is the same quantity
    n_iter = 150
    t0 = time.perf_counter()
    res = solver.solve(b, tol=0.0, maxiter=n_iter)
    elapsed = time.perf_counter() - t0
    iters = max(res.num_iters, 1)
    s_per_iter = elapsed / iters
    log(f"{iters} iterations in {elapsed:.2f}s -> {s_per_iter*1e3:.2f} ms/iter")

    print(json.dumps({
        "metric": "cg_iter_time_ethanol_n15741",
        "value": round(s_per_iter, 6),
        "unit": "s/iter",
        "vs_baseline": round(BASELINE_S_PER_ITER / s_per_iter, 2),
    }))


if __name__ == "__main__":
    main()
