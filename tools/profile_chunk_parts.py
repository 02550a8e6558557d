"""Isolate per-iteration costs INSIDE the real chunked PCG loop.

Micro-op timings through the axon tunnel are unreliable (async sync lies,
server-side result caching).  The chunked `lax.while_loop` PCG body chains
data dependencies across iterations inside ONE dispatch, so its wall-clock
divided by iterations is trustworthy.  This times the full body, then the
body with the preconditioner replaced by identity, then with the matvec
replaced by identity — isolating matvec / apply / vector-op costs.

Usage: python tools/profile_chunk_parts.py [--n-train 2778] [--k 3753]
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


def _identity(state, v):
    return v


def run_case(label, matvec, precon, y, iters=200):
    solver = PCGSolver(matvec, precon, chunk=100)
    solver.solve(y, tol=1e-300, maxiter=iters)  # warm/compile
    t0 = time.perf_counter()
    res = solver.solve(y, tol=1e-300, maxiter=iters)
    dt = (time.perf_counter() - t0) / max(res.num_iters, 1)
    print(f"  {label:44s} {dt*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=2778)
    p.add_argument("--k", type=int, default=3753)
    p.add_argument("--perms", action="store_true",
                   help="use the benchmark ethanol permutation group (P=6)")
    p.add_argument("--matvec-dtype", default="float64",
                   help="float64 | float32 (downcast GEMM operands) | "
                        "mixed (centered f32 GEMMs, f64 chunk accumulation)")
    p.add_argument("--apply-impl", default="xla", help="xla | df64")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("ethanol", n_samples=args.n_train, seed=11)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    if args.perms:
        from mlff_tpu.data.synthetic import benchmark_perms
        from mlff_tpu.ops.descriptor import desc_perms

        perms = benchmark_perms("ethanol")
        P_idx = jnp.asarray(desc_perms(perms))
    else:
        P_idx = jnp.asarray(np.arange(spec.dim)[None, :])
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    n = cache.n
    rng = np.random.default_rng(0)
    idxs = np.sort(rng.choice(n, args.k, replace=False))
    P = pc.nystrom_preconditioner(spec, cache, idxs, LAM)
    if args.apply_impl == "df64":
        P = pc.df64_from_split(P)
    y = jnp.asarray(rng.standard_normal(n))
    mv_fn, mv_cache = knl.matvec_psd, cache
    if args.matvec_dtype == "float32":
        mv_cache = knl.downcast_cache(cache)
    elif args.matvec_dtype == "mixed":
        mv_fn = knl.matvec_psd_mixed
    print(f"n = {n}, P = {cache.n_perms}, k -> m_pad = {P.Bh.shape[1] if hasattr(P, 'Bh') else P.B.shape[1]}",
          file=sys.stderr, flush=True)

    t_full = run_case("full (matvec + apply)", (mv_fn, mv_cache), P, y)
    t_mv = run_case("matvec only (P = I)", (mv_fn, mv_cache), None, y)
    t_pc = run_case("apply only (A = I)", (_identity, None), P, y)
    t_none = run_case("vector ops only (A = P = I)",
                      (_identity, None), None, y)
    print(f"  => matvec ~{(t_mv-t_none)*1e3:.2f} ms, "
          f"apply ~{(t_pc-t_none)*1e3:.2f} ms, "
          f"vec+overhead ~{t_none*1e3:.2f} ms "
          f"(sum {((t_mv-t_none)+(t_pc-t_none)+t_none)*1e3:.2f} "
          f"vs full {t_full*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
