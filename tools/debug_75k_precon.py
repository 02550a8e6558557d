"""Diagnose the n=75k preconditioner-quality collapse.

Checks, at a given n_train:
  1. grouped column assembly vs the compressed per-column oracle,
  2. K_mm gather/unpack vs directly assembled rows,
  3. spectral bound of the Woodbury factor: eigenvalues of T T^T must be
     <= 1 (T^T T = B^T (B B^T + lam)^+ B); anything above 1 makes
     P^-1 = (I - T^T T)/lam INDEFINITE and breaks CG.
"""

import argparse
import sys

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import scipy.linalg  # noqa: E402

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402
from mlff_tpu.solvers import preconditioners as pc  # noqa: E402

N_ATOMS, SIG, LAM = 9, 5.0, 1e-10


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=2778)
    p.add_argument("--k", type=int, default=3753)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_dataset("ethanol", n_samples=args.n_train, seed=11)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    P_idx = jnp.asarray(np.arange(spec.dim)[None, :])  # trivial group
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    n = cache.n
    rng = np.random.default_rng(0)
    print(f"n = {n}", file=sys.stderr, flush=True)

    # --- 1. grouped assembly vs compressed oracle on a small subset
    idxs_small = np.sort(rng.choice(n, 32, replace=False))
    cols_fast = np.asarray(knl.assemble_columns(spec, cache, idxs_small))
    cols_oracle = np.asarray(
        knl.assemble_columns_compressed(spec, cache, idxs_small))
    err = np.abs(cols_fast - cols_oracle).max() / np.abs(cols_oracle).max()
    print(f"1. grouped-vs-oracle col rel err: {err:.3e}", flush=True)

    # --- 2. full-k assembly + K_mm gather check
    idxs = np.sort(rng.choice(n, args.k, replace=False))
    K_nm = knl.assemble_columns(spec, cache, idxs)
    K_nm.block_until_ready()
    m = args.k
    tril = jnp.asarray(np.tril_indices(m))
    K_mm = pc._unpack_sym(
        np.asarray(pc._gather_rows_tril(K_nm, jnp.asarray(idxs), tril)), m)
    sub = rng.choice(m, 8, replace=False)
    cols_sub = np.asarray(
        knl.assemble_columns_compressed(spec, cache, idxs[np.sort(sub)]))
    K_mm_direct = cols_sub[idxs, :]  # (m, 8)
    err2 = np.abs(K_mm[:, np.sort(sub)] - K_mm_direct).max() / np.abs(K_mm_direct).max()
    print(f"2. K_mm gather rel err: {err2:.3e}", flush=True)

    # --- 3. factorization spectral bound
    T = pc._nystrom_factor_eigh(K_nm, idxs, LAM, rank_tol=1e-10)
    T.block_until_ready()
    n_chunks = max(1, -(-T.shape[1] // pc._GEMM_ROW_CHUNK))
    padn = n_chunks * pc._GEMM_ROW_CHUNK - T.shape[1]
    Tp = jnp.concatenate(
        [T, jnp.zeros((m, padn), T.dtype)], axis=1) if padn else T
    G_T = pc._gram_nm(Tp.T, n_chunks)   # (m, m) = T T^T
    w = scipy.linalg.eigh(np.asarray(G_T), eigvals_only=True)
    print(f"3. eig(T T^T): min {w[0]:.3e}  max {w[-1]:.12f}", flush=True)
    over = np.sum(w > 1.0)
    print(f"   eigenvalues > 1: {over} (max excess {max(w[-1]-1.0, 0):.3e})",
          flush=True)
    # the induced most-negative eigenvalue of P^-1 is -(max_excess)/lam
    if w[-1] > 1:
        print(f"   => P^-1 indefinite: most negative eig ~ "
              f"{-(w[-1]-1.0)/LAM:.3e}", flush=True)


if __name__ == "__main__":
    main()
