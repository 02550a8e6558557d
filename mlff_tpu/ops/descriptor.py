"""Inverse-pairwise-distance descriptors and their compressed Jacobians.

TPU-native redesign of the reference descriptor engine
(reference: src/sGDML/sgdml/utils/desc.py:44-483).  Differences:

  * Fully vectorized jnp, jit/vmap over geometries — no multiprocessing pool.
  * The Jacobian is kept in compressed (D, 3) form (each descriptor entry
    depends on exactly two atoms) and both Jacobian contractions are expressed
    as dense matmuls against a static +/-1 incidence matrix ``S`` (D, A), so
    they run on the MXU instead of scatter/gather units:
        d_desc_dot_vec:  w_q = J_q . (v[col_q] - v[row_q])  ==  sum(J * (S @ v))
        vec_dot_d_desc:  out_b = sum_q f_q J_q (S[q, b])    ==  S^T @ (J * f)
    (reference: desc.py:394-428 uses fancy-indexed scatter instead).
  * PBC minimum-image supported via lattice matrix + inverse.

Conventions (kept identical to the reference so kernels agree entry-by-entry):
  * descriptor ordering = np.tril_indices(A, -1) pairs (row > col),
  * pdiff_q = r[row_q] - r[col_q],  J_comp[q] = pdiff_q / pdist_q**3,
  * the implied full Jacobian is J_full[q, col_q] = +J_comp[q],
    J_full[q, row_q] = -J_comp[q]  (reference desc.py:444-462).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DescriptorSpec(NamedTuple):
    """Static (hashable on host) metadata describing the descriptor layout."""

    n_atoms: int
    rows: np.ndarray  # (D,) first atom of each pair (tril row,  i > j)
    cols: np.ndarray  # (D,) second atom of each pair (tril col)

    @property
    def dim(self) -> int:
        return self.rows.shape[0]

    @property
    def dim_i(self) -> int:
        return 3 * self.n_atoms


def make_spec(n_atoms: int) -> DescriptorSpec:
    rows, cols = np.tril_indices(n_atoms, -1)
    return DescriptorSpec(n_atoms=n_atoms, rows=rows, cols=cols)


def incidence_matrix(spec: DescriptorSpec, dtype=jnp.float64) -> jnp.ndarray:
    """Static (D, A) matrix with S[q, col_q] = +1, S[q, row_q] = -1.

    Encodes the sparsity of the full descriptor Jacobian; both compressed
    Jacobian contractions become matmuls against it.
    """
    D, A = spec.dim, spec.n_atoms
    S = np.zeros((D, A), dtype=np.float64)
    S[np.arange(D), spec.cols] = 1.0
    S[np.arange(D), spec.rows] = -1.0
    return jnp.asarray(S, dtype=dtype)


def _min_image(diffs: jnp.ndarray, lat: jnp.ndarray, lat_inv: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image convention (reference desc.py:44-77)."""
    c = diffs @ lat_inv.T
    return diffs - jnp.round(c) @ lat.T


def pair_diffs(spec: DescriptorSpec, r: jnp.ndarray, lat_and_inv=None) -> jnp.ndarray:
    """(D, 3) pairwise differences r[row_q] - r[col_q] for one geometry (A, 3)."""
    d = r[np.asarray(spec.rows)] - r[np.asarray(spec.cols)]
    if lat_and_inv is not None:
        d = _min_image(d, lat_and_inv[0], lat_and_inv[1])
    return d


def descriptor(
    spec: DescriptorSpec,
    r: jnp.ndarray,
    lat_and_inv=None,
    interact_cut_off: float | None = None,
    cut_off_slope: float = 10.0,
):
    """Descriptor (D,) and compressed Jacobian (D, 3) of one geometry (A, 3).

    With ``interact_cut_off`` set, a sigmoid interaction cutoff multiplies the
    descriptor (reference desc.py:136-144); its Jacobian here is the *exact*
    derivative of the cutoff descriptor (the reference's cutoff-Jacobian
    formula at desc.py:184-198 divides by the difference vector elementwise,
    which we do not replicate).
    """
    diffs = pair_diffs(spec, r, lat_and_inv)
    dist = jnp.linalg.norm(diffs, axis=-1)

    if interact_cut_off is None:
        desc = 1.0 / dist
        # d(1/dist)/d r_col = +diffs / dist^3  -> stored compressed.
        j_comp = diffs / (dist**3)[:, None]
    else:
        c = 1.0 - jax.nn.sigmoid(cut_off_slope * (dist - interact_cut_off))
        desc = c / dist
        # d(c(d)/d)/dd = (c'(d) d - c(d)) / d^2 ; unit vector = diffs / dist.
        c_prime = -cut_off_slope * c * (1.0 - c)
        dd = (c_prime * dist - c) / dist**2
        # gradient wrt r_col is -(dd) * unit; compressed form stores +d/dr_col.
        j_comp = (-dd / dist)[:, None] * diffs
    return desc, j_comp


def descriptors_from_R(
    spec: DescriptorSpec,
    R: jnp.ndarray,
    lat_and_inv=None,
    interact_cut_off: float | None = None,
):
    """Batched descriptors: R (M, A, 3) -> (M, D), (M, D, 3).  jit+vmap."""
    fn = functools.partial(
        descriptor, spec, lat_and_inv=lat_and_inv, interact_cut_off=interact_cut_off
    )
    return jax.vmap(fn)(R.reshape(-1, spec.n_atoms, 3))


def d_desc_dot_vec(Jc: jnp.ndarray, S: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Right-multiply compressed Jacobian(s) by 3A-vector(s).

    Jc (..., D, 3), vecs (..., A, 3) -> (..., D):
        w_q = J_q . (v[col_q] - v[row_q])
    (reference desc.py:394-405).  S @ v computes the pair differences.
    """
    sv = jnp.einsum("qa,...ax->...qx", S, vecs)
    return jnp.sum(Jc * sv, axis=-1)


def vec_dot_d_desc(Jc: jnp.ndarray, S: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply: map descriptor-space cotangent f (..., D) back to atoms.

    Returns (..., A, 3): out[b] = sum_q f_q J_q S[q, b]
    (reference desc.py:408-428).
    """
    jf = Jc * f[..., None]  # (..., D, 3)
    return jnp.einsum("qa,...qx->...ax", S, jf)


def inflate_jacobian(Jc: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """Full (D, 3A) Jacobian from compressed (D, 3) form
    (reference desc.py:444-462 ``d_desc_from_comp``)."""
    full = S[:, :, None] * Jc[:, None, :]  # (D, A, 3)
    return full.reshape(Jc.shape[0], -1)


def perm_to_desc_perm(perm: np.ndarray) -> np.ndarray:
    """Convert an atom permutation (A,) to a descriptor permutation (D,).

    Applying the result to a descriptor equals permuting atoms first
    (reference desc.py:360-389).  Host-side NumPy; runs once per task.
    """
    n = len(perm)
    rest = np.zeros((n, n))
    rest[np.tril_indices(n, -1)] = np.arange((n**2 - n) // 2)
    rest = rest + rest.T
    rest = rest[perm, :][:, perm]
    return rest[np.tril_indices(n, -1)].astype(int)


def desc_perms(perms: np.ndarray) -> np.ndarray:
    """Stack of descriptor permutations (P, D) for atom permutations (P, A).

    Row p satisfies:  desc(permuted geometry p) = desc[desc_perms[p]].
    This is the index array the kernel uses to symmetrize over the recovered
    permutation group (replaces the reference's flattened ``tril_perms_lin``
    bookkeeping, train.py:783-790).
    """
    return np.stack([perm_to_desc_perm(p) for p in np.asarray(perms)])
