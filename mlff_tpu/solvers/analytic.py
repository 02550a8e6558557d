"""Closed-form solver: dense Cholesky with LU and lstsq fallbacks.

Rebuild of the reference Analytic solver (reference:
sgdml/solvers/analytic.py:47-208).  The kernel is assembled on device
(tiled, MXU); the O(n^3) factorization runs through host LAPACK (TPU f64
decompositions are emulated; n is moderate whenever a dense solve is viable).

Conventions: PSD system (K + reg I) alpha_psd = y with the reference's fixed
reg = 1e-10 (analytic.py:136 subtracts 1e-10 on the negative-definite K).
The returned alphas are in the PSD convention; the model boundary flips sign
(alphas_ref = -alphas_psd).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

from ..ops import kernel as knl
from ..ops.descriptor import DescriptorSpec
from ..utils.log import get_logger

log = get_logger(__name__)

ANALYTIC_REG = 1e-10  # reference analytic.py:136


def solve_analytic(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    y: np.ndarray,
    reg: float = ANALYTIC_REG,
    return_K: bool = False,
    use_E_cstr: bool = False,
    cprsn_keep_atoms_idxs: np.ndarray | None = None,
):
    """Solve (K + reg I) alpha = y densely.  Returns alpha (PSD convention),
    optionally also the assembled PSD kernel.

    With ``cprsn_keep_atoms_idxs`` the kernel is compressed along symmetric
    degrees of freedom: only the partials of the kept atoms form columns and
    the (n, m) system is solved by least squares
    (reference analytic.py:58-76, 183-193).
    """
    if cprsn_keep_atoms_idxs is not None:
        n_train = cache.n_train
        dim_i = spec.dim_i
        keep_lin = (
            np.arange(dim_i).reshape(spec.n_atoms, 3)[cprsn_keep_atoms_idxs]
        ).ravel()
        col_idxs = (keep_lin[:, None] + np.arange(n_train) * dim_i).T.ravel()
        K_nm = np.asarray(knl.assemble_columns(spec, cache, np.sort(col_idxs)))
        alphas = np.linalg.lstsq(K_nm, y, rcond=-1)[0]
        if return_K:
            return alphas, K_nm
        return alphas

    if use_E_cstr:
        K = np.asarray(knl.assemble_full_ecstr(spec, cache))
    else:
        K = np.asarray(knl.assemble_full(spec, cache))
    A = K + reg * np.eye(K.shape[0])
    try:
        L = scipy.linalg.cho_factor(A, overwrite_a=False, check_finite=False)
        alphas = scipy.linalg.cho_solve(L, y, check_finite=False)
    except np.linalg.LinAlgError:
        log.warning("Cholesky failed; falling back to LU solve")
        try:
            alphas = scipy.linalg.solve(A, y, check_finite=False)
        except np.linalg.LinAlgError:
            log.warning("LU failed; falling back to least squares")
            alphas = np.linalg.lstsq(A, y, rcond=-1)[0]
    if return_K:
        return alphas, K
    return alphas
