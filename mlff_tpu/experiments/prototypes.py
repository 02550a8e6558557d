"""Standalone dense prototypes with import-time-style self-tests.

Rebuild of the reference's developer prototypes (reference:
src/tools/cholesky.py:6-95 dense pivoted Cholesky with pivot (un)transforms,
src/tools/custom_cg_solver.py:84-158 dense Woodbury-preconditioned CG,
src/tools/gp.py:34-52 RBF GP regression demo, src/tools/utils.py:161-226 toy
kernel builders).  These are small NumPy references used as oracles and
teaching code; the production implementations live in mlff_tpu.solvers.

The reference's bugs are not replicated (stale 2-tuple unpacking at
custom_cg_solver.py:107, `is not 0` comparisons at :149 — SURVEY.md §7.1).
Self-tests are exposed as ``selftest_*`` functions (called from the test
suite instead of at import time).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.sparse.linalg


def dense_pivoted_cholesky(A: np.ndarray, max_rank: int | None = None):
    """Outer-product pivoted Cholesky of a dense SPD matrix.

    Returns (L, piv) with A[piv][:, piv] ~= L_tri L_tri^T where
    L_tri = L[piv] is lower triangular (reference cholesky.py:32-77)."""
    A = np.asarray(A, dtype=float)
    n = A.shape[0]
    if max_rank is None:
        max_rank = n
    diag = np.diag(A).copy()
    L = np.zeros((n, max_rank))
    chosen = np.zeros(n, dtype=bool)
    piv = []
    for m in range(max_rank):
        p = int(np.argmax(np.where(chosen, -np.inf, diag)))
        if diag[p] <= 0:
            L = L[:, :m]
            break
        piv.append(p)
        lmm = np.sqrt(diag[p])
        col = A[:, p] - L[:, :m] @ L[p, :m]
        newcol = col / lmm
        newcol[chosen] = 0.0
        newcol[p] = lmm
        L[:, m] = newcol
        diag -= newcol**2
        chosen[p] = True
    return L, np.asarray(piv, dtype=int)


def pivot_transformation(M: np.ndarray, piv: np.ndarray, inverse=False):
    """(Un)apply a pivot permutation to rows of M (reference cholesky.py
    pivot/transformation helpers)."""
    order = np.concatenate([piv, np.setdiff1d(np.arange(M.shape[0]), piv)])
    if inverse:
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return M[inv]
    return M[order]


def init_precond_operator(K: np.ndarray, k: int, lam: float):
    """Woodbury preconditioner from a rank-k pivoted Cholesky of dense K
    (reference custom_cg_solver.py:102-123)."""
    L, piv = dense_pivoted_cholesky(K, max_rank=k)
    G = scipy.linalg.cholesky(lam * np.eye(L.shape[1]) + L.T @ L, lower=True)
    T = scipy.linalg.solve_triangular(G, L.T, lower=True)

    def apply_inv(v):
        return (v - T.T @ (T @ v)) / lam

    n = K.shape[0]
    return scipy.sparse.linalg.LinearOperator((n, n), matvec=apply_inv)


def solve_linear_system_woodbury(K: np.ndarray, y: np.ndarray, k: int,
                                 lam: float, tol: float = 1e-6):
    """Dense-K PCG with the Woodbury preconditioner
    (reference custom_cg_solver.py:126-158)."""
    P = init_precond_operator(K, k, lam)
    A = K + lam * np.eye(K.shape[0])
    iters = [0]
    x, info = scipy.sparse.linalg.cg(
        A, y, M=P, rtol=tol, atol=0.0,
        callback=lambda xk: iters.__setitem__(0, iters[0] + 1),
    )
    if info != 0:
        raise RuntimeError("woodbury-preconditioned CG did not converge")
    return x, iters[0]


def rbf_kernel(Xa: np.ndarray, Xb: np.ndarray, lengthscale: float = 1.0):
    """Toy RBF kernel matrix (reference utils.py:161-200 kernel builders)."""
    d2 = ((Xa[:, None, :] - Xb[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * d2 / lengthscale**2)


def gp_regression(X_train, y_train, X_query, lengthscale=1.0, noise=1e-6):
    """Plain GP regression demo (reference gp.py:34-52): posterior mean and
    variance on query points."""
    K = rbf_kernel(X_train, X_train, lengthscale)
    Ks = rbf_kernel(X_query, X_train, lengthscale)
    Kss = rbf_kernel(X_query, X_query, lengthscale)
    L = scipy.linalg.cho_factor(K + noise * np.eye(len(X_train)))
    alpha = scipy.linalg.cho_solve(L, y_train)
    mean = Ks @ alpha
    v = scipy.linalg.cho_solve(L, Ks.T)
    var = np.diag(Kss - Ks @ v)
    return mean, var


def condition_number(K: np.ndarray, lam: float = 0.0) -> float:
    """Spectral condition number diagnostic (reference utils.py:203-226)."""
    w = np.linalg.eigvalsh(K + lam * np.eye(K.shape[0]))
    return float(w.max() / max(w.min(), np.finfo(float).tiny))


def selftest_pivoted_cholesky(seed: int = 0, n: int = 40) -> None:
    """Factor random SPD matrices and verify reconstruction + pivot
    round-trip (the reference runs this at import, cholesky.py:80-95)."""
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n, n))
    A = B @ B.T + n * np.eye(n)
    L, piv = dense_pivoted_cholesky(A)
    assert np.linalg.norm(A - L @ L.T) < 1e-8 * np.linalg.norm(A)
    M = rng.normal(size=(n, 3))
    round_trip = pivot_transformation(
        pivot_transformation(M, piv), piv, inverse=True
    )
    assert np.array_equal(round_trip, M)


def selftest_woodbury(seed: int = 1, n: int = 60) -> None:
    """Woodbury-PCG on a random SPD system (reference
    custom_cg_solver.py:84-99)."""
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(n, n // 2))
    K = B @ B.T
    lam = 1e-4
    y = rng.normal(size=n)
    x, iters = solve_linear_system_woodbury(K, y, k=n // 2, lam=lam)
    resid = np.linalg.norm((K + lam * np.eye(n)) @ x - y)
    assert resid < 1e-4 * np.linalg.norm(y)
    assert iters < n  # preconditioner actually helps
