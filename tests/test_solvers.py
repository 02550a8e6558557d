"""Solver stack: PCG scipy-parity, Woodbury preconditioner correctness,
pivoted Cholesky vs a NumPy oracle, Nyström/leverage/eig preconditioners."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg

from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.solvers import preconditioners as pc
from mlff_tpu.solvers.cg import pcg
from mlff_tpu.solvers.pivoted_cholesky import pivoted_cholesky

SIG, LAM = 10.0, 1e-10


def _kernel_setup(n_atoms=4, n_train=10, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    return spec, cache


@pytest.fixture(scope="module")
def setup():
    return _kernel_setup()


def _dense_system(spec, cache):
    K = np.asarray(knl.assemble_full(spec, cache))
    return K + LAM * np.eye(K.shape[0])


def test_pcg_matches_scipy_iterates():
    """Same operator, same rtol => same iteration count (+-1) and solution
    as scipy.sparse.linalg.cg (on a moderately conditioned SPD system; the
    raw kernel is too ill-conditioned for unpreconditioned CG)."""
    rng = np.random.default_rng(1)
    n = 120
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = (Q * np.geomspace(1.0, 1e4, n)) @ Q.T
    b = rng.normal(size=n)
    A_dev = jnp.asarray(A)

    matvec = lambda v: A_dev @ v
    res = pcg(matvec, jnp.asarray(b), tol=1e-6, maxiter=10 * n, chunk=16)

    iters_scipy = [0]
    x_sp, info = scipy.sparse.linalg.cg(
        A, b, rtol=1e-6, atol=0.0, maxiter=10 * n,
        callback=lambda xk: iters_scipy.__setitem__(0, iters_scipy[0] + 1),
    )
    assert info == 0
    assert res.converged
    # fp summation orders differ (device vs LAPACK); identical algorithms can
    # drift a few iterations apart after hundreds of steps
    assert abs(res.num_iters - iters_scipy[0]) <= max(2, 0.03 * iters_scipy[0])
    np.testing.assert_allclose(res.x, x_sp, rtol=1e-3, atol=1e-8)
    assert np.linalg.norm(A @ res.x - b) <= 1.1e-6 * np.linalg.norm(b)


def test_pcg_matches_scipy_preconditioned_on_kernel(setup):
    """On the real (ill-conditioned) kernel system with the same Nyström
    preconditioner, our PCG and scipy's take the same number of iterations."""
    spec, cache = setup
    A = _dense_system(spec, cache)
    n = A.shape[0]
    b = np.random.default_rng(4).normal(size=n)

    P = pc.nystrom_preconditioner(spec, cache, np.sort(
        np.random.default_rng(0).choice(n, n // 3, replace=False)), LAM)
    T = np.asarray(P.fused_T())
    M_dense = scipy.sparse.linalg.LinearOperator(
        (n, n), matvec=lambda v: (v - T.T @ (T @ v)) / LAM
    )

    matvec = lambda v: knl.matvec_psd(cache, v)
    res = pcg(matvec, jnp.asarray(b), precon=P, tol=1e-4, maxiter=10 * n)

    iters_scipy = [0]
    x_sp, info = scipy.sparse.linalg.cg(
        A, b, M=M_dense, rtol=1e-4, atol=0.0, maxiter=10 * n,
        callback=lambda xk: iters_scipy.__setitem__(0, iters_scipy[0] + 1),
    )
    assert info == 0
    assert res.converged
    # the raw kernel's condition number is ~1e12+: iteration counts in this
    # regime are sensitive to fp summation order, so allow a wider band
    assert abs(res.num_iters - iters_scipy[0]) <= max(5, 0.2 * iters_scipy[0])


def test_pcg_preconditioned_converges_faster(setup):
    spec, cache = setup
    A = _dense_system(spec, cache)
    n = A.shape[0]
    b = np.random.default_rng(2).normal(size=n)
    matvec = lambda v: knl.matvec_psd(cache, v)

    plain = pcg(matvec, jnp.asarray(b), tol=1e-4, maxiter=300)

    fac, _ = pivoted_cholesky(spec, cache, max_rank=n // 2)
    P = pc.woodbury_from_factor(fac.L, LAM)
    precond = pcg(matvec, jnp.asarray(b), precon=P, tol=1e-4, maxiter=300)

    assert precond.converged
    assert precond.num_iters < max(plain.num_iters, 300 if not plain.converged else 0)
    np.testing.assert_allclose(A @ precond.x, b, rtol=1e-3, atol=1e-8)


def test_woodbury_apply_matches_dense_inverse(setup):
    spec, cache = setup
    rng = np.random.default_rng(3)
    n = cache.n
    L = rng.normal(size=(n, 7))
    lam = 1e-3
    P = pc.woodbury_from_factor(jnp.asarray(L), lam)
    v = rng.normal(size=n)
    dense = L @ L.T + lam * np.eye(n)
    np.testing.assert_allclose(
        np.asarray(P(jnp.asarray(v))), np.linalg.solve(dense, v), rtol=1e-8
    )


def test_pivoted_cholesky_matches_numpy_oracle(setup):
    spec, cache = setup
    K = _dense_system(spec, cache)  # with ridge: columns include +lam
    k = 20
    res, info = pivoted_cholesky(spec, cache, max_rank=k)
    # oracle mirrors the reference's mixed convention: seed diag without
    # ridge, extracted columns with ridge
    diag0 = np.diag(K) - LAM
    L_np, piv_np = _np_pivoted_cholesky_mixed(K, diag0, k)
    np.testing.assert_array_equal(np.asarray(res.pivots), piv_np)
    np.testing.assert_allclose(np.asarray(res.L), L_np, rtol=1e-8, atol=1e-10)


def _np_pivoted_cholesky_mixed(K_with_ridge, diag0, max_rank):
    n = K_with_ridge.shape[0]
    diag = diag0.copy()
    L = np.zeros((n, max_rank))
    chosen = np.zeros(n, dtype=bool)
    pivots = []
    for m in range(max_rank):
        masked = np.where(chosen, -np.inf, diag)
        p = int(np.argmax(masked))
        pivots.append(p)
        lmm = np.sqrt(diag[p])
        col = K_with_ridge[:, p]
        schur = L[:, :m] @ L[p, :m]
        newcol = (col - schur) / lmm
        newcol[p] = lmm
        newcol[chosen] = 0.0
        L[:, m] = newcol
        diag -= newcol**2
        chosen[p] = True
    return L, np.array(pivots)


def test_pivoted_cholesky_reconstruction_error_bound(setup):
    """||K - L L^T|| on the diagonal is exactly the remaining-diag trace, and
    the rank-k approximation error shrinks with k.  (Full-rank factorization
    of this kernel is numerically meaningless: its spectrum spans ~15 decades,
    so late pivots are pure roundoff — the reference would assert-fail there
    too, incomplete_cholesky.py:62.)"""
    spec, cache = setup
    K = _dense_system(spec, cache)
    n = K.shape[0]
    errs = []
    for k in (8, 20, 40):
        res, info = pivoted_cholesky(spec, cache, max_rank=k)
        approx = np.asarray(res.L) @ np.asarray(res.L).T
        err = np.abs(np.diag(K - approx) - LAM).sum()
        np.testing.assert_allclose(err, info["remaining_diag_error"],
                                   rtol=1e-6, atol=1e-12)
        errs.append(np.linalg.norm(K - approx))
    assert errs[0] > errs[1] > errs[2]


def test_nystrom_preconditioner_matches_dense_woodbury():
    """Nyström operator equals the dense inverse of K_nm K_mm^+ K_mn + lam I
    (computed independently in NumPy), for both factorization methods, each
    against the oracle with its own regularization semantics."""
    lam_big = 1e-4
    rng = np.random.default_rng(11)
    n_atoms, n_train = 4, 10
    import jax.numpy as jnp_
    import scipy.linalg
    from mlff_tpu.ops import descriptor as dsc_
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc_.make_spec(n_atoms)
    S = dsc_.incidence_matrix(spec)
    X, Jc = dsc_.descriptors_from_R(spec, jnp_.asarray(R))
    P_idx = jnp_.asarray(dsc_.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, lam_big)

    n = cache.n
    m = n // 3
    idxs = np.sort(rng.choice(n, m, replace=False))
    K = np.asarray(knl.assemble_full(spec, cache))
    K_nm = K[:, idxs]
    K_mm = K[np.ix_(idxs, idxs)]
    v = rng.normal(size=n)

    # eigh method: oracle uses the same clamped pseudo-inverse of K_mm
    rank_tol = 1e-10
    P = pc.nystrom_preconditioner(spec, cache, idxs, lam_big,
                                  method="eigh", rank_tol=rank_tol)
    w, V = scipy.linalg.eigh(K_mm)
    w_inv = np.where(w > w[-1] * rank_tol, 1.0 / np.maximum(w, w[-1] * rank_tol), 0.0)
    P_dense = K_nm @ (V * w_inv[None, :]) @ V.T @ K_nm.T + lam_big * np.eye(n)
    np.testing.assert_allclose(
        np.asarray(P(jnp.asarray(v))), np.linalg.solve(P_dense, v),
        rtol=1e-4, atol=1e-6 * np.abs(v).max() / lam_big,
    )

    # chol method: oracle uses the builder's spectral-scale pre-jitter
    P2 = pc.nystrom_preconditioner(spec, cache, idxs, lam_big, method="chol")
    K_mm_j = K_mm + np.abs(np.diag(K_mm)).max() * 1e-10 * np.eye(m)
    P_dense2 = K_nm @ np.linalg.solve(K_mm_j, K_nm.T) + lam_big * np.eye(n)
    # the NumPy oracle itself solves through the ~1e10-conditioned K_mm, so
    # only ~6 digits of the comparison are meaningful
    np.testing.assert_allclose(
        np.asarray(P2(jnp.asarray(v))), np.linalg.solve(P_dense2, v),
        rtol=1e-4, atol=1e-6 * np.abs(v).max() / lam_big,
    )


def test_leverage_scores_shapes_and_selection(setup):
    spec, cache = setup
    rng = np.random.default_rng(7)
    lev, order = pc.leverage_scores(spec, cache, LAM, n_inducing_pts=8, rng=rng)
    n = cache.n
    assert lev.shape == (n,)
    assert np.all(lev >= 0)
    for strat in ("lev_scores", "inverse_lev", "lev_random"):
        sel = pc.select_by_leverage(strat, lev, order, 10, rng)
        assert sel.shape == (10,)
        assert np.array_equal(sel, np.sort(sel))
        assert len(set(sel.tolist())) == 10


def test_eigvec_preconditioner_full_rank_exact(setup):
    spec, cache = setup
    A = _dense_system(spec, cache)
    n = A.shape[0]
    svd_cache = {}
    P = pc.eigvec_preconditioner(spec, cache, n, LAM, svd_cache=svd_cache)
    v = np.random.default_rng(8).normal(size=n)
    out = np.asarray(P(jnp.asarray(A @ v)))
    np.testing.assert_allclose(out, v, rtol=5e-5, atol=1e-7)
    # cache reuse
    P2 = pc.eigvec_preconditioner(spec, cache, n // 2, LAM, svd_cache=svd_cache)
    assert ("svd", "eigvec_precon", False) in svd_cache


def test_cho_factor_stable_on_indefinite():
    rng = np.random.default_rng(9)
    M = rng.normal(size=(12, 12))
    M = M + M.T  # indefinite
    L = pc.cho_factor_stable(M.copy())
    assert np.all(np.isfinite(L))


def test_nystrom_chol_host_matches_eigh_quality():
    """The host-Cholesky factorization path ('chol_host', ~10x cheaper host
    decompositions than dsyevd on few-core hosts) produces a preconditioner
    of the same quality as the eigh path: PCG iteration counts match within
    a few iterations on a production-lambda system."""
    rng = np.random.default_rng(3)
    n_atoms, n_train = 5, 40
    import jax.numpy as jnp_
    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.ops import descriptor as dsc_
    from mlff_tpu.solvers.cg import pcg

    ds = make_dataset("toy5", n_samples=n_train, seed=4, n_atoms=n_atoms)
    spec = dsc_.make_spec(n_atoms)
    S = dsc_.incidence_matrix(spec)
    X, Jc = dsc_.descriptors_from_R(spec, jnp_.asarray(ds["R"]))
    P_idx = jnp_.asarray(dsc_.desc_perms(np.arange(n_atoms)[None, :]))
    lam = 1e-10
    cache = knl.build_cache(X, Jc, S, P_idx, 4.0, lam)
    n = cache.n
    idxs = np.sort(rng.choice(n, n // 4, replace=False))
    y = np.asarray(ds["F"], dtype=np.float64).reshape(-1)[:n]
    y = jnp.asarray(y / y.std())

    iters = {}
    for method in ("eigh", "chol_host"):
        P = pc.nystrom_preconditioner(spec, cache, idxs, lam, method=method)
        r = pcg((knl.matvec_psd, cache), y, precon=P, tol=1e-4, maxiter=20 * n)
        assert r.converged, method
        iters[method] = r.num_iters
    assert abs(iters["chol_host"] - iters["eigh"]) <= max(
        3, int(0.05 * iters["eigh"])
    ), iters


def test_unpack_triu_device_roundtrip():
    """_put_factor's packed-triangle transfer reproduces the host factor
    exactly (both the gather unpack and the chol/eigh dispatch)."""
    rng = np.random.default_rng(3)
    for m in (1, 2, 7, 65):
        W = np.triu(rng.standard_normal((m, m)))
        got = np.asarray(pc._put_factor(W, "chol"))
        np.testing.assert_array_equal(got, W)
    dense = rng.standard_normal((9, 9))
    np.testing.assert_array_equal(np.asarray(pc._put_factor(dense, "eigh")),
                                  dense)


def test_post_d2h_ceiling_model(monkeypatch):
    """utils.hbm: env override wins; CPU backend has no staging reserve."""
    from mlff_tpu.utils import hbm

    monkeypatch.setenv("MLFF_TPU_HBM_CEILING_GB", "7.5")
    assert hbm.post_d2h_ceiling_bytes() == int(7.5e9)
    monkeypatch.delenv("MLFF_TPU_HBM_CEILING_GB")
    assert hbm.post_d2h_ceiling_bytes() is None  # tests run on CPU


def test_colblock_matches_monolithic(setup):
    """Column-blocked Nyström factor (utils/hbm.py per-buffer workaround):
    the blocked apply matches the monolithic split apply to roundoff and
    PCG takes the same iteration count."""
    spec, cache = setup
    n = cache.n
    rng = np.random.default_rng(7)
    idxs = np.sort(rng.choice(n, size=37, replace=False))

    P_mono = pc.nystrom_preconditioner(spec, cache, idxs, LAM,
                                       method="chol_host")
    P_blk = pc.nystrom_preconditioner(spec, cache, idxs, LAM,
                                      method="chol_host", block_cols=16)
    assert isinstance(P_blk, pc.WoodburyColBlockPreconditioner)
    assert len(P_blk.Bs) == 3 and P_blk.Bs[0].shape[1] == 16

    v = jnp.asarray(rng.standard_normal(n))
    a, b = np.asarray(P_mono(v)), np.asarray(P_blk(v))
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9 * np.abs(a).max())

    y = jnp.asarray(rng.standard_normal(n))
    r1 = pcg((knl.matvec_psd, cache), y, precon=P_mono, tol=1e-4,
             maxiter=20 * n)
    r2 = pcg((knl.matvec_psd, cache), y, precon=P_blk, tol=1e-4,
             maxiter=20 * n)
    assert r1.converged and r2.converged
    assert abs(r1.num_iters - r2.num_iters) <= max(2, int(0.05 * r1.num_iters))
    np.testing.assert_allclose(r2.x, r1.x, rtol=1e-3, atol=1e-6)


def test_colblock_ecstr(setup):
    """Blocked factorization under energy constraints: apply parity with
    the monolithic ecstr path."""
    spec, cache = setup
    n = cache.n + cache.n_train
    rng = np.random.default_rng(8)
    idxs = np.sort(rng.choice(cache.n, size=24, replace=False))
    P_mono = pc.nystrom_preconditioner(spec, cache, idxs, LAM,
                                       use_E_cstr=True, method="chol_host")
    P_blk = pc.nystrom_preconditioner(spec, cache, idxs, LAM,
                                      use_E_cstr=True, method="chol_host",
                                      block_cols=10)
    v = jnp.asarray(rng.standard_normal(n))
    a, b = np.asarray(P_mono(v)), np.asarray(P_blk(v))
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9 * np.abs(a).max())


def test_pcg_exact_maxiter_cap():
    """maxiter is honored exactly, not at chunk granularity: a cap smaller
    than the device-loop chunk stops at precisely that many iterations."""
    rng = np.random.default_rng(3)
    n = 96
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = (Q * np.geomspace(1.0, 1e6, n)) @ Q.T
    b = rng.normal(size=n)
    A_dev = jnp.asarray(A)
    res = pcg(lambda v: A_dev @ v, jnp.asarray(b), tol=1e-12,
              maxiter=7, chunk=25)
    assert res.num_iters == 7
    assert not res.converged
    # and warm-started budgets count from it0
    res2 = pcg(lambda v: A_dev @ v, jnp.asarray(b), x0=jnp.asarray(res.x),
               tol=1e-12, maxiter=4, chunk=25, it0=res.num_iters)
    assert res2.num_iters == 11


def test_restart_rebuild_preserves_config(setup, monkeypatch):
    """A stagnation restart must rebuild the Nystrom preconditioner with the
    SAME method/apply_impl/use_E_cstr as the initial build (reference
    iterative_inpoints.py:1011-1066 reuses its configured operator)."""
    from mlff_tpu.solvers import iterative as it_mod
    from mlff_tpu.solvers.cg import CGResult

    spec, cache = setup
    n = cache.n
    rng = np.random.default_rng(0)
    y = rng.standard_normal(n)

    calls = []
    real_nystrom = pc.nystrom_preconditioner

    def recording_nystrom(spec_, cache_, idxs, lam, **kw):
        calls.append(dict(kw))
        return real_nystrom(spec_, cache_, idxs, lam, **kw)

    monkeypatch.setattr(it_mod.pc, "nystrom_preconditioner", recording_nystrom)

    n_pcg = [0]
    def fake_pcg(matvec, b, precon=None, x0=None, **kw):
        n_pcg[0] += 1
        stag = n_pcg[0] == 1
        return CGResult(
            x=np.zeros(n), converged=not stag, num_iters=kw.get("it0", 0) + 5,
            resid=0.0, resid_hist=np.zeros(5), eff=10 if stag else 100,
            time_s=0.0, stagnated=stag,
        )

    monkeypatch.setattr(it_mod, "pcg", fake_pcg)

    task = {
        "use_E_cstr": False, "nystrom_method": "chol_host",
        "apply_impl": "xla", "solver_tol": 1e-4,
    }
    it_mod.solve_iterative(
        spec, cache, task, y, 1.0, break_percentage=0.2,
        str_preconditioner="random_scores", allow_restarts=True,
    )
    assert n_pcg[0] == 2, "expected exactly one restart"
    assert len(calls) >= 2
    first, rebuild = calls[0], calls[-1]
    for key in ("method", "apply_impl", "use_E_cstr"):
        assert rebuild.get(key) == first.get(key), key


def test_dense_diagnostic_guard():
    """rank_k_lev_scores / eigvec strategies refuse to materialize dense K
    above the documented size cap instead of OOMing the host."""
    import types

    spec = dsc.make_spec(4)
    fake_cache = types.SimpleNamespace(n=30_000, n_train=2_500)
    with pytest.raises(ValueError, match="small-n diagnostic"):
        pc.rank_k_leverage_scores(spec, fake_cache, 10)
    with pytest.raises(ValueError, match="small-n diagnostic"):
        pc.eigvec_preconditioner(spec, fake_cache, 10, 1e-10)


def test_gram_acc_safe_matches_reference(rng):
    """Depth-capped Gram accumulation == exact Gram (the cap exists because
    XLA's TPU f64 matmul emulation collapses from ~3e-15 to ~1e-10 relative
    beyond ~1024-deep contractions, measured 2026-08-21; the Woodbury inner
    needs lam-absolute accuracy, preconditioners._F64_SAFE_DEPTH)."""
    import jax.numpy as jnp

    tr = jnp.asarray(rng.normal(size=(2817, 37)))  # > _F64_SAFE_DEPTH rows
    acc = pc._gram_acc_safe(jnp.zeros((37, 37)), tr)
    ref = np.asarray(tr).T @ np.asarray(tr)
    assert np.abs(np.asarray(acc) - ref).max() < 1e-10 * np.abs(ref).max()

    a = jnp.asarray(rng.normal(size=(1500, 13)))
    b = jnp.asarray(rng.normal(size=(1500, 21)))
    acc2 = pc._gram_pair_acc_safe(jnp.zeros((13, 21)), a, b)
    ref2 = np.asarray(a).T @ np.asarray(b)
    assert np.abs(np.asarray(acc2) - ref2).max() < 1e-10 * np.abs(ref2).max()


def test_gram_entries_df64_oracle(rng):
    """The compensated Gram-entry probe (device Gram guard oracle,
    _nystrom_factor_split) reproduces exact f64 dot products."""
    import jax.numpy as jnp

    B = jnp.asarray(rng.normal(size=(3000, 16)))
    ii = jnp.asarray([0, 3, 7, 15])
    jj = jnp.asarray([0, 5, 7, 2])
    out = np.asarray(pc._gram_entries_df64(B, ii, jj))
    Bh = np.asarray(B)
    ref = np.array([np.dot(Bh[:, i], Bh[:, j])
                    for i, j in zip([0, 3, 7, 15], [0, 5, 7, 2])])
    assert np.abs(out - ref).max() < 1e-11 * np.abs(ref).max() + 1e-13
