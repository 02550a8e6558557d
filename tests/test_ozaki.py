"""Ozaki exact-slice GEMM accuracy tests (ops/ozaki.py).

The claim under test: ~2^-48-grade matmul accuracy from bf16 digit passes,
INDEPENDENT of contraction depth — the property plain f32 (HIGHEST) lacks
and the production CG loop needs (lam-floor bound ~1e-12, RESULTS.md)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mlff_tpu.ops import ozaki


def _oracle(A, B):
    """Extended-precision reference product (x86 long double, 64-bit
    mantissa: ~5e-20 — far below the 2^-48 grade under test)."""
    return (A.astype(np.longdouble) @ B.astype(np.longdouble))


def _relerr(C, C_ref, A, B):
    # Ozaki semantics: error relative to the row/col magnitude scale
    # (|A| @ |B|), not the (possibly cancelled) result
    scale = np.abs(A).astype(np.longdouble) @ np.abs(B).astype(np.longdouble)
    return float(np.max(np.abs(C - C_ref) / np.maximum(scale, 1e-300)))


@pytest.mark.parametrize("n,K,m", [(64, 36, 96), (48, 2000, 33), (8, 5000, 8)])
def test_gemm_df64_grade(n, K, m):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, K)) * np.exp(rng.normal(size=(n, 1)) * 2)
    B = rng.normal(size=(K, m)) * np.exp(rng.normal(size=(1, m)) * 2)
    C = np.asarray(ozaki.gemm(jnp.asarray(A), jnp.asarray(B)))
    err = _relerr(C, _oracle(A, B), A, B)
    assert err < 5e-14, err  # ~2^-48 + slack; f32 HIGHEST sits at ~1e-7


def test_gemm_beats_f32_highest_on_deep_contraction():
    """The depth-independence claim: at K = 5000 the f32 path degrades,
    the sliced path does not."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(16, 5000))
    B = rng.normal(size=(5000, 16))
    ref = _oracle(A, B)
    C_oz = np.asarray(ozaki.gemm(jnp.asarray(A), jnp.asarray(B)))
    import jax

    C_32 = np.asarray(jnp.matmul(
        jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
        precision=jax.lax.Precision.HIGHEST)).astype(np.float64)
    assert _relerr(C_oz, ref, A, B) < 2e-14
    assert _relerr(C_32, ref, A, B) > 1e-9  # f32 genuinely insufficient


def test_gemm_kernel_exp_weights():
    """Accuracy on the actual operand profile of the CG matvec: exponential
    kernel weights (all-positive, widely scaled) x permuted descriptors."""
    rng = np.random.default_rng(2)
    N, M, D = 40, 240, 36
    dist = np.abs(rng.normal(size=(N, M))) * 3
    A_exp1 = (5.0 / 300.0) * np.exp(-dist) * (1 + dist)
    wt = rng.normal(size=(M, D)) * 0.02
    C = np.asarray(ozaki.gemm(jnp.asarray(A_exp1), jnp.asarray(wt)))
    err = _relerr(C, _oracle(A_exp1, wt), A_exp1, wt)
    assert err < 2e-14, err


def test_gemm_presliced_matches_gemm():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(32, 300))
    B = rng.normal(size=(300, 24))
    full = np.asarray(ozaki.gemm(jnp.asarray(A), jnp.asarray(B)))
    A_sl = ozaki.slice_digits(jnp.asarray(A), axis=1)
    B_sl = ozaki.slice_digits(jnp.asarray(B), axis=0)
    pre = np.asarray(ozaki.gemm_presliced(A_sl, B_sl))
    np.testing.assert_array_equal(full, pre)


def test_slice_digits_roundtrip():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(20, 130)) * np.exp(rng.normal(size=(20, 1)) * 3)
    scale, digits = ozaki.slice_digits(jnp.asarray(X), axis=1)
    recon = np.zeros_like(X)
    for t, d in enumerate(digits):
        recon += np.asarray(d, dtype=np.float64) * 256.0 ** -(t + 1)
    recon *= np.asarray(scale)
    err = np.max(np.abs(recon - X) / np.asarray(scale))
    assert err <= 2.0 ** -48, err
    # digits are exact bf16 integers within the exactness bound
    for d in digits:
        dd = np.asarray(d, dtype=np.float64)
        assert np.all(dd == np.rint(dd))
        assert np.max(np.abs(dd)) <= 256


def test_matvec_ozaki_df64_grade_vs_f64():
    """The full kernel matvec through the exact-slice GEMMs matches the f64
    operator to ~1e-12 relative — inside the lam-floor bound (lam/||K||)
    that the f32-grade mixed path misses by 4+ orders."""
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    ds, perms = make_benchmark_dataset("ethanol", 60)
    task = create_task(ds, 40, ds, n_valid=10, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    state = knl.ozaki_matvec_state(cache)
    rng = np.random.default_rng(7)
    for seed_v in range(3):
        v = jnp.asarray(rng.normal(size=cache.n))
        hi = np.asarray(knl.matvec_psd(cache, v))
        oz = np.asarray(knl.matvec_psd_ozaki(state, v))
        rel = np.linalg.norm(oz - hi) / np.linalg.norm(hi)
        assert rel < 1e-12, rel


def test_matvec_ozaki_otf_df64_grade():
    """The OTF (pairwise=False, n~500k layout) ozaki matvec matches the f64
    operator to ~1e-12 — distances, exp weights and all three force GEMMs
    recomputed per tile through the exact-slice path."""
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    ds, perms = make_benchmark_dataset("ethanol", 60)
    task = create_task(ds, 40, ds, n_valid=10, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    cache_otf = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10,
                                pairwise=False)
    state = knl.ozaki_matvec_state(cache_otf)
    assert state.Ae1_sl is None and state.Xqt_sl_T is not None
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=cache.n))
    hi = np.asarray(knl.matvec_psd(cache, v))
    oz = np.asarray(knl.matvec_psd_ozaki(state, v))
    rel = np.linalg.norm(oz - hi) / np.linalg.norm(hi)
    assert rel < 1e-12, rel


def test_matvec_ozaki_solve_iteration_parity():
    """CG with the ozaki matvec must track the f64 path's iteration count
    essentially exactly (unlike 'float32'/'mixed', which this tiny
    ill-conditioned problem punishes severalfold) and satisfy the true f64
    system at tolerance."""
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    ds, perms = make_benchmark_dataset("ethanol", 60)
    task = create_task(ds, 40, ds, n_valid=10, sig=10.0, solver="cg",
                       perms=perms)
    m64 = Trainer().train(task, break_percentage=0.1,
                          str_preconditioner="lev_random")
    moz = Trainer().train(dict(task, matvec_dtype="ozaki"),
                          break_percentage=0.1,
                          str_preconditioner="lev_random")
    assert m64["is_conv"] and moz["is_conv"]
    it64, itoz = int(m64["solver_iters"]), int(moz["solver_iters"])
    assert abs(itoz - it64) <= max(3, int(0.05 * it64)), (it64, itoz)

    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    y, y_std, _ = tr.labels(task)
    cache = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]),
                            float(moz["lam"]))
    x = jnp.asarray(-np.asarray(moz["alphas_F"]))
    resid = np.linalg.norm(
        np.asarray(knl.matvec_psd(cache, x)) - y) / np.linalg.norm(y)
    assert resid <= 1.3e-4, resid


def test_ozaki_woodbury_apply_f64_grade():
    """The digit-decomposed Woodbury apply matches the f64 split apply to
    ~2^-52-grade (s = 7 digits = 56 bits: BELOW f64's mantissa, so no
    frozen-quantization penalty — the measured failure mode of the 48-bit
    df64 apply)."""
    from mlff_tpu.solvers import preconditioners as pc

    rng = np.random.default_rng(0)
    n, m = 700, 96
    # a realistic whitened factor: decaying singular values
    U = np.linalg.qr(rng.normal(size=(n, m)))[0]
    B = U * np.exp(-np.linspace(0, 8, m))[None, :]
    W2 = np.linalg.cholesky(
        np.linalg.inv(B.T @ B + 1e-10 * np.eye(m)))
    P = pc.WoodburySplitPreconditioner(
        B=jnp.asarray(B), W2=jnp.asarray(W2),
        lam=jnp.asarray(1e-10))
    Poz = pc.ozaki_from_split(P)
    for seed in range(3):
        v = jnp.asarray(np.random.default_rng(seed).normal(size=n))
        ref = np.asarray(pc.woodbury_split_apply(P, v))
        oz = np.asarray(pc.ozaki_woodbury_apply(Poz, v))
        rel = np.linalg.norm(oz - ref) / np.linalg.norm(ref)
        assert rel < 1e-13, rel


def test_ozaki_apply_solve_iteration_parity():
    """CG with apply_impl='ozaki' tracks the xla apply's iteration count
    (the 56-bit digits are below f64 resolution) and satisfies the true
    system."""
    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    ds, perms = make_benchmark_dataset("ethanol", 60)
    task = create_task(ds, 40, ds, n_valid=10, sig=10.0, solver="cg",
                       perms=perms)
    mx = Trainer().train(task, break_percentage=0.1,
                         str_preconditioner="lev_random")
    moz = Trainer().train(dict(task, apply_impl="ozaki"),
                          break_percentage=0.1,
                          str_preconditioner="lev_random")
    assert mx["is_conv"] and moz["is_conv"]
    itx, itoz = int(mx["solver_iters"]), int(moz["solver_iters"])
    assert abs(itoz - itx) <= max(3, int(0.05 * itx)), (itx, itoz)


def test_zero_rows_and_columns():
    A = np.zeros((8, 64))
    A[0] = 1.0
    B = np.zeros((64, 8))
    B[:, 0] = 2.0
    C = np.asarray(ozaki.gemm(jnp.asarray(A), jnp.asarray(B)))
    ref = A @ B
    np.testing.assert_allclose(C, ref, rtol=0, atol=1e-12)
