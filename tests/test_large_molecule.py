"""Large-descriptor smoke test (catcher-sized, d=88 => D=3828): the kernel
paths must scale to big molecules without inflating beyond memory."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.data.synthetic import make_dataset
from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.solvers.cg import pcg
from mlff_tpu.solvers import preconditioners as pc


@pytest.fixture(scope="module")
def catcher():
    n_atoms, n_train = 88, 6
    ds = make_dataset("catcher", n_samples=n_train + 2, seed=5)
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"][:n_train]))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    return spec, cache, ds


def test_dimensions(catcher):
    spec, cache, _ = catcher
    assert spec.dim == 88 * 87 // 2  # 3828
    assert cache.n == 6 * 88 * 3


def test_matvec_runs_and_matches_column(catcher):
    spec, cache, _ = catcher
    n = cache.n
    e0 = jnp.zeros(n).at[13].set(1.0)
    col_via_matvec = np.asarray(knl.matvec_psd(cache, e0))
    col_direct = np.asarray(knl.kernel_column(spec.dim_i, cache, jnp.asarray(13)))
    np.testing.assert_allclose(col_via_matvec, col_direct, rtol=1e-8, atol=1e-12)


def test_cg_with_nystrom_on_large_descriptor(catcher):
    spec, cache, ds = catcher
    n = cache.n
    y = np.asarray(ds["F"][:6], dtype=np.float64).ravel()
    y /= y.std()
    idxs = pc.select_random(n, n // 6, np.random.default_rng(0))
    P = pc.nystrom_preconditioner(spec, cache, idxs, 1e-10)
    res = pcg((knl.matvec_psd, cache), jnp.asarray(y), precon=P,
              tol=1e-4, maxiter=4 * n)
    assert np.all(np.isfinite(res.x))
    assert res.resid < np.linalg.norm(y)  # made progress


@pytest.fixture(scope="module")
def nanotube():
    """AIMS-nanotube-sized (d=370 => D=68,265) — the largest reference
    system (create_data.py:55-72)."""
    n_atoms, n_train = 370, 3
    rng = np.random.default_rng(7)
    R = rng.normal(size=(n_train, n_atoms, 3)) * 6.0
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    return spec, cache


def test_nanotube_diag_compressed_matches(nanotube):
    spec, cache = nanotube
    d_fast = np.asarray(knl.kernel_diag_any(spec, cache))
    # kernel_diag_any must route large-D to the compressed path
    d_comp = np.asarray(knl.kernel_diag_compressed(spec.dim_i, cache))
    np.testing.assert_array_equal(d_fast, d_comp)
    # spot-check three entries against directly assembled columns
    for col in (0, 517, cache.n - 1):
        c = np.asarray(knl.assemble_columns(spec, cache, np.array([col])))
        np.testing.assert_allclose(d_fast[col], c[col, 0], rtol=1e-9)


def test_nanotube_panel_cholesky_runs(nanotube):
    """The panel pivoted Cholesky (batched compressed columns + compressed
    diag) handles nanotube-scale descriptors without Jacobian inflation."""
    from mlff_tpu.solvers.pivoted_cholesky import panel_pivoted_cholesky

    spec, cache = nanotube
    res, info = panel_pivoted_cholesky(spec, cache, max_rank=48, block=16)
    assert res.L.shape[0] == cache.n
    assert np.isfinite(np.asarray(res.L)).all()
    assert (np.asarray(res.pivot_values) > 0).all()


def test_nanotube_greedy_cholesky_compressed_column(nanotube):
    """kernel_column_compressed matches the inflating path, and the greedy
    pivoted Cholesky runs at nanotube scale through it."""
    from mlff_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    spec, cache = nanotube
    col = jnp.asarray(1234)
    c1 = np.asarray(knl.kernel_column(spec.dim_i, cache, col))
    c2 = np.asarray(knl.kernel_column_compressed(spec.dim_i, cache, col))
    np.testing.assert_allclose(c2, c1, rtol=1e-9, atol=1e-12)

    res, _ = pivoted_cholesky(spec, cache, max_rank=16)
    assert res.L.shape == (cache.n, 16)
    assert (np.asarray(res.pivot_values) > 0).all()
