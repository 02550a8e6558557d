"""Inflation-free column assembly: parity with the block path and viability
at nanotube-scale descriptor dimensions."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.data.synthetic import make_dataset
from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl


def _setup(n_atoms, n_train, perms=None, sig=10.0, lam=1e-10, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    if perms is None:
        perms = np.arange(n_atoms)[None, :]
    P_idx = jnp.asarray(dsc.desc_perms(perms))
    return spec, knl.build_cache(X, Jc, S, P_idx, sig, lam)


def test_compressed_matches_block_path():
    n_atoms = 5
    invol = np.arange(n_atoms)
    invol[0], invol[1] = 1, 0
    perms = np.stack([np.arange(n_atoms), invol])
    spec, cache = _setup(n_atoms, 9, perms=perms)
    n = cache.n
    idxs = np.sort(np.random.default_rng(1).choice(n, 13, replace=False))
    block = np.asarray(knl.assemble_columns(spec, cache, idxs))
    comp = np.asarray(knl.assemble_columns_compressed(spec, cache, idxs, chunk=4))
    np.testing.assert_allclose(comp, block, rtol=1e-9, atol=1e-12)


def test_large_descriptor_triggers_compressed_path():
    """d=88 with enough perms exceeds the inflation budget; the dispatch in
    assemble_columns must route to the compressed path and stay correct."""
    n_atoms = 88
    spec, cache = _setup(n_atoms, 4, sig=10.0)
    # check the dispatch condition arithmetic at nanotube scale
    nano = dsc.make_spec(370)
    assert nano.dim * nano.dim_i * 8 * 4 > knl._INFLATION_BUDGET

    n = cache.n
    idxs = np.sort(np.random.default_rng(2).choice(n, 6, replace=False))
    comp = np.asarray(knl.assemble_columns_compressed(spec, cache, idxs, chunk=3))
    # validate against matvec unit vectors (block path also works at d=88)
    for i, c in enumerate(idxs):
        e = jnp.zeros(n).at[int(c)].set(1.0)
        col = np.array(knl.matvec_psd(cache, e))  # writable copy
        col[int(c)] -= 1e-10  # matvec includes the ridge
        np.testing.assert_allclose(comp[:, i], col, rtol=1e-8, atol=1e-11)


def test_grouped_compressed_matches_per_column():
    """assemble_columns_compressed_grouped (dense large-D fast path) equals
    the per-column compressed oracle, including multi-perm systems and
    points with uneven partial counts."""
    perms = np.stack([np.arange(7), np.array([1, 0, 2, 3, 4, 6, 5])])
    spec, cache = _setup(7, 10, perms=perms)
    n = cache.n
    rng = np.random.default_rng(7)
    # dense-ish selection: several partials per point, uneven
    idxs = np.sort(rng.choice(n, size=min(n - 1, 5 * cache.n_train),
                              replace=False))
    a = np.asarray(knl.assemble_columns_compressed_grouped(
        spec, cache, idxs, g_chunk=4))
    b = np.asarray(knl.assemble_columns_compressed(spec, cache, idxs))
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def _setup_square(n_atoms, n_train, sig=10.0, lam=1e-10, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, sig, lam, R=jnp.asarray(R))
    return spec, cache


def test_square_assembly_matches_compressed():
    """assemble_columns_square (large-A all-pairs fast path) equals the
    per-column compressed oracle, including uneven per-point selections
    and padded groups."""
    spec, cache = _setup_square(11, 6, seed=4)
    assert cache.Xsq is not None
    n = cache.n
    rng = np.random.default_rng(9)
    idxs = np.sort(rng.choice(n, size=min(n - 1, 40), replace=False))
    a = np.asarray(knl.assemble_columns_square(spec, cache, idxs, g_chunk=4))
    b = np.asarray(knl.assemble_columns_compressed(spec, cache, idxs))
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_square_assembly_self_columns():
    """Columns owned by every point including the self block (row point ==
    owning point, delta == 0) must match the matvec unit-vector oracle."""
    spec, cache = _setup_square(7, 4, seed=2)
    n = cache.n
    idxs = np.arange(0, n, 5)
    cols = np.asarray(knl.assemble_columns_square(spec, cache, idxs))
    for i, c in enumerate(idxs):
        e = jnp.zeros(n).at[int(c)].set(1.0)
        col = np.array(knl.matvec_psd(cache, e))
        col[int(c)] -= float(cache.lam)
        np.testing.assert_allclose(cols[:, i], col, rtol=1e-8, atol=1e-11)
