"""Kernel operator parity: dense assembly vs the reference, matvec vs dense,
column extraction, diagonal, permutation symmetrization."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl

from .reference_oracle import HAVE_REFERENCE, requires_reference

if HAVE_REFERENCE:
    from .reference_oracle import ref_assemble_K

SIG = 10.0
LAM = 1e-10


def _setup(n_atoms=5, n_train=12, n_perms=2, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    # synthetic permutation group: identity + an involution (swap disjoint
    # atom pairs) — must be a *closed* group or the symmetrized kernel is not
    # symmetric and the reference's exploit_sym fill diverges from direct
    # assembly.
    perms = [np.arange(n_atoms)]
    if n_perms > 1:
        invol = np.arange(n_atoms)
        invol[0], invol[1] = 1, 0
        invol[2], invol[3] = 3, 2
        perms.append(invol)
    perms = np.stack(perms)
    P_idx = jnp.asarray(dsc.desc_perms(perms))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    return spec, cache, perms, R


@pytest.fixture(scope="module")
def setup():
    return _setup()


@requires_reference
def test_full_assembly_matches_reference(setup):
    spec, cache, perms, R = setup
    K_ours = np.asarray(knl.assemble_full(spec, cache, tile=5))
    K_ref = ref_assemble_K(
        np.asarray(cache.X), np.asarray(cache.Jc), perms, SIG, spec.n_atoms
    )
    # PSD convention: ours = -reference
    np.testing.assert_allclose(K_ours, -K_ref, rtol=1e-9, atol=1e-12)


@requires_reference
def test_column_assembly_matches_reference(setup):
    spec, cache, perms, R = setup
    n = cache.n
    rng = np.random.default_rng(42)
    col_idxs = np.sort(rng.choice(n, size=17, replace=False))
    cols_ours = np.asarray(knl.assemble_columns(spec, cache, col_idxs, chunk=3))
    K_ref = ref_assemble_K(
        np.asarray(cache.X), np.asarray(cache.Jc), perms, SIG, spec.n_atoms,
        col_idxs=col_idxs,
    )
    np.testing.assert_allclose(cols_ours, -K_ref, rtol=1e-9, atol=1e-12)


def test_matvec_matches_dense(setup):
    spec, cache, _, _ = setup
    K = np.asarray(knl.assemble_full(spec, cache, tile=7))
    n = K.shape[0]
    rng = np.random.default_rng(1)
    v = rng.normal(size=n)
    ours = np.asarray(knl.matvec_psd(cache, jnp.asarray(v)))
    expected = (K + LAM * np.eye(n)) @ v
    np.testing.assert_allclose(ours, expected, rtol=1e-8, atol=1e-10)


def test_matmat_matches_matvec(setup):
    spec, cache, _, _ = setup
    n = cache.n
    rng = np.random.default_rng(2)
    V = rng.normal(size=(n, 4))
    out = np.asarray(knl.matmat_psd(cache, jnp.asarray(V)))
    for b in range(4):
        col = np.asarray(knl.matvec_psd(cache, jnp.asarray(V[:, b])))
        np.testing.assert_allclose(out[:, b], col, rtol=1e-12)


def test_kernel_is_symmetric_psd(setup):
    spec, cache, _, _ = setup
    K = np.asarray(knl.assemble_full(spec, cache, tile=12))
    np.testing.assert_allclose(K, K.T, rtol=1e-9, atol=1e-11)
    w = np.linalg.eigvalsh(K + LAM * np.eye(K.shape[0]))
    assert w.min() > -1e-8 * abs(w.max())


def test_diag_matches_dense(setup):
    spec, cache, _, _ = setup
    K = np.asarray(knl.assemble_full(spec, cache))
    d = np.asarray(knl.kernel_diag(spec.dim_i, cache))
    np.testing.assert_allclose(d, np.diag(K), rtol=1e-9)


def test_single_column_includes_ridge(setup):
    spec, cache, _, _ = setup
    K = np.asarray(knl.assemble_full(spec, cache))
    n = K.shape[0]
    col = 37 % n
    ours = np.asarray(knl.kernel_column(spec.dim_i, cache, jnp.asarray(col)))
    expected = K[:, col] + LAM * (np.arange(n) == col)
    np.testing.assert_allclose(ours, expected, rtol=1e-9, atol=1e-12)


class TestSquareLayout:
    """Square all-pairs layout (large-A fast path) vs the packed oracle."""

    def test_matvec_square_matches_packed_with_perms(self):
        spec, cache, perms, R = _setup(n_atoms=6, n_train=7, n_perms=2,
                                       seed=3)
        sq = knl.build_cache_square(jnp.asarray(R), perms, SIG, LAM)
        rng = np.random.default_rng(5)
        for _ in range(3):
            v = jnp.asarray(rng.standard_normal(cache.n))
            a = np.asarray(knl.matvec_psd(cache, v))
            b = np.asarray(knl.matvec_psd_square(sq, v))
            np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-13)

    def test_matvec_square_single_perm_large(self):
        spec, cache, perms, R = _setup(n_atoms=17, n_train=4, n_perms=1,
                                       seed=9)
        sq = knl.build_cache_square(jnp.asarray(R), perms, SIG, LAM)
        v = jnp.asarray(np.random.default_rng(1).standard_normal(cache.n))
        np.testing.assert_allclose(
            np.asarray(knl.matvec_psd_square(sq, v)),
            np.asarray(knl.matvec_psd(cache, v)), rtol=1e-10, atol=1e-13)

    def test_square_kernel_weights_match_packed(self):
        """The square layout's pairwise Matern weights equal the packed
        cache's (the 1/sqrt(2) scaling makes distances identical)."""
        spec, cache, perms, R = _setup(n_atoms=6, n_train=5, n_perms=2,
                                       seed=4)
        sq = knl.build_cache_square(jnp.asarray(R), perms, SIG, LAM)
        # near-zero descriptor distances amplify the Gram-trick cancellation
        # (na + nb - 2g), and the two layouts sum it in different orders —
        # a few self-distance entries land at ~1e-8 relative
        np.testing.assert_allclose(np.asarray(sq.A_exp),
                                   np.asarray(cache.A_exp),
                                   rtol=1e-7, atol=1e-15)


class TestLargeNModes:
    """On-the-fly matvec (pairwise=False) and chunked Woodbury apply — the
    n=500k memory modes — against the cached oracles."""

    def test_otf_matvec_matches_cached(self):
        spec, cache, perms, R = _setup(n_atoms=5, n_train=11, n_perms=2,
                                       seed=6)
        import jax.numpy as jnp
        from mlff_tpu.ops import descriptor as dsc
        otf = knl.build_cache(
            cache.X, cache.Jc, cache.S, cache.P_idx, SIG, LAM,
            pairwise=False)
        assert otf.A_exp is None
        rng = np.random.default_rng(2)
        for _ in range(2):
            v = jnp.asarray(rng.standard_normal(cache.n))
            np.testing.assert_allclose(
                np.asarray(knl.matvec_psd(otf, v)),
                np.asarray(knl.matvec_psd(cache, v)),
                rtol=1e-10, atol=1e-13)

    def test_chunked_apply_matches_plain(self):
        from mlff_tpu.solvers import preconditioners as pc
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        n, m = 1000, 64
        B = jnp.asarray(rng.standard_normal((n, m)))
        W2 = jnp.asarray(np.triu(rng.standard_normal((m, m))) * 0.1)
        P = pc.WoodburySplitPreconditioner(B=B, W2=W2,
                                           lam=jnp.asarray(1e-8))
        v = jnp.asarray(rng.standard_normal(n))
        a = np.asarray(pc.woodbury_split_apply(P, v))
        # force the chunked path with a ragged tail (chunk=128, n=1000)
        b = np.asarray(pc._woodbury_split_apply_chunked(P, v, chunk=128))
        # elements can be ~0 relative to the 1/lam-amplified scale: compare
        # with an absolute tolerance anchored at the result magnitude
        np.testing.assert_allclose(b, a, rtol=1e-10,
                                   atol=1e-13 * np.abs(a).max())
