"""Descriptor engine parity vs the reference implementation and internal
consistency (finite differences, incidence-matmul contractions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.ops import descriptor as dsc

from .reference_oracle import HAVE_REFERENCE, requires_reference

if HAVE_REFERENCE:
    from .reference_oracle import RefDesc, ref_desc_mod


@pytest.fixture(scope="module")
def geom(rng=np.random.default_rng(7)):
    n_atoms = 7
    r = rng.normal(size=(n_atoms, 3)) * 2.0
    return n_atoms, r


@requires_reference
def test_descriptor_matches_reference(geom):
    n_atoms, r = geom
    spec = dsc.make_spec(n_atoms)
    d, j = dsc.descriptor(spec, jnp.asarray(r))

    rd, rdd = ref_desc_mod._from_r(r.reshape(-1))
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(j), rdd, rtol=1e-12)


@requires_reference
def test_batched_descriptors_match(geom):
    n_atoms, _ = geom
    rng = np.random.default_rng(11)
    R = rng.normal(size=(5, n_atoms, 3))
    spec = dsc.make_spec(n_atoms)
    D, J = dsc.descriptors_from_R(spec, jnp.asarray(R))
    for m in range(5):
        rd, rdd = ref_desc_mod._from_r(R[m].reshape(-1))
        np.testing.assert_allclose(np.asarray(D[m]), rd, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(J[m]), rdd, rtol=1e-12)


def test_jacobian_finite_difference(geom):
    """Full Jacobian (via incidence inflation) equals numerical d desc / d r."""
    n_atoms, r = geom
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)

    def desc_flat(r_flat):
        d, _ = dsc.descriptor(spec, r_flat.reshape(n_atoms, 3))
        return d

    J_auto = jax.jacobian(desc_flat)(jnp.asarray(r.reshape(-1)))
    _, j_comp = dsc.descriptor(spec, jnp.asarray(r))
    J_full = dsc.inflate_jacobian(j_comp, S)
    np.testing.assert_allclose(np.asarray(J_full), np.asarray(J_auto), atol=1e-12)


def test_cutoff_jacobian_is_exact_gradient(geom):
    n_atoms, r = geom
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    cut = 3.0

    def desc_flat(r_flat):
        d, _ = dsc.descriptor(spec, r_flat.reshape(n_atoms, 3), interact_cut_off=cut)
        return d

    J_auto = jax.jacobian(desc_flat)(jnp.asarray(r.reshape(-1)))
    _, j_comp = dsc.descriptor(spec, jnp.asarray(r), interact_cut_off=cut)
    J_full = dsc.inflate_jacobian(j_comp, S)
    np.testing.assert_allclose(np.asarray(J_full), np.asarray(J_auto), atol=1e-10)


@requires_reference
def test_contractions_match_reference(geom):
    n_atoms, r = geom
    rng = np.random.default_rng(5)
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    _, j_comp = dsc.descriptor(spec, jnp.asarray(r))
    j_np = np.asarray(j_comp)

    ref = RefDesc(n_atoms)

    v = rng.normal(size=(1, 3 * n_atoms))
    ours = dsc.d_desc_dot_vec(j_comp[None], S, jnp.asarray(v).reshape(1, n_atoms, 3))
    theirs = ref.d_desc_dot_vec(j_np[None], v)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-12)

    f = rng.normal(size=(1, spec.dim))
    ours2 = dsc.vec_dot_d_desc(j_comp[None], S, jnp.asarray(f))
    theirs2 = ref.vec_dot_d_desc(j_np[None], f)
    np.testing.assert_allclose(
        np.asarray(ours2).reshape(1, -1), theirs2, rtol=1e-12, atol=1e-14
    )


@requires_reference
def test_desc_perm_matches_reference():
    n_atoms = 8
    rng = np.random.default_rng(2)
    perm = rng.permutation(n_atoms)
    ours = dsc.perm_to_desc_perm(perm)
    theirs = RefDesc(n_atoms).perm(perm)
    np.testing.assert_array_equal(ours, theirs)


def test_desc_perm_semantics():
    """desc(r[perm]) == desc(r)[desc_perm]."""
    n_atoms = 6
    rng = np.random.default_rng(3)
    r = rng.normal(size=(n_atoms, 3))
    perm = rng.permutation(n_atoms)
    spec = dsc.make_spec(n_atoms)
    d, _ = dsc.descriptor(spec, jnp.asarray(r))
    d_p, _ = dsc.descriptor(spec, jnp.asarray(r[perm]))
    dp_idx = dsc.perm_to_desc_perm(perm)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d)[dp_idx], rtol=1e-12)


def test_pbc_minimum_image():
    spec = dsc.make_spec(2)
    lat = jnp.eye(3) * 10.0
    lat_inv = jnp.asarray(np.linalg.inv(np.asarray(lat)))  # host inversion: f64 LU is unsupported on TPU
    r = jnp.asarray([[0.5, 0.0, 0.0], [9.5, 0.0, 0.0]])
    d, _ = dsc.descriptor(spec, r, lat_and_inv=(lat, lat_inv))
    np.testing.assert_allclose(float(d[0]), 1.0, rtol=1e-12)  # wrapped dist = 1
