"""Energy-constrained kernel (use_E_cstr): assembly parity vs the reference,
matvec-vs-dense consistency, and end-to-end training."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl

from .reference_oracle import HAVE_REFERENCE, requires_reference

if HAVE_REFERENCE:
    from .reference_oracle import RefDesc, ref_gdml_train, tril_perms_lin_from

SIG, LAM = 10.0, 1e-10


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(4)
    n_atoms, n_train = 5, 8
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    invol = np.arange(n_atoms)
    invol[0], invol[1] = 1, 0
    perms = np.stack([np.arange(n_atoms), invol])
    P_idx = jnp.asarray(dsc.desc_perms(perms))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    return spec, cache, perms


@requires_reference
def test_ecstr_assembly_matches_reference(setup):
    spec, cache, perms = setup
    n_atoms = spec.n_atoms
    gdml = ref_gdml_train()
    desc = RefDesc(n_atoms)
    tpl = tril_perms_lin_from(perms, n_atoms)
    K_ref = gdml._assemble_kernel_mat(
        np.asarray(cache.X), np.asarray(cache.Jc), tpl, SIG, desc,
        use_E_cstr=True, callback=lambda *a, **k: None,
    )
    K_ours = np.asarray(knl.assemble_full_ecstr(spec, cache, tile=4))
    assert K_ours.shape == K_ref.shape
    np.testing.assert_allclose(K_ours, -np.asarray(K_ref), rtol=1e-9, atol=1e-12)


def test_ecstr_matvec_matches_dense(setup):
    spec, cache, _ = setup
    K = np.asarray(knl.assemble_full_ecstr(spec, cache))
    n_ext = K.shape[0]
    rng = np.random.default_rng(1)
    v = rng.normal(size=n_ext)
    ours = np.asarray(knl.matvec_psd_ecstr(cache, jnp.asarray(v)))
    expected = (K + LAM * np.eye(n_ext)) @ v
    np.testing.assert_allclose(ours, expected, rtol=1e-8, atol=1e-10)


def test_ecstr_system_is_symmetric(setup):
    spec, cache, _ = setup
    K = np.asarray(knl.assemble_full_ecstr(spec, cache))
    np.testing.assert_allclose(K, K.T, rtol=1e-9, atol=1e-11)


def test_ecstr_training_end_to_end(ethanol_ds):
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.predict import Predictor
    from mlff_tpu.models.task import create_task

    task = create_task(
        ethanol_ds, n_train=20, valid_dataset=ethanol_ds, n_valid=20,
        sig=5.0, solver="analytic", use_E_cstr=True,
    )
    model = Trainer().train(dict(task))
    assert "alphas_E" in model
    pred = Predictor(model)
    _, F_hat = pred.predict(np.asarray(task["R_train"]))
    F_ref = np.asarray(task["F_train"])
    # E-constrained fit is regularized differently; just require a sane fit
    assert np.abs(F_hat - F_ref).mean() < 0.25 * np.abs(F_ref).mean()


def test_ecstr_diag_and_columns_any(setup):
    """kernel_diag_ecstr / assemble_columns_ecstr_any vs the dense oracle."""
    spec, cache, _ = setup
    K = np.asarray(knl.assemble_full_ecstr(spec, cache))
    n_ext = K.shape[0]

    d = np.asarray(knl.kernel_diag_ecstr(spec.dim_i, cache))
    np.testing.assert_allclose(d, np.diagonal(K), rtol=1e-9, atol=1e-12)

    rng = np.random.default_rng(2)
    idx = np.sort(rng.choice(n_ext, size=n_ext // 3, replace=False))
    cols = np.asarray(knl.assemble_columns_ecstr_any(spec, cache, idx))
    np.testing.assert_allclose(cols, K[:, idx], rtol=1e-9, atol=1e-12)

    # pure-energy and pure-force subsets too (different code branches)
    e_only = np.arange(cache.n + 1, n_ext, 2)
    np.testing.assert_allclose(
        np.asarray(knl.assemble_columns_ecstr_any(spec, cache, e_only)),
        K[:, e_only], rtol=1e-9, atol=1e-12)
    f_only = np.arange(0, cache.n, 7)
    np.testing.assert_allclose(
        np.asarray(knl.assemble_columns_ecstr_any(spec, cache, f_only)),
        K[:, f_only], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("strategy", ["cholesky", "cholesky_panel",
                                      "rpcholesky", "eigvec_precon",
                                      "eigvec_precon_block_diagonal",
                                      "eigvec_precon_atomic_interactions"])
def test_ecstr_cholesky_eigvec_preconditioners_train(ethanol_ds, strategy):
    """The pivoted-Cholesky family and the truncated-SVD family support the
    energy-constrained system end-to-end.

    The masked eigvec variants are weak diagnostic preconditioners (they
    drop most of K; the reference's own block_diagonal degenerates to
    unpreconditioned CG, iterative_solver.py:1259-1262), so for those only
    solver progress is asserted, not convergence to tolerance."""
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    task = create_task(ethanol_ds, n_train=12, valid_dataset=ethanol_ds,
                       n_valid=8, sig=5.0, solver="cg", use_E_cstr=True)
    model = Trainer().train(
        dict(task), break_percentage=0.2, str_preconditioner=strategy
    )
    if "eigvec_precon_" in strategy:
        assert np.isfinite(np.asarray(model["alphas_F"])).all()
    else:
        assert bool(model["is_conv"])
    assert model.get("alphas_E") is not None


def test_ecstr_pivoted_cholesky_factor_validity(setup):
    """Greedy ecstr factor approximates the extended kernel."""
    from mlff_tpu.solvers.pivoted_cholesky import pivoted_cholesky

    spec, cache, _ = setup
    K = np.asarray(knl.assemble_full_ecstr(spec, cache))
    n_ext = K.shape[0]
    Khat = K + LAM * np.eye(n_ext)
    k = n_ext // 2
    res, info = pivoted_cholesky(spec, cache, max_rank=k, use_E_cstr=True)
    assert res.L.shape == (n_ext, k)
    approx = np.asarray(res.L) @ np.asarray(res.L).T
    err0 = np.linalg.norm(Khat)
    err = np.linalg.norm(Khat - approx)
    assert err < 0.5 * err0  # rank-n/2 factor captures the bulk
    piv = np.asarray(res.pivots)
    assert len(set(piv.tolist())) == len(piv)
    # pivots span both blocks eventually (E diag is smaller but nonzero)
    assert (np.asarray(res.remaining_diag) <= np.asarray(
        knl.kernel_diag_ecstr(spec.dim_i, cache)).max() + 1e-9).all()
