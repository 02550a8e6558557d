"""End-to-end training: task -> solver -> model -> prediction, on a synthetic
ethanol-sized dataset.  Cross-checks PCG against the analytic solver and
validates prediction parity with the reference GDMLPredict where importable."""

import numpy as np
import pytest

from mlff_tpu.models.gdml import Trainer
from mlff_tpu.models.predict import Predictor
from mlff_tpu.models.task import create_task, create_task_from_model
from mlff_tpu.utils import io

from .reference_oracle import HAVE_REFERENCE, requires_reference


@pytest.fixture(scope="module")
def task(ethanol_ds):
    return create_task(
        ethanol_ds, n_train=25, valid_dataset=ethanol_ds, n_valid=40,
        sig=5.0, lam=1e-15, solver="analytic",
    )


@pytest.fixture(scope="module")
def analytic_model(task):
    return Trainer().train(dict(task))


def test_analytic_model_predicts_forces(analytic_model, task, ethanol_ds):
    pred = Predictor(analytic_model)
    R_valid = ethanol_ds["R"][np.asarray(task["idxs_valid"])]
    F_valid = ethanol_ds["F"][np.asarray(task["idxs_valid"])]
    E_valid = ethanol_ds["E"][np.asarray(task["idxs_valid"])]

    E_hat, F_hat = pred.predict(R_valid)
    f_scale = np.abs(F_valid).mean()
    f_mae = np.abs(F_hat - F_valid).mean()
    assert f_mae < 0.3 * f_scale, f"force MAE {f_mae} too large vs {f_scale}"

    # energies correlate and the integration constant is recovered
    assert np.corrcoef(E_hat, E_valid)[0, 1] > 0.95
    assert np.abs(E_hat - E_valid).mean() < np.abs(E_valid - E_valid.mean()).mean()


def test_training_fit_is_tight(analytic_model, task):
    """On the training set itself the fit must be nearly exact."""
    pred = Predictor(analytic_model)
    _, F_hat = pred.predict(np.asarray(task["R_train"]))
    F_ref = np.asarray(task["F_train"])
    # residual floor is set by the 1e-10 ridge against the kernel's tiny
    # trailing eigenvalues, not by solver accuracy
    assert np.abs(F_hat - F_ref).max() < 2e-2 * max(np.abs(F_ref).max(), 1.0)


@pytest.mark.parametrize("strategy", ["random_scores", "cholesky", "lev_scores"])
def test_cg_matches_analytic(task, analytic_model, strategy):
    cg_task = dict(task, solver_name="cg")
    model = Trainer().train(
        cg_task, break_percentage=0.25, str_preconditioner=strategy
    )
    assert bool(model["is_conv"])
    assert model["solver_iters"] > 0
    pred_cg = Predictor(model)
    pred_an = Predictor(analytic_model)
    R = np.asarray(task["R_train"])[:10]
    _, F_cg = pred_cg.predict(R)
    _, F_an = pred_an.predict(R)
    # both solve the same system to tol=1e-4: predictions agree closely
    np.testing.assert_allclose(F_cg, F_an, atol=5e-3 * np.abs(F_an).max())


def test_cg_cholesky_solver(task):
    model = Trainer().train(
        dict(task, solver_name="cg_cholesky"), break_percentage=0.3
    )
    assert model["solver_iters"] > 0


def test_model_save_load_roundtrip(tmp_path, analytic_model):
    path = tmp_path / "model.npz"
    io.save_model(path, analytic_model)
    loaded = io.load_model(path)
    pred = Predictor(loaded)
    assert pred.n_train == 25


def test_resume_from_model(analytic_model, ethanol_ds, task):
    resumed = create_task_from_model(analytic_model, ethanol_ds)
    assert "alphas0_F" in resumed
    np.testing.assert_array_equal(resumed["idxs_train"], task["idxs_train"])
    # warm-started CG should converge almost immediately
    model2 = Trainer().train(
        dict(resumed, solver_name="cg"), break_percentage=0.2,
        str_preconditioner="random_scores",
    )
    assert bool(model2["is_conv"])
    assert model2["solver_iters"] <= 30


@requires_reference
def test_prediction_parity_with_reference(analytic_model, task):
    """Our Predictor and the reference GDMLPredict produce identical outputs
    from the same stored model dict."""
    from sgdml.predict import GDMLPredict

    model_np = {
        k: np.asarray(v) if not isinstance(v, (dict, type(None))) else v
        for k, v in analytic_model.items()
    }
    ref = GDMLPredict(model_np, max_processes=1)
    R = np.asarray(task["R_train"])[:5].reshape(5, -1)
    E_ref, F_ref = ref.predict(R)

    ours = Predictor(analytic_model)
    E_our, F_our = ours.predict(R)
    np.testing.assert_allclose(
        F_our.reshape(5, -1), F_ref, rtol=1e-7, atol=1e-9 * np.abs(F_ref).max()
    )
    np.testing.assert_allclose(
        E_our, E_ref, rtol=1e-7, atol=1e-9 * np.abs(E_ref).max()
    )


@requires_reference
def test_load_reference_produced_model(ethanol_ds):
    """A model npz produced by the REFERENCE's GDMLTrain (create_task ->
    analytic train) loads into our Predictor and predicts identically to the
    reference's own GDMLPredict — the reverse of
    test_prediction_parity_with_reference."""
    from sgdml.predict import GDMLPredict
    from sgdml.train import GDMLTrain

    ds = {k: np.asarray(v) for k, v in ethanol_ds.items()}
    gdml = GDMLTrain(max_processes=1)
    try:
        ref_task = gdml.create_task(
            ds, 14, ds, 8, sig=5, lam=1e-10, use_sym=False, use_E=True,
            use_E_cstr=False, use_cprsn=False, solver="analytic",
        )
        ref_model = gdml.train(ref_task, callback=lambda *a, **k: None)
    finally:
        # the reference keeps a module-global singleton guard
        del gdml

    ref_pred = GDMLPredict(ref_model, max_processes=1)
    R = ds["R"][:6].reshape(6, -1)
    E_ref, F_ref = ref_pred.predict(R)

    ours = Predictor({k: v for k, v in ref_model.items()})
    E_our, F_our = ours.predict(R)
    np.testing.assert_allclose(
        F_our.reshape(6, -1), F_ref, rtol=1e-6, atol=1e-8 * np.abs(F_ref).max()
    )
    np.testing.assert_allclose(
        E_our, E_ref, rtol=1e-6, atol=1e-8 * np.abs(E_ref).max()
    )


def test_square_matvec_impl_matches_packed(tmp_path):
    """Forcing task['matvec_impl']='square' trains to the same alphas as the
    packed matvec (the CG sees a bit-compatible operator)."""
    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    ds = make_dataset("ethanol", n_samples=60, seed=2)
    task = create_task(ds, 12, ds, n_valid=10, sig=5.0, solver="cg",
                       use_sym=True)
    kw = dict(n_columns=40, str_preconditioner="lev_random")
    m_packed = Trainer().train(dict(task), **kw)
    task_sq = dict(task)
    task_sq["matvec_impl"] = "square"
    m_square = Trainer().train(task_sq, **kw)
    assert m_packed["is_conv"] and m_square["is_conv"]
    # per-matvec parity is 1e-10 (test_kernel); through an ill-conditioned
    # CG solve to tol=1e-4 the two operators' different reduction orders
    # still land within solver-tolerance of each other
    np.testing.assert_allclose(
        np.asarray(m_square["alphas_F"]), np.asarray(m_packed["alphas_F"]),
        rtol=5e-3, atol=1e-9)
    # similar iteration count: the operators differ only in reduction
    # order (~1e-13/matvec), which shifts the exact step where the
    # residual crosses tol by a few iterations on this tiny ill-
    # conditioned system
    it_p, it_s = int(m_packed["solver_iters"]), int(m_square["solver_iters"])
    assert abs(it_s - it_p) <= max(3, int(0.15 * it_p)), (it_s, it_p)
