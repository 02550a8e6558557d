"""Symmetry compression (use_cprsn): compressed analytic solve runs end to
end and reproduces the training data."""

import numpy as np
import pytest

from mlff_tpu.models.gdml import Trainer
from mlff_tpu.models.predict import Predictor
from mlff_tpu.models.task import create_task


def test_cprsn_analytic_end_to_end(ethanol_ds):
    task = create_task(
        ethanol_ds, n_train=20, valid_dataset=ethanol_ds, n_valid=10,
        sig=5.0, solver="analytic", use_sym=False, use_cprsn=True,
    )
    # inject a synthetic involution symmetry so compression has something to
    # merge (the identity group compresses nothing)
    n_atoms = ethanol_ds["R"].shape[1]
    invol = np.arange(n_atoms)
    invol[0], invol[1] = 1, 0
    task["perms"] = np.stack([np.arange(n_atoms), invol])
    _, keep = np.unique(np.sort(task["perms"], axis=0), axis=1, return_index=True)
    task["cprsn_keep_atoms_idxs"] = keep
    assert len(keep) == n_atoms - 1  # one atom pair merged

    model = Trainer().train(dict(task))
    # compressed coefficient vector: one atom fewer per training point
    assert np.asarray(model["alphas_F"]).size == 20 * (n_atoms - 1) * 3

    pred = Predictor(model)
    E, F = pred.predict(np.asarray(task["R_train"]))
    assert np.all(np.isfinite(F))
    F_ref = np.asarray(task["F_train"])
    # least-squares compressed fit: looser than the full solve but must
    # clearly track the labels
    assert np.abs(F - F_ref).mean() < 0.5 * np.abs(F_ref).mean()
