"""CLI verbs driven in-process: create/train/select/validate/test/show/
resume/reset round trip on a temp workspace."""

import os

import numpy as np
import pytest

from mlff_tpu import cli
from mlff_tpu.utils.io import save_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, ethanol_ds):
    ws = tmp_path_factory.mktemp("cliws")
    ds_path = ws / "ethanol.npz"
    save_dataset(ds_path, ethanol_ds)
    return ws, ds_path


def _run(argv, cwd):
    old = os.getcwd()
    os.chdir(cwd)
    try:
        return cli.main([str(a) for a in argv])
    finally:
        os.chdir(old)


def test_cli_pipeline(workspace):
    ws, ds_path = workspace
    task_dir = _run(
        ["create", ds_path, "18", "--n-valid", "20", "--sig", "4", "6",
         "--solver", "cg", "--task-dir", "run1"], ws,
    )
    assert (ws / "run1" / "task-sig0004.npz").exists()
    assert (ws / "run1" / "task-sig0006.npz").exists()

    models = _run(
        ["train", "run1", "--preconditioner", "random_scores",
         "--break-percentage", "0.25"], ws,
    )
    assert len(models) == 2

    best = _run(["select", "run1", ds_path], ws)
    assert (ws / "run1" / "best_model.npz").exists()

    res = _run(["validate", ws / "run1" / "best_model.npz", ds_path], ws)
    assert res.f_mae > 0

    res = _run(["test", ws / "run1" / "best_model.npz", ds_path,
                "--n-test", "30"], ws)
    assert res.n_points == 30

    _run(["show", ws / "run1" / "best_model.npz"], ws)

    out = _run(["resume", ws / "run1" / "best_model.npz", ds_path,
                "--preconditioner", "random_scores",
                "--break-percentage", "0.2"], ws)
    assert out.exists()

    _run(["reset", "run1"], ws)
    assert not (ws / "run1").exists()


def test_cli_rejects_bad_fingerprint(workspace, ethanol_ds):
    ws, ds_path = workspace
    bad = dict(ethanol_ds)
    bad["F"] = np.asarray(bad["F"]) * 2.0
    bad_path = ws / "tampered.npz"
    save_dataset(bad_path, bad)
    task_dir = _run(
        ["create", ds_path, "10", "--n-valid", "5", "--sig", "4",
         "--task-dir", "run2"], ws,
    )
    _run(["train", "run2", "--break-percentage", "0.3"], ws)
    model = next((ws / "run2").glob("model-*.npz"))
    with pytest.raises(ValueError):
        _run(["resume", model, bad_path], ws)
