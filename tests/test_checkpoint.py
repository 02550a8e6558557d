"""Checkpoint/resume machinery: periodic unconverged-model snapshots during
CG and warm-started continuation (reference iterative_solver.py:919-954,
cli.py:729-846/868-962)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.models.gdml import Trainer
from mlff_tpu.models.predict import Predictor
from mlff_tpu.models.task import create_task
from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.solvers.cg import pcg


def test_pcg_checkpoint_callback_fires():
    rng = np.random.default_rng(0)
    n = 64
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = jnp.asarray((Q * np.geomspace(1, 1e4, n)) @ Q.T)
    b = jnp.asarray(rng.normal(size=n))
    snaps = []

    res = pcg(
        lambda v: A @ v, b, tol=1e-10, maxiter=200, chunk=10,
        checkpoint_callback=lambda x, it, r: snaps.append((it, r)),
        checkpoint_every_s=0.0,
    )
    assert len(snaps) >= 1
    its = [s[0] for s in snaps]
    assert its == sorted(its)


def test_trainer_checkpoint_model_is_usable(ethanol_ds):
    """The wrapped checkpoint produces a loadable, predict-capable model."""
    task = create_task(ethanol_ds, n_train=15, valid_dataset=ethanol_ds,
                       n_valid=10, sig=5.0, solver="cg", use_sym=False)
    trainer = Trainer()
    spec, S, X, Jc, P_idx = trainer.build_kernel_inputs(task)
    y, y_std, _ = trainer.labels(task)

    wrapped = trainer._wrap_ckpt(
        lambda m: saved.append(m), task, spec, S, X, Jc, y, y_std
    )
    saved = []
    fake_alphas = np.random.default_rng(1).normal(size=len(y))
    wrapped(alphas_psd=fake_alphas, num_iters=7, resid=1.0,
            inducing_pts_idxs=np.arange(5))

    assert len(saved) == 1
    model = saved[0]
    assert int(model["solver_iters"]) == 8  # num_iters + 1, like the reference
    pred = Predictor(model)
    E, F = pred.predict(np.asarray(task["R_train"][:3]))
    assert np.all(np.isfinite(F))
