"""Standalone prototype self-tests (the reference runs these at import time;
reference src/tools/cholesky.py:80-95, custom_cg_solver.py:84-99)."""

import numpy as np

from mlff_tpu.experiments import prototypes as proto


def test_dense_pivoted_cholesky_selftest():
    proto.selftest_pivoted_cholesky()


def test_woodbury_selftest():
    proto.selftest_woodbury()


def test_gp_regression_demo():
    rng = np.random.default_rng(2)
    X = rng.uniform(-3, 3, size=(40, 1))
    y = np.sin(X[:, 0])
    Xq = np.linspace(-2.5, 2.5, 20)[:, None]
    mean, var = proto.gp_regression(X, y, Xq, lengthscale=1.0, noise=1e-8)
    np.testing.assert_allclose(mean, np.sin(Xq[:, 0]), atol=0.05)
    assert np.all(var >= -1e-10)


def test_condition_number():
    A = np.diag([1.0, 10.0, 100.0])
    assert abs(proto.condition_number(A) - 100.0) < 1e-9


def test_hardware_info():
    from mlff_tpu.parallel.distributed import hardware_info

    info = hardware_info()
    assert info["n_devices"] == 8  # virtual CPU mesh from conftest
    assert "uname" in info
