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
