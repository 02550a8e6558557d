"""Pallas fused prediction kernel vs the jnp reference path (interpret mode
on CPU; the compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.data.synthetic import make_dataset
from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl

pallas_predict = pytest.importorskip("mlff_tpu.ops.pallas_predict")


@pytest.fixture(scope="module")
def setup():
    ds = make_dataset("ethanol", n_samples=40, seed=2)
    spec = dsc.make_spec(9)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"][:30]))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(9)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, 5.0, 1e-10)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(30, spec.dim)))
    wt = knl.perm_expand_w(w, cache.P_idx)
    return spec, cache, wt


def test_pallas_matches_jnp_reference(setup):
    spec, cache, wt = setup
    # jnp reference
    F_ref, E_ref = knl._desc_forces(cache, cache.Xq, cache.A_exp,
                                    cache.A_exp1, wt)
    F_pl, E_pl = pallas_predict.desc_forces_pallas(
        cache.Xq, cache.Xqt, wt, sig=5.0, interpret=True
    )
    scale = float(jnp.abs(F_ref).max())
    np.testing.assert_allclose(np.asarray(F_pl), np.asarray(F_ref),
                               atol=2e-5 * scale, rtol=2e-4)
    e_scale = float(jnp.abs(E_ref).max())
    np.testing.assert_allclose(np.asarray(E_pl), np.asarray(E_ref),
                               atol=2e-5 * e_scale, rtol=2e-4)


def test_pallas_handles_padding(setup):
    """B and M not multiples of the tile sizes: padding must not leak."""
    spec, cache, wt = setup
    B = 7  # odd query count
    F_pl, E_pl = pallas_predict.desc_forces_pallas(
        cache.Xq[:B], cache.Xqt, wt, sig=5.0, interpret=True
    )
    F_ref, E_ref = knl._desc_forces(cache, cache.Xq[:B], cache.A_exp[:B],
                                    cache.A_exp1[:B], wt)
    scale = float(jnp.abs(F_ref).max())
    np.testing.assert_allclose(np.asarray(F_pl), np.asarray(F_ref),
                               atol=2e-5 * scale, rtol=2e-4)
