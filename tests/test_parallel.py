"""Sharded kernel operator on the 8-device virtual CPU mesh: matvec parity
with single-device results, sharded PCG step, and the driver dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n_train, n_atoms = 16, 4  # divisible by the 8-device mesh
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    return spec, cache


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matvec_matches_single_device(problem):
    spec, cache = problem
    n = cache.n
    v = np.random.default_rng(1).normal(size=n)

    expected = np.asarray(knl.matvec_psd(cache, jnp.asarray(v)))

    mesh = pmesh.make_mesh()
    sharded = pmesh.shard_cache(cache, mesh)
    v_sharded = pmesh.shard_vector(jnp.asarray(v), mesh)
    out = np.asarray(knl.matvec_psd(sharded, v_sharded))
    np.testing.assert_allclose(out, expected, rtol=1e-10, atol=1e-12)


def test_sharded_matvec_is_actually_sharded(problem):
    spec, cache = problem
    mesh = pmesh.make_mesh()
    sharded = pmesh.shard_cache(cache, mesh)
    # the large pairwise cache must be split over devices
    shards = sharded.A_exp.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == cache.A_exp.shape[0] // 8


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
