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


def test_trainer_train_on_mesh_matches_single_device():
    """Full production path on the 8-device mesh: Trainer.train(mesh=...)
    row-shards the kernel cache, the Nystrom/Woodbury factors and the CG
    state, and reproduces the single-device model element-for-element."""
    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    n_train = 24
    ds = make_dataset("ethanol", n_samples=n_train + 12, seed=3)
    task = create_task(ds, n_train, ds, n_valid=8, sig=5.0,
                       solver="cg", use_sym=False)
    task["solver_tol"] = 1e-10

    mesh = pmesh.make_mesh()
    m_mesh = Trainer().train(task, break_percentage=0.05,
                             str_preconditioner="lev_random", mesh=mesh)
    m_single = Trainer().train(task, break_percentage=0.05,
                               str_preconditioner="lev_random")

    assert m_mesh["solver_iters"] >= 10
    assert abs(int(m_mesh["solver_iters"]) - int(m_single["solver_iters"])) <= 1
    a_m, a_s = np.asarray(m_mesh["alphas_F"]), np.asarray(m_single["alphas_F"])
    np.testing.assert_allclose(a_m, a_s, rtol=1e-6,
                               atol=1e-6 * np.abs(a_s).max())


def test_shard_preconditioner_layouts(problem):
    """Woodbury factors land row-sharded (big factor) / replicated (inner)."""
    import jax.numpy as jnp

    from mlff_tpu.solvers import preconditioners as pc

    spec, cache = problem
    n = cache.n
    rng = np.random.default_rng(2)
    L = jnp.asarray(rng.normal(size=(n, 8)))
    mesh = pmesh.make_mesh()

    P_split = pc.woodbury_from_factor(L, 1e-10)
    v = jnp.asarray(rng.normal(size=n))
    expected = np.asarray(P_split(v))

    P_sh = pmesh.shard_preconditioner(P_split, mesh)
    if hasattr(P_sh, "B"):
        assert len(P_sh.B.addressable_shards) == 8
        assert P_sh.B.addressable_shards[0].data.shape[0] == P_sh.B.shape[0] // 8
    v_sh = pmesh.shard_vector(v, mesh)
    out = np.asarray(P_sh(v_sh))
    np.testing.assert_allclose(out, expected, rtol=1e-10,
                               atol=1e-12 * np.abs(expected).max())


def test_sharded_square_matvec_matches_single_device():
    """Square all-pairs layout sharded over the mesh (VERDICT r2 item 7):
    row-sharded SquareCache matvec must equal the single-device result,
    with the permuted training side sharded too (not replicated)."""
    rng = np.random.default_rng(2)
    n_train, n_atoms = 16, 6
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    perms = np.stack([np.arange(n_atoms),
                      np.array([1, 0, 2, 3, 5, 4])])  # P = 2
    sq = knl.build_cache_square(jnp.asarray(R), jnp.asarray(perms), 10.0, 1e-10)
    n = n_train * n_atoms * 3
    v = jnp.asarray(rng.normal(size=n))
    expected = np.asarray(knl.matvec_psd_square(sq, v))

    mesh = pmesh.make_mesh()
    sq_sh = pmesh.shard_square_cache(sq, mesh)
    assert len(sq_sh.Gst.addressable_shards) == 8
    assert sq_sh.Gst.addressable_shards[0].data.shape[0] == sq.Gst.shape[0] // 8
    v_sh = pmesh.shard_vector(v, mesh)
    out = np.asarray(knl.matvec_psd_square(sq_sh, v_sh))
    np.testing.assert_allclose(out, expected, rtol=1e-10, atol=1e-12)


def test_square_layout_solve_on_mesh():
    """End-to-end solve_iterative with matvec_impl='square' on the mesh
    must converge and match the single-device square solve."""
    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    ds = make_dataset("x", n_samples=40, seed=7, n_atoms=8)
    task = create_task(ds, 16, ds, n_valid=10, sig=10.0, solver="cg",
                       use_sym=False)
    task["matvec_impl"] = "square"
    task["solver_tol"] = 1e-9  # tight tol so both runs land on the solution
    m1 = Trainer().train(task, break_percentage=0.2,
                         str_preconditioner="cholesky_panel")
    mesh = pmesh.make_mesh()
    m8 = Trainer().train(dict(task), break_percentage=0.2,
                         str_preconditioner="cholesky_panel", mesh=mesh)
    assert m1["is_conv"] and m8["is_conv"]
    a1, a8 = np.asarray(m1["alphas_F"]), np.asarray(m8["alphas_F"])
    np.testing.assert_allclose(a8, a1, rtol=1e-5,
                               atol=1e-5 * np.abs(a1).max())


def test_multidevice_predict_eval_parity():
    """Mesh-sharded prediction/eval (VERDICT r2 item 8): Predictor(mesh=)
    shards the query batch over the 8-device mesh and evaluate(mesh=)
    reproduces the single-device error metrics exactly."""
    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.models.evaluate import evaluate
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.predict import Predictor
    from mlff_tpu.models.task import create_task

    ds = make_dataset("ethanol", n_samples=120, seed=9)
    task = create_task(ds, 24, ds, n_valid=8, sig=5.0, solver="cg",
                       use_sym=False)
    model = Trainer().train(task, break_percentage=0.2,
                            str_preconditioner="lev_random")

    mesh = pmesh.make_mesh()
    R = ds["R"][:40]
    e1, f1 = Predictor(model).predict(R)
    e8, f8 = Predictor(model, mesh=mesh).predict(R)
    np.testing.assert_allclose(e8, e1, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(f8, f1, rtol=1e-10, atol=1e-12)
    # uneven / smaller-than-mesh batches pad correctly
    e3, f3 = Predictor(model, mesh=mesh).predict(R[:3])
    np.testing.assert_allclose(e3, e1[:3], rtol=1e-10, atol=1e-12)

    r1 = evaluate(model, ds, n_points=30)
    r8 = evaluate(model, ds, n_points=30, mesh=mesh)
    assert r1.n_points == r8.n_points
    np.testing.assert_allclose(r8.f_mae, r1.f_mae, rtol=1e-9)
    np.testing.assert_allclose(r8.cos_mae, r1.cos_mae, rtol=1e-9)
