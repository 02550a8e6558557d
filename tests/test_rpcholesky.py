"""Blocked randomly-pivoted Cholesky: factor validity, approximation quality
vs greedy pivoting, and preconditioner effectiveness."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.solvers import preconditioners as pc
from mlff_tpu.solvers.cg import pcg
from mlff_tpu.solvers.pivoted_cholesky import block_rp_cholesky, pivoted_cholesky

SIG, LAM = 10.0, 1e-10


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n_atoms, n_train = 4, 14
    R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
    spec = dsc.make_spec(n_atoms)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    return spec, cache


def test_factor_approximates_kernel(setup):
    spec, cache = setup
    K = np.asarray(knl.assemble_full(spec, cache)) + LAM * np.eye(cache.n)
    k = 64
    res, info = block_rp_cholesky(spec, cache, max_rank=k, block=16, seed=1)
    assert res.L.shape == (cache.n, k)
    approx = np.asarray(res.L) @ np.asarray(res.L).T
    # approximation error bounded by the residual trace (plus factor slack)
    err = np.linalg.norm(K - approx)
    assert err < 5 * max(info["remaining_diag_error"], 1e-10)
    # pivots unique
    piv = np.asarray(res.pivots)
    assert len(set(piv.tolist())) == len(piv)


def test_quality_comparable_to_greedy(setup):
    """As a preconditioner, block-RP and greedy pivoting give similar CG
    iteration counts at equal rank."""
    spec, cache = setup
    n = cache.n
    b = jnp.asarray(np.random.default_rng(2).normal(size=n))
    k = n // 3
    mv = lambda v: knl.matvec_psd(cache, v)

    greedy, _ = pivoted_cholesky(spec, cache, max_rank=k)
    res_g = pcg(mv, b, precon=pc.woodbury_from_factor(greedy.L, LAM),
                tol=1e-4, maxiter=600)

    rp, _ = block_rp_cholesky(spec, cache, max_rank=k, block=16, seed=3)
    res_r = pcg(mv, b, precon=pc.woodbury_from_factor(rp.L, LAM),
                tol=1e-4, maxiter=600)

    assert res_g.converged and res_r.converged
    assert res_r.num_iters <= 2.5 * res_g.num_iters + 10


def test_block_size_one_reduces_to_random_pivoting(setup):
    spec, cache = setup
    res, info = block_rp_cholesky(spec, cache, max_rank=8, block=1, seed=4)
    assert res.L.shape[1] == 8
    assert len(info["pivots"]) == 8


def test_rpcholesky_strategy_trains(ethanol_ds):
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    task = create_task(ethanol_ds, n_train=20, valid_dataset=ethanol_ds,
                       n_valid=10, sig=5.0, solver="cg")
    model = Trainer().train(
        dict(task), break_percentage=0.25, str_preconditioner="rpcholesky"
    )
    assert bool(model["is_conv"])


def test_panel_factor_validity(setup):
    from mlff_tpu.solvers.pivoted_cholesky import panel_pivoted_cholesky

    spec, cache = setup
    K = np.asarray(knl.assemble_full(spec, cache)) + LAM * np.eye(cache.n)
    k = 64
    res, info = panel_pivoted_cholesky(spec, cache, max_rank=k, block=16)
    assert res.L.shape == (cache.n, k)
    approx = np.asarray(res.L) @ np.asarray(res.L).T
    err = np.linalg.norm(K - approx)
    assert err < 5 * max(info["remaining_diag_error"], 1e-10)
    piv = np.asarray(res.pivots)
    assert len(set(piv.tolist())) == len(piv)


def test_panel_quality_close_to_exact_greedy(setup):
    """Greedy panel pivoting must track the exact greedy loop's CG iteration
    count closely (the panel only skips intra-round diagonal re-ranking)."""
    from mlff_tpu.solvers.pivoted_cholesky import panel_pivoted_cholesky

    spec, cache = setup
    n = cache.n
    b = jnp.asarray(np.random.default_rng(5).normal(size=n))
    k = n // 3
    mv = lambda v: knl.matvec_psd(cache, v)

    greedy, _ = pivoted_cholesky(spec, cache, max_rank=k)
    res_g = pcg(mv, b, precon=pc.woodbury_from_factor(greedy.L, LAM),
                tol=1e-4, maxiter=600)

    panel, _ = panel_pivoted_cholesky(spec, cache, max_rank=k, block=16)
    res_p = pcg(mv, b, precon=pc.woodbury_from_factor(panel.L, LAM),
                tol=1e-4, maxiter=600)

    assert res_g.converged and res_p.converged
    assert res_p.num_iters <= 1.3 * res_g.num_iters + 5


def test_panel_block_one_matches_exact_greedy_pivots(setup):
    """block=1 degenerates to the exact greedy algorithm: same pivot order."""
    from mlff_tpu.solvers.pivoted_cholesky import panel_pivoted_cholesky

    spec, cache = setup
    k = 24
    greedy, _ = pivoted_cholesky(spec, cache, max_rank=k)
    panel, _ = panel_pivoted_cholesky(spec, cache, max_rank=k, block=1)
    np.testing.assert_array_equal(np.asarray(greedy.pivots),
                                  np.asarray(panel.pivots))
    # factors agree to roundoff (the fori_loop variant hard-zeroes chosen
    # rows, the panel relies on exact cancellation — ~1e-8 differences)
    np.testing.assert_allclose(np.asarray(greedy.L), np.asarray(panel.L),
                               rtol=1e-5, atol=1e-7)


def test_cholesky_panel_strategy_trains(ethanol_ds):
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    task = create_task(ethanol_ds, n_train=20, valid_dataset=ethanol_ds,
                       n_valid=10, sig=5.0, solver="cg")
    model = Trainer().train(
        dict(task), break_percentage=0.25, str_preconditioner="cholesky_panel"
    )
    assert bool(model["is_conv"])
