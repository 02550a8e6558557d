"""Mixed-precision (f32-GEMM) CG matvec: iteration parity and true-residual
correctness vs the full-f64 path.

Design facts (measured via the noise-injection knee protocol, ethanol
n = 15,741, lev_random k/n = 0.105, tol 1e-4):
  * matvec-output noise up to 1e-8 relative costs ~0 extra iterations,
    1e-7 costs <4% — so f32 GEMM operands (2^-24, HIGHEST-precision
    passes) are safe for the K@v product;
  * preconditioner-APPLY noise at 1e-8 already costs +24% — so the
    preconditioner build and apply stay f64;
  * the lam*v term must be added in f64 (lam = 1e-10 underflows f32's
    resolution against diag(K)), which matvec_psd does by keeping
    cache.lam and the CG state f64.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.data.synthetic import make_benchmark_dataset
from mlff_tpu.models.gdml import Trainer
from mlff_tpu.models.task import create_task
from mlff_tpu.ops import kernel as knl
from mlff_tpu.ops import descriptor as dsc


def _task(n_train=40):
    ds, perms = make_benchmark_dataset("ethanol", n_train + 20)
    return create_task(ds, n_train, ds, n_valid=10, sig=10.0, solver="cg",
                       perms=perms)


def test_downcast_cache_matvec_close():
    task = _task()
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    lo = knl.downcast_cache(cache)
    assert lo.Xqt.dtype == jnp.float32 and lo.A_exp.dtype == jnp.float32
    assert lo.Jc.dtype == jnp.float64 and lo.lam.dtype == jnp.float64

    v = jnp.asarray(np.random.default_rng(0).normal(size=cache.n))
    hi_out = np.asarray(knl.matvec_psd(cache, v))
    lo_out = np.asarray(knl.matvec_psd(lo, v))
    rel = np.linalg.norm(lo_out - hi_out) / np.linalg.norm(hi_out)
    assert rel < 1e-5, rel


def test_mixed_matvec_solve_parity():
    task = _task()
    m64 = Trainer().train(task, break_percentage=0.1,
                          str_preconditioner="lev_random")
    task32 = dict(task, matvec_dtype="float32")
    m32 = Trainer().train(task32, break_percentage=0.1,
                          str_preconditioner="lev_random")
    assert m32["is_conv"] and m64["is_conv"]
    # NOTE on iterations: this tiny problem (n ~ 1k at calibrated
    # difficulty, 535-iteration f64 baseline at k/n = 0.1) is far more
    # ill-conditioned than any production operating point; the f32 error
    # floor costs several-fold iterations HERE, while at the benchmark
    # scales (n >= 15k) the measured penalty is small.  What this test
    # gates is CORRECTNESS: with residual replacement the solver must not
    # fake convergence — the converged iterate must satisfy the true f64
    # system to tolerance (without replacement the recursive residual
    # drifts and reports 1e-4 while the true residual sits at 1e-2).

    # the mixed-precision solution must satisfy the ORIGINAL f64 system to
    # the solver tolerance (true residual, not the recursive one)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    y, y_std, _ = tr.labels(task)
    cache = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]), 1e-10)
    x = jnp.asarray(-np.asarray(m32["alphas_F"]))  # back to PSD convention
    resid = np.linalg.norm(
        np.asarray(knl.matvec_psd(cache, x)) - y
    ) / np.linalg.norm(y)
    assert resid <= 1.3e-4, resid


def test_mixed_chunkacc_matvec_close():
    """The centered + chunk-accumulated mixed matvec must sit well inside
    the measured 1e-7 noise knee (the plain-f32 path lands at 1e-5..1e-6
    on TPU; this path's error is ~sqrt(chunk) * 2^-24 by construction)."""
    task = _task()
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    rng = np.random.default_rng(1)
    worst = 0.0
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=cache.n))
        hi = np.asarray(knl.matvec_psd(cache, v))
        mx = np.asarray(knl.matvec_psd_mixed(cache, v))
        worst = max(worst,
                    np.linalg.norm(mx - hi) / np.linalg.norm(hi))
    assert worst < 3e-7, worst


def test_mixed_chunkacc_solve_parity():
    """matvec_dtype='mixed' must converge with a TRUE f64 residual at
    tolerance.  Iteration parity is NOT gated here: this tiny calibrated
    problem (n ~ 1k) is far more ill-conditioned than any production
    operating point and amplifies even knee-level (1e-7) matvec noise
    several-fold (same caveat as the plain-f32 test above); the parity
    gate lives in test_mixed_chunkacc_iteration_parity_15k at the archived
    n = 15,741 operating point."""
    task = _task()
    m64 = Trainer().train(task, break_percentage=0.1,
                          str_preconditioner="lev_random")
    taskmx = dict(task, matvec_dtype="mixed")
    mmx = Trainer().train(taskmx, break_percentage=0.1,
                          str_preconditioner="lev_random")
    assert mmx["is_conv"] and m64["is_conv"]

    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    y, y_std, _ = tr.labels(task)
    cache = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]), 1e-10)
    x = jnp.asarray(-np.asarray(mmx["alphas_F"]))
    resid = np.linalg.norm(
        np.asarray(knl.matvec_psd(cache, x)) - y
    ) / np.linalg.norm(y)
    assert resid <= 1.3e-4, resid


@pytest.mark.slow
def test_mixed_chunkacc_honest_at_15k():
    """The mixed matvec at the archived n = 15,741 operating point
    (sig 10, lev_random, k/n = 0.105) must stay HONEST, not fast.

    On spectra that reach the ridge floor lam (which the calibrated
    workload does), the preconditioner output carries 1/lam-amplified
    components and CG needs matvec accuracy ~lam/||K|| ~ 1e-12 — beyond
    the mixed path's ~2e-8 grade (measured divergence at n = 31,482:
    residual 3,500x ||b|| by iteration 50; see RESULTS.md).  Iteration
    parity is therefore NOT expected here.  What IS required:
      * the residual-replacement backstop must prevent FAKE convergence —
        if the solver reports converged, the TRUE f64 residual is at
        tolerance;
      * a bounded budget terminates (no unbounded default-maxiter run).
    """
    ds, perms = make_benchmark_dataset("ethanol", 583 + 60)
    task = create_task(ds, 583, ds, n_valid=40, sig=10.0, solver="cg",
                       perms=perms)
    m64 = Trainer().train(task, break_percentage=0.105,
                          str_preconditioner="lev_random")
    assert m64["is_conv"]
    it64 = int(m64["solver_iters"])
    taskmx = dict(task, matvec_dtype="mixed",
                  solver_maxiter=int(3 * it64))
    mmx = Trainer().train(taskmx, break_percentage=0.105,
                          str_preconditioner="lev_random")
    if mmx["is_conv"]:
        tr = Trainer()
        spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
        y, y_std, _ = tr.labels(task)
        # rebuild the EXACT solved operator: the CG path bumps the task's
        # ridge to Trainer.CG_LAM — read it from the trained model rather
        # than hard-coding, so a future ridge-policy change keeps this
        # residual check honest
        cache = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]),
                                float(mmx["lam"]))
        x = jnp.asarray(-np.asarray(mmx["alphas_F"]))
        resid = np.linalg.norm(
            np.asarray(knl.matvec_psd(cache, x)) - y
        ) / np.linalg.norm(y)
        assert resid <= 1.3e-4, resid


def test_mixed_otf_matvec_close():
    """The OTF mixed matvec (pairwise=False cache, the n = 500k layout)
    matches the f64 operator within the noise knee, like the cached form."""
    task = _task(n_train=60)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)
    cache_otf = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10, pairwise=False)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=cache.n))
    hi = np.asarray(knl.matvec_psd(cache, v))
    mo = np.asarray(knl.matvec_psd_mixed(cache_otf, v))
    rel = np.linalg.norm(mo - hi) / np.linalg.norm(hi)
    assert rel < 3e-7, rel
