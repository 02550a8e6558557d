"""Mixed-precision iterative refinement: converges in the representable
regime (lam >= ~1e-7), detects and reports the f32 accuracy floor in the
production lam = 1e-10 regime (documented negative result)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlff_tpu.data.synthetic import make_dataset
from mlff_tpu.ops import descriptor as dsc
from mlff_tpu.ops import kernel as knl
from mlff_tpu.solvers import preconditioners as pc
from mlff_tpu.solvers.cg import pcg
from mlff_tpu.solvers.ir_cg import ir_pcg_kernel

SIG = 5.0


def _problem(lam):
    ds = make_dataset("ethanol", n_samples=60, seed=3)
    spec = dsc.make_spec(9)
    S = dsc.incidence_matrix(spec)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"][:60]))
    P_idx = jnp.asarray(dsc.desc_perms(np.arange(9)[None, :]))
    y = ds["F"][:60].ravel()
    y = y / y.std()
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, lam)
    P = pc.nystrom_preconditioner(
        spec, cache, pc.select_random(cache.n, cache.n // 8,
                                      np.random.default_rng(0)), lam
    )
    return spec, cache, P, jnp.asarray(y)


def test_ir_converges_at_moderate_lambda():
    lam = 1e-6
    spec, cache, P, b = _problem(lam)
    res = ir_pcg_kernel(spec, cache, b, P.fused_T(), lam, tol=1e-4, inner_tol=1e-2,
                        inner_maxiter=300)
    assert res.converged
    assert res.outer_iters <= 6
    # solution agrees with the f64 solve
    res64 = pcg(lambda v: knl.matvec_psd(cache, v), b, precon=P, tol=1e-6,
                maxiter=3000)
    scale = np.abs(res64.x).max()
    np.testing.assert_allclose(res.x, res64.x, atol=2e-4 * scale)


def test_ir_detects_f32_floor_at_production_lambda():
    """lam = 1e-10 needs ~9 significant digits — reduced precision cannot
    represent the operator's small end; IR must stop and report rather than
    silently return garbage."""
    lam = 1e-10
    spec, cache, P, b = _problem(lam)
    res = ir_pcg_kernel(spec, cache, b, P.fused_T(), lam, tol=1e-4, inner_tol=1e-2,
                        inner_maxiter=100, max_outer=3)
    assert not res.converged
    assert res.outer_iters <= 3  # stalls early instead of looping forever
