"""Ozaki exact-slice factor-build GEMMs vs the f64 reference path.

Round-5: the O(n m^2) whiten + Gram products of the Nystrom build run
through ops/ozaki.py on TPU (VERDICT r4 next 3).  These tests pin the
CPU parity of every impl-switched helper: the whiten transform, the
fused whiten+Gram, the pairwise colblock Gram, and the colblock whiten
sweep.  Accuracy contract: ~2^-(8*s) relative to per-row/column operand
scales at s = 7 — comfortably below the 0.1*lam = 1e-11 self-consistency
guard threshold the build enforces at runtime.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mlff_tpu.solvers import preconditioners as pc


@pytest.fixture(scope="module")
def factor_problem():
    rng = np.random.default_rng(3)
    n, m = 700, 96
    K_nm = rng.normal(size=(n, m)) * np.exp(rng.normal(size=(1, m)))
    # upper-triangular whitening factor, like chol-host W1 = L^-T
    W1 = np.triu(rng.normal(size=(m, m)) * 0.3 + np.eye(m))
    return K_nm, W1


def test_whiten_gram_parity(factor_problem):
    K_nm, W1 = factor_problem
    n, m = K_nm.shape
    tril = jnp.asarray(np.tril_indices(m))
    chunk = 256  # exercises full chunks + ragged masked tail (700 % 256)
    B64, g64 = pc._whiten_gram_nm_tril(
        jnp.asarray(K_nm), jnp.asarray(W1), tril, chunk, "f64")
    Boz, goz = pc._whiten_gram_nm_tril(
        jnp.asarray(K_nm), jnp.asarray(W1), tril, chunk, "ozaki")
    B_ref = K_nm @ W1
    scale = np.abs(B_ref).max()
    assert np.abs(np.asarray(B64) - B_ref).max() < 1e-12 * scale
    assert np.abs(np.asarray(Boz) - B_ref).max() < 1e-12 * scale
    # Gram self-consistency: inner must match the STORED factor's Gram to
    # ~lam absolute (the production guard threshold is 0.1 * 1e-10)
    G_ref = (B_ref.T @ B_ref)[np.tril_indices(m)]
    gscale = np.abs(G_ref).max()
    assert np.abs(np.asarray(goz) - G_ref).max() < 1e-12 * max(gscale, 1.0)


def test_gram_pair_parity(factor_problem):
    K_nm, W1 = factor_problem
    Ba = jnp.asarray(K_nm[:, :64])
    Bb = jnp.asarray(K_nm[:, 64:])
    ref = np.asarray(Ba).T @ np.asarray(Bb)
    for impl in ("f64", "ozaki"):
        G = np.asarray(pc._gram_pair(Ba, Bb, 256, impl))
        assert np.abs(G - ref).max() < 1e-12 * max(np.abs(ref).max(), 1.0)


def test_whiten_colblock_parity(factor_problem):
    K_nm, W1 = factor_problem
    n, m = K_nm.shape
    bc = 32
    offs = list(range(0, m, bc))
    ref = K_nm @ W1  # full-product reference (W1 upper triangular)
    for impl in ("f64", "ozaki"):
        blocks = [jnp.asarray(K_nm[:, o:o + bc]) for o in offs]
        for c in reversed(range(len(blocks))):
            blocks[c] = pc._whiten_colblock(
                blocks[c], tuple(blocks[:c]), jnp.asarray(W1),
                offs[c], tuple(offs[:c]), 256, impl)
        got = np.concatenate([np.asarray(b) for b in blocks], axis=1)
        assert np.abs(got - ref).max() < 1e-12 * np.abs(ref).max()


def test_build_mode_selection(monkeypatch):
    # 'auto' = f64 for the monolithic build (ozaki measured 10x SLOWER at
    # deep contractions — see the engine-selection note), but the huge-n
    # colblock Gram flips to ozaki where the depth-capped f64 accumulation
    # approaches the 0.1*lam guard (measured 1.46e-11 bias at n = 504k)
    monkeypatch.setattr(pc, "_BUILD_GEMM_MODE", None)
    monkeypatch.delenv("MLFF_BUILD_GEMM", raising=False)
    assert pc._build_mode() == "f64"
    assert pc._gram_impl_for(74_979) == "f64"    # passes the lam guard
    assert pc._gram_impl_for(158_004) == "ozaki"  # fails it (4.09e-11)
    assert pc._gram_impl_for(503_982) == "ozaki"  # fails it (1.46e-11)
    monkeypatch.setattr(pc, "_BUILD_GEMM_MODE", None)
    monkeypatch.setenv("MLFF_BUILD_GEMM", "ozaki")
    assert pc._build_mode() == "ozaki"
    assert pc._gram_impl_for(1_000) == "ozaki"
    monkeypatch.setattr(pc, "_BUILD_GEMM_MODE", None)
