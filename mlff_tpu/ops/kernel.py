"""Matérn-5/2 Hessian force-field kernel: matvec, assembly, columns, diagonal.

This is the TPU-native replacement for three reference components at once:
kernel assembly (reference: sgdml/train.py:150-236, 1121-1308), the CPU matvec
engine (reference: sgdml/predict.py:72-234) and the GPU matvec engine
(reference: sgdml/torchtools.py:172-272).

Math.  For training descriptors x_i (D,) with compressed Jacobians J_i and a
permutation group acting by descriptor index arrays P (P_perms, D), the PSD
kernel block between training points i, j is

    K[i, j] = Jf_i^T  sum_p  base_p [ (sig^2 + sig*n_p) I - 5 d_p d_p^T ] Jf~_{j,p}

with d_p = x_i - x_j[P_p],  n_p = sqrt(5) ||d_p||,
base_p = 5 exp(-n_p / sig) / (3 sig^4),  Jf~ the row-permuted full Jacobian.
(The reference assembles the *negated* matrix; see package docstring.)

TPU design:
  * ``matvec``: everything reduces to dense matmuls via the Gram trick.  The
    pairwise distance matrix, its exponential and the (1+dist) weight are
    **precomputed once per solve** (``KernelCache``); each CG iteration is then
    three [N, M] x [M, D]-shaped GEMMs plus elementwise work — no
    transcendentals, no descriptor recomputation.  The reference re-walks
    training-point chunks and re-evaluates exp() on every iteration.
  * ``assemble_block``: tiled dense assembly for the analytic solver, Nyström
    column extraction, and spectra diagnostics.
  * Compressed-Jacobian contractions ride the +/-1 incidence matmul from
    ops.descriptor, so they hit the MXU as well.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .descriptor import DescriptorSpec, d_desc_dot_vec, vec_dot_d_desc

SQRT5 = math.sqrt(5.0)


class KernelCache(NamedTuple):
    """Per-solve device-resident state of the implicit kernel operator.

    Shapes: N = n_train, P = n_perms, M = N*P, D = descriptor dim,
    A = n_atoms.  All leaves are jnp arrays => this is a pytree.
    """

    X: jnp.ndarray        # (N, D) descriptors
    Jc: jnp.ndarray       # (N, D, 3) compressed Jacobians
    S: jnp.ndarray        # (D, A) incidence matrix
    P_idx: jnp.ndarray    # (P, D) descriptor permutations (int32)
    Xq: jnp.ndarray       # (N, D) q-scaled descriptors, q = sqrt(5)/sig
    Xqt: jnp.ndarray      # (M, D) q-scaled permuted descriptors
    A_exp: jnp.ndarray    # (N, M) 5/(3 sig^2) * exp(-dist)
    A_exp1: jnp.ndarray   # (N, M) A_exp * (1 + dist)
    sig: jnp.ndarray      # () kernel length scale
    lam: jnp.ndarray      # () ridge regularization
    # Optional square all-pairs layout fields (large-A fast paths; built by
    # build_cache(..., R=...) for single-perm molecules — see SquareCache)
    Xsq: jnp.ndarray | None = None   # (N, A, A) 1/sqrt(2)-scaled descriptors
    Gsq: jnp.ndarray | None = None   # (N, A, A, 3) scaled Jacobian field
    # Precomputed per-point assembly projections (see _square_point_columns;
    # N^2*A*120 bytes — built when that fits, i.e. the nanotube regime)
    Usq: jnp.ndarray | None = None   # (N, N, A, 3)  U[j, n, b, x]
    Zsq: jnp.ndarray | None = None   # (N, N, A, 3)  Z[j, n, a, y]
    C1sq: jnp.ndarray | None = None  # (N, N, A, 3, 3) C1[j, n, b, x, y]

    @property
    def n_train(self) -> int:
        return self.X.shape[0]

    @property
    def n_perms(self) -> int:
        return self.P_idx.shape[0]

    @property
    def n(self) -> int:
        """Kernel dimension n = 3 * A * N."""
        return self.S.shape[1] * 3 * self.X.shape[0]


def permuted_descriptors(X: jnp.ndarray, P_idx: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N*P, D): row (j*P + p) = X[j, P_idx[p]] (point-major order,
    matching the reference's R_desc_perms layout, predict.py:420-447)."""
    Xt = X[:, P_idx]  # (N, P, D)
    return Xt.reshape(-1, X.shape[1])


def pairwise_dist_gram(Xq_a: jnp.ndarray, Xq_b: jnp.ndarray):
    """Pairwise distances ||a_i - b_j|| via the Gram trick (pure matmul).

    The Gram GEMM carries an explicit HIGHEST precision: a no-op at f64,
    but when the operands arrive downcast (the mixed-precision OTF matvec
    streams f32 Xq/Xqt) the TPU default would run a single bf16 pass whose
    ~1e-3 relative error corrupts the distances — and every exp weight
    derived from them — far beyond what residual replacement can absorb."""
    na = jnp.sum(Xq_a * Xq_a, axis=1)
    nb = jnp.sum(Xq_b * Xq_b, axis=1)
    g = jnp.matmul(Xq_a, Xq_b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(na[:, None] + nb[None, :] - 2.0 * g, 0.0)
    return jnp.sqrt(d2)


def downcast_cache(cache: "KernelCache", dtype=jnp.float32) -> "KernelCache":
    """Copy of a (f64-built) cache with the per-iteration GEMM operands
    (Xq/Xqt/A_exp/A_exp1) downcast for the mixed-precision CG matvec.

    Split-phase design: the preconditioner build keeps the f64 cache (its
    factors must not carry frozen low-precision error — the apply is the
    noise-sensitive operator, see the noise-knee measurement in
    tests/test_mixed_matvec.py), while the solve-phase matvec streams the
    downcast copy.  The lam/X/Jc leaves stay f64: the (K v) result is cast
    back and combined with lam*v in f64, which is what makes reduced
    precision usable at lam = 1e-10 at all."""
    return cache._replace(
        Xq=cache.Xq.astype(dtype),
        Xqt=cache.Xqt.astype(dtype),
        A_exp=None if cache.A_exp is None else cache.A_exp.astype(dtype),
        A_exp1=None if cache.A_exp1 is None else cache.A_exp1.astype(dtype),
    )


@partial(jax.jit, static_argnames=("compute_dtype", "pairwise"))
def build_cache(
    X: jnp.ndarray,
    Jc: jnp.ndarray,
    S: jnp.ndarray,
    P_idx: jnp.ndarray,
    sig: float,
    lam: float,
    compute_dtype=None,
    R: jnp.ndarray | None = None,
    pairwise: bool = True,
) -> KernelCache:
    """Build the per-solve operator cache.

    ``compute_dtype`` (None = keep f64) downcasts the *pairwise* caches
    (Xq/Xqt/A_exp/A_exp1) — the operands of the per-iteration GEMMs — for a
    mixed-precision matvec: distances/exponentials are always computed in
    f64 first, the CG state and the Jacobian contractions stay f64, only the
    large matmuls run at reduced precision.  This is the explicit
    speed-vs-parity experiment of SURVEY.md §7.1 (f64 on TPU is emulated).

    Measured result: plain-CG with an f32/bf16 matvec DIVERGES on the
    production system (lam = 1e-10 against diag(K) ~ 1e-1..1e-4 needs ~9
    significant digits).  Reduced precision is only usable inside an
    iterative-refinement outer loop (see solvers.cg notes), or for force
    prediction / preconditioner-quality experiments at loose tolerance.
    """
    q = SQRT5 / sig
    Xq = q * X
    Xqt = permuted_descriptors(Xq, P_idx)
    if pairwise:
        dist = pairwise_dist_gram(Xq, Xqt)
        A_exp = (5.0 / (3.0 * sig**2)) * jnp.exp(-dist)
        A_exp1 = A_exp * (1.0 + dist)
    else:
        # large-n mode: the (N, M) pairwise caches alone cost 5.5 GB at
        # n=500k — the matvec recomputes them per row tile instead
        # (_matvec_ref_otf); everything else is unchanged
        A_exp = A_exp1 = None
    if compute_dtype is not None:
        Xq = Xq.astype(compute_dtype)
        Xqt = Xqt.astype(compute_dtype)
        if pairwise:
            A_exp = A_exp.astype(compute_dtype)
            A_exp1 = A_exp1.astype(compute_dtype)
    Xsq = Gsq = Usq = Zsq = C1sq = None
    if R is not None:
        # square all-pairs layout for the large-A fast paths (exact-scaled:
        # see SquareCache)
        N = X.shape[0]
        Rd = jnp.asarray(R, X.dtype).reshape(N, -1, 3)
        A = Rd.shape[1]
        diffs = Rd[:, :, None, :] - Rd[:, None, :, :]
        d2 = jnp.sum(diffs * diffs, axis=-1)
        eye = jnp.eye(A, dtype=bool)[None]
        inv = jnp.where(eye, 0.0, 1.0 / jnp.sqrt(jnp.where(eye, 1.0, d2)))
        isqrt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, X.dtype))
        Xsq = ((SQRT5 / sig) * isqrt2) * inv
        Gsq = diffs * (isqrt2 * inv**3)[..., None]
        if N * N * A * 120 <= int(2e9):
            # per-point assembly projections, shared by every column of a
            # point across ALL assembly calls (the panel-Cholesky loop was
            # recomputing them 36x28 times -> 102 s of its 142 s build)
            def one_point(j):
                delta = (Xsq - Xsq[j][None]) * (sig / SQRT5)   # (N, A, A)
                U = -2.0 * jnp.sum(delta[..., None] * Gsq[j][None], axis=2)
                Z = 2.0 * jnp.sum(delta[..., None] * Gsq, axis=1)
                C1 = 2.0 * jnp.einsum("ibx,niby->nbxy", Gsq[j], Gsq)
                return U, Z, C1

            Usq, Zsq, C1sq = jax.lax.map(one_point, jnp.arange(N))
    return KernelCache(
        X=X, Jc=Jc, S=S, P_idx=P_idx.astype(jnp.int32), Xq=Xq, Xqt=Xqt,
        A_exp=A_exp, A_exp1=A_exp1,
        sig=jnp.asarray(sig, X.dtype), lam=jnp.asarray(lam, X.dtype),
        Xsq=Xsq, Gsq=Gsq, Usq=Usq, Zsq=Zsq, C1sq=C1sq,
    )


def _desc_forces(cache: KernelCache, Xq_query, A_exp, A_exp1, wt):
    """Descriptor-space force contraction shared by matvec and prediction.

    Returns (F_desc (B, D), E (B,)) in the reference predictor's sign
    convention (so F maps to K_ref @ v; energies carry the trained -E flip,
    reference predict.py:202-218).  NOTE: F_desc is the descriptor-space
    cotangent to be contracted against the *Jacobian* (predict.py:229-233);
    the reference GPU path's extra xs**3 factor (torchtools.py:259) belongs
    to its raw-coordinate-diff contraction and must NOT appear here.

    (A two-wide-GEMM fusion via operand augmentation was benchmarked at
    7.83 vs 7.50 ms/iter for this three-GEMM form — no gain, so the simpler
    formulation stays.)
    """
    return _desc_forces_x(cache.Xqt, cache.sig, Xq_query, A_exp, A_exp1, wt)


def _desc_forces_x(Xqt, sig, Xq_query, A_exp, A_exp1, wt):
    """_desc_forces on explicit training descriptors — the same math serves
    the packed (B, D) and the square (B, A*A) descriptor layouts, since
    every step is an inner product / linear map in descriptor space.

    The three big GEMMs carry an explicit precision: at f64 it is a no-op;
    at f32 (build_cache compute_dtype=float32) HIGHEST selects the bf16x6
    passes (~2^-24 relative) instead of the single-pass bf16 default whose
    ~1e-3 error breaks CG (the noise-knee measurement tolerates 1e-7 in
    the matvec at <4% extra iterations but diverges around 1e-3)."""
    hp = jax.lax.Precision.HIGHEST
    ct = jnp.sum(Xqt * wt, axis=1)                  # (M,)
    dot = jnp.matmul(Xq_query, wt.T, precision=hp) - ct[None, :]  # (B, M)
    G = A_exp * dot
    F1 = Xq_query * jnp.sum(G, axis=1, keepdims=True) \
        - jnp.matmul(G, Xqt, precision=hp)
    F2 = jnp.matmul(A_exp1, wt, precision=hp)
    F_desc = F1 - F2
    q = SQRT5 / sig
    E = jnp.sum(A_exp1 * dot, axis=1) / q
    return F_desc, E


def perm_expand_w(w: jnp.ndarray, P_idx: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N*P, D) permuted copies of per-point descriptor cotangents
    (the reference's R_d_desc_alpha_perms / _Jx_alphas, torchtools.py:142-151)."""
    return w[:, P_idx].reshape(-1, w.shape[1])


# ---------------------------------------------------------------------------
# Mixed-precision matvec (f32 MXU GEMMs, f64-accurate result)
# ---------------------------------------------------------------------------
#
# TPU f64 GEMMs are emulated (8-way operand splits) and run the per-CG-
# iteration contraction at ~0.1% of the chip's f32 peak.  A plain f32
# downcast of the matvec lands ~1e-5..1e-6 relative error — past the
# measured noise knee (1e-7 fresh matvec noise costs <4% iterations,
# tests/test_mixed_matvec.py) — for two separable reasons measured here:
#
#   1. CANCELLATION in the Gram-trick dot:  dot = Xq.wt - Xqt.wt rounds
#      at the magnitude of the *uncancelled* products, which exceed the
#      difference by the inverse thermal-displacement scale (~10-100x).
#      Fix: center both descriptor sets by a common vector c before the
#      GEMM (algebraically exact:  (Xq-c).wt - (Xqt-c).wt = dot), so
#      products already live at the difference scale.
#   2. f32 ACCUMULATION over the M = N*P kernel axis (~sqrt(M) * 2^-24).
#      Fix: split the contraction into chunks of _MIXED_CHUNK columns,
#      one batched f32 GEMM computes all chunk partials on the MXU, and
#      the partials are summed in f64 on the VPU.
#
# Operand quantization (2^-24 of the cached A_exp/A_exp1/Xqt and of the
# per-iteration w) is corrected with one extra GEMM per split operand
# (hi/lo error-free splitting, ops.df64.split_f64): the correction terms
# are 2^-24-scaled, so plain f32 GEMMs handle them at 2^-48 overall.
# Everything outside the (B, M)-shaped GEMMs stays f64.

_MIXED_CHUNK = 32


def _gemm_f32_chunkacc(A32: jnp.ndarray, B32: jnp.ndarray,
                       mc: int | None = None) -> jnp.ndarray:
    """A32 (B, M) @ B32 (M, D) with f32 MXU products and f64 chunk
    accumulation.

    With randomly-cancelling terms (the F2 = A_exp1 @ wt reduction cancels
    ~sqrt(M)-fold: wt carries signed Jacobian weights), the f32 running-sum
    rounding lands at ~2^-24 * mc / sqrt(M) relative to the result — the
    chunk size controls the error LINEARLY, so mc = 32 puts the bench-scale
    matvec (M ~ 7000) at ~2e-8, well inside the 1e-7 noise knee.  The
    narrow contraction pads to a 128-wide MXU tile (4x pad waste) but the
    GEMMs are bandwidth-bound, not MXU-bound."""
    hp = jax.lax.Precision.HIGHEST
    if mc is None:
        mc = _MIXED_CHUNK
    B_, M = A32.shape
    D = B32.shape[1]
    nc = -(-M // mc)
    pad = nc * mc - M
    if pad:
        A32 = jnp.concatenate(
            [A32, jnp.zeros((B_, pad), A32.dtype)], axis=1)
        B32 = jnp.concatenate(
            [B32, jnp.zeros((pad, D), B32.dtype)], axis=0)
    part = jnp.einsum(
        "bnm,nmd->nbd",
        A32.reshape(B_, nc, mc), B32.reshape(nc, mc, D), precision=hp,
    )                                                   # (nc, B, D) f32
    return jnp.sum(part.astype(jnp.float64), axis=0)


def _rowsum_f32_chunkacc(A32: jnp.ndarray, mc: int | None = None):
    """sum(A32, axis=1) with f64 chunk accumulation: (B, M) f32 -> (B,) f64."""
    if mc is None:
        mc = _MIXED_CHUNK
    B_, M = A32.shape
    nc = -(-M // mc)
    pad = nc * mc - M
    if pad:
        A32 = jnp.concatenate([A32, jnp.zeros((B_, pad), A32.dtype)], axis=1)
    part = jnp.sum(A32.reshape(B_, nc, mc), axis=2)     # (B, nc) f32
    return jnp.sum(part.astype(jnp.float64), axis=1)


@jax.jit
def matvec_ref_mixed(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """K_ref @ v with f32 MXU GEMMs and ~1e-7-grade f64 accuracy.

    Takes the FULL f64 cache (downcasts/splits happen inside the jit; they
    are bandwidth-cheap next to the GEMM transients).  Matches matvec_ref
    to ~sqrt(_MIXED_CHUNK) * 2^-24 relative — inside the measured noise
    knee, so CG iteration counts track the f64 path within a few percent
    while the GEMMs run at f32 MXU speed instead of 8-split f64 emulation.
    """
    from .df64 import split_f64

    hp = jax.lax.Precision.HIGHEST
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    v3 = v.reshape(N, A, 3)
    w64 = d_desc_dot_vec(cache.Jc, cache.S, v3)         # (N, D) f64
    wt64 = perm_expand_w(w64, cache.P_idx)              # (M, D) f64

    # 1. centered dot GEMM (f64 operands live in the cache)
    c = jnp.mean(cache.Xq, axis=0)                      # (D,) f64
    Xc = cache.Xq - c                                   # (N, D)
    Xtc = cache.Xqt - c                                 # (M, D)
    ct_c = jnp.sum(Xtc * wt64, axis=1)                  # (M,) f64
    wh, wl = split_f64(wt64)
    Xch, Xcl = split_f64(Xc)
    Xtch, Xtcl = split_f64(Xtc)
    dot = (
        jnp.matmul(Xch, wh.T, precision=hp).astype(jnp.float64)
        + jnp.matmul(Xcl, wh.T, precision=hp).astype(jnp.float64)
        + jnp.matmul(Xch, wl.T, precision=hp).astype(jnp.float64)
        - ct_c[None, :]
    )                                                   # (B, M) f64

    # 2. weights at the f64 values, split once
    Ah, Al = split_f64(cache.A_exp)
    A1h, A1l = split_f64(cache.A_exp1)
    G64 = cache.A_exp * dot                             # (B, M) f64
    Gh, Gl = split_f64(G64)

    GX = (
        _gemm_f32_chunkacc(Gh, Xtch)
        + jnp.matmul(Gl, Xtch, precision=hp).astype(jnp.float64)
        + jnp.matmul(Gh, Xtcl, precision=hp).astype(jnp.float64)
    )                                                   # (B, D) f64
    rowsum = _rowsum_f32_chunkacc(Gh) \
        + jnp.sum(Gl.astype(jnp.float64), axis=1)       # (B,) f64
    # G @ Xqt = G @ Xtc + rowsum(G) * c  (undo the centering)
    F1 = cache.Xq * rowsum[:, None] - (GX + rowsum[:, None] * c[None, :])

    F2 = (
        _gemm_f32_chunkacc(A1h, wh)
        + jnp.matmul(A1l, wh, precision=hp).astype(jnp.float64)
        + jnp.matmul(A1h, wl, precision=hp).astype(jnp.float64)
    )                                                   # (B, D) f64
    F_desc = F1 - F2
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc)
    return out.reshape(-1)


@jax.jit
def _matvec_ref_mixed_otf(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """Mixed-precision on-the-fly matvec: the (N, M) pairwise weights are
    recomputed per row tile (build_cache(pairwise=False), the n = 500k
    regime) with the same centered-GEMM + f64-chunk-accumulation error
    budget as matvec_ref_mixed.

    Distances per tile are computed through three centered f32 GEMMs with
    hi/lo operand corrections: the Gram term's absolute error lands at
    ~2^-24 * ||Xc_tile|| * ||Xtc|| / sqrt-cancellation ~ 1e-9-grade, i.e.
    dist (and hence exp) carries ~1e-9 absolute error — well inside the
    matvec noise knee.  The exp/weight elementwise math runs in f32.
    """
    from .df64 import split_f64

    hp = jax.lax.Precision.HIGHEST
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    D = cache.X.shape[1]
    v3 = v.reshape(N, A, 3)
    w64 = d_desc_dot_vec(cache.Jc, cache.S, v3)       # (N, D) f64
    wt64 = perm_expand_w(w64, cache.P_idx)            # (M, D) f64
    sig = cache.sig
    c0 = 5.0 / (3.0 * sig**2)

    c = jnp.mean(cache.Xq, axis=0)                    # (D,) f64
    Xtc = cache.Xqt - c                               # (M, D) f64
    ct_c = jnp.sum(Xtc * wt64, axis=1)                # (M,) f64
    nb = jnp.sum(cache.Xqt * cache.Xqt, axis=1)       # (M,) f64
    wh, wl = split_f64(wt64)
    Xtch, Xtcl = split_f64(Xtc)
    Xqth, Xqtl = split_f64(cache.Xqt)

    tile = _otf_tile(N, cache.Xqt.shape[0])
    n_tiles = -(-N // tile)
    Xq_pad = cache.Xq
    if n_tiles * tile != N:
        Xq_pad = jnp.concatenate(
            [Xq_pad, jnp.zeros((n_tiles * tile - N, D), Xq_pad.dtype)])

    def one_tile(Xq_t64):                             # (tile, D) f64
        na = jnp.sum(Xq_t64 * Xq_t64, axis=1)
        Xh, Xl = split_f64(Xq_t64)
        # Gram via hi/lo-corrected f32 GEMMs (shallow D contraction)
        g = (
            jnp.matmul(Xh, Xqth.T, precision=hp).astype(jnp.float64)
            + jnp.matmul(Xl, Xqth.T, precision=hp).astype(jnp.float64)
            + jnp.matmul(Xh, Xqtl.T, precision=hp).astype(jnp.float64)
        )
        d2 = jnp.maximum(na[:, None] + nb[None, :] - 2.0 * g, 0.0)
        dist = jnp.sqrt(d2)                           # (tile, M) f64
        A_exp = c0 * jnp.exp(-dist)
        A_exp1 = A_exp * (1.0 + dist)

        Xc_t = Xq_t64 - c
        Xch, Xcl = split_f64(Xc_t)
        dot = (
            jnp.matmul(Xch, wh.T, precision=hp).astype(jnp.float64)
            + jnp.matmul(Xcl, wh.T, precision=hp).astype(jnp.float64)
            + jnp.matmul(Xch, wl.T, precision=hp).astype(jnp.float64)
            - ct_c[None, :]
        )
        G64 = A_exp * dot
        Gh, Gl = split_f64(G64)
        GX = (
            _gemm_f32_chunkacc(Gh, Xtch)
            + jnp.matmul(Gl, Xtch, precision=hp).astype(jnp.float64)
            + jnp.matmul(Gh, Xtcl, precision=hp).astype(jnp.float64)
        )
        rowsum = _rowsum_f32_chunkacc(Gh) \
            + jnp.sum(Gl.astype(jnp.float64), axis=1)
        F1 = Xq_t64 * rowsum[:, None] - (GX + rowsum[:, None] * c[None, :])
        A1h, A1l = split_f64(A_exp1)
        F2 = (
            _gemm_f32_chunkacc(A1h, wh)
            + jnp.matmul(A1l, wh, precision=hp).astype(jnp.float64)
            + jnp.matmul(A1h, wl, precision=hp).astype(jnp.float64)
        )
        return F1 - F2                                 # (tile, D) f64

    F_desc = jax.lax.map(
        one_tile, Xq_pad.reshape(n_tiles, tile, D)
    ).reshape(-1, D)[:N]
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc)
    return out.reshape(-1)


@jax.jit
def matvec_psd_mixed(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """(K + lam*I) @ v through the mixed-precision matvec (cached pairwise
    weights when present, on-the-fly recomputation otherwise)."""
    if cache.A_exp is None:
        return cache.lam * v - _matvec_ref_mixed_otf(cache, v)
    return cache.lam * v - matvec_ref_mixed(cache, v)


# ---------------------------------------------------------------------------
# Ozaki exact-slice matvec (~2^-48-grade GEMMs at native bf16 MXU speed)
# ---------------------------------------------------------------------------
#
# The route between "f64 emulation is 10-60x too slow" and "f32-grade
# accuracy diverges CG at the lam floor" (the measured round-3 negative
# result): replace the three per-iteration (N, M)-shaped GEMMs with
# ops.ozaki's error-free digit-slice products.  Result accuracy ~2^-48
# relative to operand scale — inside the ~1e-12 lam-floor bound — at ~21
# native bf16 MXU passes per GEMM.  The iteration-invariant operands
# (Xq, Xqt, A_exp1) are sliced ONCE at solver setup (OzakiMatvecState);
# each iteration slices only its own wt (M, D) and G (N, M).
# Everything outside the GEMMs (Jacobian contractions, elementwise
# exp-weight products, row sums, lam*v) stays f64 exactly as in matvec_ref.


class OzakiMatvecState(NamedTuple):
    """KernelCache + pre-sliced digit decompositions of the
    iteration-invariant GEMM operands (a pytree — rides into the compiled
    CG loop as an argument, like the plain cache).

    Cached (pairwise) mode uses Xq_sl/Xqt_sl/Ae1_sl; OTF mode
    (cache.A_exp is None — the n ~ 500k layout) uses Xqt_sl/Xqt_sl_T and
    slices the per-tile/per-iteration operands in-loop."""

    cache: KernelCache
    Xq_sl: tuple | None     # slice_digits(Xq, axis=1):   GEMM1 left (cached)
    Xqt_sl: tuple           # slice_digits(Xqt, axis=0):  GEMM2 right
    Ae1_sl: tuple | None    # slice_digits(A_exp1, axis=1) GEMM3 left (cached)
    Xqt_sl_T: tuple | None = None  # slice_digits(Xqt.T, axis=0): dist Gram
    #                                right side (OTF mode only)


# OTF-path accuracy knobs (the n ~ 500k regime).  The lam-floor bound
# needs matvec accuracy ~1e-12 RELATIVE TO ||K v||; at M = 112k the
# 6-digit OTF path measured 1.3e-10 vs f64 — enough to stall CG in the
# 1/lam-amplified preconditioner subspace (round 4, n = 503,982: residual
# oscillated at 6-9x ||b|| for 60 iterations with no net descent).  The
# OTF DEFAULT is therefore s = 7 digits (divides the slicing truncation
# by 256; ground truth vs the CPU IEEE-f64 oracle at n = 503,982:
# 3.54e-13).  The distance Gram stays on the EXACT-SLICE path (2^-56 at
# s = 7): the MLFF_OZAKI_DIST64=1 emulated-f64 alternative measurably
# adds nothing (round 4: every knob left |oz - f64| unchanged to six
# digits) and its in-loop emulated-f64 GEMM is the same op class that
# hard-crashes the tunnel TPU worker inside the CG loop (reproduced
# twice at n = 157,491 in round 5; the f64 OTF matvec crashes the same
# way at 504k) — default OFF.
_OZ_DIGITS = int(os.environ.get("MLFF_OZAKI_DIGITS", "7"))
_OZ_DIST64 = os.environ.get("MLFF_OZAKI_DIST64", "0") == "1"


def ozaki_matvec_state(cache: KernelCache) -> OzakiMatvecState:
    """Build the once-per-solve sliced operand state (~s bf16 digit copies
    of each sliced operand: +1.5x its f64 bytes at s=6; the big A_exp1
    slices exist only in cached mode)."""
    from . import ozaki

    if cache.A_exp1 is None:
        return OzakiMatvecState(
            cache=cache,
            Xq_sl=None,
            Xqt_sl=ozaki.slice_digits(cache.Xqt, axis=0, s=_OZ_DIGITS),
            Ae1_sl=None,
            Xqt_sl_T=ozaki.slice_digits(cache.Xqt.T, axis=0, s=_OZ_DIGITS),
        )
    return OzakiMatvecState(
        cache=cache,
        Xq_sl=ozaki.slice_digits(cache.Xq, axis=1),
        Xqt_sl=ozaki.slice_digits(cache.Xqt, axis=0),
        Ae1_sl=ozaki.slice_digits(cache.A_exp1, axis=1),
    )


@jax.jit
def matvec_ref_ozaki(state: OzakiMatvecState, v: jnp.ndarray) -> jnp.ndarray:
    """K_ref @ v with exact-slice GEMMs: ~2^-48-grade (vs matvec_ref's true
    f64), no f64 MXU emulation in the hot products."""
    from . import ozaki

    cache = state.cache
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    v3 = v.reshape(N, A, 3)
    w = d_desc_dot_vec(cache.Jc, cache.S, v3)        # (N, D) f64
    wt = perm_expand_w(w, cache.P_idx)               # (M, D) f64
    ct = jnp.sum(cache.Xqt * wt, axis=1)             # (M,)  f64
    # GEMM1: dot = Xq @ wt^T  (contraction D)
    wtT_sl = ozaki.slice_digits(wt.T, axis=0)
    dot = ozaki.gemm_presliced(state.Xq_sl, wtT_sl) - ct[None, :]
    G = cache.A_exp * dot                            # f64 elementwise
    # GEMM2: G @ Xqt          (contraction M)
    G_sl = ozaki.slice_digits(G, axis=1)
    F1 = cache.Xq * jnp.sum(G, axis=1, keepdims=True) \
        - ozaki.gemm_presliced(G_sl, state.Xqt_sl)
    # GEMM3: A_exp1 @ wt      (contraction M)
    wt_sl = ozaki.slice_digits(wt, axis=0)
    F2 = ozaki.gemm_presliced(state.Ae1_sl, wt_sl)
    F_desc = F1 - F2
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc)
    return out.reshape(-1)


@jax.jit
def _matvec_ref_ozaki_otf(state: OzakiMatvecState, v: jnp.ndarray
                          ) -> jnp.ndarray:
    """OTF (pairwise=False) variant: per row tile, the distance Gram and
    the three force GEMMs all run as exact-slice products; distances and
    exp weights are recomputed in f64 per tile (iteration-invariant but too
    large to store at n ~ 500k).  The per-tile right-hand operands
    (Xqt as GEMM2's right side, Xqt^T as the dist Gram's right side) are
    sliced once in the state; the tile's G/A_exp1 and the per-iteration wt
    are sliced in-loop."""
    from . import ozaki

    cache = state.cache
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    D = cache.X.shape[1]
    v3 = v.reshape(N, A, 3)
    w = d_desc_dot_vec(cache.Jc, cache.S, v3)       # (N, D) f64
    wt = perm_expand_w(w, cache.P_idx)              # (M, D) f64
    ct = jnp.sum(cache.Xqt * wt, axis=1)            # (M,)  f64
    sig = cache.sig
    c0 = 5.0 / (3.0 * sig**2)
    nq = jnp.sum(cache.Xqt * cache.Xqt, axis=1)     # (M,)  f64

    s = _OZ_DIGITS
    wtT_sl = ozaki.slice_digits(wt.T, axis=0, s=s)  # GEMM1/dist per-iter side
    wt_sl = ozaki.slice_digits(wt, axis=0, s=s)     # GEMM3 right side

    tile = _otf_tile(N, cache.Xqt.shape[0])
    n_tiles = -(-N // tile)
    Xq_pad = cache.Xq
    if n_tiles * tile != N:
        Xq_pad = jnp.concatenate(
            [Xq_pad, jnp.zeros((n_tiles * tile - N, D), Xq_pad.dtype)])

    def one_tile(Xq_t):                              # (tile, D)
        Xq_t_sl = ozaki.slice_digits(Xq_t, axis=1, s=s)
        # distances via the Gram trick (the f32-grade Gram corrupts the
        # exp weights beyond the lam-floor bound); true-f64 option for the
        # tightest accuracy — the D-deep contraction keeps its emulation
        # cost a small fraction of the tile
        if _OZ_DIST64:
            g = jnp.matmul(Xq_t, cache.Xqt.T,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            g = ozaki.gemm_presliced(Xq_t_sl, state.Xqt_sl_T)
        na = jnp.sum(Xq_t * Xq_t, axis=1)
        d2 = jnp.maximum(na[:, None] + nq[None, :] - 2.0 * g, 0.0)
        dist = jnp.sqrt(d2)
        A_exp = c0 * jnp.exp(-dist)
        A_exp1 = A_exp * (1.0 + dist)
        dot = ozaki.gemm_presliced(Xq_t_sl, wtT_sl) - ct[None, :]
        G = A_exp * dot
        G_sl = ozaki.slice_digits(G, axis=1, s=s)
        F1 = Xq_t * jnp.sum(G, axis=1, keepdims=True) \
            - ozaki.gemm_presliced(G_sl, state.Xqt_sl)
        Ae1_sl = ozaki.slice_digits(A_exp1, axis=1, s=s)
        F2 = ozaki.gemm_presliced(Ae1_sl, wt_sl)
        return F1 - F2                               # (tile, D)

    F_desc = jax.lax.map(
        one_tile, Xq_pad.reshape(n_tiles, tile, D)
    ).reshape(-1, D)[:N]
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc)
    return out.reshape(-1)


@jax.jit
def matvec_psd_ozaki(state: OzakiMatvecState, v: jnp.ndarray) -> jnp.ndarray:
    """(K + lam*I) @ v on the Ozaki sliced operator (cached or OTF)."""
    if state.cache.A_exp is None:
        return state.cache.lam * v - _matvec_ref_ozaki_otf(state, v)
    return state.cache.lam * v - matvec_ref_ozaki(state, v)


# row-tile for the on-the-fly matvec: (tile, M) pairwise transients,
# ~0.6 GB each at M = 18.5k (n = 500k)
_OTF_TILE = 4096

# elements budget for one (tile, M) OTF transient: the f64 path holds ~4
# such arrays live, each split by the f64 emulation into 8 f32 slices
# (32 B/elem) — 3e7 elements keeps that under ~4 GB.  With P > 1 perm
# groups M = N*P outgrows the fixed _OTF_TILE assumption (M = 112k at
# ethanol n = 504k compiled to a 67 GB program at tile 4096).
# MLFF_OTF_TILE_BUDGET overrides for runs where a large resident factor
# leaves less transient headroom (the 504k colblock runs).
_OTF_TILE_BUDGET = int(float(os.environ.get("MLFF_OTF_TILE_BUDGET", 3e7)))


def _otf_tile(N: int, M: int) -> int:
    """Row-tile for the OTF matvec: bounded by both _OTF_TILE and the
    (tile, M) transient element budget.  The 128-row floor can EXCEED the
    budget when M > _OTF_TILE_BUDGET/128 (~234k columns, e.g. P = 6 beyond
    n ~ 1M): warn loudly so the ensuing HBM pressure is attributable
    instead of an opaque OOM."""
    budget_t = (_OTF_TILE_BUDGET // max(M, 1)) // 128 * 128
    t = max(128, min(_OTF_TILE, budget_t))
    if budget_t < 128 and N >= 128:
        import logging

        logging.getLogger("mlff_tpu").warning(
            "OTF matvec: 128-row tile floor exceeds the transient budget "
            "(M = %d columns -> %.1f GB of f64-split transients vs ~4 GB "
            "target); expect HBM pressure or OOM at this scale", M,
            128 * M * 32 / 1e9)
    return min(t, N)


@jax.jit
def _matvec_ref_otf(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """K_ref @ v with pairwise weights recomputed per row tile (the cache
    carries no (N, M) arrays — build_cache(pairwise=False)).

    This is the SURVEY §7.2.3 'on-the-fly' backend: one (tile, D) x (D, M)
    distance GEMM + exp per tile replaces the cached A_exp/A_exp1 reads.
    At n = 500k the cached layout alone exceeds HBM; here the extra
    per-iteration cost is the D-deep Gram GEMM + 343M exps (~10% of the
    iteration at that scale)."""
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    D = cache.X.shape[1]
    v3 = v.reshape(N, A, 3)
    w = d_desc_dot_vec(cache.Jc, cache.S, v3)       # (N, D)
    wt = perm_expand_w(w, cache.P_idx)              # (M, D)
    ct = jnp.sum(cache.Xqt * wt, axis=1)            # (M,)
    sig = cache.sig
    c0 = 5.0 / (3.0 * sig**2)

    tile = _otf_tile(N, cache.Xqt.shape[0])
    n_tiles = -(-N // tile)
    Xq_pad = cache.Xq
    if n_tiles * tile != N:  # pad the small (N, D) queries only
        Xq_pad = jnp.concatenate(
            [Xq_pad, jnp.zeros((n_tiles * tile - N, D), Xq_pad.dtype)])

    def one_tile(Xq_t):                              # (tile, D)
        dist = pairwise_dist_gram(Xq_t, cache.Xqt)   # (tile, M)
        A_exp = c0 * jnp.exp(-dist)
        A_exp1 = A_exp * (1.0 + dist)
        F_desc, _ = _desc_forces_x(
            cache.Xqt, sig, Xq_t, A_exp, A_exp1, wt)
        return F_desc                                # (tile, D)

    F_desc = jax.lax.map(
        one_tile, Xq_pad.reshape(n_tiles, tile, D)
    ).reshape(-1, D)[:N]
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc)
    return out.reshape(-1)


@jax.jit
def matvec_ref(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """K_ref @ v: the reference-convention (negative-definite) kernel matvec,
    i.e. exactly the reference's 'predict forces on the training set with
    alphas = v' trick (predict.py:997-1110) — minus the process pool.

    v: flat (n,).  Returns flat (n,).
    """
    if cache.A_exp is None:
        return _matvec_ref_otf(cache, v)
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    v3 = v.reshape(N, A, 3)
    w = d_desc_dot_vec(cache.Jc, cache.S, v3)       # (N, D), f64
    # mixed precision: the big per-iteration GEMMs run at the cache dtype,
    # the Jacobian contractions and CG state stay f64
    w = w.astype(cache.Xqt.dtype)
    wt = perm_expand_w(w, cache.P_idx)              # (M, D)
    F_desc, _ = _desc_forces(cache, cache.Xq, cache.A_exp, cache.A_exp1, wt)
    out = vec_dot_d_desc(cache.Jc, cache.S, F_desc.astype(cache.Jc.dtype))
    return out.reshape(-1)


@jax.jit
def matvec_psd(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """(K + lam*I) @ v in the PSD convention: the CG system operator.

    Equals the reference's ``-K_op`` (iterative_solver.py:416-443, 995)."""
    return cache.lam * v - matvec_ref(cache, v)


@jax.jit
def matmat_psd(cache: KernelCache, V: jnp.ndarray) -> jnp.ndarray:
    """(K + lam*I) @ V for V (n, B) — batched over columns via vmap; all
    pairwise caches are shared so B RHS cost barely more than one."""
    return jax.vmap(lambda col: matvec_psd(cache, col), in_axes=1, out_axes=1)(V)


# ---------------------------------------------------------------------------
# Square all-pairs descriptor layout (large-A fast path)
# ---------------------------------------------------------------------------
#
# The packed layout contracts the compressed Jacobian against the +/-1
# incidence matrix S (D, A) as DENSE matmuls — at the nanotube's A = 370
# that is ~185x more flops than the 2 nonzeros/row justify (measured: the
# two incidence GEMMs dominate the 110 ms/iter CG step).  TPU gathers and
# scatters run at only ~5-10 M elem/s here, so sparse indexing is no
# answer either.  Instead the matvec below works in the SQUARE all-pairs
# layout: descriptors live on an (A, A) grid (both orientations of each
# pair), the Jacobian becomes an antisymmetric (A, A, 3) field, and both
# S-contractions turn into elementwise broadcast-multiplies + axis
# reductions — pure VPU work, no gathers, nothing above O(A^2).
#
# Scaling that makes it EXACT: every descriptor-space quantity appears
# twice on the square grid, so all arrays carry a 1/sqrt(2) factor; inner
# products over A^2 entries then equal the packed inner products over D,
# and the pairwise distances / kernel weights match the packed cache to
# roundoff.  The final Jacobian-transpose contraction gains the
# compensating factor 2:  out[a] = 2 sum_i Fsq[i, a] * Gs[i, a]  (the i>a
# terms reproduce the S=+1 column sums, the i<a terms the S=-1 row sums,
# via the antisymmetry of Gs).


class SquareCache(NamedTuple):
    """Operator cache in the square all-pairs layout.

    Gs   (N, A, A, 3): (r_i - r_j) / (sqrt(2) d^3), zero diagonal —
                       the scaled, antisymmetric compressed Jacobian.
    Gst  (M, A, A, 3): atom-permuted copies of Gs, point-major (M = N*P).
    Xs   (N, A*A):     (sqrt(5)/sig) / (sqrt(2) d) square descriptors.
    Xst  (M, A*A):     atom-permuted square descriptors.
    perms (P, A):      the atom permutation group (row 0 = identity).
    A_exp/A_exp1 (N, M): Matern-5/2 weights — identical values to the
                       packed KernelCache (distances match to roundoff).
    """

    Gs: jnp.ndarray
    Gst: jnp.ndarray
    Xs: jnp.ndarray
    Xst: jnp.ndarray
    perms: jnp.ndarray
    A_exp: jnp.ndarray
    A_exp1: jnp.ndarray
    sig: jnp.ndarray
    lam: jnp.ndarray


@partial(jax.jit, static_argnames=("sig", "lam"))
def build_cache_square(R, perms, sig: float, lam: float) -> SquareCache:
    """Square-layout cache from raw training geometries R (N, A, 3) and the
    atom permutation group perms (P, A)."""
    R = jnp.asarray(R, jnp.float64)
    N, A, _ = R.shape
    perms = jnp.asarray(perms, jnp.int32).reshape(-1, A)
    diffs = R[:, :, None, :] - R[:, None, :, :]     # (N, A, A, 3) r_i - r_j
    d2 = jnp.sum(diffs * diffs, axis=-1)
    eye = jnp.eye(A, dtype=bool)[None]
    inv = jnp.where(eye, 0.0, 1.0 / jnp.sqrt(jnp.where(eye, 1.0, d2)))
    isqrt2 = 1.0 / jnp.sqrt(jnp.asarray(2.0, R.dtype))
    q = SQRT5 / sig
    Xs = (q * isqrt2) * inv                          # (N, A, A)
    Gs = diffs * (isqrt2 * inv**3)[..., None]        # (N, A, A, 3)

    Xst = _perm_square(Xs, perms).reshape(N * perms.shape[0], A * A)
    Gst = _perm_square(Gs, perms).reshape(N * perms.shape[0], A, A, 3)
    Xs_flat = Xs.reshape(N, A * A)
    dist = pairwise_dist_gram(Xs_flat, Xst)
    A_exp = (5.0 / (3.0 * sig**2)) * jnp.exp(-dist)
    A_exp1 = A_exp * (1.0 + dist)
    return SquareCache(
        Gs=Gs, Gst=Gst, Xs=Xs_flat, Xst=Xst, perms=perms,
        A_exp=A_exp, A_exp1=A_exp1,
        sig=jnp.asarray(sig, R.dtype), lam=jnp.asarray(lam, R.dtype),
    )


def _perm_square(M_sq: jnp.ndarray, perms: jnp.ndarray) -> jnp.ndarray:
    """Permute both grid axes of (N, A, A, ...) by each atom permutation:
    out[j, p, i, l] = M_sq[j, perm_p(i), perm_p(l)] — the square-layout
    equivalent of the packed descriptor permutation (desc_perms)."""
    out = M_sq[:, perms]                             # (N, P, A, A, ...)
    P, A = perms.shape
    idx = perms[None, :, None, :]                    # (1, P, 1, A)
    while idx.ndim < out.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(out, jnp.broadcast_to(
        idx, out.shape[:4] + out.shape[4:]), axis=3)


@jax.jit
def matvec_ref_square(sq: SquareCache, v: jnp.ndarray) -> jnp.ndarray:
    """K_ref @ v in the square layout — bit-compatible semantics with
    matvec_ref (same kernel weights, reordered reductions)."""
    N, A = sq.Gs.shape[0], sq.Gs.shape[1]
    P = sq.perms.shape[0]
    v3 = v.reshape(N, A, 3)
    vt = v3[:, sq.perms, :]                          # (N, P, A, 3)
    # wt[j,p,i,l] = Gst[j,p,i,l] . (vt[j,p,l] - vt[j,p,i])
    dvt = vt[:, :, None, :, :] - vt[:, :, :, None, :]
    wt = jnp.sum(sq.Gst.reshape(N, P, A, A, 3) * dvt, axis=-1)
    wt = wt.reshape(N * P, A * A)
    F_desc, _ = _desc_forces_x(sq.Xst, sq.sig, sq.Xs, sq.A_exp, sq.A_exp1, wt)
    Fsq = F_desc.reshape(N, A, A)
    out = 2.0 * jnp.sum(Fsq[..., None] * sq.Gs, axis=1)   # (N, A, 3)
    return out.reshape(-1)


@jax.jit
def matvec_psd_square(sq: SquareCache, v: jnp.ndarray) -> jnp.ndarray:
    """(K + lam*I) @ v through the square-layout operator."""
    return sq.lam * v - matvec_ref_square(sq, v)


# ---------------------------------------------------------------------------
# Energy-constraint extension (use_E_cstr)
# ---------------------------------------------------------------------------
#
# With energy constraints the system grows by n_train rows/columns coupling
# force coefficients to per-point energies (reference train.py:212-234 for
# assembly, predict.py:210-218 for the matvec).  All extra kernel values are
# elementwise functions of quantities already cached:
#   cross block  K_fe ~ A_exp1 * delta          (gradient cross-kernel)
#   energy block K_ee ~ (1 + d(1 + d/3)) e^-d   (plain Matern-5/2)


def _ecstr_mats(cache: KernelCache):
    """(K_ee (N, M), dist) recovered elementwise from the cached matrices."""
    dist = cache.A_exp1 / cache.A_exp - 1.0
    e = cache.A_exp * (3.0 * cache.sig**2 / 5.0)
    K_ee = (1.0 + dist * (1.0 + dist / 3.0)) * e
    return K_ee, dist


@jax.jit
def matvec_ref_ecstr(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """Reference-convention matvec of the energy-constrained kernel.

    v = [v_F (n,), v_E (N,)] -> [f_out (n,), -e_out (N,)], exactly the
    reference's `_K_vec` composition (iterative_solver.py:416-443: predict
    with alphas (v_F, v_E), stack forces with negated energies)."""
    N = cache.X.shape[0]
    A = cache.S.shape[1]
    P = cache.P_idx.shape[0]
    v_F, v_E = v[: N * A * 3], v[N * A * 3 :]

    w = d_desc_dot_vec(cache.Jc, cache.S, v_F.reshape(N, A, 3))
    w = w.astype(cache.Xqt.dtype)
    wt = perm_expand_w(w, cache.P_idx)              # (M, D)
    vE_lin = jnp.repeat(v_E, P).astype(cache.Xqt.dtype)  # (M,) per (point, perm)

    ct = jnp.sum(cache.Xqt * wt, axis=1)
    dot = cache.Xq @ wt.T - ct[None, :]             # (B=N, M)
    G = cache.A_exp * dot
    F1 = cache.Xq * jnp.sum(G, axis=1, keepdims=True) - G @ cache.Xqt
    F2 = cache.A_exp1 @ wt
    F_desc = F1 - F2

    # energy-coefficient contribution to forces: sum_m vE_m A_exp1[b,m] delta
    # (delta unscaled by q; reference predict.py:210-213)
    q = SQRT5 / cache.sig
    H = cache.A_exp1 * vE_lin[None, :]              # (B, M)
    F_desc = F_desc + (
        cache.Xq * jnp.sum(H, axis=1, keepdims=True) - H @ cache.Xqt
    ) / q

    out_F = vec_dot_d_desc(cache.Jc, cache.S, F_desc.astype(cache.Jc.dtype))

    # energy rows: e_pred = A_exp1.dot/q + K_ee vE  (predict.py:207, 214-218)
    K_ee, _ = _ecstr_mats(cache)
    e_out = jnp.sum(cache.A_exp1 * dot, axis=1) / q + K_ee @ vE_lin
    return jnp.concatenate([out_F.reshape(-1), -e_out])


@jax.jit
def matvec_psd_ecstr(cache: KernelCache, v: jnp.ndarray) -> jnp.ndarray:
    """(K + lam I) v for the energy-constrained PSD system."""
    return cache.lam * v - matvec_ref_ecstr(cache, v)


def assemble_ecstr_blocks(spec_dim_i: int, cache: KernelCache):
    """Dense E-constraint blocks in the PSD convention:
    (K_fe (n, N), K_ee_sym (N, N)) — the extra columns/rows of the extended
    kernel (reference worker train.py:212-234, negated)."""
    N = cache.X.shape[0]
    P = cache.P_idx.shape[0]
    q = SQRT5 / cache.sig

    K_ee, _ = _ecstr_mats(cache)                    # (N, M)
    # sum over the perm copies of each column point -> (N, N); reference
    # writes K[E_i, E_j] = -(...) summed over perms
    K_ee_sym = K_ee.reshape(N, N, P).sum(axis=2)

    # cross block: for column point j (energy), rows (i, t):
    #   K_ref[F(i,t), E(j)] = sum_p A_exp1[i,(j,p)] (J_i^T delta_i,(j,p))[t]
    # computed like F1 above but per energy column.
    # delta unscaled: (Xq_i - Xqt_m)/q
    M = cache.Xqt.shape[0]
    # U[i, m, :] = A_exp1[i, m] * (Xq_i - Xqt_m) / q  contracted with J_i
    # -> do it column-block-wise to avoid (N, M, D) blowup
    cols = []
    A1 = cache.A_exp1
    for j0 in range(0, N, 64):
        j1 = min(j0 + 64, N)
        mm = slice(j0 * P, j1 * P)
        A1b = A1[:, mm]                              # (N, Mb)
        # F-like contraction per column m: g[i, m, d] = A1b*(Xq_i - Xqt_m)/q
        # contract with J_i via vec_dot_d_desc after summing perms per point
        g1 = cache.Xq[:, None, :] * A1b[:, :, None]   # (N, Mb, D)
        g2 = A1b[:, :, None] * cache.Xqt[mm][None, :, :]
        g = (g1 - g2) / q                             # (N, Mb, D)
        g = g.reshape(N, j1 - j0, P, -1).sum(axis=2)  # (N, Cb, D)
        blk = vec_dot_d_desc(
            cache.Jc[:, None], cache.S, g.astype(cache.Jc.dtype)
        )  # (N, Cb, A, 3)
        cols.append(blk.reshape(N, j1 - j0, -1))
    K_fe_ref = jnp.concatenate(cols, axis=1)          # (N, Ncols, 3A)
    K_fe_ref = K_fe_ref.transpose(0, 2, 1).reshape(N * spec_dim_i, N)
    # Row-Jacobian form equals the reference's column-Jacobian form under
    # group closure (the worker's -sum over permuted J~ at train.py:228,
    # relabeled); PSD convention then negates both blocks.
    return -K_fe_ref, K_ee_sym


def assemble_columns_ecstr(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    chunk: int = 8,
) -> jnp.ndarray:
    """Columns of the energy-constrained PSD kernel, restricted to force
    columns (col < n): returns (n + N, k) — the F-block columns with their
    energy-row extension appended."""
    N = cache.X.shape[0]
    n = cache.n
    col_idxs = np.asarray(col_idxs)
    assert col_idxs.max() < n, "only force columns supported as inducing points"
    top = assemble_columns(spec, cache, col_idxs, chunk=chunk)   # (n, k)
    K_fe, _ = assemble_ecstr_blocks(spec.dim_i, cache)           # (n, N)
    bottom = K_fe[col_idxs, :].T  # (N, k): K_EF restricted to the F columns
    return jnp.concatenate([top, bottom], axis=0)


@partial(jax.jit, static_argnums=(0,))
def kernel_diag_ecstr(spec_dim_i: int, cache: KernelCache) -> jnp.ndarray:
    """diag of the energy-constrained PSD kernel (n + N,), no ridge:
    [diag(K_ff), diag(K_ee_sym)] (reference
    iterative_cholesky.py:351-373 appends the E-block diagonal)."""
    N = cache.X.shape[0]
    P = cache.P_idx.shape[0]
    K_ee, _ = _ecstr_mats(cache)                     # (N, M = N*P)
    d_ee = jax.vmap(lambda i: jnp.sum(jax.lax.dynamic_slice(
        K_ee[i], (i * P,), (P,))))(jnp.arange(N))
    return jnp.concatenate([kernel_diag(spec_dim_i, cache), d_ee])


def assemble_columns_ecstr_any(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    chunk: int = 8,
) -> jnp.ndarray:
    """Columns of the energy-constrained PSD kernel for ARBITRARY sorted
    column indices in [0, n + N) — force columns and energy-constraint
    columns mixed (the pivoted-Cholesky-family builders pivot over the whole
    extended diagonal).  Returns (n + N, k), no ridge."""
    N = cache.X.shape[0]
    n = cache.n
    col_idxs = np.asarray(col_idxs)
    f_idx = col_idxs[col_idxs < n]
    e_idx = col_idxs[col_idxs >= n] - n
    K_fe, K_ee_sym = assemble_ecstr_blocks(spec.dim_i, cache)
    parts = []
    if len(f_idx):
        top = assemble_columns(spec, cache, f_idx, chunk=chunk)   # (n, kf)
        parts.append(jnp.concatenate([top, K_fe[f_idx, :].T], axis=0))
    if len(e_idx):
        e_cols = jnp.concatenate(
            [K_fe[:, e_idx], K_ee_sym[:, e_idx]], axis=0
        )
        parts.append(e_cols)
    # sorted input => all force columns precede all energy columns
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def assemble_full_ecstr(
    spec: DescriptorSpec, cache: KernelCache, tile: int = 32
) -> jnp.ndarray:
    """Full PSD kernel with energy-constraint rows/columns appended:
    shape (n + N, n + N) (reference train.py:1205-1208)."""
    K = assemble_full(spec, cache, tile=tile)
    K_fe, K_ee = assemble_ecstr_blocks(spec.dim_i, cache)
    top = jnp.concatenate([K, K_fe], axis=1)
    bottom = jnp.concatenate([K_fe.T, K_ee], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


# ---------------------------------------------------------------------------
# Dense assembly (tiled)
# ---------------------------------------------------------------------------


def _inflate_full(Jc: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """(…, D, 3) compressed -> (…, D, 3A) full Jacobians."""
    full = S[:, :, None] * Jc[..., :, None, :]  # (..., D, A, 3)
    return full.reshape(*Jc.shape[:-1], -1)


@partial(jax.jit, static_argnums=(0,))
def assemble_block(
    spec_dim_i: int,
    cache: KernelCache,
    I_idx: jnp.ndarray,
    J_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Dense PSD kernel block between training-point sets I (rows) and J
    (cols): returns (|I|*3A, |J|*3A).  No ridge term.

    Mirrors the reference worker math (train.py:150-236) but batched over
    pairs and permutations in one einsum chain.
    """
    sig = cache.sig
    X_I = cache.X[I_idx]                              # (B, D)
    Jf_I = _inflate_full(cache.Jc[I_idx], cache.S)    # (B, D, T)
    X_J = cache.X[J_idx][:, cache.P_idx]              # (C, P, D)
    Jf_J = _inflate_full(cache.Jc[J_idx], cache.S)    # (C, D, T)
    Jf_Jp = Jf_J[:, cache.P_idx, :]                   # (C, P, D, T) row-permuted

    delta = X_I[:, None, None, :] - X_J[None, :, :, :]      # (B, C, P, D)
    nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)           # (B, C, P)
    base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
    c_iso = (sig**2 + sig * nrm) * base

    u = jnp.einsum("bcpd,cpdt->bcpt", delta, Jf_Jp)         # (B, C, P, T)
    v1 = jnp.einsum("bcpd,bds->bcps", delta, Jf_I)          # (B, C, P, T)
    # contract the perm axis as a batched GEMM (a fused three-operand einsum
    # materializes a (B, C, P, T, T) tensor and OOMs at scale)
    bv = base[..., None] * v1                               # (B, C, P, T)
    rank = jnp.einsum("bcps,bcpt->bcst", bv, u)             # (B, C, T, T)
    W = jnp.einsum("bcp,cpdt->bcdt", c_iso, Jf_Jp)          # (B, C, D, T)
    iso = jnp.einsum("bds,bcdt->bcst", Jf_I, W)             # (B, C, T, T)

    blk = iso - 5.0 * rank                                  # PSD convention
    B, C = I_idx.shape[0], J_idx.shape[0]
    T = spec_dim_i
    return blk.transpose(0, 2, 1, 3).reshape(B * T, C * T)


def assemble_full(
    spec: DescriptorSpec,
    cache: KernelCache,
    tile: int = 32,
    add_ridge: float | None = None,
) -> jnp.ndarray:
    """Full dense PSD kernel matrix (n, n), assembled in row tiles.

    Equivalent to -1 * reference _assemble_kernel_mat with all columns
    (train.py:1121-1308).  ``add_ridge`` optionally adds c*I.
    """
    N = cache.n_train
    T = spec.dim_i
    all_idx = jnp.arange(N)
    rows = []
    for start in range(0, N, tile):
        I_idx = all_idx[start : start + tile]
        rows.append(assemble_block(T, cache, I_idx, all_idx))
    K = jnp.concatenate(rows, axis=0)
    if add_ridge is not None:
        K = K + add_ridge * jnp.eye(K.shape[0], dtype=K.dtype)
    return K


@partial(jax.jit, static_argnums=(0,))
def _point_block_cols(spec_dim_i: int, cache: KernelCache, j: jnp.ndarray):
    """All-row kernel block for a single training point j: (n, 3A)."""
    return assemble_block(
        spec_dim_i, cache, jnp.arange(cache.n_train), j[None]
    )


def _group_columns(points: np.ndarray, partials: np.ndarray, g: int):
    """Group requested (point, partial) columns by owning point, padding each
    group to ``g`` slots (points with more than g requested partials split
    into several groups).  Returns (grp_pt (C,), grp_t (C, g) with -1 pads,
    flat_valid (k,) mapping sorted input columns to flattened (C*g) slots)."""
    groups: list[tuple[int, list[int]]] = []
    prev_pt = None
    for p, t in zip(points.tolist(), partials.tolist()):
        if p != prev_pt or len(groups[-1][1]) == g:
            groups.append((p, []))
        prev_pt = p
        groups[-1][1].append(t)
    grp_pt = np.array([p for p, _ in groups], dtype=np.int64)
    grp_t = np.full((len(groups), g), -1, dtype=np.int64)
    flat_valid = []
    for i, (_, ts) in enumerate(groups):
        grp_t[i, : len(ts)] = ts
        flat_valid.extend(i * g + s for s in range(len(ts)))
    return grp_pt, grp_t, np.asarray(flat_valid, dtype=np.int64)


def _columns_jcol(cache: KernelCache, grp_pt: jnp.ndarray, grp_t: jnp.ndarray):
    """Permuted compressed Jacobian COLUMNS for the grouped column set:
    jcol[c, s, p, q] = Jc[grp_pt[c]][P[p,q], x] * S[P[p,q], b] for partial
    t = (b, x) = grp_t[c, s]; zero for -1 pads.  Small: (C, g, P, D).
    Traced (called inside _assemble_columns_grouped — as eager ops, its ~10
    small remote compiles cost ~12 s per process and are too fast to
    persistent-cache individually)."""
    C, g = grp_t.shape
    valid = grp_t >= 0
    t_safe = jnp.where(valid, grp_t, 0)
    b = t_safe // 3                                     # (C, g) atom index
    x = t_safe % 3                                      # (C, g) xyz
    J_g = cache.Jc[grp_pt][:, cache.P_idx, :]           # (C, P, D, 3)
    jx = jnp.take_along_axis(
        J_g[:, None], x[:, :, None, None, None], axis=-1
    )[..., 0]                                           # (C, g, P, D)
    S_p = cache.S[cache.P_idx]                          # (P, D, A)
    St = jnp.take(S_p, b.reshape(-1), axis=2)           # (P, D, C*g)
    sb = St.transpose(2, 0, 1).reshape(C, g, *S_p.shape[:2])  # (C, g, P, D)
    return jx * sb * valid[:, :, None, None]


@partial(jax.jit, static_argnums=(0, 4))
def _assemble_columns_grouped(
    spec_dim_i: int,
    cache: KernelCache,
    grp_pt: jnp.ndarray,    # (C,)
    grp_t: jnp.ndarray,     # (C, g) partial indices, -1 pads
    tile: int,
    flat_valid: jnp.ndarray = None,  # (k,) column slots to keep
) -> jnp.ndarray:
    """Column-exact assembly: computes ONLY the requested partials.

    A wide-tile block path (assembling all 3A partials of every touched
    point, then gathering ~2 of them) has an O(B C D (3A)^2) inner einsum.  Here the permutation axis is collapsed
    BEFORE the row-side Jacobian is applied, giving
    O(B C D (3 g P + g 3A)) — measured ~6x fewer FLOPs at the rule-of-thumb
    k (g=4, P=6, 3A=27).  Returns (n, k) — the requested columns.
    """
    sig = cache.sig
    N = cache.n_train
    T = spec_dim_i
    jcol = _columns_jcol(cache, grp_pt, grp_t)          # (C, g, P, D)
    X_g = cache.X[grp_pt][:, cache.P_idx]               # (C, P, D)
    n_tiles = -(-N // tile)
    # the tail tile overlaps instead of padding: every tile computes `tile`
    # true rows, written at its exact offset — the lax.map + row-slice form
    # held the stacked (n_tiles*tile*T, k) buffer AND its sliced copy live
    # (2 x 7.8 GB at n=158k, k=6144 -> runtime HBM OOM)
    starts = jnp.minimum(jnp.arange(n_tiles) * tile, max(N - tile, 0))

    def one(start):
        I_idx = start + jnp.arange(tile)
        X_I = cache.X[I_idx]                            # (B, D)
        Jf_I = _inflate_full(cache.Jc[I_idx], cache.S)  # (B, D, T)
        delta = X_I[:, None, None, :] - X_g[None]       # (B, C, P, D)
        nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)   # (B, C, P)
        base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
        c_iso = (sig**2 + sig * nrm) * base
        # u, z, W as broadcast-reduces on the VPU: the g/P axes are tiny
        # (4/6), so dot_general forms pad them to MXU tiles — under f64
        # emulation (8 f32 operand splits) that padding OOM'd HBM
        dj = delta[:, :, None, :, :] * jcol[None]       # (B, C, g, P, D)
        u = jnp.sum(dj, axis=-1)                        # (B, C, g, P)
        ub = u * base[:, :, None, :]
        z = jnp.sum(ub[..., None] * delta[:, :, None], axis=3)   # (B, C, g, D)
        W = jnp.sum(c_iso[:, :, None, :, None] * jcol[None], axis=3)
        G = W - 5.0 * z                                 # (B, C, g, D)
        out = jnp.einsum("bcsd,bdt->bcst", G, Jf_I)     # (B, C, g, T)
        out = out.transpose(0, 3, 1, 2).reshape(tile * T, -1)
        # select the requested columns per row tile: the full (n, C*g)
        # slot array never materializes (at n=158k, k=6144 it cost a
        # 5.2 GB HLO temp on top of the (n, k) result -> HBM OOM)
        return out[:, flat_valid] if flat_valid is not None else out

    k_out = int(flat_valid.shape[0]) if flat_valid is not None else (
        int(grp_t.shape[0] * grp_t.shape[1]))

    def step(buf, start):
        return jax.lax.dynamic_update_slice(buf, one(start), (start * T, 0)), None

    buf = jnp.zeros((N * T, k_out), dtype=cache.X.dtype)
    out, _ = jax.lax.scan(step, buf, starts)
    return out


@partial(jax.jit, static_argnums=(0,))
def _point_blocks_chunk(spec_dim_i: int, cache: KernelCache, pts: jnp.ndarray):
    """All-row kernel blocks for a chunk of training points: (len(pts), n, 3A).

    Module-level jit so repeated chunk calls hit the compile cache — a fresh
    per-call lambda would retrace (and on the remote-compile TPU tunnel,
    recompile) every chunk.
    """
    return jax.lax.map(lambda j: _point_block_cols(spec_dim_i, cache, j), pts)


def assemble_columns(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    chunk: int = 8,
) -> jnp.ndarray:
    """PSD kernel columns K[:, col_idxs] (n, k), for arbitrary sorted column
    subsets (the Nyström / leverage-score path; reference train.py:1192-1263
    'fancy indexing').  Computes per-point blocks on device in chunks and
    gathers the requested partials.
    """
    col_idxs = np.asarray(col_idxs)
    assert np.array_equal(col_idxs, np.sort(col_idxs)), "column indices must be sorted"
    assert len(set(col_idxs.tolist())) == len(col_idxs), "duplicate column indices"
    T = spec.dim_i
    points = col_idxs // T           # owning training point of each column
    uniq_points = np.unique(points)
    N = cache.n_train

    # large-D molecules: the block paths inflate (D, 3A) Jacobians; switch
    # to the inflation-free square / compressed paths when that would blow
    # memory (square when the cache carries the all-pairs layout; grouped
    # when selections are dense enough to share per-point geometry)
    if spec.dim * T * 8 * max(4, cache.n_perms) > _INFLATION_BUDGET:
        if cache.Xsq is not None and cache.n_perms == 1:
            return assemble_columns_square(spec, cache, col_idxs)
        if len(col_idxs) >= 4 * len(uniq_points):
            return assemble_columns_compressed_grouped(spec, cache, col_idxs)
        return assemble_columns_compressed(spec, cache, col_idxs)

    # the chunked path materializes ALL touched point-blocks
    # (n_pts, n, 3A) before gathering — at n = 75k and ~1000 points that is
    # ~15 GB and OOMs HBM; the grouped path's footprint is ~the (n, k)
    # result.  Threshold 0.5 GB: a 1.36 GB chunked assembly (m=216 at
    # n=31,482) hit runtime RESOURCE_EXHAUSTED on the axon runtime
    # (round 4) while the grouped path runs the same selection fine
    chunked_bytes = len(uniq_points) * cache.n * T * 8
    if len(uniq_points) > N // 3 or chunked_bytes > int(5e8):
        # dense-ish column set: column-exact grouped assembly — computes
        # only the requested partials (see _assemble_columns_grouped).
        # Slots per group track the average partials-per-point so sparse
        # selections (leverage sampling: ~1/point) don't carry 4x padding;
        # points with more partials split into several groups.
        g = int(min(8, max(1, round(len(col_idxs) / len(uniq_points)))))
        grp_pt, grp_t, flat_valid = _group_columns(points, col_idxs % T, g)
        k = len(col_idxs)
        # bucket the group count C (pad with all-invalid groups -> zero
        # columns) and the selected-column count k (pad with repeats of
        # slot 0, sliced off below) so k-sweeps and re-selections share
        # one compiled executable instead of one per (C, k) pair — each
        # grouped-assembly compile costs tens of seconds over the
        # remote-compile tunnel
        C = -(-len(grp_pt) // 64) * 64
        if C > len(grp_pt):
            grp_pt = np.concatenate(
                [grp_pt, np.zeros(C - len(grp_pt), dtype=np.int64)])
            grp_t = np.concatenate(
                [grp_t, np.full((C - len(grp_t), g), -1, dtype=np.int64)])
        k_pad = -(-k // 512) * 512
        flat_valid = np.concatenate(
            [flat_valid, np.zeros(k_pad - k, dtype=np.int64)])
        # row tile sized so the (tile, C, g, P, D) broadcast-reduce
        # intermediates stay ~<= 0.2 GB each
        row_bytes = C * g * max(cache.n_perms, 1) * spec.dim * 8
        tile = max(2, min(N, int(2e8 / max(row_bytes, 1))))
        out = _assemble_columns_grouped(
            T, cache, jnp.asarray(grp_pt), jnp.asarray(grp_t), tile,
            jnp.asarray(flat_valid),
        )
        # the slice copies (transiently 2x the result in HBM at large n) —
        # skip it when k already sits on the bucket boundary
        return out if k == k_pad else out[:, :k]

    blocks = []
    for start in range(0, len(uniq_points), chunk):
        pts = uniq_points[start : start + chunk]
        if len(pts) < chunk:  # pad to the jitted chunk shape
            pts = np.concatenate([pts, np.repeat(pts[-1:], chunk - len(pts))])
        blk = _point_blocks_chunk(T, cache, jnp.asarray(pts))
        blocks.append(blk)  # (chunk, n, T)
    all_blocks = jnp.concatenate(blocks, axis=0)[: len(uniq_points)]  # (n_pts, n, T)

    # Map each requested column to (position of its point, partial index).
    pt_pos = np.searchsorted(uniq_points, points)
    partial_idx = col_idxs % T
    cols = all_blocks[pt_pos, :, partial_idx]  # (k, n)
    return cols.T


@partial(jax.jit, static_argnums=(0,))
def _columns_compressed_chunk(
    spec_dim_i: int,
    cache: KernelCache,
    pts: jnp.ndarray,     # (C,) owning training point per column
    atoms: jnp.ndarray,   # (C,) atom index of each column's partial
    xyzs: jnp.ndarray,    # (C,) cartesian component of each partial
) -> jnp.ndarray:
    """Kernel columns without Jacobian inflation: (C, n).

    For huge descriptors (nanotube: D = 68k, 3A = 1110) the block-assembly
    path materializes (D, 3A) inflated Jacobians (~0.6 GB per point) and
    OOMs.  Here the permuted Jacobian COLUMN t = (b, x) of point j is built
    directly from the compressed form,
        Jcol_p[q] = Jc[j, P[p, q], x] * S[P[p, q], b],
    and the per-column contraction never forms anything larger than
    (N, P, D).  Cost per column ~ N P D + N D A; use for large-D systems.
    """
    sig = cache.sig

    def one(col):
        j, b, x = col
        Pj = cache.P_idx                                    # (P, D)
        jcol = cache.Jc[j][Pj, x] * cache.S[Pj, b]          # (P, D)
        Xt_j = cache.X[j][Pj]                               # (P, D)
        delta = cache.X[:, None, :] - Xt_j[None, :, :]      # (N, P, D)
        nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)       # (N, P)
        base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
        c_iso = (sig**2 + sig * nrm) * base
        u = jnp.einsum("npd,pd->np", delta, jcol)           # (N, P)
        G = (
            jnp.einsum("np,pd->nd", c_iso, jcol)
            - 5.0 * jnp.einsum("np,np,npd->nd", base, u, delta)
        )                                                   # (N, D)
        out = vec_dot_d_desc(cache.Jc, cache.S, G)          # (N, A, 3)
        return out.reshape(-1)

    cols = jnp.stack([pts, atoms, xyzs], axis=1)
    return jax.lax.map(one, cols)                           # (C, n)


@partial(jax.jit, static_argnums=(0, 4))
def _columns_compressed_point_group(
    spec_dim_i: int,
    cache: KernelCache,
    j: jnp.ndarray,       # () owning training point
    ts: jnp.ndarray,      # (g,) partial indices of that point, -1 pads
    g_chunk: int,
) -> jnp.ndarray:
    """All requested kernel columns of ONE training point, batched: (n, g).

    Large-D fast path: the per-column compressed route
    (_columns_compressed_chunk) recomputes the (N, P, D) geometry per
    column and runs its D x A Jacobian contraction as a narrow, dispatch-
    bound op — measured 78 ms/column (~18 f64-GF/s) on the nanotube
    (D = 68,265).  Dense selections put ~k/N columns on each point (160 at
    the nanotube's rule-of-thumb k), so batching one point's partials
    shares the geometry and turns the contraction into one wide
    (N*g*3, D) x (D, A) GEMM per chunk.  No (D, 3A) inflation anywhere.
    """
    sig = cache.sig
    N = cache.n_train
    g = ts.shape[0]
    jcol = _columns_jcol(cache, j[None], ts[None])[0]       # (g, P, D)
    Xt_j = cache.X[j][cache.P_idx]                          # (P, D)
    delta = cache.X[:, None, :] - Xt_j[None]                # (N, P, D)
    nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)           # (N, P)
    base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
    c_iso = (sig**2 + sig * nrm) * base
    bdelta = base[..., None] * delta                        # (N, P, D)

    def one_chunk(jc):                                      # (gc, P, D)
        u = jnp.einsum("npd,spd->nsp", delta, jc)           # (N, gc, P)
        z = jnp.einsum("nsp,npd->nsd", u, bdelta)           # (N, gc, D)
        W = jnp.einsum("np,spd->nsd", c_iso, jc)
        G = W - 5.0 * z
        out = vec_dot_d_desc(cache.Jc[:, None], cache.S, G)  # (N, gc, A, 3)
        return out.reshape(N, jc.shape[0], spec_dim_i)

    n_chunks = g // g_chunk
    outs = jax.lax.map(
        one_chunk, jcol.reshape(n_chunks, g_chunk, *jcol.shape[1:])
    )                                                       # (nc, N, gc, T)
    out = outs.transpose(1, 0, 2, 3).reshape(N, g, spec_dim_i)
    return out.transpose(0, 2, 1).reshape(N * spec_dim_i, g)


def assemble_columns_compressed_grouped(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    g_chunk: int = 8,
) -> jnp.ndarray:
    """Inflation-free kernel columns for DENSE selections on large-D
    molecules: one _columns_compressed_point_group dispatch per owning
    point, partial counts padded to multiples of ``32 * g_chunk`` so the
    executable is shared across points/sweeps.  col_idxs sorted."""
    col_idxs = np.asarray(col_idxs)
    T = spec.dim_i
    points = col_idxs // T
    partials = col_idxs % T
    outs = []
    bucket = 4 * g_chunk
    for j in np.unique(points):
        ts = partials[points == j]
        g_pad = -(-len(ts) // bucket) * bucket
        ts_pad = np.full(g_pad, -1, dtype=np.int64)
        ts_pad[: len(ts)] = ts
        blk = _columns_compressed_point_group(
            T, cache, jnp.asarray(j), jnp.asarray(ts_pad), g_chunk
        )
        outs.append(blk[:, : len(ts)])
    return jnp.concatenate(outs, axis=1)                    # (n, k)


@partial(jax.jit, static_argnums=(4,))
def _square_point_columns(
    cache: KernelCache,
    j: jnp.ndarray,       # () owning training point
    bs: jnp.ndarray,      # (g,) atom index of each requested column (pad: 0)
    xs: jnp.ndarray,      # (g,) cartesian component of each column (pad: 0)
    g_chunk: int,
) -> jnp.ndarray:
    """Requested kernel columns of ONE training point in the square
    all-pairs layout: (n, g) — no (N, P, D) geometry, no incidence GEMMs.

    Exploits that a compressed Jacobian COLUMN (b, x) of point j is, on the
    square grid, supported only on the b-CROSS of the antisymmetric field
    Gsq[j] (entries with i = b or l = b).  With ssq = the 1/sqrt(2)-scaled
    square quantities (exactly packed-equal inner products, see
    SquareCache), the per-column packed pipeline
    (_columns_compressed_chunk) reduces to three point-shared einsums plus
    cheap per-column elementwise work:

      u[n|b,x]   = -2 sum_l delta_ssq[n,b,l] Gsq[j,b,l,x]
      Z[n,a,y]   =  2 sum_i delta_ssq[n,i,a] Gsq[n,i,a,y]   (shared by ALL
                    columns of j — the dense -5*base*u*delta term)
      C1[n,b,x,y] = 2 sum_i Gsq[j,i,b,x] Gsq[n,i,b,y]       (the a=b block)
      col[n,a,y] = A_exp1[n,j] * (delta_ab C1 - 2 Gsq[j,b,a,x] Gsq[n,b,a,y])
                   - 5 (A_exp[n,j]/sig^2) u Z[n,a,y]

    ~N*A^2*15 flops for ALL 3A columns of a point, vs the compressed
    path's N*g*3*D*A — ~(D/A)x fewer (=92x at the nanotube).
    """
    Xs, Gs = cache.Xsq, cache.Gsq
    N, A = Xs.shape[0], Xs.shape[1]
    a1j = cache.A_exp1[:, j]                              # (N,)
    w5 = 5.0 * cache.A_exp[:, j] / cache.sig**2           # (N,) 5*base
    Gsj = Gs[j]                                           # (A, A, 3)
    if cache.Usq is not None:
        U, Z, C1 = cache.Usq[j], cache.Zsq[j], cache.C1sq[j]
    else:
        # Xsq carries the kernel's q = sqrt(5)/sig scaling (matvec layout);
        # the assembly pipeline contracts UNSCALED descriptor differences
        # against the Jacobian field, so undo q here (the 1/sqrt(2) stays)
        delta = (Xs - Xs[j][None]) * (cache.sig / SQRT5)  # (N, A, A)
        U = -2.0 * jnp.sum(delta[..., None] * Gsj[None], axis=2)  # (N, A, 3)
        Z = 2.0 * jnp.sum(delta[..., None] * Gs, axis=1)          # (N, A, 3)
        C1 = 2.0 * jnp.einsum("ibx,niby->nbxy", Gsj, Gs)          # (N, A, 3, 3)

    g = bs.shape[0]

    def one_chunk(args):
        bc, xc = args                                     # (gc,)
        gc = bc.shape[0]
        Uc = U[:, bc, xc]                                 # (N, gc)
        Gsel = Gsj[bc, :, xc]                             # (gc, A)
        Gn = Gs[:, bc, :, :]                              # (N, gc, A, 3)
        t2 = 2.0 * Gsel[None, :, :, None] * Gn            # (N, gc, A, 3)
        out = (
            -a1j[:, None, None, None] * t2
            - (w5[:, None] * Uc)[..., None, None] * Z[:, None]
        )                                                 # (N, gc, A, 3)
        add = a1j[:, None, None] * C1[:, bc, xc, :]       # (N, gc, 3)
        out = out.at[:, jnp.arange(gc), bc, :].add(add)
        # rows are (n, a, y) -> (N*A*3, gc)
        return out.transpose(0, 2, 3, 1).reshape(N * A * 3, gc)

    n_chunks = g // g_chunk
    outs = jax.lax.map(
        one_chunk,
        (bs.reshape(n_chunks, g_chunk), xs.reshape(n_chunks, g_chunk)),
    )                                                     # (nc, n, gc)
    return outs.transpose(1, 0, 2).reshape(N * A * 3, g)


@partial(jax.jit, static_argnums=(3,))
def _square_points_batched(
    cache: KernelCache,
    js: jnp.ndarray,      # (n_pts,) owning points
    ts: jnp.ndarray,      # (n_pts, g_pad) partial indices, 0-padded
    g_chunk: int,
) -> jnp.ndarray:
    """All requested columns of a batch of points in ONE dispatch:
    (n_pts, n, g_pad).  A per-point Python loop costs a host->device index
    transfer + dispatch each (~30 ms through the tunnel — 28 points x 36
    panel rounds made the build dispatch-bound)."""
    def one(args):
        j, t = args
        return _square_point_columns(cache, j, t // 3, t % 3, g_chunk)

    return jax.lax.map(one, (js, ts))


@partial(jax.jit, static_argnums=(2,))
def _square_gather_columns(blocks: jnp.ndarray, flat_cols: jnp.ndarray,
                           n: int) -> jnp.ndarray:
    """(n_pts, n, g_pad) point blocks -> (n, k) selected columns (one
    coarse column gather, ~250 KB slices)."""
    stacked = blocks.transpose(1, 0, 2).reshape(n, -1)
    return jnp.take(stacked, flat_cols, axis=1)


def assemble_columns_square(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    g_chunk: int = 8,
) -> jnp.ndarray:
    """Kernel columns K[:, col_idxs] (n, k) through the square all-pairs
    layout — the large-A fast path (single-perm molecules; requires
    build_cache(..., R=...)).  Per-point partial counts are padded to a
    common multiple of ``4 * g_chunk`` so all points ride one executable
    and ONE device dispatch."""
    assert cache.Xsq is not None and cache.n_perms == 1
    col_idxs = np.asarray(col_idxs)
    T = spec.dim_i
    points = col_idxs // T
    partials = col_idxs % T
    uniq = np.unique(points)
    bucket = 4 * g_chunk
    counts = np.array([(points == j).sum() for j in uniq])
    g_pad = -(-int(counts.max()) // bucket) * bucket
    # chunk the point axis so the (pts, n, g_pad) block stays ~<= 2 GB
    pts_chunk = max(1, min(len(uniq), int(2e9 / (cache.n * g_pad * 8))))
    outs = []
    for c0 in range(0, len(uniq), pts_chunk):
        uc = uniq[c0 : c0 + pts_chunk]
        if len(uc) < pts_chunk:  # pad to the jitted chunk shape
            uc = np.concatenate([uc, np.repeat(uc[-1:], pts_chunk - len(uc))])
        ts = np.zeros((pts_chunk, g_pad), dtype=np.int64)
        flat = []
        for row, j in enumerate(uc[: min(pts_chunk, len(uniq) - c0)]):
            sel = partials[points == j]
            ts[row, : len(sel)] = sel
            flat.append(row * g_pad + np.arange(len(sel)))
        flat = np.concatenate(flat)
        blocks = _square_points_batched(
            cache, jnp.asarray(uc), jnp.asarray(ts), g_chunk)
        outs.append(_square_gather_columns(blocks, jnp.asarray(flat),
                                           cache.n))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def assemble_columns_compressed(
    spec: DescriptorSpec,
    cache: KernelCache,
    col_idxs: np.ndarray,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Inflation-free PSD kernel columns K[:, col_idxs] (n, k) for large-D
    molecules (see _columns_compressed_chunk).

    ``chunk`` (columns per device dispatch) defaults to the largest count
    whose (N, P, D) per-column intermediates stay under ~1 GB: the nanotube
    build at chunk=16 was DISPATCH-bound (280 round trips, 339 s for 4,488
    columns), not compute-bound."""
    col_idxs = np.asarray(col_idxs)
    if chunk is None:
        per_col = cache.n_train * max(cache.n_perms, 1) * spec.dim * 8
        chunk = int(max(16, min(256, 1e9 // max(per_col, 1))))
    T = spec.dim_i
    pts = col_idxs // T
    partial_idx = col_idxs % T
    atoms = partial_idx // 3
    xyzs = partial_idx % 3

    outs = []
    k = len(col_idxs)
    for start in range(0, k, chunk):
        sl = slice(start, start + chunk)
        p, a, x = pts[sl], atoms[sl], xyzs[sl]
        pad = chunk - len(p)
        if pad and k > chunk:
            p = np.concatenate([p, np.repeat(p[-1:], pad)])
            a = np.concatenate([a, np.repeat(a[-1:], pad)])
            x = np.concatenate([x, np.repeat(x[-1:], pad)])
        blk = _columns_compressed_chunk(
            T, cache, jnp.asarray(p), jnp.asarray(a), jnp.asarray(x)
        )
        outs.append(blk[: len(col_idxs[sl])])
    return jnp.concatenate(outs, axis=0).T                  # (n, k)


# Jacobian-inflation memory (bytes, f64) above which assemble_columns
# switches to the inflation-free path.
_INFLATION_BUDGET = int(2e8)


@partial(jax.jit, static_argnums=(0,))
def kernel_diag(spec_dim_i: int, cache: KernelCache) -> jnp.ndarray:
    """diag(K) (n,), PSD convention, no ridge (mirrors reference
    iterative_cholesky.py:241-373, which returns the negated = PSD diagonal)."""
    def one(i):
        blk = assemble_block(spec_dim_i, cache, i[None], i[None])
        return jnp.diagonal(blk)

    return jax.lax.map(one, jnp.arange(cache.n_train)).reshape(-1)


@partial(jax.jit, static_argnums=(0,))
def kernel_diag_compressed(spec_dim_i: int, cache: KernelCache) -> jnp.ndarray:
    """diag(K) (n,) without Jacobian inflation — large-D molecules.

    For the diagonal entry of point i, partial t = (b, x), the two terms of
    the Matérn-5/2 Hessian contraction reduce to compressed-Jacobian
    contractions:

      isotropic:    sum_q S[q,b] S[P_p[q],b] * Jc[q,x] Jc[P_p[q],x]
                    (one fused einsum per perm; the (D, A) product never
                    inflates to (D, A, 3)),
      anisotropic:  -5 base_p * v_p[b,x] * vt_p[b,x] with
                    v_p  = vec_dot_d_desc(Jc_i, S, delta_p)
                    vt_p = vec_dot_d_desc(Jc_i, S, delta_p[Pinv_p]).

    Cost O(N P D A); peak memory O(P D + D A) — vs the inflating
    ``kernel_diag`` whose per-point block materializes a (D, A, 3) Jacobian
    (~0.6 GB per point for the nanotube, d=370, D=68k)."""
    sig = cache.sig
    Pinv = jnp.argsort(cache.P_idx, axis=1)                 # (P, D)

    def one(i):
        Jc_i = cache.Jc[i]                                  # (D, 3)
        X_i = cache.X[i]                                    # (D,)
        Xp = X_i[cache.P_idx]                               # (P, D)
        delta = X_i[None, :] - Xp                           # (P, D)
        nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)       # (P,)
        base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
        c_iso = (sig**2 + sig * nrm) * base

        def per_perm(p):
            Pp = cache.P_idx[p]
            Sp = cache.S[Pp]                                # (D, A) transient
            g = Jc_i * Jc_i[Pp]                             # (D, 3)
            # isotropic: fused einsum, never forms (D, A, 3)
            termA = jnp.einsum("qa,qa,qx->ax", cache.S, Sp, g)
            # anisotropic: two compressed contractions
            v = vec_dot_d_desc(Jc_i, cache.S, delta[p])     # (A, 3)
            vt = vec_dot_d_desc(Jc_i, cache.S, delta[p][Pinv[p]])
            return c_iso[p] * termA - 5.0 * base[p] * v * vt

        out = jnp.sum(
            jax.lax.map(per_perm, jnp.arange(cache.P_idx.shape[0])), axis=0
        )                                                   # (A, 3)
        return out.reshape(-1)

    return jax.lax.map(one, jnp.arange(cache.n_train)).reshape(-1)


def kernel_diag_any(spec: DescriptorSpec, cache: KernelCache) -> jnp.ndarray:
    """diag(K): inflating fast path for small D, compressed path for large D
    (same routing rule as assemble_columns)."""
    if spec.dim * spec.dim_i * 8 * max(4, cache.n_perms) > _INFLATION_BUDGET:
        return kernel_diag_compressed(spec.dim_i, cache)
    return kernel_diag(spec.dim_i, cache)


@partial(jax.jit, static_argnums=(0,))
def kernel_column(spec_dim_i: int, cache: KernelCache, col: jnp.ndarray) -> jnp.ndarray:
    """Single column of (K + lam*I): direct assembly, O(n * P * D) — an
    n_train-fold speedup over the reference's matvec-based ``get_col``
    (iterative_cholesky.py:152-156 pays a full matvec per column).
    """
    T = spec_dim_i
    j = col // T
    t = col % T
    blk = _point_block_cols(T, cache, j)           # (n, 3A)
    column = blk[:, t]
    return column.at[col].add(cache.lam)


@partial(jax.jit, static_argnums=(0,))
def kernel_column_compressed(
    spec_dim_i: int, cache: KernelCache, col: jnp.ndarray
) -> jnp.ndarray:
    """Single column of (K + lam*I) without Jacobian inflation (the
    single-column body of _columns_compressed_chunk) — large-D route for the
    greedy pivoted-Cholesky loop."""
    T = spec_dim_i
    j = col // T
    t = col % T
    b, x = t // 3, t % 3
    sig = cache.sig
    Pj = cache.P_idx                                    # (P, D)
    jcol = cache.Jc[j][Pj, x] * cache.S[Pj, b]          # (P, D)
    Xt_j = cache.X[j][Pj]                               # (P, D)
    delta = cache.X[:, None, :] - Xt_j[None, :, :]      # (N, P, D)
    nrm = SQRT5 * jnp.linalg.norm(delta, axis=-1)       # (N, P)
    base = (5.0 / (3.0 * sig**4)) * jnp.exp(-nrm / sig)
    c_iso = (sig**2 + sig * nrm) * base
    u = jnp.einsum("npd,pd->np", delta, jcol)           # (N, P)
    G = (
        jnp.einsum("np,pd->nd", c_iso, jcol)
        - 5.0 * jnp.einsum("np,np,npd->nd", base, u, delta)
    )                                                   # (N, D)
    out = vec_dot_d_desc(cache.Jc, cache.S, G)          # (N, A, 3)
    return out.reshape(-1).at[col].add(cache.lam)
