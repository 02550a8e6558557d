"""Low-rank preconditioner zoo: Woodbury apply, Nyström factorization,
column-selection strategies, leverage scores, truncated-eigen family.

TPU-native rebuild of the reference preconditioner dispatch
(reference: sgdml/solvers/iterative_solver.py:672-807) and its builders:

  strategy (task string)              reference location
  ---------------------------------  -------------------------------------
  'random_scores'                    iterative_solver.py:683-686
  'lev_scores'/'inverse_lev'/
  'lev_random'                       iterative_solver.py:447-552, 724-755
  'rank_k_lev_scores[_custom]'       iterative_solver.py:713-722, 1110-1175
  'truncated_cholesky[_custom]'      iterative_solver.py:687-712
  'cholesky' (pivoted incomplete)    iterative_cholesky.py + incomplete_cholesky.py
  'eigvec_precon*'                   iterative_solver.py:1177-1348

All builders work in the PSD convention (K + lam*I).  The reference's main
Nyström operator returns the *negated* preconditioner (its `_P_vec`
iterative_solver.py:292-318 computes -(P^-1 v)); PCG iterates are invariant
under that global sign, so this clean-sign implementation produces identical
iteration sequences.

Split of labor: O(n*m) and O(n^2) work (column assembly, big triangular
solves, the Woodbury GEMVs) stays on device; O(m^3) factorizations of m x m
matrices run through host LAPACK (scipy) — TPU f64 decompositions are
emulated/unsupported and these are negligible in the profile.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..ops import kernel as knl
from ..ops import ozaki
from ..ops.descriptor import DescriptorSpec
from ..utils.log import get_logger

log = get_logger(__name__)

# Every f64 matmul on the factor-build path carries an explicit HIGHEST
# precision.  On TPU, f64 matmuls are emulated by multi-pass f32 MXU
# products and the DEFAULT pass count delivers only ~1e-8-grade results —
# measured: the fused Gram `inner` differed from the exact Gram of the
# same factor by 6.5e-7 absolute (6,500x lam), which silently destroyed
# preconditioner quality (CG stuck at 100x||b|| while the identical
# factorization with an exact inner converged in 648 iterations;
# 2026-08-21, ethanol n = 31,482, k = 1536).  The assembly path
# (ops/kernel.py) always carried HIGHEST, which is why assembled columns
# match CPU to 2e-15 while the factor build did not.
_HP = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Factor-build GEMM engine selection (round 5).  The O(n m^2) whiten + Gram
# products can run either as emulated-f64 matmuls with depth-capped Gram
# accumulation (_F64_SAFE_DEPTH, the round-3 emulation-cliff fix) or
# through the Ozaki exact-slice engine (ops/ozaki.py).
#
# MEASURED NEGATIVE (2026-08-21, hardware): ozaki for the MONOLITHIC
# whiten+gram at n = 31,482, m = 1536 runs 5.7-8.2 s vs the f64 path's
# 0.5-0.7 s — ~10x SLOWER.  Root cause: at deep contractions (m >= 1536)
# the engine's cross-segment f64 accumulation — n_pairs(28) x n_seg(m/256)
# f64 adds over the full (chunk, m) output — dominates; the matvec's 2.6x
# win came from D = 36-deep contractions where that term is a single
# conversion.  The f64 emulated matmul amortizes its own splitting far
# better on deep contractions.  'auto' therefore keeps f64 EVERYWHERE
# except the huge-n colblock inner Gram, where the f64 path is an
# ACCURACY failure, not a speed choice: at n = 503,982 the depth-capped
# f64 Gram carries a measured 1.46e-11 bias (> the 0.1*lam = 1e-11 guard)
# and triggers a ~9-minute host-Gram fallback — the ozaki Gram's exact
# segments beat that by an order of magnitude even at its slower rate.
# MLFF_BUILD_GEMM=ozaki|f64 forces one engine globally.
# ---------------------------------------------------------------------------
_BUILD_GEMM_MODE: str | None = None
# s = 7 digits: ~2^-56 slicing truncation; Gram absolute error at n = 504k
# stays ~1e-12-grade, inside the 0.1*lam self-consistency guard threshold
# (the guard still runs and falls back to a host Gram on violation).
_BUILD_DIGITS = int(os.environ.get("MLFF_BUILD_DIGITS", "7"))
# above this row count the depth-capped f64 Gram's accumulated bias
# approaches 0.1*lam — switch the Gram to exact-slice digits before the
# guard has to fire.  Measured: n = 74,979 passes the guard; n = 157,500
# FAILS it (4.09e-11, aspirin k = 4096 — a 59 s + a ~3 min host-fallback
# per factor); n = 503,982 fails at 1.46e-11.  120k splits the measured
# pass/fail points.
_OZAKI_GRAM_MIN_ROWS = int(float(os.environ.get("MLFF_OZAKI_GRAM_MIN_ROWS",
                                                "120000")))


def _build_mode() -> str:
    global _BUILD_GEMM_MODE
    if _BUILD_GEMM_MODE is None:
        mode = os.environ.get("MLFF_BUILD_GEMM", "auto")
        if mode == "auto":
            mode = "f64"  # measured optimum for the monolithic build
        _BUILD_GEMM_MODE = mode
    return _BUILD_GEMM_MODE


def _gram_impl_for(n_rows: int) -> str:
    """Gram engine by row count: f64 below the measured bias scale,
    exact-slice ozaki above it (see the engine-selection note)."""
    if _build_mode() == "ozaki":
        return "ozaki"
    if (os.environ.get("MLFF_BUILD_GEMM", "auto") == "auto"
            and n_rows >= _OZAKI_GRAM_MIN_ROWS):
        return "ozaki"
    return _build_mode()


def _oz_slice_T(X: jnp.ndarray, s: int):
    """One slicing pass serving BOTH operands of a Gram X^T X: returns
    (left, right) where right = slice_digits(X, axis=0) and left is the
    same scales/digits transposed (per-column scales of X are per-row
    scales of X^T) — dot_general absorbs the transposes without copies."""
    sc, dg = ozaki.slice_digits(X, axis=0, s=s)
    return (sc.T, [d.T for d in dg]), (sc, dg)


def _gram_acc_ozaki(acc: jnp.ndarray, tr: jnp.ndarray, s: int) -> jnp.ndarray:
    """acc += tr^T tr via exact-slice digit products: error ~2^-(8s) of the
    per-column scales, independent of the row count (no depth cap needed —
    every 256-deep segment accumulation is exact by construction)."""
    left, right = _oz_slice_T(tr, s)
    return acc + ozaki.gemm_presliced(left, right)


def _gram_pair_acc_ozaki(acc, Ab, Bb, s: int):
    """acc += Ab^T Bb, exact-slice version of _gram_pair_acc_safe."""
    left, _ = _oz_slice_T(Ab, s)
    right = ozaki.slice_digits(Bb, axis=0, s=s)
    return acc + ozaki.gemm_presliced(left, right)


class WoodburyPreconditioner(NamedTuple):
    """P = L L^T + lam I with precomputed T = chol(lam I + L^T L)^-1 L^T.

    apply(v) = lam^-1 (v - T^T (T v))  — two (k, n) GEMVs + axpy
    (reference: iterative_cholesky.py:141-148).

    T is stored padded with zero rows to a multiple of 128: padding is
    mathematically inert in the apply, and it buckets the compiled-graph
    shapes so a k-sweep reuses one PCG executable per bucket instead of
    paying a multi-minute tunnel compile per distinct k.
    """

    T: jnp.ndarray    # (k, n)
    lam: jnp.ndarray  # ()

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return woodbury_apply(self, v)

    def as_op(self):
        """(fn, state) form for PCGSolver: keeps T out of the compiled
        executable's constants (see solvers.cg._normalize_op)."""
        return woodbury_apply, self


def woodbury_apply(P: "WoodburyPreconditioner", v: jnp.ndarray) -> jnp.ndarray:
    """P^-1 v = lam^-1 (v - T^T (T v)).

    Written as broadcasts + reductions rather than T @ v GEMVs: single-RHS
    f64 matmuls waste the MXU (1/128 tile occupancy under f64 emulation) and
    measured 5x slower per CG iteration than this fused VPU form on TPU v5e
    (37.4 -> 7.4 ms/iter at k=1574, n=15741)."""
    w = jnp.sum(P.T * v[None, :], axis=1)               # (k,)  == T v
    return (v - jnp.sum(P.T * w[:, None], axis=0)) / P.lam


class WoodburySplitPreconditioner(NamedTuple):
    """Woodbury apply through the SPLIT factors B (n, m) and W2 (m, m):

        P^-1 v = lam^-1 (v - B W2 (W2^T (B^T v)))

    Equivalent to the single-factor form with T = W2^T B^T, but materially
    more robust at scale: the fused T is computed by an (m, m) x (m, n)
    device GEMM whose rounding noise — amplified by ||W2|| ~ lam^-1/2 — gets
    FROZEN into T.  At n = 75k that excess pushed 35 eigenvalues of T T^T
    above 1 (max 1 + 1.7e-6), making P^-1 indefinite (most negative
    eigenvalue ~ -(excess)/lam = -1.7e4) and stalling CG with an oscillating
    residual.  Applying through B and W2 keeps the frozen operator the
    EXACT symmetric contraction B W2 W2^T B^T (Gram-consistent by the
    factorization's construction); per-apply rounding is fresh, unamplified
    noise that PCG absorbs.  Per-iteration cost is identical: the two (n, m)
    passes dominate; the extra two (m, m) GEMVs are O(m/n) of that.

    B is padded with zero COLUMNS (and W2 with zero rows/cols) to a multiple
    of 128 for compile-shape bucketing, like WoodburyPreconditioner.T.
    """

    B: jnp.ndarray    # (n, m) whitened columns
    W2: jnp.ndarray   # (m, m) inner inverse-sqrt factor
    lam: jnp.ndarray  # ()

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return woodbury_split_apply(self, v)

    def as_op(self):
        return woodbury_split_apply, self

    def fused_T(self) -> jnp.ndarray:
        """(m, n) fused factor W2^T B^T — DIAGNOSTIC/TEST USE ONLY (the
        production apply deliberately avoids materializing this product;
        see the class docstring)."""
        return (self.B @ self.W2).T


class OzakiApplyPreconditioner(NamedTuple):
    """Woodbury apply through an Ozaki digit decomposition of B.

    The split apply's two (n, m) passes are f64 broadcast-reduces on the
    VPU — f64 elementwise is software-emulated on v5e and dominates the CG
    iteration once the matvec runs through ops.ozaki (measured 23.4 ms/iter
    total with the matvec at 7.7 ms, n = 31,482, m = 1536).  Here B is
    stored as s = 7 integer bf16 digit arrays with per-COLUMN power-of-two
    scales (56 bits: below f64's own 52-bit mantissa, so unlike the 48-bit
    2-component df64 apply there is NO frozen-quantization iteration
    penalty).  Each pass contracts digit i of B against ALL needed digits
    of the (small, per-apply-sliced) vector in ONE segmented MXU product —
    B's digits are read once per pass, so HBM traffic is ~1.75x the f64
    B read while the arithmetic moves from emulated-f64 VPU to native bf16
    MXU.  The same per-column decomposition serves both passes: pass 2
    folds the column scales into the small vector before slicing it
    (products then sit on a uniform per-digit-pair grid, keeping the
    256-deep f32 segment sums exact).

    B's digits are row-padded to a multiple of 256 (zero rows are inert);
    the f64 B is NOT kept — the digits replace it (~1.75x B's bytes).
    """

    B_dig: tuple      # s x (n_pad, m) bf16 integer digits
    sB: jnp.ndarray   # (m,) f64 per-column power-of-two scales
    W2: jnp.ndarray   # (m, m)
    lam: jnp.ndarray  # ()

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return ozaki_woodbury_apply(self, v)

    def as_op(self):
        return ozaki_woodbury_apply, self


def ozaki_from_split(P: "WoodburySplitPreconditioner", s: int = 7
                     ) -> OzakiApplyPreconditioner:
    """Convert a split factor into the Ozaki-digit apply form."""
    from ..ops import ozaki

    n, m = P.B.shape
    n_pad = -(-n // 256) * 256
    B = P.B
    if n_pad != n:
        B = jnp.concatenate([B, jnp.zeros((n_pad - n, m), B.dtype)])
    scale, digits = ozaki.slice_digits(B, axis=0, s=s)
    return OzakiApplyPreconditioner(
        B_dig=tuple(digits), sB=scale.reshape(-1), W2=P.W2, lam=P.lam)


def _ozaki_gemv_digits(B_dig: tuple, x_dig: list, sx: jnp.ndarray,
                       transpose: bool) -> jnp.ndarray:
    """sum over digit pairs (i, j), i + j < s, of
    256^-(i+j+2) * (B_i^T X_j) (transpose=True: contraction over rows) or
    256^-(i+j+2) * (B_i X_j)   (transpose=False: contraction over columns),
    with exact 256-deep f32 segment accumulation and f64 cross-segment/pair
    accumulation.  x_dig entries are (len_contract, 1) integer digits.
    Digit i of B is read ONCE: all its partners stack into one product."""
    s = len(B_dig)
    n_pad, m = B_dig[0].shape
    out = None
    for i, Bi in enumerate(B_dig):
        J = s - i
        X = jnp.concatenate([x_dig[j] for j in range(J)], axis=1)
        if transpose:
            # u_part[c, j] = sum_r Bi[r, c] X[r, j], segmented over r
            n_seg = n_pad // 256
            B3 = Bi.reshape(n_seg, 256, m)
            X3 = X.reshape(n_seg, 256, J)
            part = jnp.einsum("scm,scj->smj", B3, X3,
                              preferred_element_type=jnp.float32)
            acc = jnp.sum(part.astype(jnp.float64), axis=0)      # (m, J)
        else:
            # y_part[r, j] = sum_c Bi[r, c] X[c, j], segmented over c
            m_seg = -(-m // 256)
            m_pad = m_seg * 256
            Bp, Xp = Bi, X
            if m_pad != m:
                Bp = jnp.concatenate(
                    [Bi, jnp.zeros((n_pad, m_pad - m), Bi.dtype)], axis=1)
                Xp = jnp.concatenate(
                    [X, jnp.zeros((m_pad - m, J), X.dtype)])
            B3 = Bp.reshape(n_pad, m_seg, 256).transpose(1, 0, 2)
            X3 = Xp.reshape(m_seg, 256, J)
            part = jnp.einsum("smc,scj->smj", B3, X3,
                              preferred_element_type=jnp.float32)
            acc = jnp.sum(part.astype(jnp.float64), axis=0)      # (n_pad, J)
        w = 256.0 ** -(i + 2.0 + jnp.arange(J, dtype=jnp.float64))
        term = jnp.sum(acc * w[None, :], axis=1)
        out = term if out is None else out + term
    return out * sx


@jax.jit
def ozaki_woodbury_apply(P: OzakiApplyPreconditioner, v: jnp.ndarray
                         ) -> jnp.ndarray:
    """lam^-1 (v - B W2 W2^T B^T v) through the digit decomposition."""
    from ..ops import ozaki

    n = v.shape[0]
    n_pad = P.B_dig[0].shape[0]
    s = len(P.B_dig)
    vp = v
    if n_pad != n:
        vp = jnp.concatenate([v, jnp.zeros(n_pad - n, v.dtype)])
    sv, v_dig = ozaki.slice_digits(vp[:, None], axis=0, s=s)
    u = _ozaki_gemv_digits(P.B_dig, v_dig, sv.reshape(()), True) * P.sB
    x = jnp.matmul(P.W2, jnp.matmul(P.W2.T, u, precision=_HP),
                   precision=_HP)
    x2 = x * P.sB  # fold column scales into the small vector (grid
    #                uniformity for the exact segment sums)
    sx2, x_dig = ozaki.slice_digits(x2[:, None], axis=0, s=s)
    y = _ozaki_gemv_digits(P.B_dig, x_dig, sx2.reshape(()), False)[:n]
    return (v - y) / P.lam


# chunk the apply's (n, m) passes above this factor size (an unfused
# broadcast-multiply transient equals B's own footprint — 8 GB at n=500k)
_APPLY_CHUNK_BYTES = int(2e9)
_APPLY_CHUNK_ROWS = 16384


def woodbury_split_apply(
    P: "WoodburySplitPreconditioner", v: jnp.ndarray
) -> jnp.ndarray:
    """lam^-1 (v - B W2 W2^T B^T v), VPU broadcast-reduce form for the big
    (n, m) passes (see woodbury_apply for why not GEMVs)."""
    if P.B.size * 8 > _APPLY_CHUNK_BYTES:
        return _woodbury_split_apply_chunked(P, v)
    u = jnp.sum(P.B * v[:, None], axis=0)               # (m,)  == B^T v
    x = jnp.matmul(P.W2, jnp.matmul(P.W2.T, u, precision=_HP),
                   precision=_HP)                             # (m,)  tiny GEMVs
    return (v - jnp.sum(P.B * x[None, :], axis=1)) / P.lam


def _woodbury_split_apply_chunked(
    P: "WoodburySplitPreconditioner", v: jnp.ndarray,
    chunk: int = _APPLY_CHUNK_ROWS,
) -> jnp.ndarray:
    """Row-chunked apply: keeps per-pass transients at (chunk, m).  The
    ragged tail window is row-masked in the accumulating pass; the write
    pass may harmlessly rewrite overlap rows with identical values."""
    n, m = P.B.shape
    chunk = min(chunk, n)
    n_full = (n // chunk) * chunk

    def pass1(i, acc):
        Bb = jax.lax.dynamic_slice(P.B, (i * chunk, 0), (chunk, m))
        vb = jax.lax.dynamic_slice(v, (i * chunk,), (chunk,))
        return acc + jnp.sum(Bb * vb[:, None], axis=0)

    u = jax.lax.fori_loop(0, n // chunk, pass1,
                          jnp.zeros(m, P.B.dtype))
    if n_full != n:
        start = n - chunk
        Bb = jax.lax.dynamic_slice(P.B, (start, 0), (chunk, m))
        vb = jax.lax.dynamic_slice(v, (start,), (chunk,))
        fresh = (jnp.arange(chunk) >= n_full - start)
        u = u + jnp.sum(Bb * jnp.where(fresh, vb, 0.0)[:, None], axis=0)

    x = jnp.matmul(P.W2, jnp.matmul(P.W2.T, u, precision=_HP),
                   precision=_HP)

    def pass2(i, y):
        start = jnp.minimum(i * chunk, n - chunk)
        Bb = jax.lax.dynamic_slice(P.B, (start, 0), (chunk, m))
        yb = jnp.sum(Bb * x[None, :], axis=1)
        return jax.lax.dynamic_update_slice(y, yb, (start,))

    y = jax.lax.fori_loop(0, -(-n // chunk), pass2,
                          jnp.zeros(n, P.B.dtype))
    return (v - y) / P.lam


class WoodburyColBlockPreconditioner(NamedTuple):
    """Split Woodbury apply with B stored as COLUMN blocks (n, m_c).

    Mathematically identical to WoodburySplitPreconditioner with
    B = concat(Bs, axis=1); exists because the axon runtime's d2h staging
    carve-out caps any SINGLE HBM buffer at ~8 GB while ~12 GB remains
    allocatable in pieces (utils/hbm.py).  Block widths are compile-shape
    buckets; the last block is zero-column padded (inert, like
    WoodburySplitPreconditioner's padding).

        u_c = B_c^T v                 (per block, row-chunked)
        x = W2 (W2^T concat(u))       (m, m) GEMVs
        y = sum_c B_c x_c             (per block, row-chunked)
        P^-1 v = lam^-1 (v - y)
    """

    Bs: tuple  # of (n, m_c) column blocks
    W2: jnp.ndarray   # (m, m) inner inverse-sqrt factor
    lam: jnp.ndarray  # ()

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return woodbury_colblock_apply(self, v)

    def as_op(self):
        return woodbury_colblock_apply, self


def _block_pass1(B: jnp.ndarray, v: jnp.ndarray,
                 chunk: int = _APPLY_CHUNK_ROWS) -> jnp.ndarray:
    """u = B^T v for one (n, m_c) block, row-chunked broadcast-reduce."""
    n, m = B.shape
    chunk = min(chunk, n)
    n_full = (n // chunk) * chunk

    def body(i, acc):
        Bb = jax.lax.dynamic_slice(B, (i * chunk, 0), (chunk, m))
        vb = jax.lax.dynamic_slice(v, (i * chunk,), (chunk,))
        return acc + jnp.sum(Bb * vb[:, None], axis=0)

    u = jax.lax.fori_loop(0, n // chunk, body, jnp.zeros(m, B.dtype))
    if n_full != n:
        start = n - chunk
        Bb = jax.lax.dynamic_slice(B, (start, 0), (chunk, m))
        vb = jax.lax.dynamic_slice(v, (start,), (chunk,))
        fresh = (jnp.arange(chunk) >= n_full - start)
        u = u + jnp.sum(Bb * jnp.where(fresh, vb, 0.0)[:, None], axis=0)
    return u


def _block_pass2(B: jnp.ndarray, x: jnp.ndarray,
                 chunk: int = _APPLY_CHUNK_ROWS) -> jnp.ndarray:
    """y = B x for one (n, m_c) block, row-chunked (overlap rows of the
    ragged tail window rewrite identical values, like the split apply)."""
    n, m = B.shape
    chunk = min(chunk, n)

    def body(i, y):
        start = jnp.minimum(i * chunk, n - chunk)
        Bb = jax.lax.dynamic_slice(B, (start, 0), (chunk, m))
        yb = jnp.sum(Bb * x[None, :], axis=1)
        return jax.lax.dynamic_update_slice(y, yb, (start,))

    return jax.lax.fori_loop(0, -(-n // chunk), body, jnp.zeros(n, B.dtype))


def woodbury_colblock_apply(
    P: "WoodburyColBlockPreconditioner", v: jnp.ndarray
) -> jnp.ndarray:
    """lam^-1 (v - B W2 W2^T B^T v) over column blocks of B."""
    u = jnp.concatenate([_block_pass1(B, v) for B in P.Bs])
    x = jnp.matmul(P.W2, jnp.matmul(P.W2.T, u, precision=_HP),
                   precision=_HP)
    off = 0
    y = jnp.zeros_like(v)
    for B in P.Bs:
        y = y + _block_pass2(B, jax.lax.slice(x, (off,), (off + B.shape[1],)))
        off += B.shape[1]
    return (v - y) / P.lam


class DF64WoodburyPreconditioner(NamedTuple):
    """Split Woodbury apply with the two (n, m) passes running as Pallas
    double-f32 kernels (ops.pallas_df64) instead of XLA's f64 emulation.

    B is stored as an f32 (hi, lo) pair carrying 48 of f64's 53 mantissa
    bits — measured 1.7e-14 relative error on the production GEMV shapes,
    i.e. f64-class for the solver (plain f32 at 5e-7 breaks CG), at f32
    VPU speed: the apply pair ran 11.3 ms vs 15.4-30 ms for the XLA-f64
    forms at (75k, 3840) on v5e.  Padding: Bh/Bl/W2 padded to the kernel
    tile size (zeros, inert); n-length vectors are padded per apply.

    ``Bm`` (optional third component, f32(B - Bh - Bl), ~2^-72 grade):
    the 2^-48 FROZEN quantization of the two-component form perturbs the
    apply operator by ~2^-48 * ||W2||^2 ~ 1e-10/lam-grade — measured
    +10-15%% CG iterations.  The third component removes the frozen error
    (its contribution rides two plain f32 GEMVs; per-apply df64 rounding
    is fresh noise and measured free).
    """

    Bh: jnp.ndarray   # (n_pad, m_pad) f32
    Bl: jnp.ndarray   # (n_pad, m_pad) f32
    W2: jnp.ndarray   # (m_pad, m_pad) f64
    lam: jnp.ndarray  # ()
    Bm: jnp.ndarray | None = None  # (n_pad, m_pad) f32, 2^-48-scaled residual

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        return df64_woodbury_apply(self, v)

    def as_op(self):
        return df64_woodbury_apply, self


def df64_woodbury_apply(
    P: "DF64WoodburyPreconditioner", v: jnp.ndarray
) -> jnp.ndarray:
    """lam^-1 (v - B W2 W2^T B^T v) with the big passes in Pallas df64."""
    from ..ops import pallas_df64 as pdf

    hp = jax.lax.Precision.HIGHEST
    n = v.shape[0]
    n_pad = P.Bh.shape[0]
    vp = v if n_pad == n else jnp.zeros(n_pad, v.dtype).at[:n].set(v)
    u = pdf.df64_bt_v(P.Bh, P.Bl, vp)                   # (m_pad,) f64
    if P.Bm is not None:
        # third-component correction: Bm ~ 2^-48 * ||B||, so a plain f32
        # GEMV carries it at ~2^-72 overall — removes the frozen two-
        # component quantization of the apply operator
        v32 = vp.astype(jnp.float32)
        u = u + jnp.matmul(v32[None, :], P.Bm,
                           precision=hp)[0].astype(jnp.float64)
    x = jnp.matmul(P.W2, jnp.matmul(P.W2.T, u, precision=_HP),
                   precision=_HP)                             # small f64 GEMVs
    y = pdf.df64_b_x(P.Bh, P.Bl, x)                     # (n_pad,) f64
    if P.Bm is not None:
        x32 = x.astype(jnp.float32)
        y = y + jnp.matmul(P.Bm, x32[:, None],
                           precision=hp)[:, 0].astype(jnp.float64)
    return (v - y[:n]) / P.lam


@partial(jax.jit, static_argnums=(1, 2, 3), donate_argnums=(0,))
def _split_pad_b(B, n_pad: int, m_pad: int, components: int = 3):
    """f64 B (n, m) -> padded f32 (hi, lo[, mid]) tuple; B's buffer is
    donated and the split happens BEFORE padding (an f64 padded copy of the
    n=75k factor transiently cost ~5 GB HBM and OOM'd)."""
    from ..ops import df64 as _df64

    n, m = B.shape
    Bh, Bl = _df64.split_f64(B)
    Bm = None
    if components >= 3:
        # residual below the two-component representation (~2^-48 scale);
        # f64's 53-bit mantissa means it carries the remaining ~5 bits
        # exactly — the frozen apply-operator error goes to zero
        Bm = (B - Bh.astype(B.dtype) - Bl.astype(B.dtype)).astype(jnp.float32)
    out = []
    for comp in (Bh, Bl, Bm):
        if comp is None:
            out.append(None)
        elif (n_pad, m_pad) != (n, m):
            out.append(jnp.zeros((n_pad, m_pad), jnp.float32
                                 ).at[:n, :m].set(comp))
        else:
            out.append(comp)
    return tuple(out)


@partial(jax.jit, donate_argnums=(0,))
def _split_block_f32(B: jnp.ndarray):
    """f64 block -> (hi, lo) f32 pair; the f64 buffer is donated (memory
    SHRINKS per block during the colblock conversion)."""
    from ..ops import df64 as _df64

    return _df64.split_f64(B)


def df64_from_colblocks(Bs: tuple, W2: jnp.ndarray, lam: float
                        ) -> "DF64WoodburyPreconditioner":
    """Convert column-blocked f64 factors to the monolithic Pallas-df64
    (2-component) form, block by block to respect the HBM budget: each
    2.1 GB f64 block is donated into two 1 GB f32 slices before the next
    converts, then the slices concatenate into (n_pad, m_pad) hi/lo
    planes (peak ~12 GB in <=4.2 GB pieces at n = 504k, k = 2048 — inside
    the per-buffer post-d2h envelope, RESULTS.md memory model)."""
    from ..ops import pallas_df64 as pdf

    n = Bs[0].shape[0]
    m = sum(B.shape[1] for B in Bs)
    n_pad = -(-n // pdf.TILE_N) * pdf.TILE_N
    m_pad = -(-m // pdf.TILE_M) * pdf.TILE_M
    his, los = [], []
    for B in Bs:
        hi, lo = _split_block_f32(B)
        his.append(hi)
        los.append(lo)
    del Bs
    pad_rows = n_pad - n
    pad_cols = m_pad - m

    def assemble(pieces):
        if pad_cols:
            pieces = pieces + [jnp.zeros((n, pad_cols), jnp.float32)]
        plane = jnp.concatenate(pieces, axis=1)
        if pad_rows:
            plane = jnp.concatenate(
                [plane, jnp.zeros((pad_rows, m_pad), jnp.float32)])
        return plane

    Bh = assemble(his)
    del his
    Bh.block_until_ready()
    Bl = assemble(los)
    del los
    Bl.block_until_ready()
    if m_pad != W2.shape[0]:
        W2 = jnp.zeros((m_pad, m_pad), W2.dtype).at[:W2.shape[0],
                                                    :W2.shape[1]].set(W2)
    log.info("df64 colblock conversion: 2-component (n_pad=%d, m_pad=%d)",
             n_pad, m_pad)
    return DF64WoodburyPreconditioner(
        Bh=Bh, Bl=Bl, W2=W2, lam=jnp.asarray(lam, jnp.float64), Bm=None)


def df64_from_split(P: "WoodburySplitPreconditioner", components: int = 3
                    ) -> "DF64WoodburyPreconditioner":
    """Convert a split Woodbury preconditioner to the Pallas-df64 form
    (pads storage to the kernel tile multiples).  P.B is consumed
    (donated); do not use P afterwards.  ``components=3`` (default) stores
    the third f32 slice of B, eliminating the frozen-quantization
    iteration penalty at +50%% factor memory; pass 2 to drop it when HBM
    is the binding constraint."""
    from ..ops import pallas_df64 as pdf

    n, m = P.B.shape
    n_pad = -(-n // pdf.TILE_N) * pdf.TILE_N
    m_pad = -(-m // pdf.TILE_M) * pdf.TILE_M
    Bh, Bl, Bm = _split_pad_b(P.B, n_pad, m_pad, components)
    W2 = P.W2
    if m_pad != m:
        W2 = jnp.zeros((m_pad, m_pad), W2.dtype).at[:m, :m].set(W2)
    return DF64WoodburyPreconditioner(Bh=Bh, Bl=Bl, W2=W2, lam=P.lam, Bm=Bm)


_tunnel_warmed = False


def warm_host_transfer() -> None:
    """Kick off the first device->host transfer asynchronously.

    Through the axon TPU tunnel the FIRST d2h in a process pays a flat
    ~4-10 s connection-setup cost (tools/probe_tunnel.py).  Issuing a tiny
    ``copy_to_host_async`` at training start hides that setup under the
    descriptor/kernel-cache/assembly work instead of landing it on the
    factorization's critical path.  No-op on backends without async copy.

    MEMORY SIDE EFFECT (load-bearing): the first d2h also permanently
    reserves ~6-7 GB of the chip's 16 GB HBM for the runtime's transfer
    staging, dropping the largest allocatable buffer from ~14 GB to ~8 GB
    — and it hard-fails with RESOURCE_EXHAUSTED if that much isn't free
    at first-transfer time (measured, see utils/hbm.py and RESULTS.md
    "Axon runtime memory model").  Running the warm-up FIRST, before any
    large allocation, is therefore mandatory, and all large long-lived
    buffers must be budgeted against the post-d2h ceiling.
    """
    global _tunnel_warmed
    if _tunnel_warmed:
        return
    _tunnel_warmed = True
    try:
        jnp.zeros(8).copy_to_host_async()
    except Exception:  # pragma: no cover - backend without async d2h
        pass


@partial(jax.jit, static_argnums=(1,))
def _unpack_triu_dev(packed: jnp.ndarray, m: int) -> jnp.ndarray:
    """Row-major packed upper triangle -> full (m, m) on device.

    Index arithmetic in int32: row r of the triangle starts at
    r*m - r(r-1)/2, so the flat source index of (r, c>=r) is that plus
    (c - r).  One gather, no host-side index constants (which would cost
    as many tunnel bytes as the data saved by packing)."""
    assert m < 40_000  # int32 offset arithmetic headroom
    r = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    idx = r * m - (r * (r - 1)) // 2 + (c - r)
    mask = c >= r
    vals = packed[jnp.where(mask, idx, 0)]
    return jnp.where(mask, vals, jnp.zeros((), packed.dtype))


def _put_factor(W_host: np.ndarray, host_decomp: str) -> jnp.ndarray:
    """Host m x m factor -> device.  The 'chol' factors (L^-T) are upper
    triangular: send only the packed triangle (halves the ~30-55 MB/s
    tunnel bytes; 113 -> 56 MB at m = 3753) and unpack with one gather on
    device.  'eigh' factors are dense — full transfer."""
    if host_decomp != "chol":
        return jnp.asarray(W_host)
    m = W_host.shape[0]
    packed = np.ascontiguousarray(W_host[np.triu_indices(m)])
    return _unpack_triu_dev(jnp.asarray(packed), m)


def cho_factor_stable(M: np.ndarray, max_tries: int = 20) -> np.ndarray:
    """Lower Cholesky factor with escalating diagonal regularization.

    Mirrors the reference's `_cho_factor_stable`
    (iterative_solver.py:554-618): shift the diagonal by the (negated)
    smallest eigenvalue when needed, then escalate jitter ~10x per failure.
    Host LAPACK — M is m x m.
    """
    M = np.asarray(M)
    m = M.shape[0]
    lo_eig = scipy.linalg.eigh(M, eigvals_only=True, subset_by_index=(0, 0))[0]
    shift = 1e-15 if lo_eig <= 0 else -1e-15
    A = M + shift * np.eye(m)
    jitter = 0.0
    for i in range(max_tries):
        try:
            return scipy.linalg.cholesky(A + jitter * np.eye(m), lower=True)
        except scipy.linalg.LinAlgError:
            jitter = max(abs(lo_eig) * 2.0, 1e-14) * (10.0**i)
            log.warning("cho_factor_stable: escalating jitter to %.2e", jitter)
    raise np.linalg.LinAlgError("cho_factor_stable failed to regularize matrix")


def _pad_factor_rows(T: jnp.ndarray) -> jnp.ndarray:
    """Pad (k, n) -> (ceil(k/128)*128, n) with zero rows (inert in apply)."""
    k = T.shape[0]
    k_pad = -(-k // 128) * 128
    if k_pad == k:
        return T
    return jnp.zeros((k_pad, T.shape[1]), T.dtype).at[:k].set(T)


def _pad_split(B: jnp.ndarray, W2: jnp.ndarray):
    """Pad B (n, m) with zero columns and W2 (m, m) with zero rows/cols to a
    multiple of 128 (inert in the split apply; buckets compile shapes)."""
    m = B.shape[1]
    m_pad = -(-m // 128) * 128
    if m_pad == m:
        return B, W2
    Bp = jnp.zeros((B.shape[0], m_pad), B.dtype).at[:, :m].set(B)
    Wp = jnp.zeros((m_pad, m_pad), W2.dtype).at[:m, :m].set(W2)
    return Bp, Wp


def woodbury_from_factor(L: jnp.ndarray, lam: float) -> WoodburySplitPreconditioner:
    """Build the Woodbury apply operator from a low-rank factor L (n, k):
    P^-1 = lam^-1 (I - L (lam I + L^T L)^-1 L^T), applied through the split
    factors (B = L, W2 = chol(lam I + L^T L)^-T computed by host LAPACK).

    The O(k^2 n) Gram is row-chunked on device (an unchunked (n, k) f64
    GEMM's emulation operand splits OOM HBM at n >~ 50k); only the packed
    (k, k) Gram crosses the host tunnel.  The split apply avoids freezing
    trsm noise into a (k, n) product — see WoodburySplitPreconditioner."""
    L = jnp.asarray(L)
    n, k = L.shape
    chunk = min(n, _GEMM_ROW_CHUNK)
    tril = jnp.asarray(np.tril_indices(k))
    inner = _unpack_sym(
        np.asarray(_gram_nm_tril(L, tril, chunk, _gram_impl_for(n))),
        k)                                                 # d2h k(k+1)/2
    W2 = jnp.asarray(_host_inner_isqrt(inner, lam, "chol"))
    B, W2 = _pad_split(L, W2)
    return WoodburySplitPreconditioner(
        B=B, W2=W2, lam=jnp.asarray(lam, L.dtype)
    )


def nystrom_preconditioner(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    inducing_idxs: np.ndarray,
    lam: float,
    use_E_cstr: bool = False,
    method: str = "chol_host",
    rank_tol: float = 1e-10,
    apply_impl: str = "xla",
    block_cols: int | None = None,
) -> WoodburyPreconditioner:
    """Nyström preconditioner from a column subset, whitened form.

    P = K_nm K_mm^+ K_mn + lam I, applied through the Woodbury identity
    (the numerically stable variant the reference uses in both its
    operators, iterative_solver.py:218-254 and 370-374).
    With ``use_E_cstr`` the columns span the energy-constrained system
    (inducing points restricted to force columns).

    ``method``:
      * 'eigh' (default) — deterministic rank-revealing factorization: both
        m x m decompositions (K_mm whitening and the whitened Gram) run as
        host LAPACK eigendecompositions with eigenvalue clamping at
        ``rank_tol`` * lambda_max, i.e. pseudo-inverse whitening.  No jitter
        ladders, no NaN retries, and the O(m^2 n) device work is two GEMMs
        (no triangular solve).  Replaces the reference's escalating-jitter
        `_cho_factor_stable` (iterative_solver.py:554-618), whose
        regularization level measurably swings PCG iteration counts (2.3k-9k
        at n=31k, k=2k) — the clamp only discards eigendirections below the
        device-assembly noise floor (~1e-10 relative under TPU f64-emulated
        matmuls) instead of shifting the whole spectrum.
      * 'chol' — the previous fused Cholesky path with escalating traced
        jitter (reference-semantics ladder); kept for A/B comparison.
    """
    import time as _time

    inducing_idxs = np.sort(np.asarray(inducing_idxs))
    from ..utils.hbm import post_d2h_ceiling_bytes

    ceiling = post_d2h_ceiling_bytes()
    factor_bytes = cache.n * len(inducing_idxs) * 8
    if (block_cols is None and ceiling is not None
            and factor_bytes > 0.9 * ceiling
            and method in ("chol_host", "eigh") and apply_impl == "xla"):
        # past the per-buffer ceiling: store B as column blocks (the
        # runtime still serves ~12 GB in pieces, utils/hbm.py).  Bucket
        # the width to the assembly's 512-column compile-shape grid.
        width = int(0.45 * ceiling / (cache.n * 8)) // 512 * 512
        block_cols = max(512, width)
        log.info(
            "Nystrom factor (n=%d, m=%d, %.1f GB) exceeds the %.1f GB "
            "per-buffer post-d2h ceiling — using column blocks of %d",
            cache.n, len(inducing_idxs), factor_bytes / 1e9,
            ceiling / 1e9, block_cols,
        )
    t0 = _time.perf_counter()
    if block_cols is not None:
        Bs, W2 = _nystrom_factor_split_colblocked(
            spec, cache, inducing_idxs, lam, rank_tol, block_cols,
            use_E_cstr=use_E_cstr)
        t1 = _time.perf_counter()
        Bs, W2 = _pad_colblocks(Bs, W2)
        log.info("nystrom build (colblock x%d): %.1fs", len(Bs), t1 - t0)
        if apply_impl == "df64":
            # At colblock scale the XLA f64 apply is unusable anyway: the
            # compiled CG loop hoists X64Split hi/lo f32 copies of every
            # factor block (+8 GB at n = 504k, k = 2048 — compile-time
            # OOM).  The Pallas df64 apply consumes explicit f32 pairs
            # (same total bytes as the f64 factor, no hidden splits);
            # 2 components only — the third would not fit the HBM budget
            # at exactly the sizes that need colblocks.
            return df64_from_colblocks(Bs, W2, lam)
        if apply_impl != "xla":
            raise ValueError(
                f"apply_impl {apply_impl!r} unsupported with column blocks")
        return WoodburyColBlockPreconditioner(
            Bs=Bs, W2=W2, lam=jnp.asarray(lam, W2.dtype))
    if use_E_cstr:
        K_nm = knl.assemble_columns_ecstr(spec, cache, inducing_idxs)
    else:
        K_nm = knl.assemble_columns(spec, cache, inducing_idxs)  # (n, m) PSD
    K_nm.block_until_ready()
    t1 = _time.perf_counter()
    if method in ("eigh", "chol_host"):
        B_t, W2 = _nystrom_factor_split(
            K_nm, inducing_idxs, lam, rank_tol,
            host_decomp="chol" if method == "chol_host" else "eigh",
        )
        B_t.block_until_ready()
        B, W2 = _pad_split(B_t, W2)
        P = WoodburySplitPreconditioner(
            B=B, W2=W2, lam=jnp.asarray(lam, B.dtype)
        )
        if apply_impl == "df64":
            # 3 components unless the conversion transient (f64 B + three
            # f32 slices, ~20 B/elem) would breach the HBM ceiling
            comps = 3 if P.B.size * 20 < int(8e9) else 2
            P = df64_from_split(P, components=comps)
        elif apply_impl == "ozaki":
            P = ozaki_from_split(P)
        elif apply_impl != "xla":
            raise ValueError(f"unknown apply_impl {apply_impl!r}")
    elif method == "chol":
        T = _nystrom_factor_chol(K_nm, inducing_idxs, lam)
        T.block_until_ready()
        P = WoodburyPreconditioner(
            T=_pad_factor_rows(T), lam=jnp.asarray(lam, T.dtype)
        )
    else:
        raise ValueError(f"unknown nystrom method {method!r}")
    log.info(
        "nystrom build (%s): columns %.1fs, factorization %.1fs",
        method, t1 - t0, _time.perf_counter() - t1,
    )
    return P


def _host_whiten_factor(M: np.ndarray, rank_tol: float, host_decomp: str):
    """Host-LAPACK W with W^T M W ~ I (pseudo-inverse whitening).

    'eigh': V diag(w^-1/2) with eigenvalues clamped at rank_tol * w_max.
    'chol': L^-T from a deterministic escalating-jitter Cholesky of
      M + j*I, j = rank_tol * diag_max * 4^i — ~10x cheaper than eigh on
      host (this machine has 2 cores: dsyevd at m=3753 is 14.4 s, potrf +
      trtri ~2 s) and measured iteration-count-neutral (tests/test_solvers).
    """
    m = M.shape[0]
    if host_decomp == "eigh":
        w1, V1 = scipy.linalg.eigh(M, driver="evd", overwrite_a=True)
        tol1 = max(w1[-1], 0.0) * rank_tol
        wi = np.where(w1 > tol1, 1.0 / np.sqrt(np.maximum(w1, tol1)), 0.0)
        return V1 * wi[None, :]
    j0 = float(np.abs(np.diagonal(M)).max()) * rank_tol
    for i in range(16):
        try:
            L = scipy.linalg.cholesky(
                M + (j0 * 4.0**i) * np.eye(m), lower=True)
        except scipy.linalg.LinAlgError:
            continue
        if i:
            log.info("whiten chol: jitter escalated to %.1e rel", rank_tol * 4.0**i)
        return scipy.linalg.lapack.dtrtri(L, lower=1)[0].T
    raise np.linalg.LinAlgError("whiten chol failed to regularize")


def _host_inner_isqrt(inner: np.ndarray, lam: float, host_decomp: str):
    """Host-LAPACK W2 with W2 W2^T ~ (inner + lam I)^-1 (inner = Gram of the
    device-computed B, PSD up to device-GEMM roundoff).

    'eigh': V diag((max(w,0)+lam)^-1/2) — exact pseudo-inverse scaling.
    'chol': L^-T of inner + (lam + j) I with the deterministic ladder
      j = lam * 4^i (the Gram's roundoff eigenvalues are ~-1e-10 * w_max
      under TPU f64-emulated GEMMs, the same order as lam itself)."""
    m = inner.shape[0]
    if host_decomp == "eigh":
        w2, V2 = scipy.linalg.eigh(inner, driver="evd", overwrite_a=True)
        return V2 * (1.0 / np.sqrt(np.maximum(w2, 0.0) + lam))[None, :]
    for i in range(16):
        j = 0.0 if i == 0 else lam * 4.0 ** (i - 1)
        try:
            L = scipy.linalg.cholesky(
                inner + (lam + j) * np.eye(m), lower=True)
        except scipy.linalg.LinAlgError:
            continue
        if i:
            log.info("inner chol: extra jitter escalated to %.1e", j)
        return scipy.linalg.lapack.dtrtri(L, lower=1)[0].T
    raise np.linalg.LinAlgError("inner chol failed to regularize")


def _nystrom_factor_split(
    K_nm: jnp.ndarray, inducing_idxs: np.ndarray, lam: float, rank_tol: float,
    host_decomp: str = "eigh",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split Nyström factorization (B_t (n, m), W2 (m, m)) with
    B = K_nm W1, W2 W2^T = (B^T B + lam I)^+, via two host decompositions
    (eigh by default, Cholesky with ``host_decomp='chol'``).

    W1 = V1 diag(w1^-1/2 clamped)  (K_mm = V1 w1 V1^T, pseudo-inverse whiten)
    W2 = V2 diag((max(w2,0)+lam)^-1/2)  (B B^T = V2 w2 V2^T)

    so T^T T = B^T (B B^T + lam I)^+ B exactly — the Woodbury inner solve in
    its eigenbasis, immune to the near-singularity that makes chol(B B^T)
    fail.  Only the two m x m matrices cross the host boundary (measured
    ~16 MB/s through the TPU tunnel; 33 MB each way at m=2048); the
    O(m^2 n) work stays on device as GEMMs.  On-device eigh is not an
    option: QDWH-eig under f64 emulation takes 292 s to COMPILE at m=512.
    """
    idxs_dev = jnp.asarray(inducing_idxs)
    # O(m^2 n) device work is CHUNKED over the n axis: TPU f64 matmul
    # emulation splits each operand into 8 f32 slices, so one fused
    # (75006, 3753) f64 GEMM holds ~4 x 8.4 GB of operand splits — an
    # instant HBM OOM.  Dynamic-slice chunking with a masked ragged tail
    # keeps one chunk's splits live and avoids any padded copy of the
    # factor (the in-place whiten reuses K_nm's donated buffer).
    n = K_nm.shape[0]
    chunk = min(n, _GEMM_ROW_CHUNK)
    # Two host round trips, each m x m (the ~16 MB/s tunnel + host eigh are
    # the cost; divide-and-conquer driver is 7.0 vs 8.5 s at m = 3753).
    #
    # SELF-CONSISTENCY IS LOAD-BEARING: the inner matrix MUST be the Gram of
    # the actual device-computed B_t = K_nm W1, not a congruence
    # W1^T (K_nm^T K_nm) W1 evaluated on host.  With lam = 1e-10, the
    # (w2 + lam)^-1/2 scaling needs `inner` to match B_t's true Gram to
    # ~lam absolute in the small eigenvalues; the congruence takes a
    # different roundoff path through the TPU's emulated-f64 GEMMs and its
    # mismatch destroyed preconditioner quality (CG at n=31k went from
    # 1213 iterations to non-converging within 40x that budget).
    m = len(inducing_idxs)
    t = _StageTimer()
    tril = jnp.asarray(np.tril_indices(m))
    K_mm_packed = _gather_rows_tril(K_nm, idxs_dev, tril)
    K_mm_packed.block_until_ready()
    t.mark("gather")
    K_mm = _unpack_sym(np.asarray(K_mm_packed), m)         # d2h m(m+1)/2
    t.mark("d2h_Kmm")
    W1_h = _host_whiten_factor(K_mm, rank_tol, host_decomp)
    t.mark("chol_W1")
    W1 = _put_factor(W1_h, host_decomp)
    W1.block_until_ready()
    t.mark("h2d_W1")
    # fused whiten+Gram: one pass, no full-factor relayout copy or hoisted
    # X64Split (a standalone Gram compile-OOMed at n=500k — see the
    # _whiten_gram_nm_tril docstring)
    gram_impl = _gram_impl_for(n)
    B_t, inner_packed = _whiten_gram_nm_tril(K_nm, W1, tril, chunk,
                                             _build_mode(), gram_impl)
    inner_packed.block_until_ready()
    t.mark(f"whiten+gram[{_build_mode()}/{gram_impl}]")
    inner = _unpack_sym(np.asarray(inner_packed), m)       # d2h m(m+1)/2
    t.mark("d2h_inner")
    # GUARD (load-bearing, see the self-consistency note above): inner must
    # match B's true Gram to ~lam ABSOLUTE or the (w2 + lam)^-1/2 scaling
    # corrupts the small-eigenvalue directions and the preconditioner
    # silently stops preconditioning.  Spot-check a few entries against a
    # compensated (df64, ~2^-48) dot computed on device; on failure,
    # recompute the whole Gram on host from the factor (d2h n x m — slow
    # but correct).
    # probe the FULL diagonal (every column covered — an emulation error
    # localized to a few columns cannot slip between random samples) plus a
    # few random cross entries; df64 dot cost is O(n m) — small next to the
    # O(n m^2) Gram itself
    rng_p = np.random.default_rng(0)
    ii = np.concatenate([np.arange(m), rng_p.integers(0, m, size=min(8, m))])
    jj = np.concatenate([np.arange(m), rng_p.integers(0, m, size=min(8, m))])
    exact = np.asarray(_gram_entries_df64(B_t, jnp.asarray(ii),
                                          jnp.asarray(jj)))
    probe_err = float(np.abs(inner[ii, jj] - exact).max())
    t.mark("gram_probe")
    if probe_err > max(0.1 * lam, 1e-12):
        log.warning(
            "device Gram failed the df64 spot check (max abs err %.2e vs "
            "lam = %.0e): recomputing inner on host from the factor "
            "(d2h %d x %d)", probe_err, lam, n, m)
        B_host = np.asarray(B_t)
        inner = B_host.T @ B_host
        t.mark("host_gram_fallback")
    W2_h = _host_inner_isqrt(inner, lam, host_decomp)
    t.mark("chol_W2")
    W2 = _put_factor(W2_h, host_decomp)
    W2.block_until_ready()
    t.mark("h2d_W2")
    t.report("nystrom factor stages")
    return B_t, W2


@jax.jit
def _gram_entries_df64(B: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray):
    """Compensated (double-f32, ~2^-48 relative) Gram entries
    sum_r B[r, i] * B[r, j] for index vectors ii/jj — the accuracy oracle
    for the device Gram guard in _nystrom_factor_split.  Error ~4e-14
    absolute at Gram scale O(10): two decades below the 1e-12 guard
    threshold, four below the failure grade it exists to catch.

    Entries are processed in COLUMN CHUNKS of 64 (lax.map): the full-
    diagonal probe (~2m entries) gathered wholesale is an (n, 2m) f64
    transient whose df64 splits compile-OOMed HBM at n = 504k, m = 1024
    (measured round 4: 16.1 G needed of 15.75 G)."""
    from ..ops import df64 as _d

    k = int(ii.shape[0])
    CH = 64
    n_ch = -(-k // CH)
    pad = n_ch * CH - k
    ii_p = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)]) if pad else ii
    jj_p = jnp.concatenate([jj, jnp.zeros(pad, jj.dtype)]) if pad else jj

    def one(idx_pair):
        i_c, j_c = idx_pair
        a = B[:, i_c]
        b = B[:, j_c]
        ah, al = _d.split_f64(a)
        bh, bl = _d.split_f64(b)
        ph, pe = _d.two_prod(ah, bh)
        pe = pe + (ah * bl + al * bh)
        h, low = _d.df64_sum_pairwise(ph, pe, axis=0)
        return h.astype(jnp.float64) + low.astype(jnp.float64)

    out = jax.lax.map(one, (ii_p.reshape(n_ch, CH), jj_p.reshape(n_ch, CH)))
    return out.reshape(-1)[:k]


@partial(jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0,))
def _whiten_colblock(
    K_c: jnp.ndarray, K_prev: tuple, W1: jnp.ndarray,
    off_c: int, offs_prev: tuple, chunk: int, impl: str = "f64",
) -> jnp.ndarray:
    """B_c = sum_{j<=c} K_j W1[j-block, c-block], row-chunked, with K_c's
    buffer donated (the j=c term reads each row window before the update
    overwrites it — same in-place pattern as _whiten_nm).

    Correctness relies on W1 being UPPER TRIANGULAR (chol whitening,
    L^-T): block c of B then depends only on K blocks j <= c, so a
    descending-c sweep can overwrite block c while blocks j < c still
    hold original kernel columns."""
    n, mc = K_c.shape
    n_full = (n // chunk) * chunk
    s = _BUILD_DIGITS
    W_cc = W1[off_c:off_c + mc, off_c:off_c + mc]
    W_jcs = [W1[oj:oj + Kj.shape[1], off_c:off_c + mc]
             for Kj, oj in zip(K_prev, offs_prev)]
    if impl == "ozaki":
        W_cc_sl = ozaki.slice_digits(W_cc, axis=0, s=s)
        W_jc_sls = [ozaki.slice_digits(W, axis=0, s=s) for W in W_jcs]

    def transform(B, start, size):
        if impl == "ozaki":
            rows = jax.lax.dynamic_slice(B, (start, 0), (size, mc))
            blk = ozaki.gemm_presliced(
                ozaki.slice_digits(rows, axis=1, s=s), W_cc_sl)
            for Kj, W_jc_sl in zip(K_prev, W_jc_sls):
                kj = jax.lax.dynamic_slice(Kj, (start, 0),
                                           (size, Kj.shape[1]))
                blk = blk + ozaki.gemm_presliced(
                    ozaki.slice_digits(kj, axis=1, s=s), W_jc_sl)
            return blk
        blk = jnp.matmul(jax.lax.dynamic_slice(B, (start, 0), (size, mc)),
                         W_cc, precision=_HP)
        for Kj, W_jc in zip(K_prev, W_jcs):
            blk = blk + jnp.matmul(
                jax.lax.dynamic_slice(Kj, (start, 0), (size, Kj.shape[1])),
                W_jc, precision=_HP)
        return blk

    def body(i, B):
        return jax.lax.dynamic_update_slice(
            B, transform(B, i * chunk, chunk), (i * chunk, 0))

    B = jax.lax.fori_loop(0, n // chunk, body, K_c)
    if n_full != n:
        start = n - chunk
        tr = transform(B, start, chunk)
        old = jax.lax.dynamic_slice(B, (start, 0), (chunk, mc))
        fresh = (jnp.arange(chunk) >= n_full - start)[:, None]
        B = jax.lax.dynamic_update_slice(
            B, jnp.where(fresh, tr, old), (start, 0))
    return B


@partial(jax.jit, static_argnums=(2, 3))
def _gram_pair(Ba: jnp.ndarray, Bb: jnp.ndarray, chunk: int,
               impl: str = "f64") -> jnp.ndarray:
    """Ba^T Bb (m_a, m_b) accumulated over row chunks (masked ragged tail)."""
    n, ma = Ba.shape
    mb = Bb.shape[1]
    n_full = (n // chunk) * chunk

    def gacc(acc, Ab, Bb_):
        if impl == "ozaki":
            return _gram_pair_acc_ozaki(acc, Ab, Bb_, _BUILD_DIGITS)
        return _gram_pair_acc_safe(acc, Ab, Bb_)

    def body(i, acc):
        Ab = jax.lax.dynamic_slice(Ba, (i * chunk, 0), (chunk, ma))
        Bb_ = jax.lax.dynamic_slice(Bb, (i * chunk, 0), (chunk, mb))
        return gacc(acc, Ab, Bb_)

    acc = jax.lax.fori_loop(0, n // chunk, body,
                            jnp.zeros((ma, mb), Ba.dtype))
    if n_full != n:
        start = n - chunk
        Ab = jax.lax.dynamic_slice(Ba, (start, 0), (chunk, ma))
        Bb_ = jax.lax.dynamic_slice(Bb, (start, 0), (chunk, mb))
        fresh = (jnp.arange(chunk) >= n_full - start)[:, None]
        acc = gacc(acc, jnp.where(fresh, Ab, 0.0), Bb_)
    return acc


def _nystrom_factor_split_colblocked(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    inducing_idxs: np.ndarray,
    lam: float,
    rank_tol: float,
    block_cols: int,
    use_E_cstr: bool = False,
) -> tuple[tuple, jnp.ndarray]:
    """Column-blocked variant of _nystrom_factor_split: K_nm is assembled,
    whitened in place, and kept as column blocks of <= block_cols, never
    materializing a single (n, m) buffer.  Exists for factors past the
    axon runtime's ~8 GB per-buffer post-d2h ceiling (utils/hbm.py); the
    math and the self-consistency discipline (the inner matrix is the
    Gram of the ACTUAL device-held B blocks) are identical to the
    monolithic path.  Only the 'chol' host whitening is supported: the
    in-place block sweep needs W1 upper triangular."""
    inducing_idxs = np.sort(np.asarray(inducing_idxs))
    m = len(inducing_idxs)
    n = cache.n + (cache.n_train if use_E_cstr else 0)
    chunk = min(n, _GEMM_ROW_CHUNK)
    offs = list(range(0, m, block_cols))
    t = _StageTimer()
    blocks = []
    for off in offs:
        cols_c = inducing_idxs[off:off + block_cols]
        if use_E_cstr:
            K_c = knl.assemble_columns_ecstr(spec, cache, cols_c)
        else:
            K_c = knl.assemble_columns(spec, cache, cols_c)
        blocks.append(K_c)
    jax.block_until_ready(blocks[-1])
    t.mark("assemble")
    idxs_dev = jnp.asarray(inducing_idxs)
    K_mm = np.concatenate(
        [np.asarray(_gather_rows(K_c, idxs_dev)) for K_c in blocks], axis=1)
    t.mark("gather+d2h")
    W1_h = _host_whiten_factor(K_mm, rank_tol, "chol")
    t.mark("chol_W1")
    W1 = _put_factor(W1_h, "chol")
    W1.block_until_ready()
    t.mark("h2d_W1")
    for c in reversed(range(len(blocks))):
        blocks[c] = _whiten_colblock(
            blocks[c], tuple(blocks[:c]), W1,
            offs[c], tuple(offs[:c]), chunk, _build_mode())
    jax.block_until_ready(blocks)
    t.mark(f"whiten[{_build_mode()}]")
    inner = np.zeros((m, m))
    gram_impl = _gram_impl_for(n)
    log.info("colblock inner Gram impl: %s (n = %d)", gram_impl, n)
    for a in range(len(blocks)):
        for b in range(a, len(blocks)):
            G = np.asarray(_gram_pair(blocks[a], blocks[b], chunk,
                                      gram_impl))
            inner[offs[a]:offs[a] + G.shape[0],
                  offs[b]:offs[b] + G.shape[1]] = G
            if b != a:
                inner[offs[b]:offs[b] + G.shape[1],
                      offs[a]:offs[a] + G.shape[0]] = G.T
    t.mark("gram+d2h")
    # SELF-CONSISTENCY GUARD (same contract as _nystrom_factor_split's):
    # the inner matrix must match the device-held B blocks' true Gram to
    # ~lam ABSOLUTE or the (w2+lam)^-1/2 scaling corrupts the small-
    # eigenvalue directions and the preconditioner silently stops
    # preconditioning (the r3 depth-cliff failure signature: CG residual
    # oscillating at ~10x ||b|| forever).  Probe every diagonal entry
    # per block with the chunked df64 oracle; fall back to a host Gram
    # of the d2h'd blocks on failure.
    probe_err = 0.0
    for a, B_a in enumerate(blocks):
        m_a = B_a.shape[1]
        idx = jnp.arange(m_a)
        exact = np.asarray(_gram_entries_df64(B_a, idx, idx))
        diag = np.diagonal(inner)[offs[a]:offs[a] + m_a]
        probe_err = max(probe_err, float(np.abs(diag - exact).max()))
    t.mark("gram_probe")
    if probe_err > max(0.1 * lam, 1e-12):
        log.warning(
            "colblock device Gram failed the df64 spot check (max abs err "
            "%.2e vs lam = %.0e): recomputing inner on host from the "
            "blocks", probe_err, lam)
        Bh = np.concatenate([np.asarray(B_c) for B_c in blocks], axis=1)
        inner = Bh.T @ Bh
        del Bh
        t.mark("host_gram_fallback")
    W2_h = _host_inner_isqrt(inner, lam, "chol")
    t.mark("chol_W2")
    W2 = _put_factor(W2_h, "chol")
    W2.block_until_ready()
    t.mark("h2d_W2")
    t.report("nystrom colblock factor stages")
    return tuple(blocks), W2


def _pad_colblocks(Bs: tuple, W2: jnp.ndarray):
    """Zero-column-pad the LAST block (and W2's rows/cols) to a multiple
    of 128 — inert in the apply, buckets compile shapes."""
    m = sum(B.shape[1] for B in Bs)
    m_pad = -(-m // 128) * 128
    if m_pad == m:
        return Bs, W2
    extra = m_pad - m
    last = Bs[-1]
    lp = jnp.zeros((last.shape[0], last.shape[1] + extra),
                   last.dtype).at[:, :last.shape[1]].set(last)
    Wp = jnp.zeros((m_pad, m_pad), W2.dtype).at[:m, :m].set(W2)
    return (*Bs[:-1], lp), Wp


class _StageTimer:
    """Accumulates labelled wall-clock stage durations for one log line."""

    def __init__(self):
        import time as _time
        self._clock = _time.perf_counter
        self._last = self._clock()
        self.stages: list[tuple[str, float]] = []

    def mark(self, label: str) -> None:
        now = self._clock()
        self.stages.append((label, now - self._last))
        self._last = now

    def report(self, what: str) -> None:
        log.info("%s: %s", what,
                 "  ".join(f"{k} {v:.1f}s" for k, v in self.stages))


def _nystrom_factor_eigh(
    K_nm: jnp.ndarray, inducing_idxs: np.ndarray, lam: float, rank_tol: float,
    host_decomp: str = "eigh",
) -> jnp.ndarray:
    """Fused factor T = W2^T B^T (m, n) — the single-array form, kept for
    leverage-score computation and small-m diagnostics.  NOT used for the
    production preconditioner apply: at large n the project GEMM's frozen
    rounding noise (amplified by ||W2|| ~ lam^-1/2) pushes singular values
    of T above 1 and makes the Woodbury apply indefinite — see
    WoodburySplitPreconditioner."""
    B_t, W2 = _nystrom_factor_split(
        K_nm, inducing_idxs, lam, rank_tol, host_decomp)
    n = B_t.shape[0]
    n_chunks = max(1, -(-n // _GEMM_ROW_CHUNK))
    pad = n_chunks * _GEMM_ROW_CHUNK - n
    if pad:
        B_t = jnp.concatenate(
            [B_t, jnp.zeros((pad, B_t.shape[1]), B_t.dtype)], axis=0)
    T = _project_factor_nm(B_t, W2, n_chunks)              # (m, n_pad), donates
    return T[:, :n] if pad else T


# row-chunk size for the factorization GEMMs: per-chunk f64-emulation splits
# are 8 f32 slices of (chunk, m) with ~4 live at once — ~2 GB at m = 4096
_GEMM_ROW_CHUNK = 4096

# XLA's TPU f64-emulated matmul holds true-f64 accuracy (~3e-15 relative)
# only up to this CONTRACTION depth; beyond it the emulation switches to a
# cheaper pass structure and collapses to ~1e-10 relative regardless of
# the precision setting (measured 2026-08-21: depth 1024 -> 3.3e-15,
# 1536 -> 3.5e-11, 4096 -> 2.1e-8 rel).  Gram accumulations whose result
# must be lam-absolute-accurate (the Woodbury inner, see
# _nystrom_factor_split) therefore slice every contraction to this depth
# and accumulate the partials in f64, which is exact to ~sqrt(n/depth)
# extra rounding.
_F64_SAFE_DEPTH = 1024


def _gram_acc_safe(acc: jnp.ndarray, tr: jnp.ndarray) -> jnp.ndarray:
    """acc += tr^T tr with every matmul's contraction depth capped at
    _F64_SAFE_DEPTH.  Full-depth blocks run in a fori_loop (compile time
    stays O(1) in the row count — the trace-unrolled form compiled ~74
    slices at n = 75k); the ragged tail is one static extra matmul."""
    rows = tr.shape[0]
    nfull = rows // _F64_SAFE_DEPTH
    if nfull >= 2:
        def body(i, a):
            blk = jax.lax.dynamic_slice_in_dim(
                tr, i * _F64_SAFE_DEPTH, _F64_SAFE_DEPTH)
            return a + jnp.matmul(blk.T, blk, precision=_HP)

        acc = jax.lax.fori_loop(0, nfull, body, acc)
    elif nfull:
        blk = jax.lax.slice_in_dim(tr, 0, _F64_SAFE_DEPTH)
        acc = acc + jnp.matmul(blk.T, blk, precision=_HP)
    if rows > nfull * _F64_SAFE_DEPTH:
        blk = jax.lax.slice_in_dim(tr, nfull * _F64_SAFE_DEPTH, rows)
        acc = acc + jnp.matmul(blk.T, blk, precision=_HP)
    return acc


def _gram_pair_acc_safe(acc, Ab, Bb):
    """acc += Ab^T Bb, contraction depth capped at _F64_SAFE_DEPTH (same
    fori_loop-plus-static-tail structure as _gram_acc_safe)."""
    rows = Ab.shape[0]
    nfull = rows // _F64_SAFE_DEPTH
    if nfull >= 2:
        def body(i, a):
            s = i * _F64_SAFE_DEPTH
            ab = jax.lax.dynamic_slice_in_dim(Ab, s, _F64_SAFE_DEPTH)
            bb = jax.lax.dynamic_slice_in_dim(Bb, s, _F64_SAFE_DEPTH)
            return a + jnp.matmul(ab.T, bb, precision=_HP)

        acc = jax.lax.fori_loop(0, nfull, body, acc)
    elif nfull:
        a0 = jax.lax.slice_in_dim(Ab, 0, _F64_SAFE_DEPTH)
        b0 = jax.lax.slice_in_dim(Bb, 0, _F64_SAFE_DEPTH)
        acc = acc + jnp.matmul(a0.T, b0, precision=_HP)
    if rows > nfull * _F64_SAFE_DEPTH:
        a1 = jax.lax.slice_in_dim(Ab, nfull * _F64_SAFE_DEPTH, rows)
        b1 = jax.lax.slice_in_dim(Bb, nfull * _F64_SAFE_DEPTH, rows)
        acc = acc + jnp.matmul(a1.T, b1, precision=_HP)
    return acc


@jax.jit
def _gather_rows(K_nm: jnp.ndarray, idxs: jnp.ndarray) -> jnp.ndarray:
    return K_nm[idxs]


@jax.jit
def _gather_rows_tril(K_nm, idxs, tril):
    """Lower triangle of K_nm[idxs] as a packed vector (the symmetric m x m
    blocks cross the ~16 MB/s host tunnel; packing halves the bytes)."""
    K_mm = K_nm[idxs]
    return K_mm[tril[0], tril[1]]


@partial(jax.jit, static_argnums=(2, 3))
def _gram_nm_tril(B_t, tril, chunk, impl: str = "f64"):
    G = _gram_nm(B_t, chunk, impl)
    return G[tril[0], tril[1]]


def _unpack_sym(packed: np.ndarray, m: int) -> np.ndarray:
    """Packed lower triangle -> full symmetric (m, m) on host."""
    M = np.zeros((m, m), dtype=packed.dtype)
    il = np.tril_indices(m)
    M[il] = packed
    M = M + M.T
    M[np.diag_indices(m)] /= 2.0
    return M


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _whiten_nm(K_nm: jnp.ndarray, W1: jnp.ndarray, chunk: int):
    """B^T = K_nm W1 (n, m), row-chunked IN PLACE (K_nm donated).

    No row padding: a padded copy of the factor transiently doubles its
    HBM footprint (3.9 GB at n=158k, k=3072 — OOM).  Full chunks
    transform in place via dynamic slices; the ragged tail reads the
    window [n-chunk, n), transforms it, and keeps the already-whitened
    overlap rows from the window itself."""
    n, m = K_nm.shape
    n_full = (n // chunk) * chunk

    def body(i, B):
        blk = jax.lax.dynamic_slice(B, (i * chunk, 0), (chunk, m))
        return jax.lax.dynamic_update_slice(
            B, jnp.matmul(blk, W1, precision=_HP), (i * chunk, 0))

    B = jax.lax.fori_loop(0, n // chunk, body, K_nm)
    if n_full != n:
        start = n - chunk
        blk = jax.lax.dynamic_slice(B, (start, 0), (chunk, m))
        tr = jnp.matmul(blk, W1, precision=_HP)
        fresh = (jnp.arange(chunk) >= n_full - start)[:, None]
        B = jax.lax.dynamic_update_slice(
            B, jnp.where(fresh, tr, blk), (start, 0))
    return B


@partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,))
def _whiten_gram_nm_tril(K_nm: jnp.ndarray, W1: jnp.ndarray,
                         tril: jnp.ndarray, chunk: int, impl: str = "f64",
                         gram_impl: str | None = None):
    """Fused in-place whiten + Gram: B = K_nm W1 (K_nm donated) AND
    inner = B^T B, packed lower triangle — in ONE pass over the rows.

    Why fused: a standalone Gram over the finished (n, m) factor makes
    XLA (a) relayout-copy the ENTIRE factor for the transposed
    contraction and (b) HOIST the f64-emulation X64Split of that copy
    out of the chunk loop — at n=500k, k=1536 that planned
    5.72 (copy) + 2 x 2.86 GB (hi/lo splits) on top of the 5.72 GB
    input: a 17.19 GB executable, compile-time OOM (measured, see
    RESULTS.md).  Accumulating each chunk's tr^T tr as the chunk is
    produced keeps every transpose/split at (chunk, m).

    Self-consistency (load-bearing, see _nystrom_factor_split): the Gram
    addend and the stored factor rows are the SAME traced value `tr`, so
    inner is exactly the Gram of the stored B.

    ``impl='ozaki'`` runs both the whiten GEMM and the Gram through the
    exact-slice engine (native bf16 MXU passes, ~2^-56 at s=7): W1's
    digits are sliced ONCE outside the row loop; each chunk slices its
    kernel rows for the whiten and its whitened rows once for both Gram
    operands (_oz_slice_T)."""
    n, m = K_nm.shape
    n_full = (n // chunk) * chunk
    s = _BUILD_DIGITS
    gram_impl = impl if gram_impl is None else gram_impl
    W1_sl = ozaki.slice_digits(W1, axis=0, s=s) if impl == "ozaki" else None

    def transform(blk):
        if impl == "ozaki":
            return ozaki.gemm_presliced(
                ozaki.slice_digits(blk, axis=1, s=s), W1_sl)
        return jnp.matmul(blk, W1, precision=_HP)

    def gacc(acc, tr):
        if gram_impl == "ozaki":
            return _gram_acc_ozaki(acc, tr, s)
        return _gram_acc_safe(acc, tr)

    def body(i, carry):
        B, acc = carry
        blk = jax.lax.dynamic_slice(B, (i * chunk, 0), (chunk, m))
        tr = transform(blk)
        return (jax.lax.dynamic_update_slice(B, tr, (i * chunk, 0)),
                gacc(acc, tr))

    B, acc = jax.lax.fori_loop(
        0, n // chunk, body, (K_nm, jnp.zeros((m, m), K_nm.dtype)))
    if n_full != n:
        start = n - chunk
        blk = jax.lax.dynamic_slice(B, (start, 0), (chunk, m))
        tr = transform(blk)
        fresh = (jnp.arange(chunk) >= n_full - start)[:, None]
        acc = gacc(acc, jnp.where(fresh, tr, 0.0))
        B = jax.lax.dynamic_update_slice(
            B, jnp.where(fresh, tr, blk), (start, 0))
    return B, acc[tril[0], tril[1]]


@partial(jax.jit, static_argnums=(1, 2))
def _gram_nm(B_t: jnp.ndarray, chunk: int, impl: str = "f64") -> jnp.ndarray:
    """Gram B B^T = B_t^T B_t (m, m), accumulated over row chunks; the
    ragged tail window is row-masked so no padding is needed."""
    n, m = B_t.shape
    n_full = (n // chunk) * chunk

    def gacc(acc, Bb):
        if impl == "ozaki":
            return _gram_acc_ozaki(acc, Bb, _BUILD_DIGITS)
        return _gram_acc_safe(acc, Bb)

    def body(i, acc):
        Bb = jax.lax.dynamic_slice(B_t, (i * chunk, 0), (chunk, m))
        return gacc(acc, Bb)

    acc = jax.lax.fori_loop(0, n // chunk, body,
                            jnp.zeros((m, m), B_t.dtype))
    if n_full != n:
        start = n - chunk
        Bb = jax.lax.dynamic_slice(B_t, (start, 0), (chunk, m))
        fresh = (jnp.arange(chunk) >= n_full - start)[:, None]
        acc = gacc(acc, jnp.where(fresh, Bb, 0.0))
    return acc


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _project_factor_nm(B_t: jnp.ndarray, W2: jnp.ndarray, n_chunks: int):
    """T = W2^T B = (B_t W2)^T (m, n), row-chunked; B_t's buffer is donated."""
    n, m = B_t.shape
    out = jax.lax.map(lambda Bb: jnp.matmul(Bb, W2, precision=_HP),
                      B_t.reshape(n_chunks, -1, m))
    return out.reshape(n, m).T


def _nystrom_factor_chol(
    K_nm: jnp.ndarray, inducing_idxs: np.ndarray, lam: float
) -> jnp.ndarray:
    """Previous fused-Cholesky path: two stages, each retried with an
    escalating jitter passed as a TRACED argument so retries reuse the
    compiled graphs."""
    idxs_dev = jnp.asarray(inducing_idxs)
    B = None
    for i in range(8):
        B, flag = _nystrom_whiten_fused(K_nm, idxs_dev, jnp.asarray(10.0**i))
        if not bool(flag):
            break
        log.warning("nystrom whiten NaN at jitter boost 1e%d; escalating", i)
    inner = _nystrom_inner_gram(B)   # expensive (m^2 n) Gram, computed once
    G = None
    for i in range(14):
        # fine ladder: chol-only retries are cheap (stage 2a is not re-run),
        # and the smallest working regularization gives the best quality
        G, flag = _chol_with_reg(inner, lam, jnp.asarray(10.0**i))
        if not bool(flag):
            break
        if i > 4:
            log.warning("nystrom inner chol NaN at boost 1e%d; escalating", i)
    return _trsm_fused(G, B)


@jax.jit
def _nystrom_whiten_fused(K_nm: jnp.ndarray, idxs: jnp.ndarray, boost):
    """Stage 1: B = chol(K_mm + jitter)^-1 K_mn as one compiled graph.

    Base jitter is 1e-10 of the spectral scale (the reference also shifts
    the K_mm diagonal unconditionally, iterative_solver.py:576-579, and the
    measured quality cost is ~1 CG iteration); ``boost`` multiplies it on
    NaN retries without recompiling."""
    m = K_nm.shape[1]
    K_mm = K_nm[idxs]
    eye = jnp.eye(m, dtype=K_nm.dtype)
    scale = jnp.max(jnp.abs(jnp.diagonal(K_mm)))
    L_mm = jnp.linalg.cholesky(K_mm + (scale * 1e-10 * boost) * eye)
    B = jax.scipy.linalg.solve_triangular(L_mm, K_nm.T, lower=True)  # (m, n)
    return B, jnp.isnan(jnp.sum(B))


@jax.jit
def _nystrom_inner_gram(B: jnp.ndarray) -> jnp.ndarray:
    """Stage 2a: the (m, m) Gram matrix B B^T — the expensive piece, run
    exactly once (retrying it with the chol cost ~50x cheaper was the
    dominant waste of the NaN-escalation ladder)."""
    acc = jnp.zeros((B.shape[0], B.shape[0]), B.dtype)
    return _gram_acc_safe(acc, B.T)


@jax.jit
def _chol_with_reg(inner: jnp.ndarray, lam, boost):
    """Stage 2b: chol(inner + reg I) with a traced escalation boost.

    Base regularization is lam; on retry the whitened Gram's spectral scale
    enters at 1e-14 * boost (roundoff makes the PSD Gram slightly indefinite
    at magnitude ~eps * ||B B^T||, which for near-singular whitening exceeds
    lam by orders of magnitude; the reference's _cho_factor_stable ladders
    identically, iterative_solver.py:600-618)."""
    m = inner.shape[0]
    eye = jnp.eye(m, dtype=inner.dtype)
    scale = jnp.max(jnp.abs(jnp.diagonal(inner)))
    reg = lam + jnp.where(boost > 1.0, scale * 1e-16 * boost, 0.0)
    G = jnp.linalg.cholesky(inner + reg * eye)
    # full-matrix NaN check: the last pivot alone missed NaNs in practice
    return G, jnp.isnan(jnp.sum(G))


@jax.jit
def _trsm_fused(G: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Stage 2c: T = G^-1 B."""
    return jax.scipy.linalg.solve_triangular(G, B, lower=True)


def select_random(n: int, k: int, rng: np.random.Generator) -> np.ndarray:
    """'random_scores': uniform column subset (iterative_solver.py:683-686)."""
    return np.sort(rng.choice(n, size=k, replace=False))


def leverage_scores(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    lam: float,
    n_inducing_pts: int,
    rng: np.random.Generator,
    idxs_ordered_by_lev_score: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Approximate ridge leverage scores for all n columns.

    Pipeline identical to the reference `_lev_scores`
    (iterative_solver.py:447-552): sample m = max(1, n_ind//4)*dim_i columns,
    whiten K_nm by chol(K_mm), then lev_j = || chol(B B^T + lam I)^-1 B ||_j^2.
    Returns (lev_scores, argsort(lev_scores)).
    """
    n_train = cache.n_train
    dim_i = spec.dim_i
    n = n_train * dim_i
    dim_m = max(1, n_inducing_pts // 4) * dim_i

    if idxs_ordered_by_lev_score is None:
        lev_approx_idxs = np.sort(rng.choice(n, size=dim_m, replace=False))
    else:
        assert len(idxs_ordered_by_lev_score) == n
        lev_approx_idxs = np.sort(idxs_ordered_by_lev_score[-dim_m:])

    import time as _time
    t0 = _time.perf_counter()
    K_nm = knl.assemble_columns(spec, cache, lev_approx_idxs)  # (n, m)
    K_nm.block_until_ready()
    t1 = _time.perf_counter()
    # ridge leverage scores are exactly the column sums-of-squares of the
    # eigh-based Nyström factor T = (B B^T + lam I)^-1/2 B (see
    # _nystrom_factor_eigh): deterministic, no chol ladder, no trsm
    T = _nystrom_factor_eigh(K_nm, lev_approx_idxs, lam, rank_tol=1e-10,
                             host_decomp="chol")
    lev = np.asarray(_colwise_sumsq(T))
    log.info("lev scores (m=%d): columns %.1fs, factor+scores %.1fs",
             len(lev_approx_idxs), t1 - t0, _time.perf_counter() - t1)
    return lev, np.argsort(lev)


@jax.jit
def _colwise_sumsq(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(T * T, axis=0)


def select_by_leverage(
    strategy: str,
    lev: np.ndarray,
    order: np.ndarray,
    k: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Deterministic / inverse / probabilistic leverage-score selection
    (iterative_solver.py:736-753)."""
    if strategy == "lev_scores":
        return np.sort(order[-k:])
    if strategy == "inverse_lev":
        return np.sort(order[:k])
    if strategy == "lev_random":
        p = lev / lev.sum()
        return np.sort(rng.choice(len(lev), size=k, replace=False, p=p))
    raise ValueError(strategy)


def _guard_dense_diagnostic(name: str, n: int) -> None:
    """The eigvec/rank-k-lev families materialize dense K and run a host
    SVD — O(n^2) memory, O(n^3) flops.  They are small-n diagnostics
    (reference iterative_solver.py:1110-1175, 1177-1348); invoking them at
    the production operating points (n >= 30k) would OOM the host.  The cap
    is overridable for big-memory hosts via MLFF_TPU_DENSE_DIAG_MAX_N."""
    import os

    max_n = int(os.environ.get("MLFF_TPU_DENSE_DIAG_MAX_N", 20_000))
    if n > max_n:
        raise ValueError(
            f"{name} materializes the dense {n}x{n} kernel "
            f"({n * n * 8 / 1e9:.1f} GB) and host-SVDs it; it is a small-n "
            f"diagnostic capped at n <= {max_n}. Use a Nystrom/Cholesky "
            f"strategy at this size, or raise MLFF_TPU_DENSE_DIAG_MAX_N."
        )


def rank_k_leverage_scores(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    k: int,
) -> np.ndarray:
    """Rank-k subspace leverage scores from a full SVD of K
    (reference `_rank_k_leverage_scores`, iterative_solver.py:1110-1175;
    Def. 1 of arXiv:2201.07017).  Small-n diagnostic: materializes K."""
    _guard_dense_diagnostic("rank_k_lev_scores", cache.n)
    K = np.asarray(knl.assemble_full(spec, cache))
    U, s, _ = scipy.linalg.svd(K)
    U_k = U[:, :k]
    return np.linalg.norm(U_k, axis=1)


# ---------------------------------------------------------------------------
# Truncated eigen / SVD / Jacobi family (small-n diagnostics)
# ---------------------------------------------------------------------------


def eigvec_preconditioner(
    spec: DescriptorSpec,
    cache: knl.KernelCache,
    k: int,
    lam: float,
    variant: str = "eigvec_precon",
    svd_cache: dict | None = None,
    use_E_cstr: bool = False,
) -> WoodburyPreconditioner:
    """Truncated-SVD preconditioner P = U_k S_k U_k^T + lam I.

    Variants (reference iterative_solver.py:1238-1268):
      * 'eigvec_precon'              — plain truncated SVD of K,
      * 'eigvec_precon_block_diagonal' — per-training-point block-diagonal
        K (3A x 3A blocks) before the SVD,
      * 'eigvec_precon_atomic_interactions' — keep only 3x3 atomic
        self-interaction blocks.
    ``svd_cache`` (optional dict) memoizes (U, s) across k-sweeps the way the
    reference's glob_U/glob_s module globals do (iterative_solver.py:1291-1303)
    — but explicitly, per caller.

    Two deliberate deviations from the reference (not replicated as bugs):
      * its 'eigvec_precon_block_diagonal' zeroes the ENTIRE matrix — the
        intended masked assignment is commented out in favor of
        ``K[np.ones_like(K, dtype=bool)] = 0`` (iterative_solver.py:1259-1262);
        here the documented intent (keep per-point diagonal blocks) is applied.
      * with ``use_E_cstr`` its (n, n)-shaped masks crash against the
        (n + N)-extended matrix (iterative_solver.py:1241-1252); here the
        masks extend over the E-constraint rows: 'block_diagonal' keeps each
        point's force block, its force<->own-energy coupling, and the energy
        diagonal; 'atomic_interactions' keeps the atomic 3x3 blocks plus the
        energy diagonal (cross block dropped).
    """
    key = ("svd", variant, use_E_cstr)
    if svd_cache is not None and key in svd_cache:
        U, s = svd_cache[key]
    else:
        _guard_dense_diagnostic(variant, cache.n + (cache.n_train if use_E_cstr else 0))
        if use_E_cstr:
            K = np.asarray(knl.assemble_full_ecstr(spec, cache))
        else:
            K = np.asarray(knl.assemble_full(spec, cache))
        n = K.shape[0]
        T = spec.dim_i
        N = cache.n_train
        if variant == "eigvec_precon_block_diagonal":
            mask = scipy.linalg.block_diag(
                *([np.ones((T, T), dtype=bool)] * N)
            ).astype(bool)
            if use_E_cstr:
                ext = np.zeros((n, n), dtype=bool)
                ext[: T * N, : T * N] = mask
                for i in range(N):
                    ext[T * i : T * (i + 1), T * N + i] = True  # F_i <-> E_i
                    ext[T * N + i, T * i : T * (i + 1)] = True
                    ext[T * N + i, T * N + i] = True            # E_i diag
                mask = ext
            K = np.where(mask, K, 0.0)
        elif variant == "eigvec_precon_atomic_interactions":
            # zero entries below threshold except 3x3 atomic diagonal blocks
            eps = 1.0 * np.abs(K).max()
            delete = np.abs(K) < eps
            atomic = np.zeros((T, T), dtype=bool)
            A = spec.n_atoms
            for a in range(A):
                atomic[3 * a : 3 * (a + 1), 3 * a : 3 * (a + 1)] = True
            keep = np.tile(atomic, (N, N))
            if use_E_cstr:
                ext = np.zeros((n, n), dtype=bool)
                ext[: T * N, : T * N] = keep
                ext[T * N :, T * N :] = np.eye(N, dtype=bool)   # E diag
                keep = ext
            delete[keep] = False
            assert (delete != delete.T).sum() == 0, "only symmetric deletes allowed"
            K = np.where(delete, 0.0, K)
        elif variant != "eigvec_precon":
            raise NotImplementedError(variant)
        U, s, _ = scipy.linalg.svd(K)
        if svd_cache is not None:
            svd_cache[key] = (U, s)
    L = U[:, :k] * np.sqrt(s[:k])[None, :]
    return woodbury_from_factor(jnp.asarray(L), lam)


def jacobi_preconditioner(diag: jnp.ndarray, lam: float) -> Callable:
    """Plain diagonal (Jacobi) preconditioner — cheap baseline."""
    d = diag + lam

    def apply(v):
        return v / d

    return apply
