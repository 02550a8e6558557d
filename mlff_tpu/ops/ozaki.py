"""Ozaki-style exact-slice GEMM: ~2^-48-grade matmuls from native-speed
bf16 MXU passes.

WHY.  TPU v5e has no f64 unit: XLA emulates f64 GEMMs by many-way operand
splitting (~10-60x f32 cost, worse on skinny shapes) — the dominant cost of
the production CG loop (RESULTS.md).  Plain f32 (even HIGHEST, 6-pass bf16)
accumulates at ~2^-24 relative, which DIVERGES CG on the calibrated
workload: when the kernel spectrum reaches the ridge floor lam = 1e-10, the
preconditioner output carries 1/lam-amplified components and the matvec
needs ~1e-12 relative accuracy (the lam-floor bound, measured round 3).
The route between those two regimes is an EXACT-ARITHMETIC splitting: slice
each f64 operand into small fixed-point digits such that every MXU product
and every in-segment f32 accumulation is EXACT, then recombine the few
rounded quantities in f64.  Error is then only the slicing truncation,
~2^-(8s) relative to the row/column scale — 2^-48 at s = 6 — independent of
the contraction depth.

HOW (per GEMM C = A @ B):
  * scale rows of A (cols of B) by their max-abs power of two -> |x| <= 1;
  * extract s = 6 fixed-point digits of 8 bits each by repeated
    multiply-by-256 + round-to-nearest: every digit is an INTEGER in
    [-256, 256], exactly representable in bf16 (8-bit significand);
  * for each digit pair (i, j) with i + j < s: a bf16 x bf16 -> f32 batched
    GEMM over contraction segments of 256.  Digit products are integers
    <= 2^16 and a 256-deep integer sum stays <= 2^24 — both EXACT in the
    MXU's f32 accumulator;
  * accumulate the segment partials and the 21 digit-pair terms in f64 with
    their 2^-8(i+j+2) grid weights, and apply the row/col scales.

Cost: 21 native bf16 MXU passes ~= 3.5x one f32-HIGHEST GEMM — far below
the f64 emulation — plus O(s n K) VPU work to slice (cacheable for
iteration-invariant operands; see ops.kernel.matvec caches).

References: Ozaki, Ogita, Oishi & Rump, "Error-free transformations of
matrix multiplication" (Numer. Algorithms 2012); public technique, no
reference-code counterpart (the reference runs native f64, torchtools.py
hot loop 172-272).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# digits of 8 bits each: 6 -> ~2^-48 (df64 grade)
DIGITS = 6
_RADIX = 256.0
# contraction segment: 256-deep exact f32 integer accumulation (<= 2^24)
_SEG = 256


def _pow2_scale(m: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= m (elementwise), 1.0 where m == 0."""
    safe = jnp.where(m > 0, m, 1.0)
    e = jnp.ceil(jnp.log2(safe))
    return jnp.where(m > 0, jnp.exp2(e), 1.0)


def slice_digits(X: jnp.ndarray, axis: int, s: int = DIGITS):
    """f64 -> (scale, digits): X = scale * sum_t digits[t] * 256^-(t+1) + err,
    |err| <= scale * 2^-(8s) (half-ulp of the last digit), with ``scale``
    the per-row max-abs power of two over ``axis`` (kept with its singleton
    axis) and each digit an integer-valued bf16 array in [-256, 256]."""
    m = jnp.max(jnp.abs(X), axis=axis, keepdims=True)
    scale = _pow2_scale(m)
    r = X / scale
    digits = []
    for _ in range(s):
        r = r * _RADIX
        q = jnp.rint(r)
        digits.append(q.astype(jnp.bfloat16))
        r = r - q
    return scale, digits


def _seg_matmul(a: jnp.ndarray, b: jnp.ndarray, n_seg: int,
                acc_dtype=jnp.float64) -> jnp.ndarray:
    """Exact digit-pair product sum: a (n, K) x b (K, m) bf16 integer
    digits -> (n, m), f32-accumulated per 256-deep segment (exact) and
    ``acc_dtype``-accumulated across segments.  f32 cross-segment
    accumulation is allowed for LOW-weight digit pairs only (see
    gemm_presliced): its ~2^-24-relative rounding is scaled by the pair's
    256^-(w+2) grid weight, landing below the slicing truncation."""
    n, K = a.shape
    m = b.shape[1]
    if n_seg == 1:
        p = jnp.matmul(a, b, preferred_element_type=jnp.float32)
        return p if acc_dtype == jnp.float32 else p.astype(acc_dtype)
    a3 = a.reshape(n, n_seg, _SEG).transpose(1, 0, 2)
    b3 = b.reshape(n_seg, _SEG, m)
    p = jnp.matmul(a3, b3, preferred_element_type=jnp.float32)  # (S, n, m)
    return jnp.sum(p.astype(acc_dtype), axis=0)


def _pad_K(X: jnp.ndarray, axis: int, K_pad: int) -> jnp.ndarray:
    pad = [(0, 0)] * X.ndim
    pad[axis] = (0, K_pad - X.shape[axis])
    return jnp.pad(X, pad)


def gemm(A: jnp.ndarray, B: jnp.ndarray, s: int = DIGITS) -> jnp.ndarray:
    """C = A @ B for f64 A (n, K), B (K, m) with ~2^-(8s)-grade accuracy at
    s*(s+1)/2 native bf16 MXU passes."""
    sA, dA = slice_digits(A, axis=1, s=s)
    sB, dB = slice_digits(B, axis=0, s=s)
    return gemm_presliced((sA, dA), (sB, dB), s=s)


def gemm_presliced(A_sl, B_sl, s: int | None = None) -> jnp.ndarray:
    """gemm() on operands already run through slice_digits — the hot-loop
    form: iteration-invariant operands (kernel caches) slice ONCE and every
    CG iteration pays only its own side's slicing.  ``s`` (default: the
    operands' own digit count) sets the digit-pair truncation i + j < s."""
    sA, dA = A_sl
    sB, dB = B_sl
    if s is None:
        s = min(len(dA), len(dB))
    K = dA[0].shape[1]
    n_seg = -(-K // _SEG) if K > _SEG else 1
    K_pad = n_seg * _SEG if n_seg > 1 else K
    if K_pad != K:
        dA = [_pad_K(a, 1, K_pad) for a in dA]
        dB = [_pad_K(b, 0, K_pad) for b in dB]
    # Weight-split accumulation (round 5): digit pairs on LOW grid weights
    # accumulate ENTIRELY in f32 — the f32 rounding (~2^-24 relative to
    # the term) times the term's 256^-(w+2) weight lands below the 2^-8s
    # slicing truncation — and only the heaviest weight classes pay f64
    # elementwise adds.  On (N, M)-shaped outputs this removes ~half of
    # the engine's f64 accumulation work (the measured OTF bottleneck at
    # n = 504k: 2.1G-element tiles x 28 pair terms of f64 adds/iter).
    # Threshold s-2 keeps the f32 classes' combined error ~2^-(8s+8)-
    # grade (a CPU solve at s-3 showed a +5% CG-iteration drift on a
    # lam-floor system — one class of margin buys that back);
    # MLFF_OZAKI_F32W widens/narrows for A/B.
    w_f64 = max(0, s - int(os.environ.get("MLFF_OZAKI_F32W", "2")))
    acc = None        # f64: exact-grade weight classes w < w_f64
    acc32 = None      # f32: low-weight classes, one f64 add at the end
    for w in range(s):
        low = w >= w_f64
        part = None
        for i in range(w + 1):
            p = _seg_matmul(dA[i], dB[w - i], n_seg,
                            acc_dtype=jnp.float32 if low else jnp.float64)
            part = p if part is None else part + p
        if low:
            # relative weight within the f32 accumulator; the common
            # 256^-(w_f64+2) factor is applied once at the final f64 add
            term32 = part * jnp.float32(_RADIX ** -(w - w_f64))
            acc32 = term32 if acc32 is None else acc32 + term32
        else:
            term = part * (_RADIX ** -(w + 2))
            acc = term if acc is None else acc + term
    if acc32 is not None:
        tail = acc32.astype(jnp.float64) * (_RADIX ** -(w_f64 + 2))
        acc = tail if acc is None else acc + tail
    return sA * acc * sB


def matmat(A: jnp.ndarray, B: jnp.ndarray, s: int = DIGITS) -> jnp.ndarray:
    """Alias of gemm (naming symmetry with ops.kernel.matmat_psd)."""
    return gemm(A, B, s=s)
