"""Double-f32 ("df64") arithmetic primitives for TPU kernels.

TPU v5e has no native f64: XLA emulates f64 matmuls by 8-way operand
slicing on the MXU and f64 elementwise ops in software on the VPU — both
~10-60x slower than f32.  For SKINNY contractions (GEMVs, narrow GEMMs)
the MXU emulation additionally wastes up to 128x on tile padding, so the
per-CG-iteration Woodbury apply and kernel matvec run at ~40-85 "f64
GFLOP/s" (measured inside the chunked PCG loop, tools/profile_chunk_parts).

A number is represented as an UNEVALUATED PAIR (hi, lo) of f32 with
hi = f32(x), lo = f32(x - hi): ~2^-48 relative precision — enough for the
solver's preconditioner apply (f64 works at 1e-14, plain f32 FAILS at
5e-7; see RESULTS.md).  All building blocks are error-free transformations
in plain mul/add — NO fma required (XLA:TPU does not contract a*b+c, and
`a*b - p` reassociation is not performed, verified on hardware), so they
are exact both in plain XLA and inside Pallas/Mosaic kernels.

References: Dekker (1971); Hida, Li & Bailey's QD library conventions.
Public recipes; implemented from the algorithm definitions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Veltkamp splitting constant for f32 (24-bit mantissa): 2^12 + 1.
# A plain Python float: a jnp scalar here would be captured as a constant
# by Pallas kernel bodies, which pallas_call rejects.
_SPLIT_C = 4097.0


def split_f64(x):
    """f64 array -> (hi, lo) f32 pair: hi + lo carries the top 48 of f64's
    53 mantissa bits (~2^-48 relative round-trip)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join_f64(hi, lo):
    """(hi, lo) f32 pair -> f64 array."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def veltkamp_split(a):
    """f32 -> (a1, a2), a = a1 + a2 exactly, each with <= 12 mantissa bits
    (so products a_i * b_j of split halves are EXACT in f32)."""
    c = _SPLIT_C * a
    a1 = c - (c - a)
    a2 = a - a1
    return a1, a2


def two_sum(a, b):
    """Error-free sum: (s, e) with s = fl(a+b), s + e = a + b exactly.
    6 VPU ops (Knuth's branch-free TwoSum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (3 ops; Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free product via Veltkamp/Dekker: (p, e) with p = fl(a*b),
    p + e = a*b exactly.  ~10 VPU ops (no fma on TPU)."""
    p = a * b
    a1, a2 = veltkamp_split(a)
    b1, b2 = veltkamp_split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def df64_add(xh, xl, yh, yl):
    """Pair + pair -> normalized pair (~2^-48 relative)."""
    sh, se = two_sum(xh, yh)
    se = se + (xl + yl)
    return fast_two_sum(sh, se)


def df64_prod(ah, al, bh, bl):
    """Pair * pair -> normalized pair (drops al*bl, ~2^-48 relative)."""
    ph, pe = two_prod(ah, bh)
    pe = pe + (ah * bl + al * bh)
    return fast_two_sum(ph, pe)


def df64_sum_pairwise(hi, lo, axis: int):
    """Compensated pairwise-tree reduction of an (hi, lo) pair array along
    ``axis``: result pair with ~2^-48 relative error independent of length
    (a plain f32 jnp.sum loses sqrt(n)*2^-24).  Works on VALUES (not refs),
    so it is usable inside Pallas kernel bodies and in plain XLA.

    The axis length is padded to the next power of two with zeros.
    """
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    n = hi.shape[0]
    n_pad = 1 << max(0, (n - 1).bit_length())
    if n_pad != n:
        pad = [(0, n_pad - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while hi.shape[0] > 1:
        h = hi.shape[0] // 2
        hi, lo = df64_add(hi[:h], lo[:h], hi[h:], lo[h:])
    # the reduced axis is gone: the leading singleton is all that remains of
    # it, and the other axes keep their original relative order
    return hi[0], lo[0]


def df64_dot_bv(Bh, Bl, vh, vl):
    """Compensated dot u = B^T v for B (n, m), v (n,) given as f32 pairs:
    returns (uh, ul) (m,) f32 pairs with ~2^-48 relative error.

    Per element: one TwoProd for the hi*hi product (its f32 rounding is
    2^-24-relative and MUST be captured) + plain cross products (already
    2^-24-small, their rounding is ~2^-48 and ignorable).
    """
    ph, pe = two_prod(Bh, vh[:, None])
    pe = pe + (Bh * vl[:, None] + Bl * vh[:, None])
    return df64_sum_pairwise(ph, pe, axis=0)


def df64_dot_bx(Bh, Bl, xh, xl):
    """Compensated y = B x for B (n, m), x (m,) f32 pairs: (yh, yl) (n,)."""
    ph, pe = two_prod(Bh, xh[None, :])
    pe = pe + (Bh * xl[None, :] + Bl * xh[None, :])
    return df64_sum_pairwise(ph, pe, axis=1)
