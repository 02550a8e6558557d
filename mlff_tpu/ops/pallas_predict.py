"""Pallas TPU kernel: fused descriptor-space force/energy contraction.

The prediction hot loop (models/predict.py) evaluates, for a batch of query
descriptors against the permuted training set,

    dist  = ||q x_b - q x~_m||            (Gram trick)
    A     = 5/(3 sig^2) exp(-dist)
    dot   = (q x_b - q x~_m) . w~_m
    F     = sum_m A [ dot (q x_b - q x~_m) - (1 + dist) w~_m ]
    E     = sum_m A (1 + dist) dot / q

The jnp path materializes several (B, M) intermediates in HBM.  This kernel
tiles the training axis M and keeps every intermediate in VMEM — one pass
over the training data per query tile, with the exp/distance math fused into
the contraction (the per-solve cache trick used by the *solver* path does
not apply at inference time, where queries are fresh every call).

f32 only: Mosaic has no f64, which is fine for inference, while the
*training* path stays f64 (see ops.kernel.build_cache notes).  Measured on
TPU v5e: 1.5 ms for 583 queries x 3498 training rows at 2e-6 relative force
error vs the f64 path.  Two pitfalls are baked in as fixes: distances come
precomputed in f64 (the f32 Gram trick loses ~3 digits at small
separations), and all dots force Precision.HIGHEST (the TPU default is
single-pass bf16, which cost 5e-3 relative error).  Falls back to
interpret mode off-TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail gracefully on unsupported platforms
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

SQRT5 = math.sqrt(5.0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _contract_kernel(xq_ref, xt_ref, wt_ref, dist_ref, f_ref, e_ref, *, sig):
    """Grid: (B_tiles, M_tiles).  Blocks:
    xq (TB, D), xt (TM, D), wt (TM, D), dist (TB, TM) -> f (TB, D), e (TB, 128).

    The M-axis accumulates across grid steps (revisiting the same output
    block), so outputs are initialized at m_tile == 0.  Distances arrive
    precomputed in f64 upstream (the f32 Gram trick loses ~3 digits near
    zero separation); padded training rows carry a huge distance, so
    exp(-dist) = 0 masks them for free.  Blocks with a trailing dimension
    of 1 fail Mosaic legalization — hence the 128-lane energy accumulator
    with only column 0 meaningful.
    """
    m_idx = pl.program_id(1)

    @pl.when(m_idx == 0)
    def _init():
        f_ref[:, :] = jnp.zeros_like(f_ref)
        e_ref[:, :] = jnp.zeros_like(e_ref)

    xq = xq_ref[:, :]          # (TB, D)
    xt = xt_ref[:, :]          # (TM, D)
    wt = wt_ref[:, :]          # (TM, D)
    dist = dist_ref[:, :]      # (TB, TM)

    a = (5.0 / (3.0 * sig**2)) * jnp.exp(-dist)
    ct = jnp.sum(xt * wt, axis=1, keepdims=True).T          # (1, TM)
    dot = jnp.dot(xq, wt.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST) - ct

    G = a * dot
    a1 = a * (1.0 + dist)

    f_ref[:, :] += (
        xq * jnp.sum(G, axis=1, keepdims=True)
        - jnp.dot(G, xt, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        - jnp.dot(a1, wt, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    )
    q = SQRT5 / sig
    e_col = jnp.sum(a1 * dot, axis=1, keepdims=True) / q    # (TB, 1)
    e_ref[:, :] += e_col  # broadcast over lanes; column 0 is read back


@functools.partial(jax.jit, static_argnames=("sig", "interpret"))
def desc_forces_pallas(
    Xq_query: jnp.ndarray,   # (B, D) q-scaled query descriptors
    Xqt: jnp.ndarray,        # (M, D) q-scaled permuted training descriptors
    wt: jnp.ndarray,         # (M, D) permuted cotangents
    sig: float,
    interpret: bool = False,
):
    """Fused (F_desc (B, D), E (B,)) contraction, f32, tiled over M."""
    if not _HAVE_PALLAS:
        raise RuntimeError("pallas unavailable on this platform")

    B, D = Xq_query.shape
    M = Xqt.shape[0]
    TB = min(_round_up(B, 8), 128)
    TM = 512 if M >= 512 else _round_up(M, 8)
    Bp, Mp, Dp = _round_up(B, TB), _round_up(M, TM), _round_up(D, 128)

    f32 = jnp.float32
    xq = jnp.zeros((Bp, Dp), f32).at[:B, :D].set(Xq_query.astype(f32))
    xt = jnp.zeros((Mp, Dp), f32).at[:M, :D].set(Xqt.astype(f32))
    w = jnp.zeros((Mp, Dp), f32).at[:M, :D].set(wt.astype(f32))

    # accurate distances upstream (f64 Gram trick), padded rows pushed far
    # away so exp(-dist) masks them inside the kernel
    from .kernel import pairwise_dist_gram

    dist64 = pairwise_dist_gram(Xq_query.astype(jnp.float64),
                                Xqt.astype(jnp.float64))
    dist = jnp.full((Bp, Mp), 1e30, f32).at[:B, :M].set(dist64.astype(f32))

    grid = (Bp // TB, Mp // TM)
    # index maps use `0 * idx` for zero coordinates: under jax_enable_x64 a
    # literal 0 promotes to i64 while program ids are i32, and the mixed
    # (i32, i64) index-map signature fails Mosaic legalization
    f, e = pl.pallas_call(
        functools.partial(_contract_kernel, sig=float(sig)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda i, j: (i, 0 * j)),
            pl.BlockSpec((TM, Dp), lambda i, j: (j, 0 * j)),
            pl.BlockSpec((TM, Dp), lambda i, j: (j, 0 * j)),
            pl.BlockSpec((TB, TM), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((TB, Dp), lambda i, j: (i, 0 * j)),
            pl.BlockSpec((TB, 128), lambda i, j: (i, 0 * j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Dp), f32),
            jax.ShapeDtypeStruct((Bp, 128), f32),
        ],
        interpret=interpret,
    )(xq, xt, w, dist)
    return f[:B, :D], e[:B, 0]
