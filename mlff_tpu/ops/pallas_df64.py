"""Pallas TPU kernels: double-f32 (df64) Woodbury-apply GEMV passes.

Why: the per-CG-iteration Woodbury apply is two skinny f64 contractions
against the (n, m) factor B.  XLA's f64 paths run them at ~38 "f64 GF/s"
on v5e (VPU software emulation for the broadcast-reduce form; the MXU
8-slice route both OOMs on operand splits and wastes 128x on single-vector
tiles).  These kernels stream B ONCE per pass as an f32 (hi, lo) pair —
same bytes as f64 — and do compensated (error-free-transformation)
arithmetic on the VPU: ~2^-48 relative accuracy (vs plain f32's
sqrt(n)*2^-24, which breaks CG — RESULTS.md) at f32 speed.

Layout: reduction over the SUBLANE axis via in-tile pairwise halving, then
a df64 accumulation across grid steps in the output block.  B is padded to
(TILE_N, TILE_M) multiples by the owner (zero rows/cols are inert).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df64

TILE_N = 512   # rows per grid step (reduction axis of pass 1)
TILE_M = 512   # columns per grid step


def _tile_reduce_rows(ph, pe):
    """(T, M) df64 pairs -> (1, M) via compensated pairwise halving (T is a
    power of two)."""
    while ph.shape[0] > 1:
        h = ph.shape[0] // 2
        ph, pe = df64.df64_add(ph[:h], pe[:h], ph[h:], pe[h:])
    return ph, pe


def _bt_v_kernel(vh_ref, vl_ref, bh_ref, bl_ref, uh_ref, ul_ref):
    """Grid (m_tiles, n_tiles): accumulate u[mtile] += B[ntile,mtile]^T v."""
    j = pl.program_id(1)

    bh = bh_ref[:]                      # (TILE_N, TILE_M) f32
    bl = bl_ref[:]
    vh = vh_ref[:]                      # (TILE_N, 1) f32
    vl = vl_ref[:]

    ph, perr = df64.two_prod(bh, vh)    # exact hi*hi product
    perr = perr + (bh * vl + bl * vh)   # 2^-24-small cross terms
    sh, sl = _tile_reduce_rows(ph, perr)            # (1, TILE_M)

    @pl.when(j == 0)
    def _():
        uh_ref[:] = sh
        ul_ref[:] = sl

    @pl.when(j > 0)
    def _():
        ah, al = df64.df64_add(uh_ref[:], ul_ref[:], sh, sl)
        uh_ref[:] = ah
        ul_ref[:] = al


def _default_interpret() -> bool:
    """Pallas/Mosaic needs real TPU hardware; fall back to the interpreter
    on CPU backends (tests, the driver's virtual-device dry run)."""
    return jax.default_backend() != "tpu"


@partial(jax.jit, static_argnames=("interpret",))
def _df64_bt_v_jit(Bh: jnp.ndarray, Bl: jnp.ndarray, v: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """u = B^T v with B given as an f32 (hi, lo) pair (n_pad, m_pad), v f64
    (n_pad,).  Returns f64 (m_pad,).  n_pad/m_pad must be TILE multiples."""
    n, m = Bh.shape
    vh, vl = df64.split_f64(v)
    uh, ul = pl.pallas_call(
        _bt_v_kernel,
        grid=(m // TILE_M, n // TILE_N),
        # index maps use `0 * id` for zero coordinates: under jax_enable_x64
        # a literal 0 promotes to i64 while program ids are i32, and the
        # mixed signature fails Mosaic legalization (same as pallas_predict)
        in_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (j, 0 * j)),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (j, 0 * j)),
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (j, i)),
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (j, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_M), lambda i, j: (0 * i, i)),
            pl.BlockSpec((1, TILE_M), lambda i, j: (0 * i, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ],
        interpret=interpret,
    )(vh[:, None], vl[:, None], Bh, Bl)
    return df64.join_f64(uh[0], ul[0])


def df64_bt_v(Bh, Bl, v, interpret: bool | None = None):
    return _df64_bt_v_jit(
        Bh, Bl, v, _default_interpret() if interpret is None else interpret)


def _tile_reduce_lanes(ph, pe):
    """(T, M) df64 pairs -> (T, 1) via compensated pairwise halving over the
    lane axis (M a power of two)."""
    while ph.shape[1] > 1:
        h = ph.shape[1] // 2
        ph, pe = df64.df64_add(ph[:, :h], pe[:, :h], ph[:, h:], pe[:, h:])
    return ph, pe


def _b_x_kernel(xh_ref, xl_ref, bh_ref, bl_ref, yh_ref, yl_ref):
    """Grid (n_tiles, m_tiles): accumulate y[ntile] += B[ntile,mtile] x."""
    j = pl.program_id(1)

    bh = bh_ref[:]                      # (TILE_N, TILE_M)
    bl = bl_ref[:]
    xh = xh_ref[:]                      # (1, TILE_M)
    xl = xl_ref[:]

    ph, perr = df64.two_prod(bh, xh)
    perr = perr + (bh * xl + bl * xh)
    sh, sl = _tile_reduce_lanes(ph, perr)           # (TILE_N, 1)

    @pl.when(j == 0)
    def _():
        yh_ref[:] = sh
        yl_ref[:] = sl

    @pl.when(j > 0)
    def _():
        ah, al = df64.df64_add(yh_ref[:], yl_ref[:], sh, sl)
        yh_ref[:] = ah
        yl_ref[:] = al


@partial(jax.jit, static_argnames=("interpret",))
def _df64_b_x_jit(Bh: jnp.ndarray, Bl: jnp.ndarray, x: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """y = B x with B an f32 (hi, lo) pair (n_pad, m_pad), x f64 (m_pad,).
    Returns f64 (n_pad,)."""
    n, m = Bh.shape
    xh, xl = df64.split_f64(x)
    yh, yl = pl.pallas_call(
        _b_x_kernel,
        grid=(n // TILE_N, m // TILE_M),
        in_specs=[
            pl.BlockSpec((1, TILE_M), lambda i, j: (0 * j, j)),
            pl.BlockSpec((1, TILE_M), lambda i, j: (0 * j, j)),
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j)),
            pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0 * i)),
            pl.BlockSpec((TILE_N, 1), lambda i, j: (i, 0 * i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(xh[None, :], xl[None, :], Bh, Bl)
    return df64.join_f64(yh[:, 0], yl[:, 0])


def df64_b_x(Bh, Bl, x, interpret: bool | None = None):
    return _df64_b_x_jit(
        Bh, Bl, x, _default_interpret() if interpret is None else interpret)
