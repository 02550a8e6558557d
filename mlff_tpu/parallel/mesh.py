"""Device mesh construction and sharding specs for the kernel operator.

The reference parallelizes with fork pools over (a) disjoint column blocks of
K during assembly (reference: sgdml/train.py:1267-1295) and (b) training-point
ranges of the matvec contraction (reference: sgdml/predict.py:451-500), plus
``torch.nn.DataParallel`` on GPUs (predict.py:336-341).  The TPU-native
mapping is a 1-D (extendable to 2-D) device mesh with the kernel operator
**row-sharded** over training points:

  * the large per-solve caches A_exp / A_exp1 (N, M) and the query-side
    descriptors live sharded on the 'rows' axis,
  * the permuted training side (Xqt, w~) is replicated — it is O(N*P*D),
    tiny next to the (N, M) matrices,
  * each matvec needs one all-gather of the per-point cotangents w (N, D)
    per iteration; XLA/GSPMD inserts it from the sharding annotations,
  * length-n CG vectors are sharded on 'rows' as well; dot products psum
    over ICI.

Multi-host: the same specs extend over a ('hosts', 'rows') mesh with DCN on
the outer axis; jax.distributed initialization is the caller's concern.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kernel import KernelCache

ROWS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the row axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROWS,))


def cache_shardings(mesh: Mesh, cache: KernelCache | None = None) -> KernelCache:
    """PartitionSpec pytree matching KernelCache (row-sharded operator).

    When ``cache`` is given, shardings are produced for exactly its present
    optional square-layout fields so the two pytrees match structurally."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    opt = {}
    if cache is not None:
        # square all-pairs fields: row-sharded over training points
        for name, spec in (("Xsq", (ROWS, None, None)),
                           ("Gsq", (ROWS, None, None, None)),
                           ("Usq", (ROWS, None, None, None)),
                           ("Zsq", (ROWS, None, None, None)),
                           ("C1sq", (ROWS, None, None, None, None))):
            if getattr(cache, name) is not None:
                opt[name] = s(*spec)
    return KernelCache(
        X=s(ROWS, None),
        Jc=s(ROWS, None, None),
        S=s(),                    # replicated
        P_idx=s(),
        Xq=s(ROWS, None),
        Xqt=s(),                  # replicated permuted training side
        A_exp=s(ROWS, None),
        A_exp1=s(ROWS, None),
        sig=s(),
        lam=s(),
        **opt,
    )


def shard_cache(cache: KernelCache, mesh: Mesh) -> KernelCache:
    """Place a built cache onto the mesh with the row-sharded layout."""
    shardings = cache_shardings(mesh, cache)
    return jax.tree.map(jax.device_put, cache, shardings)


def square_cache_shardings(mesh: Mesh):
    """PartitionSpec pytree for ops.kernel.SquareCache (row-sharded).

    Everything with a leading training-point axis shards over 'rows' —
    including the permuted training side Gst/Xst (M = N*P rows in
    point-major order, so an M-axis shard boundary coincides with an
    N-axis one whenever N divides the mesh): unlike the packed layout's
    tiny (M, D) Xqt, the square training side is as large as the query
    side and must not be replicated.  The per-iteration wt (M, A*A)
    weights are computed row-locally; GSPMD inserts one all-gather of wt
    for the (N, M)-shaped dot GEMM — the square-layout analog of the
    packed path's w gather (the reference's matvec workers exchange the
    same quantity, predict.py:451-500)."""
    from ..ops.kernel import SquareCache

    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return SquareCache(
        Gs=s(ROWS, None, None, None),
        Gst=s(ROWS, None, None, None),
        Xs=s(ROWS, None),
        Xst=s(ROWS, None),
        perms=s(),
        A_exp=s(ROWS, None),
        A_exp1=s(ROWS, None),
        sig=s(),
        lam=s(),
    )


def shard_square_cache(sq, mesh: Mesh):
    """Place a built SquareCache onto the mesh (row-sharded layout)."""
    return jax.tree.map(jax.device_put, sq, square_cache_shardings(mesh))


def vector_sharding(mesh: Mesh) -> NamedSharding:
    """Length-n CG vectors: sharded over rows (n = N * 3A, N divisible by
    the mesh for clean layout; callers pad if needed)."""
    return NamedSharding(mesh, P(ROWS))


def shard_vector(v: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(v, vector_sharding(mesh))


def shard_preconditioner(precon, mesh: Mesh):
    """Place a Woodbury-family preconditioner onto the mesh.

    Layout (SURVEY.md §7.2.5 / VERDICT round 1 item 2): the big (n, m)
    factor is row-sharded like the kernel operator's caches; the small
    (m, m) inner factor and lam are replicated.  The fused single-factor
    form stores T as (k, n) so its *columns* follow the row axis.

    Pallas-kernel applies (DF64) don't shard — the caller keeps them
    single-device (they exist for the one-chip speed path).
    Unknown/callable preconditioners are returned unchanged.
    """
    # local import: solvers must stay importable without the parallel layer
    from ..solvers import preconditioners as pc

    s = lambda *spec: NamedSharding(mesh, P(*spec))
    rep = s()
    if isinstance(precon, pc.WoodburySplitPreconditioner):
        return pc.WoodburySplitPreconditioner(
            B=jax.device_put(precon.B, s(ROWS, None)),
            W2=jax.device_put(precon.W2, rep),
            lam=jax.device_put(precon.lam, rep),
        )
    if isinstance(precon, pc.WoodburyPreconditioner):
        return pc.WoodburyPreconditioner(
            T=jax.device_put(precon.T, s(None, ROWS)),
            lam=jax.device_put(precon.lam, rep),
        )
    if isinstance(precon, pc.WoodburyColBlockPreconditioner):
        return pc.WoodburyColBlockPreconditioner(
            Bs=tuple(jax.device_put(B, s(ROWS, None)) for B in precon.Bs),
            W2=jax.device_put(precon.W2, rep),
            lam=jax.device_put(precon.lam, rep),
        )
    if isinstance(precon, pc.OzakiApplyPreconditioner):
        # digit arrays row-shard like the f64 factor; the segmented einsum
        # contracts the (padded) row axis per 256-block, so the row count —
        # already a multiple of 256 — stays divisible across mesh rows
        return pc.OzakiApplyPreconditioner(
            B_dig=tuple(jax.device_put(d, s(ROWS, None))
                        for d in precon.B_dig),
            sB=jax.device_put(precon.sB, rep),
            W2=jax.device_put(precon.W2, rep),
            lam=jax.device_put(precon.lam, rep),
        )
    return precon
