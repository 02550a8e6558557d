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


def cache_shardings(mesh: Mesh) -> KernelCache:
    """PartitionSpec pytree matching KernelCache (row-sharded operator)."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
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
    )


def shard_cache(cache: KernelCache, mesh: Mesh) -> KernelCache:
    """Place a built cache onto the mesh with the row-sharded layout."""
    shardings = cache_shardings(mesh)
    return jax.tree.map(jax.device_put, cache, shardings)


def vector_sharding(mesh: Mesh) -> NamedSharding:
    """Length-n CG vectors: sharded over rows (n = N * 3A, N divisible by
    the mesh for clean layout; callers pad if needed)."""
    return NamedSharding(mesh, P(ROWS))


def shard_vector(v: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(v, vector_sharding(mesh))
