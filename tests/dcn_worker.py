"""Worker for the multi-process (DCN-simulated) test: run under
`python tests/dcn_worker.py <pid> <nproc> <port>` with JAX_PLATFORMS=cpu.
Two processes x 4 virtual CPU devices form a ('hosts', 'rows') mesh; the
row-sharded kernel matvec and a short PCG solve must match the
single-process oracle exactly (same fp ops, different partitioning).
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", nproc, pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402
from mlff_tpu.parallel import distributed as dist  # noqa: E402
from mlff_tpu.parallel import mesh as pmesh  # noqa: E402
from mlff_tpu.solvers import preconditioners as pc  # noqa: E402
from mlff_tpu.solvers.cg import pcg  # noqa: E402

mesh = dist.make_host_mesh()
assert mesh.devices.shape == (nproc, 4), mesh.devices.shape

rng = np.random.default_rng(0)
n_atoms, n_train = 4, 16
R = rng.normal(size=(n_train, n_atoms, 3)) * 1.5
spec = dsc.make_spec(n_atoms)
S = dsc.incidence_matrix(spec)
X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(R))
P_idx = jnp.asarray(dsc.desc_perms(np.arange(n_atoms)[None, :]))
cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10)

flat = jax.sharding.Mesh(mesh.devices.reshape(-1), ("rows",))
cache_sh = pmesh.shard_cache(cache, flat)
v = jnp.asarray(rng.normal(size=cache.n))
v_sh = pmesh.shard_vector(v, flat)

# 1. sharded matvec == local oracle
out = jax.jit(knl.matvec_psd)(cache_sh, v_sh)
full = multihost_utils.process_allgather(out, tiled=True)
ref = np.asarray(knl.matvec_psd(cache, v))
np.testing.assert_allclose(full, ref, rtol=1e-10, atol=1e-12)

# 2. preconditioned CG through the sharded operator
n = cache.n
idxs = np.sort(rng.choice(n, n // 3, replace=False))
P = pc.nystrom_preconditioner(spec, cache, idxs, 1e-10)
P_sh = pc.WoodburySplitPreconditioner(
    B=jax.device_put(
        P.B, jax.sharding.NamedSharding(flat, jax.sharding.PartitionSpec("rows", None))
    ),
    W2=jax.device_put(
        P.W2, jax.sharding.NamedSharding(flat, jax.sharding.PartitionSpec(None, None))
    ),
    lam=P.lam,
)
res_sh = pcg((knl.matvec_psd, cache_sh), v_sh, precon=P_sh, tol=1e-6,
             maxiter=500)
res_ref = pcg((knl.matvec_psd, cache), v, precon=P, tol=1e-6, maxiter=500)
assert res_sh.converged and res_ref.converged
# partitioned reductions change fp summation order; on this ~1e12-conditioned
# system that drifts iteration counts by a few percent
assert abs(res_sh.num_iters - res_ref.num_iters) <= max(
    5, 0.15 * res_ref.num_iters), (res_sh.num_iters, res_ref.num_iters)
# the solve itself must be correct: residual through the local oracle
x_sh = np.asarray(res_sh.x)
r = np.asarray(knl.matvec_psd(cache, jnp.asarray(x_sh))) - np.asarray(v)
assert np.linalg.norm(r) <= 1.5e-6 * np.linalg.norm(np.asarray(v))

print(f"DCN-OK proc {pid}: matvec exact, pcg iters "
      f"{res_sh.num_iters} vs {res_ref.num_iters}", flush=True)
