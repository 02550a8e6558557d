"""Per-stage matvec timing on the current default device.

Times jitted prefixes of the kernel matvec inside a fori_loop(50) (to
amortize dispatch) and the Woodbury apply, isolating where the per-CG-
iteration budget goes.  Usage: python tools/profile_matvec.py
"""

import itertools
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.ops import descriptor as dsc  # noqa: E402
from mlff_tpu.ops import kernel as knl  # noqa: E402

N_TRAIN, N_ATOMS, SIG, LAM = 583, 9, 10.0, 1e-10
LOOP = 50


def main():
    ds = make_dataset("ethanol", n_samples=N_TRAIN, seed=7)
    spec = dsc.make_spec(N_ATOMS)
    S = dsc.incidence_matrix(spec)
    perms = []
    for p3 in itertools.permutations([0, 1, 2]):
        p = np.arange(N_ATOMS)
        p[:3] = p3
        perms.append(p)
    P_idx = jnp.asarray(dsc.desc_perms(np.stack(perms)), dtype=jnp.int32)
    X, Jc = dsc.descriptors_from_R(spec, jnp.asarray(ds["R"]))
    cache = knl.build_cache(X, Jc, S, P_idx, SIG, LAM)
    n = cache.n
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.normal(size=n))
    T = jnp.asarray(rng.normal(size=(int(0.1 * n), n)))

    N, A = cache.X.shape[0], cache.S.shape[1]

    def stage(upto):
        def one(v):
            v3 = v.reshape(N, A, 3)
            w = dsc.d_desc_dot_vec(cache.Jc, cache.S, v3)
            if upto == "w":
                return jnp.sum(w) + v[0]
            wt = knl.perm_expand_w(w, cache.P_idx)
            if upto == "gather":
                return jnp.sum(wt) + v[0]
            ct = jnp.sum(cache.Xqt * wt, axis=1)
            dot = cache.Xq @ wt.T - ct[None, :]
            if upto == "dot":
                return jnp.sum(dot) + v[0]
            G = cache.A_exp * dot
            F1 = cache.Xq * jnp.sum(G, axis=1, keepdims=True) - G @ cache.Xqt
            if upto == "F1":
                return jnp.sum(F1) + v[0]
            F2 = cache.A_exp1 @ wt
            F_desc = F1 - F2
            if upto == "F2":
                return jnp.sum(F_desc) + v[0]
            out = dsc.vec_dot_d_desc(cache.Jc, cache.S, F_desc)
            return jnp.sum(out) + v[0]

        @jax.jit
        def loop(v):
            def body(i, acc):
                return acc + one(v + acc * 1e-30)
            return jax.lax.fori_loop(0, LOOP, body, 0.0)

        loop(v0).block_until_ready()  # compile
        t0 = time.perf_counter()
        loop(v0).block_until_ready()
        return (time.perf_counter() - t0) / LOOP * 1e3

    for name in ("w", "gather", "dot", "F1", "F2", "full"):
        print(f"matvec upto {name}: {stage(name):.2f} ms", flush=True)

    @jax.jit
    def wood_loop(T, v):
        def body(i, acc):
            u = v + acc * 1e-30
            return acc + jnp.sum((u - T.T @ (T @ u)) / LAM)
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    wood_loop(T, v0).block_until_ready()
    t0 = time.perf_counter()
    wood_loop(T, v0).block_until_ready()
    print(f"woodbury apply: {(time.perf_counter()-t0)/LOOP*1e3:.2f} ms", flush=True)

    # full production matvec in a loop
    @jax.jit
    def mv_loop(cache, v):
        def body(i, acc):
            return acc + jnp.sum(knl.matvec_psd(cache, v + acc * 1e-30))
        return jax.lax.fori_loop(0, LOOP, body, 0.0)

    mv_loop(cache, v0).block_until_ready()
    t0 = time.perf_counter()
    mv_loop(cache, v0).block_until_ready()
    print(f"matvec_psd total: {(time.perf_counter()-t0)/LOOP*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
