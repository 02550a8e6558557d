"""Who is actually accurate at n = 503,982 — the TPU f64-emulated OTF
matvec or the ozaki exact-slice one?

`probe_500k_matvec` measured |oz - f64_tpu| = 1.3e-10, UNCHANGED by
raising the digit count (s=6 -> 7 agreed to 6 significant digits) — so
the difference is s-independent and cannot be ozaki slicing truncation.
Prime suspect: the f64 EMULATION DEPTH CLIFF (RESULTS.md round 3: XLA's
f64 matmul emulation collapses from ~3e-15 to ~1e-10 relative beyond
~1024-deep contractions) — the OTF force GEMMs contract over M = 111,996.

Ground truth: the SAME matvec on the CPU backend (true IEEE f64).
  --save out.npz   (on TPU: saves v, y_f64, y_oz)
  --check out.npz  (on CPU: recomputes y_cpu, prints both error norms)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(n_train=18666):
    import jax.numpy as jnp

    from mlff_tpu.data.synthetic import make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task
    from mlff_tpu.ops import kernel as knl

    ds, perms = make_benchmark_dataset("ethanol", n_train + 60, seed=11,
                                       n_train=n_train)
    task = create_task(ds, n_train, ds, n_valid=50, sig=10.0, solver="cg",
                       perms=perms)
    tr = Trainer()
    spec, S, X, Jc, P_idx = tr.build_kernel_inputs(task)
    cache = knl.build_cache(X, Jc, S, P_idx, 10.0, 1e-10, pairwise=False)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=cache.n))
    return knl, cache, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save")
    ap.add_argument("--check")
    ap.add_argument("--n-train", type=int, default=18666)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        d = np.load(args.check)
        knl, cache, v = build(args.n_train)
        y_cpu = np.asarray(knl.matvec_psd(cache, v))
        nrm = np.linalg.norm(y_cpu)
        for k in ("y_f64", "y_oz"):
            if k in d:
                print(k, "vs cpu-f64:",
                      float(np.linalg.norm(d[k] - y_cpu) / nrm), flush=True)
        print("f64 vs oz:",
              float(np.linalg.norm(d["y_f64"] - d["y_oz"]) / nrm))
        return

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    knl, cache, v = build(args.n_train)
    y_f64 = np.asarray(knl.matvec_psd(cache, v))
    state = knl.ozaki_matvec_state(cache)
    y_oz = np.asarray(knl.matvec_psd_ozaki(state, v))
    np.savez(args.save or "/tmp/truth500k.npz", v=np.asarray(v),
             y_f64=y_f64, y_oz=y_oz)
    print("saved", args.save or "/tmp/truth500k.npz", flush=True)


if __name__ == "__main__":
    main()
