"""Run the 7-molecule iteration-count parity protocol on hardware.

The pytest version (tests/test_golden_archived.py::
test_iteration_count_parity_protocol_n15741) gates all molecules except
ethanol behind MLFF_TPU_FULL_PARITY=1 because thousands of CG iterations
at n ~= 15.7k take minutes-to-hours on the CPU test backend.  This driver
runs the same protocol on the chip (iteration counts are deterministic f64
quantities — identical across backends) and records
tools/parity_results.json for RESULTS.md / the test log.

    python tools/run_parity.py                 # all calibrated molecules
    python tools/run_parity.py aspirin catcher # subset
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from calibrate_difficulty import ARCHIVE_POINTS, archived_curve  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "parity_results.json")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)

    from mlff_tpu.data.synthetic import _BENCH_DIFFICULTY, make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    todo = sys.argv[1:] or [m for m in ARCHIVE_POINTS if m in _BENCH_DIFFICULTY]
    print("backend:", jax.devices(), "molecules:", todo, flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for mol in todo:
        perc, steps, n_arch = archived_curve(mol)
        n_train = ARCHIVE_POINTS[mol]
        ds, perms = make_benchmark_dataset(mol, n_train + 60)
        task = create_task(ds, n_train, ds, n_valid=40, sig=10.0,
                           solver="cg", perms=perms)
        n = int(np.asarray(task["F_train"]).size)
        assert n == n_arch, (mol, n, n_arch)
        points = []
        ok = True
        for target_p in (0.105, 0.049):
            idx = int(np.argmin(np.abs(perc - target_p)))
            p, archived = float(perc[idx]), float(steps[idx])
            t0 = time.time()
            model = Trainer().train(task, break_percentage=p,
                                    str_preconditioner="lev_random")
            dt = time.time() - t0
            ours = int(model["solver_iters"])
            in_band = 0.6 * archived <= ours <= 1.6 * archived
            ok &= in_band
            print(f"[{mol}] k/n={p:.4f}: ours {ours} vs archived "
                  f"{archived:.0f} ({ours / archived:.2f}x) "
                  f"{'OK' if in_band else 'FAIL'} [{dt:.0f}s]", flush=True)
            points.append(dict(p=p, ours=ours, archived=archived,
                               ratio=round(ours / archived, 3),
                               in_band=in_band, wall_s=round(dt, 1)))
        results[mol] = dict(n=n, P=int(perms.shape[0]), points=points,
                            passed=ok)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    n_pass = sum(r["passed"] for r in results.values())
    print(f"parity: {n_pass}/{len(results)} molecules in band", flush=True)


if __name__ == "__main__":
    main()
