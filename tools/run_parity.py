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
    python tools/run_parity.py --real-data ~/mlff_data
                                # the 5%-band REAL-data protocol: the
                                # moment the reference npz files exist
                                # (tools/fetch_real_md17.py), this runs the
                                # same two archived operating points on the
                                # real MD17/AIMS training draws with perms
                                # recovered by the symmetry finder; results
                                # land under '<mol>@real'
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("molecules", nargs="*")
    ap.add_argument("--real-data", default=None, metavar="DIR",
                    help="directory of reference npz datasets "
                         "(tools/fetch_real_md17.py naming); use the real "
                         "data instead of calibrated synthetic")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from mlff_tpu.data.synthetic import _BENCH_DIFFICULTY, make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    todo = args.molecules or [m for m in ARCHIVE_POINTS
                              if m in _BENCH_DIFFICULTY or args.real_data]
    print("backend:", jax.devices(), "molecules:", todo, flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for mol in todo:
        perc, steps, n_arch = archived_curve(mol)
        n_train = ARCHIVE_POINTS[mol]
        if args.real_data:
            from fetch_real_md17 import DATASET_FILES, verify

            path = os.path.join(args.real_data, DATASET_FILES[mol])
            if not os.path.exists(path):
                print(f"[{mol}] SKIP: {path} missing "
                      f"(tools/fetch_real_md17.py)", flush=True)
                continue
            ok, msg = verify(path, mol)
            if not ok:
                print(f"[{mol}] SKIP: {path} failed verification: {msg}",
                      flush=True)
                continue
            with np.load(path, allow_pickle=False) as f:
                ds = {k: f[k] for k in f.files}
            # production path: symmetries RECOVERED from the real data by
            # the matching engine (models/symmetry.py), like the reference
            task = create_task(ds, n_train, ds, n_valid=40, sig=10.0,
                               solver="cg", use_sym=True)
            perms = np.asarray(task["perms"])
            mol = f"{mol}@real"
        else:
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
