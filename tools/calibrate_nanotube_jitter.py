"""Nanotube difficulty: jitter-axis search.

The generic calibrator's temperature-first search is blind on nanotube:
three successive T reductions (0.25 -> 0.097 -> 0.038) all hit the
2.2x-target iteration cap at k/n = 0.049 — with n_train = 14 and
A = 370 the kernel spectrum's preconditioner-resistant tail is set by the
full-dimensional ``jitter`` noise (15,540 dims from 14 points), not by
the mode temperature.  This sweeps jitter downward at fixed T until the
archived point is matched, then verifies the second point.

MLFF_CAL_PLATFORM=tpu python tools/calibrate_nanotube_jitter.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from calibrate_difficulty import LOG, archived_curve, measure  # noqa: E402

import numpy as np  # noqa: E402


def main():
    perc, steps, _ = archived_curve("nanotube")
    p1 = float(perc[np.argmin(np.abs(perc - 0.049))])
    p2 = float(perc[np.argmin(np.abs(perc - 0.105))])
    t1 = float(steps[np.argmin(np.abs(perc - 0.049))])
    t2 = float(steps[np.argmin(np.abs(perc - 0.105))])
    print(f"[nanotube] targets: {t1:.0f} @ {p1:.4f}, {t2:.0f} @ {p2:.4f}",
          flush=True)

    T = 0.0971  # the calibrator's round-1 temperature (mid-range)
    history = []
    jit_lo, jit_hi = None, 0.005  # 0.005 known too hard (ratio >= 2.2)
    jitter = 0.00125
    best = None
    for round_ in range(6):
        settings = dict(n_modes=21, temperature=T, jitter=jitter)
        cap = int(min(2.2 * t1, 60000))
        t0 = time.time()
        ours = measure("nanotube", settings, p1, cap)
        r = ours / t1
        print(f"  round {round_}: jitter={jitter:g} -> {ours} @ p1 "
              f"(ratio {r:.2f}) [{time.time() - t0:.0f}s]", flush=True)
        history.append(dict(settings=settings, p=p1, ours=ours, target=t1))
        if 0.7 <= r <= 1.3:
            best = settings
            break
        if r > 1.3:
            jit_hi = jitter
            jitter = jitter / 4 if jit_lo is None else (jit_lo + jitter) / 2
        else:
            jit_lo = jitter
            jitter = (jitter + jit_hi) / 2

    out = dict(molecule="nanotube", converged=False, history=history)
    if best is not None:
        t0 = time.time()
        ours2 = measure("nanotube", best, p2, int(min(4 * t2, 60000)))
        r2 = ours2 / t2
        print(f"  check @ p2: {ours2} (target {t2:.0f}, ratio {r2:.2f}) "
              f"[{time.time() - t0:.0f}s]", flush=True)
        history.append(dict(settings=best, p=p2, ours=ours2, target=t2))
        out.update(settings=best, converged=0.7 <= r2 <= 1.3,
                   points=[[p1, history[-2]["ours"], t1], [p2, ours2, t2]])
    log = {}
    if os.path.exists(LOG):
        with open(LOG) as f:
            log = json.load(f)
    log["nanotube"] = out
    with open(LOG, "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps({k: out[k] for k in out if k != "history"}))


if __name__ == "__main__":
    main()
