"""Generate the example harness sweep + paper figures in examples/.

Runs real k-sweeps and spectra measurements (synthetic ethanol, CPU-sized)
through the experiment harness and renders every figure family:
CG-steps-vs-k, spectrum grid, difference-to-SVD-baseline, rule-of-thumb.
Reference figure sources: src/tools/plot_data.py:105-370, 1029-1361.
"""

import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

from mlff_tpu.data.synthetic import make_dataset  # noqa: E402
from mlff_tpu.experiments import plotting  # noqa: E402
from mlff_tpu.experiments.harness import (  # noqa: E402
    harness_task, merge_sweeps, minimum_preconditioner_size, spectra_sweep,
)

OUT = Path(__file__).resolve().parent.parent / "examples" / "measurements"
STRATEGIES = ("eigvec_precon", "cholesky", "lev_random", "random_scores")


def main():
    ds = make_dataset("ethanol", n_samples=120, seed=7)
    task = harness_task(ds, n_datapoints=50, sig=5.0, n_valid=30,
                        use_sym=False)
    n = int(np.asarray(task["F_train"]).size)
    print(f"n = {n}")

    percentages = np.geomspace(0.03, 0.4, 6)
    sweeps = [
        minimum_preconditioner_size(task, s, percentages=percentages)
        for s in STRATEGIES
    ]
    merged = merge_sweeps(sweeps)
    with open(OUT / "synthetic_ethanol" / "multi_strategy_sweep.pickle", "wb") as f:
        pickle.dump(merged, f)

    spec = spectra_sweep(task, ("eigvec_precon", "lev_random", "random_scores"),
                         (0.05, 0.15, 0.4))
    with open(OUT / "synthetic_ethanol" / "spectra_sweep.pickle", "wb") as f:
        pickle.dump(spec, f)

    plotting.plot_cg_steps_vs_k(
        {s: sw for s, sw in zip(STRATEGIES, sweeps)}, n,
        OUT / "ethanol_cg_steps_vs_k.png")
    plotting.plot_spectrum_grid(spec, OUT / "ethanol_spectrum_grid.png")
    plotting.plot_cg_steps_difference(
        merged, "eigvec_precon", OUT / "ethanol_diff_to_svd.png")
    plotting.plot_rule_of_thumb_prediction(
        n, "ethanol", OUT / "ethanol_rule_of_thumb.png")
    print("figures written to", OUT)


if __name__ == "__main__":
    main()
