"""Golden regression against the reference's archived measurement data.

Two layers:
  * EXACT analysis parity — running our rule-of-thumb fit on the very
    sweeps the paper fitted (data/data/rule_of_thumb/"estimate_slope,
    nmax = 31 500"/*, largest-n rows, exactly like reference
    plot_data.py:634-674 measure_slope) must reproduce the published
    per-molecule constants (data/rule_of_thumb.csv rows 0-6) to ~1%.
  * ITERATION-COUNT parity protocol — our solver at the archived
    n = 15,741 ethanol operating point with the same (strategy, k/n) must
    land in a stated band of the archived cgsteps curve.  Exact parity
    needs the real MD17 data (unavailable offline); the synthetic dataset
    reproduces the kernel structure but not the exact spectrum, so the
    band is a factor-2 envelope documented here rather than the 5%
    north-star, which is reserved for runs on the real datasets.
"""

import os
import pickle
from pathlib import Path

import numpy as np
import pytest

from mlff_tpu.experiments.rule_of_thumb import fit_slope, optimal_precon_k

ARCHIVE = Path("/root/reference/data/data/cg_performance_n=15750")
SLOPE_ARCHIVE = Path(
    "/root/reference/data/data/rule_of_thumb/estimate_slope, nmax = 31 500"
)

requires_archive = pytest.mark.skipif(
    not ARCHIVE.is_dir(), reason="reference archive not available"
)
requires_slope_archive = pytest.mark.skipif(
    not SLOPE_ARCHIVE.is_dir(), reason="reference archive not available"
)


class _AnyTuple(tuple):
    """Stand-in for unpicklable foreign classes (old platform.uname_result)."""

    def __new__(cls, *args, **kwargs):
        return super().__new__(cls, args)


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "platform":
            return _AnyTuple
        return super().find_class(module, name)


def _load(directory: Path, name_fragment: str) -> dict:
    for fn in os.listdir(directory):
        if name_fragment in fn:
            with open(directory / fn, "rb") as f:
                return _TolerantUnpickler(f).load()
    raise FileNotFoundError(name_fragment)


# data/rule_of_thumb.csv rows 0-6 (also plot_data.py:677-734 get_params)
PAPER_CONSTANTS = {
    "ethanol": (0.87, 10),
    "uracil": (1.07, 32),
    "toluene": (1.01, 44),
    "aspirin": (1.14, 236),
    "azobenzene": (1.02, 62),
    "catcher": (1.02, 316),
    "nanotube": (0.73, 89),
}


@requires_slope_archive
@pytest.mark.parametrize("molecule", sorted(PAPER_CONSTANTS))
def test_fit_reproduces_published_constants_exactly(molecule):
    """Same data, same fit => same constants: fitting the largest-n rows of
    the paper's own slope-estimation sweeps recovers the published
    (m, k_unity) to 1% / 5% (reference measure_slope fits the max-n rows,
    plot_data.py:641)."""
    d = _load(SLOPE_ARCHIVE, molecule)
    nmax = max(d["list_n_datapoints"])
    n_kernel = d[f"{nmax}_K.shape"][0]
    k = np.asarray(d[f"{nmax}_lev_random_percentage"]) * n_kernel
    steps = np.asarray(d[f"{nmax}_lev_random_cgsteps"])
    m, ku = fit_slope(k, steps, n_kernel)
    m_paper, ku_paper = PAPER_CONSTANTS[molecule]
    assert abs(m - m_paper) <= 0.012, f"fitted slope {m} vs paper {m_paper}"
    assert abs(ku / ku_paper - 1) <= 0.05, f"fitted k_unity {ku} vs {ku_paper}"


@requires_archive
def test_archived_cg_curves_are_monotone_decreasing():
    """More preconditioner rank => fewer CG iterations, on the real data."""
    d = _load(ARCHIVE, "ethanol")
    steps = np.asarray(d["lev_random_cgsteps"], dtype=float)
    k = np.asarray(d["lev_random_percentage"])
    order = np.argsort(k)
    s = steps[order]
    # randomized column selection is noisy point-to-point (the real curve is
    # only ~67% locally non-increasing); require the broad trend
    assert s[0] > 2 * s[-1]
    assert np.mean(np.diff(s) <= 0) > 0.6


@requires_archive
def test_baseline_iteration_time_constant():
    """The BASELINE.md headline number comes from this archive entry."""
    d = _load(ARCHIVE, "ethanol")
    assert abs(d["time_cg_step"] - 0.130) < 0.02


# archived n_train (kernel size ~= 15,741 after aspirin normalization) and
# expected P for each molecule's benchmark dataset
_PARITY_CASES = {
    "ethanol": (583, 6),
    "uracil": (437, 1),
    "toluene": (350, 12),
    "azobenzene": (218, 4),
    "aspirin": (250, 6),
    "catcher": (60, 1),
    "nanotube": (14, 1),
}

# Molecules beyond ethanol need thousands of CG iterations at n ~= 15.7k —
# minutes-to-hours on the CPU test backend (seconds on the chip).  The full
# 7-molecule protocol runs via MLFF_TPU_FULL_PARITY=1 (tools/run_parity.py
# drives it on hardware and records tools/parity_results.json).
_heavy = pytest.mark.skipif(
    os.environ.get("MLFF_TPU_FULL_PARITY", "") != "1",
    reason="heavy parity case; set MLFF_TPU_FULL_PARITY=1 (see tools/run_parity.py)",
)


@requires_archive
@pytest.mark.slow
@pytest.mark.parametrize(
    "molecule",
    [mol if mol == "ethanol" else pytest.param(mol, marks=_heavy)
     for mol in _PARITY_CASES],
)
def test_iteration_count_parity_protocol_n15741(molecule):
    """Iteration-count parity protocol (BASELINE.md north star).

    Train the difficulty-calibrated benchmark dataset at the archived
    kernel size n ~= 15,741 with the molecule's REAL permutation group and
    the archived hyperparameters (sig = 10, tol 1e-4, lev_random), at two
    archived k/n points; our CG iteration counts must land within
    [0.6, 1.6]x of the archived curve (per-molecule calibration runs:
    tools/calibration_log.json; e.g. ethanol 171 vs archived 196 at
    k/n = 0.105, 386 vs 379 at k/n = 0.049).  On the real MD17 datasets
    the protocol is the same with the band tightened to 5%; the synthetic
    potential shares the kernel's structure and — after calibration — its
    difficulty, but not MD17's exact spectrum.
    """
    from mlff_tpu.data.synthetic import _BENCH_DIFFICULTY, make_benchmark_dataset
    from mlff_tpu.models.gdml import Trainer
    from mlff_tpu.models.task import create_task

    if molecule not in _BENCH_DIFFICULTY:
        pytest.skip(f"{molecule} difficulty not calibrated yet")
    n_train, n_perms = _PARITY_CASES[molecule]
    d = _load(ARCHIVE, molecule)
    n_arch = d["K.shape"][0]
    perc = np.asarray(d["lev_random_percentage"], dtype=float)
    steps = np.asarray(d["lev_random_cgsteps"], dtype=float)

    ds, perms = make_benchmark_dataset(molecule, n_train + 60)
    task = create_task(ds, n_train, ds, n_valid=40, sig=10.0, solver="cg",
                       perms=perms)
    n = int(np.asarray(task["F_train"]).size)
    assert n == n_arch
    assert perms.shape[0] == n_perms

    for target_p in (0.105, 0.049):
        idx = int(np.argmin(np.abs(perc - target_p)))
        p = float(perc[idx])
        model = Trainer().train(task, break_percentage=p,
                                str_preconditioner="lev_random")
        ours = int(model["solver_iters"])
        archived = float(steps[idx])
        assert 0.6 * archived <= ours <= 1.6 * archived, (
            f"k/n={p:.3f}: ours {ours} vs archived {archived}"
        )
