"""Experiment harness: rule-of-thumb engine, sweep index decoding, k-sweep
measurement schema, plotting smoke tests."""

import numpy as np
import pytest

from mlff_tpu.experiments import rule_of_thumb as rot
from mlff_tpu.experiments.harness import cg_steps, harness_task, normalize_to_aspirin
from mlff_tpu.experiments.sweep import create_list_percentage, decode_index, select_value


def test_rule_of_thumb_closed_form():
    # k* = (k_unity^m * m * n^2 / 2)^(1/(2+m)) — reference plot_data.py:1254
    k = rot.rule_of_thumb(75000, 10, 0.87)
    assert isinstance(k, int)
    # sits in the 3-11% of n band the paper reports (BASELINE.md)
    assert 0.01 * 75000 < k < 0.15 * 75000


def test_rule_of_thumb_minimizes_cost_model():
    n = 50000
    for name in ("ethanol", "aspirin", "nanotube"):
        m, k_unity, pref = rot.get_params(name)
        k_star = rot.rule_of_thumb(n, k_unity, m)
        ks = np.geomspace(10, n, 2000)
        cost = rot.rule_of_thumb_fn(ks, m, pref, k_unity, n)
        k_grid_opt = ks[np.argmin(cost)]
        assert abs(np.log(k_star / k_grid_opt)) < 0.1


def test_fit_slope_recovers_params():
    rng = np.random.default_rng(0)
    n = 20000
    m_true, k_unity_true = 1.05, 40.0
    k = np.geomspace(100, 0.6 * n, 15)
    steps = n * (k / k_unity_true) ** (-m_true) * np.exp(rng.normal(0, 0.01, k.size))
    m_fit, ku_fit = rot.fit_slope(k, steps, n)
    assert abs(m_fit - m_true) < 0.05
    assert abs(np.log(ku_fit / k_unity_true)) < 0.2


def test_jackknife():
    mean, err = rot.jackknife(np.array([1.0, 1.1, 0.9, 1.0]))
    assert abs(mean - 1.0) < 1e-9
    assert err > 0


def test_optimal_precon_k_schema():
    k = np.geomspace(50, 5000, 12)
    t_pre = 1e-4 * k**2 / 50
    t_cg = 2000.0 / k
    t_solve = t_pre + t_cg
    out = rot.optimal_precon_k(k, t_solve, t_pre, t_cg, n_kernel=20000,
                               dataset_name="ethanol")
    for key in ("optimal_experimental_k", "rule_of_thumb_k_specific",
                "ratio2_k", "naive_k", "smallest_factor"):
        assert key in out
    assert out["rule_of_thumb_factor_specific"] >= 1.0


def test_select_value_mixed_radix():
    # reference cluster_main.py:96-106: repeated decode over value lists
    precons = ["a", "b", "c"]
    mols = ["x", "y"]
    seen = set()
    for idx in range(6):
        p, rest = select_value(precons, idx)
        m, rest = select_value(mols, rest)
        seen.add((p, m))
    assert len(seen) == 6


def test_decode_index():
    out = decode_index(5, ["a", "b", "c"], ["x", "y"])
    assert out == ["c", "y"]


def test_create_list_percentage():
    ps = create_list_percentage(10000, 8, 100, 0.5)
    assert len(ps) == 8
    assert abs(ps[0] - 0.01) < 1e-9
    assert abs(ps[-1] - 0.5) < 1e-9


def test_normalize_to_aspirin():
    assert normalize_to_aspirin(100, "aspirin") == 100
    assert normalize_to_aspirin(100, "ethanol") == int(100 * 21 / 9)


def test_cg_steps_measurement_schema(ethanol_ds):
    task = harness_task(ethanol_ds, n_datapoints=12, sig=5.0, n_valid=10,
                        use_sym=False)
    res = cg_steps(task, "random_scores", 0.3, raise_on_nonconv=False)
    for key in ("n_kernel", "K.shape", "random_scores_percentage",
                "random_scores_cgsteps", "time_cg_step", "platform",
                "solver_runtime_s", "sig", "lam", "solver_tol"):
        assert key in res, key
    assert res["n_kernel"] == 12 * 9 * 3


def test_plotting_smoke(tmp_path):
    from mlff_tpu.experiments import plotting

    sweeps = {
        "random_scores": {
            "random_scores_percentage": np.array([0.05, 0.1, 0.3]),
            "random_scores_cgsteps": np.array([300, 150, 60]),
        }
    }
    p1 = plotting.plot_cg_steps_vs_k(sweeps, 1000, tmp_path / "curves.png")
    p2 = plotting.plot_spectrum(
        np.geomspace(1, 1e-10, 50), np.geomspace(10, 1e-12, 50),
        tmp_path / "spec.png",
    )
    p3 = plotting.plot_rule_of_thumb_prediction(15741, "ethanol",
                                                tmp_path / "rot.png")
    for p in (p1, p2, p3):
        assert p.exists() and p.stat().st_size > 0


def test_visualize_smoke(tmp_path, ethanol_ds):
    from mlff_tpu.experiments import visualize

    contrib = visualize.calculate_atomic_contributions(
        np.random.default_rng(0).normal(size=(5 * 9 * 3)), 9
    )
    assert contrib.shape == (9,)
    out = visualize.plot_atomic_contributions(
        ethanol_ds["R"][0], ethanol_ds["z"], contrib, tmp_path / "mol.png"
    )
    assert out.exists()


def test_spectra_sweep_and_spectrum_grid(tmp_path, ethanol_ds):
    """Real harness spectra over a (strategy x k) grid -> panel figure
    (reference plot_data.py:206-370 over create_data.py:173-203 output)."""
    from mlff_tpu.experiments import plotting
    from mlff_tpu.experiments.harness import harness_task, spectra_sweep

    task = harness_task(ethanol_ds, n_datapoints=8, sig=5.0, n_valid=6,
                        use_sym=False)
    data = spectra_sweep(task, ("random_scores", "eigvec_precon"),
                         (0.1, 0.3))
    n = int(data["K.shape"][0])
    # archive schema: raw spectrum + per-percentage spectra, percent keys
    assert f"eigvals_random_scores_0" in data
    assert f"eigvals_random_scores_{10.0:.2f}" in data
    assert len(data["eigvals_eigvec_precon_30.00"]) == n

    # preconditioning must tighten the spectrum at larger k
    from mlff_tpu.experiments.plotting import _normalized_spectrum
    raw = _normalized_spectrum(data["eigvals_random_scores_0"])
    pre = _normalized_spectrum(data["eigvals_eigvec_precon_30.00"])
    assert pre.max() < raw.max()

    out = plotting.plot_spectrum_grid(data, tmp_path / "spectra.png")
    assert out.exists() and out.stat().st_size > 10_000

    # prefix-collision regression: a second strategy whose label extends the
    # first ('random_scores' vs 'random_scores_panel') must not crash the
    # percentage parser (float('panel_10.00') ValueError)
    data2 = dict(data)
    data2["eigvals_random_scores_panel_10.00"] = data["eigvals_random_scores_10.00"]
    out2 = plotting.plot_spectrum_grid(
        data2, tmp_path / "spectra2.png",
        labels=["random_scores", "random_scores_panel"])
    assert out2.exists()


def test_cg_steps_difference_plot(tmp_path, ethanol_ds):
    """Difference-to-SVD-baseline figure from real k-sweeps
    (reference plot_data.py:1289-1361)."""
    from mlff_tpu.experiments import plotting
    from mlff_tpu.experiments.harness import (
        harness_task, merge_sweeps, minimum_preconditioner_size,
    )

    task = harness_task(ethanol_ds, n_datapoints=10, sig=5.0, n_valid=6,
                        use_sym=False)
    sweeps = [
        minimum_preconditioner_size(
            task, s, percentages=np.array([0.1, 0.2, 0.4]))
        for s in ("eigvec_precon", "random_scores", "lev_random")
    ]
    data = merge_sweeps(sweeps)
    assert "eigvec_precon_cgsteps" in data and "lev_random_cgsteps" in data

    out = plotting.plot_cg_steps_difference(
        data, "eigvec_precon", tmp_path / "diff.png")
    assert out.exists() and out.stat().st_size > 10_000
    # stacked multi-molecule variant
    out2 = plotting.plot_cg_steps_difference(
        [data, dict(data, dataset_name="copy")], "eigvec_precon",
        tmp_path / "diff_all.png")
    assert out2.exists()
