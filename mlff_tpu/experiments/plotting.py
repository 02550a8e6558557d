"""Paper-figure plotting: CG-steps-vs-k curves, preconditioned spectra,
rule-of-thumb comparisons.

Rebuild of the reference plotting layer (reference: src/tools/plot_data.py
:105-185 sweep curves, :206-370 spectrum plots, :1029-1253 rule-of-thumb bar
charts; figure entry point scripts/main_plot.py:67-175; shared rcParams
src/tools/init_plt.py).  Figures are saved, never shown (headless).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .rule_of_thumb import get_params, rule_of_thumb, rule_of_thumb_fn  # noqa: E402


def init_style():
    """Shared figure style (reference src/tools/init_plt.py semantics)."""
    plt.rcParams.update({
        "figure.figsize": (6, 4),
        "font.size": 11,
        "axes.grid": True,
        "grid.alpha": 0.3,
        "savefig.dpi": 150,
        "savefig.bbox": "tight",
    })


def plot_cg_steps_vs_k(
    sweeps: dict[str, dict],
    n_kernel: int,
    out: str | Path,
    normalized: bool = True,
):
    """CG iterations vs preconditioner strength for several strategies
    (reference plot_data.py:105-185).  ``sweeps`` maps strategy name to the
    merged sweep dict from experiments.harness.minimum_preconditioner_size.
    """
    init_style()
    fig, ax = plt.subplots()
    for strategy, data in sweeps.items():
        k = np.asarray(data[f"{strategy}_percentage"]) * n_kernel
        steps = np.asarray(data[f"{strategy}_cgsteps"], dtype=float)
        if normalized:
            steps = steps / n_kernel
        ax.plot(k, steps, "o-", label=strategy)
    ax.set_xlabel("preconditioner rank k")
    ax.set_ylabel("CG steps" + (" / n" if normalized else ""))
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.legend()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def plot_spectrum(
    eigvals_precon: np.ndarray,
    eigvals_raw: np.ndarray | None,
    out: str | Path,
    title: str = "",
):
    """Spectrum of P^-1 (K + lam I) vs the raw kernel spectrum
    (reference plot_data.py:206-370)."""
    init_style()
    fig, ax = plt.subplots()
    sp = np.sort(np.abs(np.asarray(eigvals_precon)))[::-1]
    ax.plot(sp, label="preconditioned")
    if eigvals_raw is not None:
        sr = np.sort(np.abs(np.asarray(eigvals_raw)))[::-1]
        ax.plot(sr, label="raw kernel")
    ax.set_yscale("log")
    ax.set_xlabel("eigenvalue index")
    ax.set_ylabel("|eigenvalue|")
    if title:
        ax.set_title(title)
    ax.legend()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def plot_rule_of_thumb_bars(
    molecule_results: dict[str, dict],
    out: str | Path,
):
    """Relative time-to-solution of k-selection policies per molecule
    (reference plot_data.py:1029-1253 bar chart semantics).  Each value in
    ``molecule_results`` is the dict from rule_of_thumb.optimal_precon_k.
    """
    init_style()
    policies = [
        ("smallest_factor", "minimal k"),
        ("naive_factor", "naive 1% of n"),
        ("rule_of_thumb_factor_default", "RoT default"),
        ("rule_of_thumb_factor_specific", "RoT specific"),
        ("ratio2_factor", "precon/cg = 2"),
    ]
    mols = list(molecule_results)
    x = np.arange(len(mols))
    width = 0.8 / len(policies)
    fig, ax = plt.subplots(figsize=(1.5 * len(mols) + 2, 4))
    for i, (key, label) in enumerate(policies):
        vals = [molecule_results[m].get(key, np.nan) for m in mols]
        ax.bar(x + i * width, vals, width, label=label)
    ax.axhline(1.0, color="k", lw=0.8)
    ax.set_xticks(x + 0.4)
    ax.set_xticklabels(mols, rotation=0)
    ax.set_ylabel("time / optimal time")
    ax.legend()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)


def plot_rule_of_thumb_prediction(
    n_kernel: int, dataset_name: str, out: str | Path,
):
    """Cost-model curve with the closed-form optimum marked
    (reference plot_data.py:629-631, 1254-1258)."""
    init_style()
    slope, k_unity, prefactor = get_params(dataset_name)
    k = np.geomspace(max(k_unity, 2), n_kernel, 400)
    cost = rule_of_thumb_fn(k, slope, prefactor, k_unity, n_kernel)
    k_star = rule_of_thumb(int(n_kernel), k_unity, slope)
    fig, ax = plt.subplots()
    ax.plot(k, cost)
    ax.axvline(k_star, ls="--", color="C1", label=f"k* = {k_star}")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("preconditioner rank k")
    ax.set_ylabel("modeled relative cost")
    ax.set_title(f"{dataset_name}, n = {n_kernel}")
    ax.legend()
    fig.savefig(out)
    plt.close(fig)
    return Path(out)
