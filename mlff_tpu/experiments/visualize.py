"""Molecule visualization: kernel-eigenvector atomic contributions.

Rebuild of the reference visualization (reference:
src/visualize_molecules.py:12-25 ``calculate_atomic_contributions`` and
src/tools/plot_routines_molecules.py): project kernel eigenvectors onto
per-atom 3-vectors and render them as heat on a 2-D molecule sketch
(matplotlib, headless; the reference uses 3-D renders).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def calculate_atomic_contributions(eigvec: np.ndarray, n_atoms: int) -> np.ndarray:
    """Per-atom contribution weights of one kernel eigenvector.

    The length-n eigenvector is reshaped to (n_train, n_atoms, 3); the
    contribution of atom a is the mean over training points of the 3-vector
    norms (reference visualize_molecules.py:12-25)."""
    v = np.asarray(eigvec).reshape(-1, n_atoms, 3)
    return np.linalg.norm(v, axis=2).mean(axis=0)


def plot_atomic_contributions(
    r: np.ndarray,
    z: np.ndarray,
    contributions: np.ndarray,
    out: str | Path,
    bond_cutoff: float = 1.8,
    title: str = "",
):
    """2-D molecule sketch with atoms colored by contribution weight
    (reference plot_routines_molecules.plot_atomic_contributions)."""
    r = np.asarray(r).reshape(-1, 3)
    xy = r[:, :2]
    fig, ax = plt.subplots(figsize=(5, 5))
    # bonds: all pairs within the cutoff
    for i in range(len(r)):
        for j in range(i + 1, len(r)):
            if np.linalg.norm(r[i] - r[j]) < bond_cutoff:
                ax.plot(*zip(xy[i], xy[j]), color="0.7", lw=1.5, zorder=1)
    sizes = 120 + 60 * (np.asarray(z) > 1)
    sc = ax.scatter(
        xy[:, 0], xy[:, 1], c=contributions, s=sizes, cmap="viridis",
        edgecolors="k", zorder=2,
    )
    fig.colorbar(sc, label="atomic contribution")
    ax.set_aspect("equal")
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return Path(out)


def plot_single_molecule(r, z, out, bond_cutoff: float = 1.8):
    """Plain molecule sketch (reference plot_routines_molecules.plot_single_molecule)."""
    return plot_atomic_contributions(
        r, z, np.zeros(len(np.asarray(z))), out, bond_cutoff=bond_cutoff
    )
