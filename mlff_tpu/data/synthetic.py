"""Synthetic molecular datasets with consistent energies and forces.

The reference downloads benchmark npz datasets (ethanol, aspirin, ...) from
quantum-machine.org (reference: sgdml/get.py:45-69).  This environment has no
network egress, so we generate MD-like samples from an analytic pairwise Morse
potential instead: energies and forces are exactly consistent (F = -grad E),
which exercises integration-constant recovery, cosine force errors and
learning-curve sanity the same way real data does.  Atom counts for the named
molecules match the reference benchmark systems
(reference: src/tools/create_data.py:55-72).
"""

from __future__ import annotations

import numpy as np

from ..utils.io import dataset_md5

# name -> number of atoms, as in the reference benchmark set.
MOLECULES = {
    "ethanol": 9,
    "uracil": 12,
    "malonaldehyde": 9,
    "naphthalene": 18,
    "salicylic": 16,
    "toluene": 15,
    "aspirin": 21,
    "azobenzene": 24,
    "paracetamol": 20,
    "catcher": 88,
    "nanotube": 370,
}


def _base_geometry(n_atoms: int, rng: np.random.Generator) -> np.ndarray:
    """Random base geometry with a minimum pair separation (greedy rejection)."""
    pts = [rng.normal(size=3)]
    scale = max(1.5, 0.9 * n_atoms ** (1.0 / 3.0) * 1.6)
    while len(pts) < n_atoms:
        cand = rng.normal(size=3) * scale
        d = np.linalg.norm(np.asarray(pts) - cand, axis=1)
        if np.all(d > 1.0):
            pts.append(cand)
    return np.asarray(pts)


def _morse_energy_forces(R: np.ndarray, d0: np.ndarray, De: float, a: float):
    """Energy and forces of a pairwise Morse potential, batched over (M, A, 3).

    E = sum_{i<j} De * (1 - exp(-a (d_ij - d0_ij)))**2,  F = -grad E.
    """
    M, A, _ = R.shape
    iu, ju = np.triu_indices(A, 1)
    diff = R[:, iu] - R[:, ju]  # (M, npair, 3)
    dist = np.linalg.norm(diff, axis=-1)  # (M, npair)
    ex = np.exp(-a * (dist - d0[None, :]))
    E = (De * (1.0 - ex) ** 2).sum(axis=1)
    # dE/dd = 2 De (1 - ex) * a * ex ; dd/dr_i = diff/dist.
    dEdd = 2.0 * De * (1.0 - ex) * a * ex
    g = (dEdd / dist)[..., None] * diff  # grad wrt r_i per pair
    F = np.zeros_like(R)
    np.add.at(F, (slice(None), iu), -g)
    np.add.at(F, (slice(None), ju), g)
    return E, F


def make_dataset(
    name: str = "ethanol",
    n_samples: int = 1500,
    seed: int = 1,
    temperature: float = 0.02,
    n_atoms: int | None = None,
    n_modes: int = 4,
) -> dict:
    """Generate a synthetic dataset dict in the reference npz schema.

    Displacements are drawn along ``n_modes`` random collective modes (plus a
    whiff of full-dimensional jitter), mimicking thermal MD trajectories that
    live on a low-dimensional manifold — i.i.d. per-coordinate noise would
    make the regression problem hopeless at realistic training sizes.
    """
    if n_atoms is None:
        n_atoms = MOLECULES.get(name)
        if n_atoms is None:
            raise ValueError(f"unknown molecule {name!r}; pass n_atoms explicitly")
    rng = np.random.default_rng(seed)
    base = _base_geometry(n_atoms, rng)

    iu, ju = np.triu_indices(n_atoms, 1)
    d0 = np.linalg.norm(base[iu] - base[ju], axis=1)

    modes = rng.normal(size=(n_modes, n_atoms, 3))
    modes /= np.linalg.norm(modes.reshape(n_modes, -1), axis=1)[:, None, None]
    coeff = rng.normal(size=(n_samples, n_modes)) * np.sqrt(temperature * 3 * n_atoms / n_modes)
    disp = np.einsum("sm,max->sax", coeff, modes)
    jitter = rng.normal(size=(n_samples, n_atoms, 3)) * 0.005
    R = base[None] + disp + jitter
    E, F = _morse_energy_forces(R, d0, De=5.0, a=1.2)

    # a few light species repeated, like organic molecules
    z = rng.choice([1, 6, 7, 8], size=n_atoms, p=[0.5, 0.35, 0.075, 0.075])

    dataset = {
        "type": "d",
        "name": np.asarray(f"synthetic_{name}"),
        "theory": np.asarray("morse_pairwise"),
        "z": z.astype(np.int64),
        "R": R.astype(np.float64),
        "E": E.astype(np.float64),
        "F": F.astype(np.float64),
        "r_unit": np.asarray("Ang"),
        "e_unit": np.asarray("kcal/mol"),
    }
    dataset["md5"] = np.asarray(dataset_md5(dataset))
    return dataset
