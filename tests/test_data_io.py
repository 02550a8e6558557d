"""Dataset IO: npz round-trip + fingerprints, xyz/extxyz converters,
synthetic dataset physics (F = -grad E), downloader stub."""

import numpy as np
import pytest

from mlff_tpu.data import xyz
from mlff_tpu.data.synthetic import make_dataset
from mlff_tpu.utils import io


def test_dataset_roundtrip(tmp_path, ethanol_ds):
    p = tmp_path / "ds.npz"
    io.save_dataset(p, ethanol_ds)
    loaded = io.load_dataset(p)
    np.testing.assert_array_equal(loaded["R"], ethanol_ds["R"])
    assert io.dataset_md5(loaded) == io.dataset_md5(ethanol_ds)


def test_fingerprint_detects_tamper(tmp_path, ethanol_ds):
    p = tmp_path / "ds.npz"
    io.save_dataset(p, ethanol_ds)
    data = dict(np.load(p, allow_pickle=True))
    data["F"] = data["F"] + 1.0
    np.savez_compressed(p, **data)
    with pytest.raises(ValueError, match="fingerprint"):
        io.load_dataset(p)


def test_extxyz_roundtrip(tmp_path, ethanol_ds):
    p = tmp_path / "traj.xyz"
    small = {
        **ethanol_ds,
        "R": ethanol_ds["R"][:7],
        "F": ethanol_ds["F"][:7],
        "E": ethanol_ds["E"][:7],
    }
    xyz.dataset_to_extxyz(small, p)
    back = xyz.dataset_from_extxyz(p, name="roundtrip")
    np.testing.assert_allclose(back["R"], small["R"], rtol=1e-10)
    np.testing.assert_allclose(back["F"], small["F"], rtol=1e-10)
    np.testing.assert_allclose(back["E"], small["E"], rtol=1e-10)
    np.testing.assert_array_equal(back["z"], small["z"])


def test_read_write_xyz(tmp_path, ethanol_ds):
    p = tmp_path / "geo.xyz"
    xyz.write_xyz(p, ethanol_ds["R"][:3], ethanol_ds["z"])
    R, z, comments = xyz.read_xyz(p)
    np.testing.assert_allclose(R, ethanol_ds["R"][:3], rtol=1e-10)
    np.testing.assert_array_equal(z, ethanol_ds["z"])


def test_synthetic_forces_are_gradients():
    """F = -grad E by central differences on the generator's potential."""
    ds = make_dataset("ethanol", n_samples=3, seed=9)
    from mlff_tpu.data.synthetic import _morse_energy_forces

    n_atoms = ds["R"].shape[1]
    base_R = ds["R"][:1]
    # rebuild the d0 used by the generator
    rng = np.random.default_rng(9)
    from mlff_tpu.data.synthetic import _base_geometry

    base = _base_geometry(n_atoms, rng)
    iu, ju = np.triu_indices(n_atoms, 1)
    d0 = np.linalg.norm(base[iu] - base[ju], axis=1)

    E0, F0 = _morse_energy_forces(base_R, d0, De=5.0, a=1.2)
    eps = 1e-6
    for idx in [(0, 0), (3, 1), (n_atoms - 1, 2)]:
        Rp = base_R.copy(); Rp[0, idx[0], idx[1]] += eps
        Rm = base_R.copy(); Rm[0, idx[0], idx[1]] -= eps
        Ep, _ = _morse_energy_forces(Rp, d0, De=5.0, a=1.2)
        Em, _ = _morse_energy_forces(Rm, d0, De=5.0, a=1.2)
        fd = -(Ep[0] - Em[0]) / (2 * eps)
        np.testing.assert_allclose(F0[0, idx[0], idx[1]], fd, rtol=1e-5)


def test_downloader_raises_helpfully():
    with pytest.raises(RuntimeError, match="synthetic"):
        xyz.download("dataset", "ethanol_dft.npz")


def test_ase_calc_gated():
    from mlff_tpu.models import ase_calc

    if not ase_calc._HAVE_ASE:
        with pytest.raises(ImportError):
            ase_calc.MLFFCalculator(model={})
