"""Dataset IO: npz round-trip + fingerprints, xyz/extxyz converters,
synthetic dataset physics (F = -grad E), checksum-verified downloader,
AIMS converter, compile-cache seeding + key stability."""

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


def _mirror_with(tmp_path, name, dataset):
    """Build a file:// mirror in the reference's URL layout."""
    from mlff_tpu.utils.io import save_dataset

    root = tmp_path / "mirror"
    (root / "data" / "npz").mkdir(parents=True)
    save_dataset(root / "data" / "npz" / name, dataset)
    return root.as_uri()


def test_downloader_fetches_and_verifies(tmp_path):
    """download() streams from any urllib scheme (here file://), verifies
    the embedded dataset fingerprint, and places the npz in dest_dir."""
    from mlff_tpu.data import get
    from mlff_tpu.data.synthetic import make_dataset

    ds = make_dataset("ethanol", n_samples=5, seed=0)
    base = _mirror_with(tmp_path, "ethanol_syn.npz", ds)

    seen = []
    out = get.download(
        "dataset", "ethanol_syn.npz", base_url=base,
        dest_dir=tmp_path / "dl", progress=lambda d, t: seen.append((d, t)),
    )
    assert out.exists() and out.name == "ethanol_syn.npz"
    assert seen and seen[-1][0] > 0
    loaded = dict(np.load(out, allow_pickle=True))
    np.testing.assert_allclose(loaded["R"], np.asarray(ds["R"]))

    # registry checksum path: correct entry passes, wrong entry raises
    md5 = get._file_md5(out)
    get.CHECKSUMS["ethanol_syn.npz"] = md5
    try:
        get.download("dataset", "ethanol_syn.npz", base_url=base,
                     dest_dir=tmp_path / "dl2")
        get.CHECKSUMS["ethanol_syn.npz"] = "0" * 32
        with pytest.raises(IOError, match="registry"):
            get.download("dataset", "ethanol_syn.npz", base_url=base,
                         dest_dir=tmp_path / "dl3")
        assert (tmp_path / "dl3" / "ethanol_syn.npz.corrupt").exists()
    finally:
        get.CHECKSUMS.pop("ethanol_syn.npz", None)


def test_downloader_rejects_tampered_dataset(tmp_path):
    """A dataset whose z/R/E/F do not match its embedded md5 is rejected."""
    from mlff_tpu.data import get
    from mlff_tpu.data.synthetic import make_dataset

    ds = make_dataset("ethanol", n_samples=5, seed=0)
    base = _mirror_with(tmp_path, "bad.npz", ds)
    # corrupt the payload after the fingerprint was embedded (save_dataset
    # recomputes md5, so tamper at the file level like real corruption)
    path = tmp_path / "mirror" / "data" / "npz" / "bad.npz"
    raw = dict(np.load(path, allow_pickle=True))
    raw["R"] = raw["R"] + 1.0
    np.savez_compressed(path, **raw)
    with pytest.raises(IOError, match="fingerprint"):
        get.download("dataset", "bad.npz", base_url=base, dest_dir=tmp_path)


def test_downloader_compat_shim(tmp_path):
    """xyz.download forwards to data.get (old call sites keep working)."""
    from mlff_tpu.data.synthetic import make_dataset

    ds = make_dataset("ethanol", n_samples=5, seed=0)
    base = _mirror_with(tmp_path, "e.npz", ds)
    out = xyz.download("dataset", "e.npz", base_url=base, dest_dir=tmp_path / "o")
    assert out.exists()


def test_ase_calc_gated():
    from mlff_tpu.models import ase_calc

    if not ase_calc._HAVE_ASE:
        with pytest.raises(ImportError):
            ase_calc.MLFFCalculator(model={})


def _fake_aims_output(path, R, z, E_eV, F_eV):
    """Emit a minimal FHI-aims MD stdout with the three per-step sections."""
    from mlff_tpu.data.xyz import z_to_str

    M, A, _ = R.shape
    with open(path, "w") as fh:
        fh.write(f"  The structure contains {A} atoms,  and a total of "
                 f"{float(sum(z)):.3f} electrons.\n\n")
        for s in range(M):
            fh.write("  Energy and forces in a compact form:\n")
            fh.write(f"  | Total energy uncorrected      :  {E_eV[s]: .12e} eV\n")
            fh.write("  Total atomic forces (unitary forces cleaned) [eV/Ang]:\n")
            for a in range(A):
                fx, fy, fz = F_eV[s, a]
                fh.write(f"  |{a + 1:4d}   {fx: .8e}  {fy: .8e}  {fz: .8e}\n")
            fh.write("  Atomic structure (and velocities) as used in the "
                     "preceding time step:\n")
            fh.write("  |\n")
            for a in range(A):
                x, y, zz = R[s, a]
                fh.write(f"            atom   {x: .8f}  {y: .8f}  {zz: .8f}"
                         f"  {z_to_str(z[a])}\n")


def test_dataset_from_aims(tmp_path):
    rng = np.random.default_rng(4)
    M, A = 5, 3
    R = rng.normal(size=(M, A, 3))
    z = np.array([8, 1, 1])
    E_eV = rng.normal(size=M) * 10 - 2000.0
    F_eV = rng.normal(size=(M, A, 3))
    path = tmp_path / "aims.out"
    _fake_aims_output(path, R, z, E_eV, F_eV)

    ds = xyz.dataset_from_aims(path, name="water_test")
    ev2kcal = 0.036749326 / 0.0015946679
    assert str(ds["name"]) == "water_test"
    np.testing.assert_array_equal(ds["z"], z)
    np.testing.assert_allclose(ds["R"], R, atol=1e-7)  # fixture prints %.8f
    np.testing.assert_allclose(ds["E"][:, 0], E_eV * ev2kcal, rtol=1e-10)
    np.testing.assert_allclose(ds["F"], F_eV * ev2kcal, rtol=1e-6)
    assert "md5" in ds and ds["E"].shape == (M, 1)


def test_dataset_from_aims_prunes_incomplete_tail(tmp_path):
    rng = np.random.default_rng(5)
    M, A = 4, 3
    R = rng.normal(size=(M, A, 3))
    z = np.array([6, 1, 1])
    E_eV = rng.normal(size=M)
    F_eV = rng.normal(size=(M, A, 3))
    path = tmp_path / "aims_truncated.out"
    _fake_aims_output(path, R, z, E_eV, F_eV)
    # append one extra energy+forces with no geometry (interrupted run)
    with open(path, "a") as fh:
        fh.write("  Energy and forces in a compact form:\n")
        fh.write("  | Total energy uncorrected      :  -1.0e+00 eV\n")

    ds = xyz.dataset_from_aims(path)
    assert ds["R"].shape[0] == M and ds["E"].shape[0] == M


def test_dataset_subsets_from_model(tmp_path, ethanol_ds):
    """datasets-from-model extraction (reference
    scripts/sgdml_datasets_from_model.py): md5-validated train/valid
    subsets, each a self-fingerprinted dataset."""
    from mlff_tpu.data.xyz import dataset_subsets_from_model

    model = {
        "md5_train": ethanol_ds["md5"],
        "md5_valid": ethanol_ds["md5"],
        "idxs_train": np.array([0, 2, 4]),
        "idxs_valid": np.array([1, 3]),
    }
    subs = dataset_subsets_from_model(model, ethanol_ds)
    assert subs["train"]["R"].shape[0] == 3
    assert subs["valid"]["R"].shape[0] == 2
    np.testing.assert_array_equal(
        subs["train"]["F"], np.asarray(ethanol_ds["F"])[[0, 2, 4]])
    # each subset carries a valid fingerprint of its own contents
    from mlff_tpu.utils.io import dataset_md5
    assert str(subs["valid"]["md5"]) == dataset_md5(subs["valid"])
    # mismatched fingerprint is rejected
    model["md5_train"] = "deadbeef"
    with pytest.raises(ValueError, match="fingerprint"):
        dataset_subsets_from_model(model, ethanol_ds)


def test_dataset_via_ase_gated():
    """Without the optional ase package the converter raises the
    documented ImportError (reference gates identically)."""
    from mlff_tpu.data.xyz import dataset_via_ase

    try:
        import ase  # noqa: F401
        pytest.skip("ase available; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ase"):
        dataset_via_ase("nonexistent.traj")


def test_compile_cache_prune(tmp_path):
    """LRU eviction brings an over-cap cache dir under target size and
    never touches the marker file."""
    import time as _t

    from mlff_tpu.utils.cache import prune_compile_cache

    d = tmp_path / "cache"
    d.mkdir()
    for i in range(10):
        p = d / f"entry{i}"
        p.write_bytes(bytes(1000))
        ts = _t.time() - (10 - i) * 100
        import os
        os.utime(p, (ts, ts))
    # cap at 5500 bytes -> evict oldest until <= 4125
    evicted = prune_compile_cache(str(d), max_bytes=5500)
    remaining = sorted(f.name for f in d.iterdir())
    assert evicted == 6
    assert remaining == [f"entry{i}" for i in range(6, 10)]
    # under cap: no-op
    assert prune_compile_cache(str(d), max_bytes=5500) == 0


def test_seed_compile_cache(tmp_path, monkeypatch):
    """Repo-shipped cache entries are linked/copied into the active cache;
    seeding is idempotent and can be disabled."""
    from mlff_tpu.utils.cache import seed_compile_cache

    seed = tmp_path / "seed"
    active = tmp_path / "active"
    seed.mkdir()
    (seed / "jit_foo-abc-cache").write_bytes(b"x" * 64)
    (seed / "jit_bar-def-cache").write_bytes(b"y" * 64)
    (seed / ".last_prune").write_bytes(b"")  # marker must not be copied

    assert seed_compile_cache(str(active), str(seed)) == 2
    assert sorted(p.name for p in active.iterdir()) == [
        "jit_bar-def-cache", "jit_foo-abc-cache"]
    # idempotent: nothing new on re-seed
    assert seed_compile_cache(str(active), str(seed)) == 0
    # existing entries are never overwritten
    (active / "jit_foo-abc-cache").write_bytes(b"local")
    seed_compile_cache(str(active), str(seed))
    assert (active / "jit_foo-abc-cache").read_bytes() == b"local"
    # env kill switch
    monkeypatch.setenv("MLFF_TPU_SEED_CACHE", "off")
    assert seed_compile_cache(str(active)) == 0


def test_cache_key_build_stamp_sanitizer():
    """The compile-cache key ignores the tunnel server's per-build stamp
    (a replica swap must not invalidate the shipped executable cache) while
    still keying on the executable-compatibility fields."""
    import hashlib
    from types import SimpleNamespace

    from jax._src import cache_key as ck

    import mlff_tpu  # noqa: F401  (applies the patch at import)

    assert hasattr(ck._hash_platform, "_mlff_orig"), "sanitizer not installed"

    def key_for(version):
        h = hashlib.sha256()
        ck._hash_platform(h, SimpleNamespace(platform="tpu",
                                             platform_version=version))
        return h.hexdigest()

    base = ("PJRT C API\naxon 0.1.0; SerializedExecutable v9; "
            "compile-cache v14; compat c49\nTFRT TPU v5 lite\n")
    a = key_for(base + "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")
    b = key_for(base + "Built on Dec 01 2025 09:00:00 (1764000000) cl/999999999")
    assert a == b, "build stamp must not enter the cache key"
    c = key_for(base.replace("compat c49", "compat c50")
                + "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")
    assert c != a, "compat version must still key the cache"


def test_cache_key_independent_of_cache_dir():
    """Compile-options cache-key hashes must not depend on the compilation
    cache directory: jax's default points the (GPU-only) per-fusion
    autotune cache at a subdir of the compile cache and hashes that PATH
    into every key, so a shipped seed cache would silently miss under any
    other cache location.  mlff_tpu disables it at import."""
    import hashlib

    import jax
    from jax._src import cache_key as ck
    from jax._src import compiler

    import mlff_tpu  # noqa: F401  (applies the config at import)

    assert jax.config.jax_persistent_cache_enable_xla_caches == "none"

    def opts_hash(cache_dir):
        old = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            d = jax.devices()[0]
            opts = compiler.get_compile_options(
                num_replicas=1, num_partitions=1, device_assignment=[[d]])
            h = hashlib.sha256()
            ck._hash_serialized_compile_options(h, opts)
            return h.hexdigest()
        finally:
            jax.config.update("jax_compilation_cache_dir", old)

    assert opts_hash("/tmp/ckA") == opts_hash("/tmp/ckB")


def test_seed_compile_cache_tarball(tmp_path):
    """Single-artifact seeding: a <seed>.tar.gz at the seed location is
    extracted into the active cache (one git object per re-key event
    instead of a hundred loose blobs)."""
    import tarfile

    from mlff_tpu.utils.cache import seed_compile_cache

    seed_src = tmp_path / "src"
    seed_src.mkdir()
    for i in range(3):
        (seed_src / f"jit_f-{i}-cache").write_bytes(b"z" * 64)
    with tarfile.open(tmp_path / "seed.tar.gz", "w:gz") as tf:
        tf.add(seed_src, arcname=".jax_cache")

    active = tmp_path / "active"
    assert seed_compile_cache(str(active), str(tmp_path / "seed")) == 3
    assert sorted(p.name for p in active.iterdir()) == [
        "jit_f-0-cache", "jit_f-1-cache", "jit_f-2-cache"]
    # idempotent
    assert seed_compile_cache(str(active), str(tmp_path / "seed")) == 0


def test_correlated_trajectory_sampling():
    """AR(1) mode coefficients (round 5): marginal variance preserved,
    lag-1 autocorrelation ~rho — the MD-trajectory sampling geometry the
    i.i.d. generator lacks (nanotube calibration, RESULTS.md)."""
    import numpy as np

    from mlff_tpu.data.synthetic import make_dataset

    kw = dict(n_samples=400, seed=3, temperature=0.02, n_modes=21,
              geometry="tube")
    d_iid = make_dataset("nanotube", correlation=0.0, **kw)
    d_cor = make_dataset("nanotube", correlation=0.97, **kw)
    for d, lo, hi in [(d_iid, -0.2, 0.2), (d_cor, 0.9, 1.0)]:
        R = d["R"].reshape(400, -1)
        disp = R - R.mean(0)
        lag1 = (np.mean(np.sum(disp[1:] * disp[:-1], 1))
                / np.mean(np.sum(disp ** 2, 1)))
        assert lo < lag1 < hi
    # marginal spread stays at the temperature's scale
    v_iid = (d_iid["R"] - d_iid["R"].mean(0)).var()
    v_cor = (d_cor["R"] - d_cor["R"].mean(0)).var()
    assert 0.5 * v_iid < v_cor < 1.5 * v_iid


def test_real_data_onramp_fixture(tmp_path):
    """tools/fetch_real_md17.verify against a synthetic npz fixture: the
    real-data on-ramp's schema + internal-fingerprint checks (VERDICT r4
    next 9) — accepts a well-formed file, rejects tampered contents."""
    import sys

    import numpy as np

    from mlff_tpu.data.synthetic import make_dataset
    from mlff_tpu.utils.io import save_dataset

    sys.path.insert(0, "/root/repo/tools")
    from fetch_real_md17 import DATASET_FILES, verify

    ds = make_dataset("ethanol", n_samples=30, seed=2)
    path = tmp_path / DATASET_FILES["ethanol"]
    save_dataset(str(path), ds)
    ok, msg = verify(str(path), "ethanol")
    assert ok, msg

    # tamper: flip one force component -> stored fingerprint must mismatch
    bad = dict(ds)
    bad["F"] = np.array(ds["F"], copy=True)
    bad["F"][0, 0, 0] += 1.0
    bad_path = tmp_path / "tampered.npz"
    save_dataset(str(bad_path), bad)
    # save_dataset recomputes md5? emulate transport corruption by writing
    # the ORIGINAL md5 alongside modified arrays
    with np.load(str(bad_path)) as f:
        arrs = {k: f[k] for k in f.files}
    arrs["md5"] = ds["md5"]
    np.savez_compressed(str(bad_path), **arrs)
    ok, msg = verify(str(bad_path), "ethanol")
    assert not ok and "fingerprint" in msg

    # wrong molecule file contents
    ok, msg = verify(str(path), "aspirin")
    assert not ok and "atom count" in msg


def test_by_n_train_log_nearest_selection(monkeypatch):
    """Per-scale difficulty overlays resolve by LOG-nearest n_train: the
    verified 31.4k midpoint (n_train=1166) must keep the 583-base
    settings, while the 75k row picks its own entry."""
    from mlff_tpu.data import synthetic

    captured = {}
    real_make = synthetic.make_dataset

    def spy(name, **kw):
        captured.update(kw)
        return real_make(name, **kw)

    monkeypatch.setattr(synthetic, "make_dataset", spy)

    def temp_for(n_train):
        captured.clear()
        synthetic.make_benchmark_dataset("ethanol", 70, n_train=n_train)
        return captured["temperature"]

    assert temp_for(583) == 0.25
    assert temp_for(1166) == 0.25     # log-nearest 583 -> base settings
    assert temp_for(2777) == 0.232    # 75k per-scale entry
    assert temp_for(2000) == 0.232    # closer to 2777 in log space
