"""Compile-cache seeding: the repo ships the bench path's executables as
ONE tarball (.jax_cache.tar.gz) that utils.cache.seed_compile_cache
extracts into the active cache dir (VERDICT r3 next 8: no loose blobs in
git, and seeding must actually populate)."""

import os
import tarfile

import pytest

from mlff_tpu.utils import cache as uc


def _make_tarball(tmp_path, names):
    src = tmp_path / "entries"
    src.mkdir()
    for n in names:
        (src / n).write_bytes(b"x" * 64)
    tb = tmp_path / "seed.tar.gz"
    with tarfile.open(tb, "w:gz") as tf:
        for n in names:
            tf.add(src / n, arcname=n)
    return tb


def test_seed_from_tarball_populates(tmp_path, monkeypatch):
    names = [f"jit_fn-{i:064x}-cache" for i in range(5)]
    tb = _make_tarball(tmp_path, names)
    # seed_dir WITHOUT the .tar.gz suffix: the tarball branch appends it
    seed_dir = str(tb)[: -len(".tar.gz")]
    cache_dir = tmp_path / "active"
    n = uc.seed_compile_cache(str(cache_dir), seed_dir=seed_dir)
    assert n == 5
    assert sorted(os.listdir(cache_dir)) == sorted(names)
    # idempotent: existing entries are not re-copied
    assert uc.seed_compile_cache(str(cache_dir), seed_dir=seed_dir) == 0


def test_seed_off_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("MLFF_TPU_SEED_CACHE", "off")
    assert uc.seed_compile_cache(str(tmp_path / "x")) == 0


def test_repo_ships_tarball_not_loose_blobs():
    """The repo-root seed must be the single tarball; the loose .jax_cache
    directory must NOT be in git (it may exist locally as scratch)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tracked = subprocess.run(
        ["git", "ls-files", ".jax_cache", ".jax_cache.tar.gz"],
        cwd=root, capture_output=True, text=True).stdout.splitlines()
    loose = [t for t in tracked if t.startswith(".jax_cache/")]
    assert not loose, f"{len(loose)} loose cache blobs still tracked"
    if not any(t == ".jax_cache.tar.gz" for t in tracked):
        pytest.skip("seed tarball not yet shipped (packed at end of round)")


def test_repo_tarball_extracts(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tb = os.path.join(root, ".jax_cache.tar.gz")
    if not os.path.isfile(tb):
        pytest.skip("seed tarball not yet shipped")
    cache_dir = tmp_path / "active"
    n = uc.seed_compile_cache(
        str(cache_dir), seed_dir=tb[: -len(".tar.gz")])
    assert n > 0
    assert len(os.listdir(cache_dir)) == n
