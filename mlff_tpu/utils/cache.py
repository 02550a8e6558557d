"""Persistent compile-cache size management.

The package points jax_compilation_cache_dir at ~/.cache/mlff_tpu_jax
(mlff_tpu/__init__.py); every distinct computation shape adds an entry
(large fused-factorization graphs are ~45 MB each), so sweeps grow the
cache without bound.  ``prune_compile_cache`` evicts least-recently-USED
entries (access time; falls back to mtime on noatime mounts) down to a
target size.  The package calls it at import at most once per day via a
marker file.
"""

from __future__ import annotations

import os
import time

from .log import get_logger

log = get_logger(__name__)

DEFAULT_MAX_BYTES = 4 << 30          # start evicting above 4 GiB
TARGET_FRACTION = 0.75               # evict down to 75% of the cap
_MARKER = ".last_prune"
_PRUNE_PERIOD_S = 24 * 3600.0


def prune_compile_cache(cache_dir: str | None = None,
                        max_bytes: int = DEFAULT_MAX_BYTES) -> int:
    """Evict least-recently-used cache entries until the directory is under
    ``max_bytes`` * TARGET_FRACTION.  Returns the number of evicted files."""
    if cache_dir is None:
        import jax

        cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir or not os.path.isdir(cache_dir):
        return 0

    entries = []
    total = 0
    with os.scandir(cache_dir) as it:
        for e in it:
            if not e.is_file() or e.name == _MARKER:
                continue
            st = e.stat()
            total += st.st_size
            entries.append((max(st.st_atime, st.st_mtime), st.st_size, e.path))
    if total <= max_bytes:
        return 0

    entries.sort()  # oldest first
    target = int(max_bytes * TARGET_FRACTION)
    evicted = 0
    for _, size, path in entries:
        if total <= target:
            break
        try:
            os.unlink(path)
            total -= size
            evicted += 1
        except OSError:
            pass
    log.info("compile cache pruned: %d entries evicted, now %.1f GiB",
             evicted, total / 2**30)
    return evicted


def maybe_prune_compile_cache(cache_dir: str) -> None:
    """Daily-rate-limited prune, called at package import (cheap: one stat
    unless the marker is stale)."""
    try:
        marker = os.path.join(cache_dir, _MARKER)
        now = time.time()
        try:
            if now - os.stat(marker).st_mtime < _PRUNE_PERIOD_S:
                return
        except OSError:
            pass
        if os.path.isdir(cache_dir):
            with open(marker, "w"):
                pass
            prune_compile_cache(cache_dir)
    except Exception:  # never let cache hygiene break imports
        pass


def seed_compile_cache(cache_dir: str, seed_dir: str | None = None) -> int:
    """Populate the active compile cache from a repo-shipped seed directory.

    Cold time-to-solution is the product: a fresh machine should not pay
    minutes of remote TPU compiles for the executables the benchmark path
    always needs.  The repo ships them (content-addressed, zstd-compressed
    XLA cache entries) in ``.jax_cache/`` at the repo root; this copies any
    missing entries into ``cache_dir`` (hardlinks when possible).  Returns
    the number of entries seeded.

    The seed location can be overridden with MLFF_TPU_SEED_CACHE (set it to
    "off" to disable seeding entirely).
    """
    if seed_dir is None:
        seed_dir = os.environ.get("MLFF_TPU_SEED_CACHE", "")
        if seed_dir.lower() == "off":
            return 0
        if not seed_dir:
            # <pkg>/utils/cache.py -> repo root is two levels up from <pkg>
            pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            seed_dir = os.path.join(pkg_root, ".jax_cache")
    if not os.path.isdir(seed_dir):
        # single-artifact form: the repo ships the seed as one tarball
        # (<seed_dir>.tar.gz) instead of per-entry blobs — one object to
        # replace per re-key event instead of a hundred loose files in git
        # history.  Extract straight into the active cache.
        tarball = seed_dir + ".tar.gz"
        if os.path.isfile(tarball):
            import tarfile

            os.makedirs(cache_dir, exist_ok=True)
            seeded = 0
            try:
                with tarfile.open(tarball, "r:gz") as tf:
                    for member in tf.getmembers():
                        name = os.path.basename(member.name)
                        if not member.isfile() or not name:
                            continue
                        dst = os.path.join(cache_dir, name)
                        if os.path.exists(dst):
                            continue
                        src = tf.extractfile(member)
                        if src is None:
                            continue
                        with open(dst, "wb") as out:
                            out.write(src.read())
                        seeded += 1
            except (OSError, EOFError, tarfile.TarError):  # pragma: no cover
                # EOFError: gzip raises it (not OSError) on a truncated
                # tarball — a corrupt seed must never break package import
                return seeded
            if seeded:
                log.info("compile cache seeded: %d entries from %s",
                         seeded, tarball)
            return seeded
        return 0
    if os.path.realpath(seed_dir) == os.path.realpath(cache_dir):
        return 0

    os.makedirs(cache_dir, exist_ok=True)
    seeded = 0
    with os.scandir(seed_dir) as it:
        for e in it:
            if not e.is_file() or e.name == _MARKER:
                continue
            dst = os.path.join(cache_dir, e.name)
            if os.path.exists(dst):
                continue
            try:
                os.link(e.path, dst)
            except OSError:
                import shutil

                try:
                    shutil.copyfile(e.path, dst)
                except OSError:
                    continue
            seeded += 1
    if seeded:
        log.info("compile cache seeded: %d entries from %s", seeded, seed_dir)
    return seeded
