"""mlff_tpu — TPU-native framework for preconditioned kernel ML force fields.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bluecher31/mlff-preconditioner (the companion code of "Reconstructing
Kernel-Based Machine Learning Force Fields with Superlinear Convergence",
JCTC 19(14):4619-4630, 2023): sGDML kernel ridge regression solved with
preconditioned conjugate gradients and a zoo of low-rank preconditioners.

Design notes (vs. the reference, see SURVEY.md):
  * All kernel math lives in descriptor space and reduces to dense matmuls
    (MXU-friendly); distance/exponential matrices are precomputed once per
    solve instead of per CG iteration.
  * The PSD convention is used throughout: we solve (K + lam*I) alpha = y
    with K positive semi-definite.  The reference assembles -K and runs
    cg(-K_op, y) followed by a sign flip (reference
    sgdml/solvers/iterative_solver.py:995-1009); the mapping is
    alphas_ref = -alphas_ours at the model boundary.
  * float64 is enabled package-wide: kernel conditioning (lam as small as
    1e-10 against ~10 decades of spectrum) requires it for the CG state and
    factorizations.  Mixed-precision fast paths are explicit opt-ins.
"""

import os

import jax

# Kernel conditioning requires f64 state (see module docstring).
jax.config.update("jax_enable_x64", True)

# NOTE on f32 matmul precision: TPU f32 matmuls default to single-pass bf16
# (~3 decimal digits).  The f32-sensitive paths (pallas_predict, ir_cg) set
# Precision.HIGHEST explicitly; a global jax_default_matmul_precision flag
# is deliberately NOT set — it changes every compiled module's cache key and
# invalidates the persistent compile cache wholesale.

# Persistent compilation cache: TPU (re)compiles through remote-compile
# tunnels cost minutes; cache them across processes.  Override the location
# with MLFF_TPU_COMPILE_CACHE, or set it to "off" to disable.
_cache_dir = os.environ.get(
    "MLFF_TPU_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "mlff_tpu_jax"),
)
def _stabilize_cache_key() -> None:
    """Drop the volatile build stamp from the compile-cache key.

    The axon TPU tunnel's ``platform_version`` ends with a per-server-build
    line ``Built on <date> (<epoch>) cl/<number>``; reconnecting to a
    different server replica changes it and silently invalidates the entire
    persistent compile cache (observed: a tunnel restart between two bench
    runs re-keyed all 54 bench-path executables).  Executable compatibility
    is governed by the ``SerializedExecutable vN; compile-cache vN; compat
    cN`` fields, which stay in the key; only the build stamp is stripped.
    """
    import re

    try:
        from jax._src import cache_key as _ck

        _orig = _ck._hash_platform
        _hash_string = _ck._hash_string

        def _hash_platform_stable(hash_obj, backend):
            version = re.sub(r"Built on .*", "", backend.platform_version).strip()
            _hash_string(hash_obj, backend.platform)
            _hash_string(hash_obj, version)

        _hash_platform_stable._mlff_orig = _orig  # for tests/unpatching
        _ck._hash_platform = _hash_platform_stable
    except (ImportError, AttributeError):  # pragma: no cover
        # jax._src internals are unstable API: on a rename/removal fall back
        # to the unpatched key (a slower cache miss, never an import crash)
        return


if _cache_dir.lower() != "off":
    _stabilize_cache_key()
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # by default jax points the (GPU-only) per-fusion autotune cache at a
    # subdirectory of the compilation cache — and that PATH is hashed into
    # every cache key, so entries built under one cache location silently
    # miss under another (this is exactly how a shipped seed cache dies).
    # Root-caused via per-component key hashing: identical computation/
    # backend/flags hashes, compile_options differing only in
    # xla_gpu_per_fusion_autotune_cache_dir.  Irrelevant on TPU: disable.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)  # the remote-compile tunnel makes even tiny eager ops cost ~0.5 s each
    # keep source locations/tracebacks out of the lowered IR: they shift on
    # every source edit and silently invalidate the persistent cache keys
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    # bound the cache's disk growth (LRU eviction, at most once per day)
    from .utils.cache import maybe_prune_compile_cache as _prune
    from .utils.cache import seed_compile_cache as _seed

    _prune(_cache_dir)
    # seed from the repo-shipped executable cache (cold-start product path;
    # see utils/cache.py:seed_compile_cache) — after pruning, so freshly
    # seeded entries are never the eviction victims of the same import
    _seed(_cache_dir)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import mlff_tpu` light)."""
    if name == "Trainer":
        from .models.gdml import Trainer
        return Trainer
    if name == "Predictor":
        from .models.predict import Predictor
        return Predictor
    if name == "create_task":
        from .models.task import create_task
        return create_task
    if name == "make_dataset":
        from .data.synthetic import make_dataset
        return make_dataset
    if name == "evaluate":
        from .models.evaluate import evaluate
        return evaluate
    raise AttributeError(name)
