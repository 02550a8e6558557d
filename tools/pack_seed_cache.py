"""Pack the bench-path compile-cache entries into the repo seed tarball.

Replaces the 108 loose ``.jax_cache/`` blobs in git with ONE artifact
(``.jax_cache.tar.gz``) that ``mlff_tpu.utils.cache.seed_compile_cache``
already knows how to extract (one object to replace per cache re-key event
instead of a hundred loose files in history).

Selection: entries in the ACTIVE cache (~/.cache/mlff_tpu_jax) whose
function name matches the bench execution path (build/assembly/factor/CG/
ozaki/predict families) and whose mtime is within --days (default 3) — the
current code generation.  Run right after a full ``python bench.py`` so
the final configuration's executables are present and fresh.

    python tools/pack_seed_cache.py [--days 3] [--dry-run]

The tightest working set comes from an isolated run instead of name
filters: point the package at a FRESH cache dir, run the bench once (every
executable remote-compiles), then pack that directory wholesale:

    MLFF_TPU_COMPILE_CACHE=/tmp/seedcache MLFF_TPU_SEED_CACHE=off \\
        python bench.py
    python tools/pack_seed_cache.py --cache-dir /tmp/seedcache --all
"""

import argparse
import json
import os
import re
import sys
import tarfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".jax_cache.tar.gz")

# function-name families on the bench critical path
_BENCH_FAMILIES = (
    "jit_build_cache", "jit__assemble_columns_grouped", "jit_run",
    "jit__point_blocks_chunk", "jit_matvec_psd", "jit_matvec_ref",
    "jit__matvec_ref", "jit__gather_rows", "jit__unpack", "jit__whiten",
    "jit__gram", "jit_woodbury", "jit_ozaki", "jit__ozaki",
    "jit_ozaki_woodbury_apply", "jit__gram_entries_df64", "jit__put",
    "jit_slice_digits", "jit__desc", "jit_descriptors", "jit__columns",
    "jit_d_desc", "jit_vec_dot", "jit_perm_expand", "jit__predict_batch",
    "jit_kernel_diag", "jit__colwise", "jit__broadcast_arrays",
    "jit_fn", "jit__lambda_", "jit_matmul", "jit__sum", "jit__norm",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=3.0)
    ap.add_argument("--cache-dir",
                    default=os.path.expanduser("~/.cache/mlff_tpu_jax"))
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="pack every entry in --cache-dir (the isolated "
                         "fresh-run working set), no name/age filter")
    args = ap.parse_args()

    cutoff = time.time() - args.days * 86400.0
    pat = re.compile("^(" + "|".join(re.escape(f) for f in _BENCH_FAMILIES)
                     + ")-")
    picked = []
    total = 0
    with os.scandir(args.cache_dir) as it:
        for e in it:
            if not e.is_file():
                continue
            if not args.all and not pat.match(e.name):
                continue
            st = e.stat()
            if not args.all and st.st_mtime < cutoff:
                continue
            picked.append((e.name, e.path, st.st_size))
            total += st.st_size
    picked.sort()
    print(json.dumps({"entries": len(picked), "bytes": total}),
          file=sys.stderr)
    if args.dry_run:
        for name, _, size in picked:
            print(f"{size:>10d}  {name}")
        return
    with tarfile.open(OUT, "w:gz") as tf:
        for name, path, _ in picked:
            tf.add(path, arcname=name)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB, "
          f"{len(picked)} entries)")


if __name__ == "__main__":
    main()
