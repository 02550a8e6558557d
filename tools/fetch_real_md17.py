"""Fetch + verify the reference's real benchmark datasets (MD17 + AIMS).

This environment has ZERO network egress (documented in
mlff_tpu/data/get.py) — every repo result is synthetic-calibrated, and the
5%-band real-data iteration-parity north star is unverifiable here.  This
script is the on-ramp for the first user WITH network: one command turns
"npz appears" into the 7-molecule real-data parity table.

  python tools/fetch_real_md17.py --dir ~/mlff_data            # download all
  python tools/fetch_real_md17.py --dir ~/mlff_data --verify-only
  python tools/run_parity.py --real-data ~/mlff_data           # then parity

File naming follows the reference exactly
(/root/reference/src/tools/create_data.py:24-38): '<name>_dft.npz' for the
MD17-family molecules, 'aims_catcher.npz' and 'larger_aims_nanotube.npz'
for the AIMS systems.  Download source is the reference's own base URL
(sgdml/get.py:45-48, http://www.quantum-machine.org/gdml/data/npz/).

Integrity: the sGDML npz schema carries its own fingerprint — an md5 over
the sorted array contents ('md5' key, recomputed by
mlff_tpu.utils.io.dataset_md5 with reference-identical semantics).  Each
fetched file is verified by recomputing that fingerprint from the arrays
and comparing it to the stored one; a transport-corrupted or truncated
file cannot pass.  (There is no out-of-band md5 pin list: the reference
publishes none, and inventing pins without network access to the real
files would be fiction.  The internal fingerprint is the reference's own
integrity mechanism.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE_URL = "http://www.quantum-machine.org/gdml/data/npz/"

# molecule -> reference filename (create_data.py:24-38)
DATASET_FILES = {
    "ethanol": "ethanol_dft.npz",
    "uracil": "uracil_dft.npz",
    "toluene": "toluene_dft.npz",
    "aspirin": "aspirin_dft.npz",
    "azobenzene": "azobenzene_dft.npz",
    "catcher": "aims_catcher.npz",
    "nanotube": "larger_aims_nanotube.npz",
}

# expected atom counts (reference create_data.py:56-72) — a cheap schema
# check that catches a wrong-molecule file before any md5 work
N_ATOMS = {
    "ethanol": 9, "uracil": 12, "toluene": 15, "aspirin": 21,
    "azobenzene": 24, "catcher": 88, "nanotube": 370,
}


def verify(path: str, molecule: str) -> tuple[bool, str]:
    """Schema + internal-fingerprint verification of one npz file."""
    from mlff_tpu.utils.io import dataset_md5

    try:
        with np.load(path, allow_pickle=False) as f:
            ds = {k: f[k] for k in f.files}
    except Exception as e:
        return False, f"unreadable ({e!r})"
    for key in ("R", "F", "z"):
        if key not in ds:
            return False, f"missing array {key!r}"
    A = int(ds["z"].shape[0])
    if A != N_ATOMS[molecule]:
        return False, f"atom count {A} != expected {N_ATOMS[molecule]}"
    if ds["R"].shape[1:] != (A, 3) or ds["F"].shape != ds["R"].shape:
        return False, f"shape mismatch R{ds['R'].shape} F{ds['F'].shape}"
    if "md5" in ds:
        want = str(np.asarray(ds["md5"]))
        got = dataset_md5(ds)
        if got != want:
            return False, f"fingerprint mismatch: {got} != stored {want}"
        return True, f"ok ({ds['R'].shape[0]} samples, md5 {got})"
    return True, f"ok ({ds['R'].shape[0]} samples, no stored md5)"


def fetch(molecule: str, out_dir: str, overwrite: bool = False) -> str | None:
    from urllib.request import urlopen

    fn = DATASET_FILES[molecule]
    path = os.path.join(out_dir, fn)
    if os.path.exists(path) and not overwrite:
        return path
    url = BASE_URL + fn
    print(f"fetching {url} ...", flush=True)
    try:
        with urlopen(url, timeout=60) as r, open(path + ".part", "wb") as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
        os.replace(path + ".part", path)
        return path
    except Exception as e:
        print(f"  FAILED: {e!r}", flush=True)
        try:
            os.unlink(path + ".part")
        except OSError:
            pass
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data_real")
    ap.add_argument("--molecules", nargs="*", default=list(DATASET_FILES))
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    n_ok = 0
    for mol in args.molecules:
        path = os.path.join(args.dir, DATASET_FILES[mol])
        if not args.verify_only:
            path = fetch(mol, args.dir, args.overwrite) or path
        if not os.path.exists(path):
            print(f"[{mol}] MISSING {path}", flush=True)
            continue
        ok, msg = verify(path, mol)
        n_ok += ok
        print(f"[{mol}] {'OK  ' if ok else 'FAIL'} {path}: {msg}", flush=True)
    print(f"{n_ok}/{len(args.molecules)} datasets verified", flush=True)
    return 0 if n_ok == len(args.molecules) else 1


if __name__ == "__main__":
    sys.exit(main())
