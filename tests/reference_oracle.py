"""Import the read-only reference implementation (/root/reference) as a
numerical oracle for parity tests.

The reference targets Python 3.7 / NumPy 1.x; we shim the removed NumPy
aliases before importing.  Nothing from the reference is copied into the
framework — it is only *called* here to produce expected values.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/sGDML")

# NumPy 2.x removed these aliases the 2018-era reference relies on.
for _name, _val in [("int", int), ("bool", bool), ("float", float),
                    ("object", object), ("str", str)]:
    if not hasattr(np, _name):
        setattr(np, _name, _val)
if not hasattr(np.random, "random_integers"):
    np.random.random_integers = lambda lo, hi=None, size=None: np.random.randint(
        lo, (hi + 1) if hi is not None else None, size
    )

if str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

try:
    from sgdml.utils.desc import Desc as RefDesc  # noqa: F401
    from sgdml.utils import desc as ref_desc_mod  # noqa: F401
    import sgdml.train as ref_train_mod  # noqa: F401

    HAVE_REFERENCE = True
except Exception as _e:  # pragma: no cover
    HAVE_REFERENCE = False
    _import_error = _e

requires_reference = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="reference implementation not importable"
)


def ref_gdml_train(max_processes: int = 2):
    """A GDMLTrain instance from the reference (oracle only)."""
    from sgdml.train import GDMLTrain

    return GDMLTrain(max_processes=max_processes)


def tril_perms_lin_from(perms: np.ndarray, n_atoms: int) -> np.ndarray:
    """Build the reference's flattened permutation index array from an atom
    permutation stack, exactly as reference train.py:783-790 does."""
    ref = RefDesc(n_atoms)
    tril_perms = np.array([ref.perm(p) for p in perms])
    dim_d = (n_atoms * (n_atoms - 1)) // 2
    n_perms = perms.shape[0]
    perm_offsets = np.arange(n_perms)[:, None] * dim_d
    return (tril_perms + perm_offsets).flatten("F")


def ref_assemble_K(R_desc, R_d_desc, perms, sig, n_atoms, col_idxs=np.s_[:]):
    """Reference kernel assembly (negative-definite convention)."""
    gdml = ref_gdml_train()
    desc = RefDesc(n_atoms)
    tpl = tril_perms_lin_from(perms, n_atoms)
    K = gdml._assemble_kernel_mat(
        R_desc, R_d_desc, tpl, sig, desc,
        use_E_cstr=False, col_idxs=col_idxs,
        callback=lambda *a, **k: None,
    )
    return np.asarray(K)
