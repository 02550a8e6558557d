"""Physical atom-permutation (symmetry) recovery.

Rebuild of the reference symmetry finder (reference:
sgdml/utils/perm.py:48-359): pairwise bipartite matching (Hungarian) on
adjacency-spectrum features with a same-species penalty, permutation
synchronization over a minimum spanning tree of match costs, transitive group
closure capped at 100 permutations, and a salvage fallback.

Host-side NumPy/SciPy by design: this is combinatorial preprocessing that
runs once per task; its *output ordering* must be deterministic because the
descriptor permutations change kernel entries one-for-one (SURVEY.md §7.4).
The reference's fork-pool parallelism is replaced by a vectorized O(M^2)
loop — eigendecompositions are batched, matching is the only serial part.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize
import scipy.spatial.distance
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import minimum_spanning_tree

from ..utils.log import get_logger

log = get_logger(__name__)


def _adjacency_features(R: np.ndarray):
    """Per-geometry adjacency (condensed pdist) and eigenvector features,
    sorted by descending eigenvalue (reference perm.py:154-195)."""
    M, n_atoms, _ = R.shape
    adj_set = np.empty((M, n_atoms * (n_atoms - 1) // 2))
    v_set = np.empty((M, n_atoms, n_atoms))
    for i in range(M):
        adj = scipy.spatial.distance.pdist(R[i], "euclidean")
        w, v = np.linalg.eig(scipy.spatial.distance.squareform(adj))
        v = v[:, w.argsort()[::-1]]
        adj_set[i] = adj
        v_set[i] = np.real(v)
    return adj_set, v_set


def bipartite_match(R: np.ndarray, z: np.ndarray):
    """All-pairs Hungarian matching of atoms between geometries
    (reference perm.py:53-233).  Returns (match_perms dict, match_cost csr)."""
    M, n_atoms, _ = R.shape

    same_z_cost = np.repeat(z[:, None], len(z), axis=1) - z
    same_z_cost[same_z_cost != 0] = 1

    adj_set, v_set = _adjacency_features(R)
    match_cost = np.zeros((M, M))
    match_perms = {}

    for i in range(M):
        adj_i = scipy.spatial.distance.squareform(adj_set[i])
        v_i = np.abs(v_set[i])
        for j in range(i + 1, M):
            adj_j = scipy.spatial.distance.squareform(adj_set[j])
            cost = -v_i @ np.abs(v_set[j]).T
            cost += same_z_cost * np.max(np.abs(cost))
            _, perm = scipy.optimize.linear_sum_assignment(cost)

            adj_i_perm = adj_i[perm][:, perm]
            score_before = np.linalg.norm(adj_i - adj_j)
            score = np.linalg.norm(adj_i_perm - adj_j)

            match_cost[i, j] = score if score < score_before else score_before
            if score < score_before and not np.isclose(score_before, score):
                match_perms[i, j] = perm

    match_cost = match_cost + match_cost.T
    match_cost[np.diag_indices_from(match_cost)] = np.inf
    return match_perms, csr_matrix(match_cost)


def sync_perm_mat(match_perms_all: dict, match_cost, n_atoms: int) -> np.ndarray:
    """Keep only the matchings on a minimum spanning tree of the match costs
    (permutation synchronization, reference perm.py:236-257)."""
    tree = minimum_spanning_tree(match_cost, overwrite=True)
    perms = np.arange(n_atoms, dtype=int)[None, :]
    rows, cols = tree.nonzero()
    for edge in zip(rows, cols):
        perm = match_perms_all.get(edge)
        if perm is not None:
            perms = np.vstack((perms, perm))
    return np.unique(perms, axis=0)


def _to_cycles(perm):
    pi = {i: perm[i] for i in range(len(perm))}
    cycles = []
    while pi:
        elem0 = next(iter(pi))
        this_elem = pi[elem0]
        next_item = pi[this_elem]
        cycle = []
        while True:
            cycle.append(this_elem)
            del pi[this_elem]
            this_elem = next_item
            if next_item in pi:
                next_item = pi[next_item]
            else:
                break
        cycles.append(cycle)
    return cycles


def salvage_subgroup(perms: np.ndarray) -> np.ndarray:
    """If closure diverges, keep the permutation of largest cycle-LCM
    (reference perm.py:285-296)."""
    n_perms, n_atoms = perms.shape
    lcms = [
        np.lcm.reduce([len(cy) for cy in _to_cycles(list(perms[i]))])
        for i in range(n_perms)
    ]
    keep = int(np.argmax(lcms))
    return np.vstack((np.arange(n_atoms), perms[keep]))


def complete_sym_group(perms: np.ndarray, n_perms_max: int | None = 100):
    """Transitive closure of the permutation set (reference perm.py:299-334).
    Returns None if the closure exceeds ``n_perms_max`` elements."""
    perm_added = True
    while perm_added:
        perm_added = False
        n_perms = perms.shape[0]
        for i in range(n_perms):
            for j in range(n_perms):
                new_perm = perms[i, perms[j]]
                if not (new_perm == perms).all(axis=1).any():
                    perm_added = True
                    perms = np.vstack((perms, new_perm))
                    if n_perms_max is not None and perms.shape[0] == n_perms_max:
                        return None
    return perms


def find_perms(R: np.ndarray, z: np.ndarray, max_geometries: int = 100) -> np.ndarray:
    """Recover the physical permutation group from sample geometries
    (reference perm.py:337-358).  ``R`` (M, A, 3), ``z`` (A,)."""
    M, n_atoms = R.shape[:2]
    if M > max_geometries:
        # deterministic subset for speed; reference subsamples 1000 randomly
        # at task level (train.py:476-479)
        R = R[np.linspace(0, M - 1, max_geometries).astype(int)]
        M = max_geometries

    match_perms_all, match_cost = bipartite_match(R, z)
    match_perms = sync_perm_mat(match_perms_all, match_cost, n_atoms)

    sym_group_perms = complete_sym_group(match_perms, n_perms_max=100)
    if sym_group_perms is None:
        log.warning("transitive closure failed; salvaging largest subgroup")
        match_perms_subset = salvage_subgroup(match_perms)
        sym_group_perms = complete_sym_group(match_perms_subset, n_perms_max=100)
    log.info("found %d symmetries", sym_group_perms.shape[0])
    return sym_group_perms


def inv_perm(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def find_frag_perms(R: np.ndarray, z: np.ndarray, **kwargs) -> np.ndarray:
    """Permutations of non-bonded molecular fragments
    (reference perm.py:361-527).  The reference gates this behind
    USE_FRAG_PERMS = False (train.py:500) and it requires ASE bond analysis;
    it is optional and unimplemented here — returns the identity set."""
    try:
        import ase  # noqa: F401
    except ImportError:
        log.warning("find_frag_perms requires ASE; returning identity only")
        return np.arange(R.shape[1])[None, :]
    raise NotImplementedError(
        "fragment-permutation search is not implemented yet (the reference "
        "ships it disabled, train.py:500)"
    )
