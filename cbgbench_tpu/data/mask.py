"""Ligand masking machinery (host-side numpy).

Carves a ligand into (context, masked) subsets for AR training and the
decomposition tasks (reference: repo/datasets/transforms/mask.py:64-258).
Operates on numpy ligand dicts {pos, atype, bond_index, bond_type, ...};
`ctx_flag` entries are never masked (decomp tasks).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def neighbor_lists(n: int, bond_index: np.ndarray):
    nbrs = [[] for _ in range(n)]
    if bond_index is not None and bond_index.size:
        for a, b in zip(bond_index[0], bond_index[1]):
            nbrs[int(a)].append(int(b))
    return nbrs


def bfs_perm(n: int, bond_index: np.ndarray, rng: np.random.Generator):
    nbrs = neighbor_lists(n, bond_index)
    start = int(rng.integers(0, n))
    queue = [start]
    visited = {start}
    perm = []
    while queue:
        cur = queue.pop(0)
        perm.append(cur)
        cand = [v for v in nbrs[cur] if v not in visited]
        rng.shuffle(cand)
        for v in cand:
            visited.add(v)
        queue += cand
    # disconnected leftovers (shouldn't happen for valid molecules)
    for i in range(n):
        if i not in visited:
            perm.append(i)
    return np.array(perm, int)


def _num_masked(n: int, rng, min_ratio, max_ratio, min_num_masked,
                min_num_unmasked) -> int:
    ratio = float(np.clip(rng.uniform(min_ratio, max_ratio), 0.0, 1.0))
    num = int(n * ratio)
    num = max(num, min_num_masked)
    if n - num < min_num_unmasked:
        num = n - min_num_unmasked
    return int(np.clip(num, 0, n))


def random_mask(n: int, bond_index, rng, min_ratio=0.0, max_ratio=1.2,
                min_num_masked=1, min_num_unmasked=0,
                ctx_flag: Optional[np.ndarray] = None):
    num = _num_masked(n, rng, min_ratio, max_ratio, min_num_masked,
                      min_num_unmasked)
    perm = rng.permutation(n)
    masked = perm[:num]
    context = perm[num:]
    return _apply_ctx_flag(n, masked, context, ctx_flag)


def bfs_mask(n: int, bond_index, rng, min_ratio=0.0, max_ratio=1.2,
             min_num_masked=1, min_num_unmasked=0, inverse=False,
             ctx_flag: Optional[np.ndarray] = None):
    perm = bfs_perm(n, bond_index, rng)
    num = _num_masked(n, rng, min_ratio, max_ratio, min_num_masked,
                      min_num_unmasked)
    if inverse:
        masked, context = perm[:num], perm[num:]
    else:
        masked, context = perm[n - num:], perm[:n - num]
    return _apply_ctx_flag(n, masked, context, ctx_flag)


def mixed_mask(n: int, bond_index, rng, min_ratio=0.0, max_ratio=1.2,
               min_num_masked=1, min_num_unmasked=0, p_random=0.5,
               p_bfs=0.25, p_invbfs=0.25, ctx_flag=None):
    u = rng.random()
    if u < p_random:
        return random_mask(n, bond_index, rng, min_ratio, max_ratio,
                           min_num_masked, min_num_unmasked, ctx_flag)
    if u < p_random + p_bfs:
        return bfs_mask(n, bond_index, rng, min_ratio, max_ratio,
                        min_num_masked, min_num_unmasked, False, ctx_flag)
    return bfs_mask(n, bond_index, rng, min_ratio, max_ratio,
                    min_num_masked, min_num_unmasked, True, ctx_flag)


def _apply_ctx_flag(n, masked, context, ctx_flag):
    """Atoms with ctx_flag set always stay in the context
    (reference: mask.py:156-169)."""
    if ctx_flag is not None and ctx_flag.any():
        keep = np.zeros(n, bool)
        keep[context] = True
        keep[ctx_flag] = True
        context = np.where(keep)[0]
        masked = np.where(~keep)[0]
    return np.asarray(masked, int), np.asarray(context, int)


def count_bond_neighbors(n: int, bond_index) -> np.ndarray:
    cnt = np.zeros(n, int)
    if bond_index is not None and bond_index.size:
        for a in bond_index[0]:
            cnt[int(a)] += 1
    return cnt


def subgraph_bonds(bond_index, bond_type, keep_idx: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Bonds among keep_idx, relabeled to the new compact indexing."""
    if bond_index is None or not bond_index.size:
        return np.zeros((2, 0), int), np.zeros((0,), int)
    keep_set = {int(i): k for k, i in enumerate(keep_idx)}
    src, dst, typ = [], [], []
    for k in range(bond_index.shape[1]):
        a, b = int(bond_index[0, k]), int(bond_index[1, k])
        if a in keep_set and b in keep_set:
            src.append(keep_set[a])
            dst.append(keep_set[b])
            typ.append(int(bond_type[k]))
    return np.stack([np.array(src, int), np.array(dst, int)]) if src else \
        np.zeros((2, 0), int), np.array(typ, int)
