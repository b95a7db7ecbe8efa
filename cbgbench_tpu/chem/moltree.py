"""Junction-tree (motif) decomposition of molecules, pure python.

Rewrite of the reference mol-tree machinery (reference:
repo/datasets/parsers/mol_tree.py + repo/utils/chemutils.py tree_decomp):
cliques are SSSR rings plus non-ring bonds; rings sharing >= 3 atoms merge.
Motifs are identified by a canonical SIGNATURE (element multiset + bond
multiset + ring size) instead of RDKit canonical SMILES — equivalent role
as a vocabulary key, computable without RDKit.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

from ..constants.molecule import MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL
from .mol import Molecule


def tree_decomp(mol: Molecule) -> Tuple[List[List[int]], List[Tuple[int, int]]]:
    """-> (cliques, tree edges between clique ids)."""
    n = mol.num_atoms
    rings = [sorted(r) for r in mol.rings()]
    # merge rings sharing >= 3 atoms (bridged/fused treated as one motif)
    merged = True
    while merged:
        merged = False
        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                if len(set(rings[i]) & set(rings[j])) >= 3:
                    rings[i] = sorted(set(rings[i]) | set(rings[j]))
                    rings.pop(j)
                    merged = True
                    break
            if merged:
                break
    ring_atoms = set(a for r in rings for a in r)
    cliques = list(rings)
    for (i, j) in mol.bonds:
        in_same_ring = any(i in r and j in r for r in rings)
        if not in_same_ring:
            cliques.append(sorted([i, j]))
    if not cliques:           # single atom molecule
        cliques = [[i] for i in range(n)]

    # tree edges: cliques sharing an atom
    edges = []
    for a in range(len(cliques)):
        for b in range(a + 1, len(cliques)):
            if set(cliques[a]) & set(cliques[b]):
                edges.append((a, b))
    return cliques, edges


def motif_signature(mol: Molecule, clique: List[int]) -> str:
    """Canonical motif key: element counts + bond-class counts + size."""
    syms = sorted(MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL.get(
        int(mol.atomic_numbers[a]), "X") for a in clique)
    cs = set(clique)
    bonds = sorted(cls for (i, j), cls in mol.bonds.items()
                   if i in cs and j in cs)
    is_ring = len(bonds) >= len(clique)
    return "".join(syms) + "|" + "".join(map(str, bonds)) + \
        ("|R" if is_ring else "")


class MotifVocab:
    """Data-built motif vocabulary (reference: repo/utils/molecule/vocab.py
    loads a fixed vocab.txt; here the vocabulary is harvested from the
    training molecules, with mean template geometry per motif)."""

    def __init__(self):
        self.key_to_id: Dict[str, int] = {}
        self.templates: Dict[int, dict] = {}
        self.counts: Dict[int, int] = {}   # corpus occurrence frequency

    def size(self) -> int:
        return len(self.key_to_id)

    def add(self, mol: Molecule, clique: List[int]) -> int:
        key = motif_signature(mol, clique)
        if key in self.key_to_id:
            wid0 = self.key_to_id[key]
            self.counts[wid0] += 1
            # harvest up to 8 INSTANCE geometries per motif: a single
            # template makes every draw of a motif bit-identical, so
            # ring-heavy sampling (motif prior) collapses whole
            # bond-length histogram bins to delta peaks (measured
            # q5_flag_prior: JSD_BL 0.56 vs 0.38 with mixed draws);
            # samplers draw one instance per growth step instead
            tmpl = self.templates[wid0]
            insts = tmpl.setdefault("instances", [tmpl["pos"]])
            if len(insts) < 8:
                from ..constants.molecule import MAX_VALENCE

                def free_val(a):
                    inside = sum(min(cls, 3)
                                 for (i, j), cls in mol.bonds.items()
                                 if a in (i, j) and i in clique
                                 and j in clique)
                    mx = MAX_VALENCE.get(int(mol.atomic_numbers[a]), 4)
                    return mx - inside

                idx = sorted(clique, key=free_val, reverse=True)
                if list(mol.atomic_numbers[idx]) == list(tmpl["z"]):
                    insts.append(
                        (mol.pos[idx] - mol.pos[idx].mean(0)).copy())
        if key not in self.key_to_id:
            wid = len(self.key_to_id)
            self.key_to_id[key] = wid
            # store a centered template geometry + topology; atom 0 is the
            # graft atom in candidate/assembly graphs (flag_data.py:156,
            # flag_sample.py), so order the clique by descending free
            # valence to keep grafts chemically attachable
            from ..constants.molecule import MAX_VALENCE

            def free_val(a):
                inside = sum(min(cls, 3)
                             for (i, j), cls in mol.bonds.items()
                             if a in (i, j) and i in clique and j in clique)
                mx = MAX_VALENCE.get(int(mol.atomic_numbers[a]), 4)
                return mx - inside

            idx = sorted(clique, key=free_val, reverse=True)
            pos = mol.pos[idx] - mol.pos[idx].mean(0)
            remap = {a: k for k, a in enumerate(idx)}
            bonds = {(remap[i], remap[j]): cls
                     for (i, j), cls in mol.bonds.items()
                     if i in remap and j in remap}
            self.templates[wid] = {
                "z": mol.atomic_numbers[idx].copy(), "pos": pos.copy(),
                "bonds": bonds, "key": key,
                "graft_free_valence": free_val(idx[0]),
            }
            self.counts[wid] = 1
        return self.key_to_id[key]

    def get(self, mol: Molecule, clique: List[int]) -> int:
        return self.key_to_id.get(motif_signature(mol, clique), -1)

    @staticmethod
    def build(mols: List[Molecule]) -> "MotifVocab":
        vocab = MotifVocab()
        for m in mols:
            cliques, _ = tree_decomp(m)
            for c in cliques:
                vocab.add(m, c)
        return vocab


def bfs_motif_order(cliques: List[List[int]], edges,
                    start: int, rng: np.random.Generator) -> List[int]:
    """BFS over the clique tree from the start clique."""
    nbrs = {i: [] for i in range(len(cliques))}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    queue = [start]
    visited = {start}
    order = []
    while queue:
        cur = queue.pop(0)
        order.append(cur)
        cand = [v for v in nbrs[cur] if v not in visited]
        rng.shuffle(cand)
        for v in cand:
            visited.add(v)
        queue += cand
    for i in range(len(cliques)):
        if i not in visited:
            order.append(i)
    return order
