"""Minimal host-side molecule representation (pure python/numpy).

The image carries no RDKit/OpenBabel; this module provides the small slice
of cheminformatics the framework needs host-side: elements + coordinates +
bond graph, ring perception, valence accounting, fragment analysis. When
RDKit *is* available (user environments), cbgbench_tpu.chem.rdkit_bridge
upgrades reconstruction/scoring to exact reference behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..constants.molecule import (MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL,
                                  MAX_VALENCE, SYMBOL_TO_Z)

BOND_ORDER = {1: 1.0, 2: 2.0, 3: 3.0, 4: 1.5}  # class -> valence weight


@dataclass
class Molecule:
    atomic_numbers: np.ndarray                 # [N] int
    pos: np.ndarray                            # [N, 3] float
    bonds: Dict[Tuple[int, int], int] = field(default_factory=dict)
    # bond key is (i, j) with i < j; value is bond class (1/2/3/4=aromatic)
    aromatic: Optional[np.ndarray] = None      # [N] bool (model prediction)
    name: str = ""

    def __post_init__(self):
        self.atomic_numbers = np.asarray(self.atomic_numbers, int)
        self.pos = np.asarray(self.pos, float)

    @property
    def num_atoms(self) -> int:
        return len(self.atomic_numbers)

    def symbols(self) -> List[str]:
        return [MAP_ATOMIC_NUMBER_TO_ATOM_SYMBOL.get(int(z), "C")
                for z in self.atomic_numbers]

    def add_bond(self, i: int, j: int, order: int = 1):
        if i == j:
            return
        key = (min(i, j), max(i, j))
        self.bonds[key] = order

    def remove_bond(self, i: int, j: int):
        self.bonds.pop((min(i, j), max(i, j)), None)

    def neighbors(self) -> List[List[int]]:
        adj: List[List[int]] = [[] for _ in range(self.num_atoms)]
        for (i, j) in self.bonds:
            adj[i].append(j)
            adj[j].append(i)
        return adj

    def bond_valence(self, i: int) -> float:
        """Sum of bond orders at atom i (aromatic counts 1.5)."""
        total = 0.0
        for (a, b), cls in self.bonds.items():
            if a == i or b == i:
                total += BOND_ORDER.get(cls, 1.0)
        return total

    def degree(self, i: int) -> int:
        return sum(1 for (a, b) in self.bonds if a == i or b == i)

    # ------------------------------------------------------------------

    def fragments(self) -> List[List[int]]:
        """Connected components (sorted largest first)."""
        adj = self.neighbors()
        seen = [False] * self.num_atoms
        comps = []
        for s in range(self.num_atoms):
            if seen[s]:
                continue
            stack, comp = [s], []
            seen[s] = True
            while stack:
                u = stack.pop()
                comp.append(u)
                for v in adj[u]:
                    if not seen[v]:
                        seen[v] = True
                        stack.append(v)
            comps.append(sorted(comp))
        comps.sort(key=len, reverse=True)
        return comps

    def rings(self, max_size: int = 8) -> List[List[int]]:
        """Smallest-set-of-smallest-rings approximation via per-edge BFS:
        for each bond, the shortest cycle through it (≤ max_size)."""
        adj = self.neighbors()
        found: Set[frozenset] = set()
        rings = []
        for (i, j) in self.bonds:
            # shortest path i->j avoiding the direct edge
            prev = {i: None}
            frontier = [i]
            depth = 0
            hit = None
            while frontier and depth < max_size and hit is None:
                nxt = []
                for u in frontier:
                    for v in adj[u]:
                        if u == i and v == j:
                            continue
                        if v not in prev:
                            prev[v] = u
                            if v == j:
                                hit = v
                                break
                            nxt.append(v)
                    if hit:
                        break
                frontier = nxt
                depth += 1
            if hit is not None:
                path = [j]
                while path[-1] is not None and prev[path[-1]] is not None:
                    path.append(prev[path[-1]])
                path.append(i) if path[-1] != i else None
                ring = [a for a in path if a is not None]
                key = frozenset(ring)
                if len(ring) <= max_size and key not in found:
                    found.add(key)
                    rings.append(ring)
        return rings

    def extract(self, idx: List[int]) -> "Molecule":
        """Sub-molecule on the given atom indices (bonds relabeled)."""
        remap = {a: k for k, a in enumerate(idx)}
        sub = Molecule(self.atomic_numbers[idx], self.pos[idx], name=self.name)
        for (i, j), cls in self.bonds.items():
            if i in remap and j in remap:
                sub.add_bond(remap[i], remap[j], cls)
        if self.aromatic is not None:
            sub.aromatic = np.asarray(self.aromatic)[idx]
        return sub

    def valence_ok(self, slack: float = 0.0) -> bool:
        for i, z in enumerate(self.atomic_numbers):
            mx = MAX_VALENCE.get(int(z))
            if mx is None:
                continue
            if int(z) == 7 and self.bond_valence(i) <= 4.0:
                # quaternary/protonated nitrogen: 4 single bonds is valid
                # chemistry as N+ — the reference's RDKit path assigns the
                # formal charge and sanitizes (rdkit_utils.py
                # postprocess_rd_mol_2); crystal amines (e.g. 6CM4's
                # risperidone-like N) otherwise fail every pose that
                # includes them (q5_p2m_frag pocket 3 read 0/100 valid)
                continue
            if self.bond_valence(i) > mx + slack:
                return False
        return True

    def formula(self) -> str:
        from collections import Counter
        c = Counter(self.symbols())
        parts = []
        for sym in sorted(c, key=lambda s: (s != "C", s != "H", s)):
            n = c[sym]
            parts.append(sym + (str(n) if n > 1 else ""))
        return "".join(parts)


def bond_index_arrays(mol: Molecule):
    """-> (bond_index [2, 2E] both directions, bond_type [2E]) like the
    reference parsers (molecule_parser.py:17-90)."""
    if not mol.bonds:
        return np.zeros((2, 0), int), np.zeros((0,), int)
    src, dst, typ = [], [], []
    for (i, j), cls in sorted(mol.bonds.items()):
        src += [i, j]
        dst += [j, i]
        typ += [cls, cls]
    return np.stack([np.array(src), np.array(dst)]), np.array(typ)
