"""Task decompositions: linker / fragment / scaffold / side chain.

Pure-python rewrite of the reference decomposition toolkit
(reference: repo/datasets/parsers/molecule_parser.py:213-383 linker/
fragment/scaffold/sidechain_decomp + frag.py fragmentize/linkerize/
Murcko_decompose). The SMARTS cut pattern
``[#6+0;!$(*=,#[!#6])]!@!=!#[*]`` selects acyclic single bonds from
uncharged carbons not doubly bonded to heteroatoms — reproduced here with
graph predicates on the Molecule bond graph.

Each function returns (gen_index, ctx_index) over the ligand's atoms.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .mol import Molecule


def _cuttable_bonds(mol: Molecule) -> List[Tuple[int, int]]:
    """Acyclic single bonds matching the reference SMARTS cut pattern."""
    rings = mol.rings()
    ring_bonds = set()
    for r in rings:
        rs = set(r)
        for (i, j) in mol.bonds:
            if i in rs and j in rs:
                ring_bonds.add((i, j))
    out = []
    for (i, j), cls in mol.bonds.items():
        if cls != 1 or (i, j) in ring_bonds:
            continue
        # at least one end is a carbon without double/triple bond to a
        # heteroatom (the !$(*=,#[!#6]) predicate)
        def carbon_ok(a):
            if int(mol.atomic_numbers[a]) != 6:
                return False
            for (x, y), c2 in mol.bonds.items():
                if a in (x, y) and c2 in (2, 3):
                    other = y if x == a else x
                    if int(mol.atomic_numbers[other]) != 6:
                        return False
            return True
        if carbon_ok(i) or carbon_ok(j):
            out.append((i, j))
    return out


def _components_without(mol: Molecule, removed: List[Tuple[int, int]]):
    adj = [[] for _ in range(mol.num_atoms)]
    rm = set(removed) | set((b, a) for a, b in removed)
    for (i, j) in mol.bonds:
        if (i, j) not in rm:
            adj[i].append(j)
            adj[j].append(i)
    seen = [False] * mol.num_atoms
    comps = []
    for s in range(mol.num_atoms):
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
    return comps


def murcko_scaffold(mol: Molecule) -> np.ndarray:
    """Atom indices of the Murcko scaffold: iteratively strip terminal
    (degree-1) atoms outside rings (reference: frag.py:60-70)."""
    keep = np.ones(mol.num_atoms, bool)
    ring_atoms = set(a for r in mol.rings() for a in r)
    changed = True
    while changed:
        changed = False
        deg = np.zeros(mol.num_atoms, int)
        for (i, j) in mol.bonds:
            if keep[i] and keep[j]:
                deg[i] += 1
                deg[j] += 1
        for a in range(mol.num_atoms):
            if keep[a] and deg[a] <= 1 and a not in ring_atoms:
                keep[a] = False
                changed = True
    if not keep.any():        # acyclic molecule: no scaffold
        return np.zeros(0, int)
    return np.where(keep)[0]


def linker_decomp(mol: Molecule, rng: np.random.Generator,
                  min_frag: int = 2, min_linker: int = 1,
                  max_tries: int = 30) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Two cuts isolating a middle linker: gen = linker atoms, ctx = the two
    flanking fragments (reference: molecule_parser.py:213-267)."""
    bonds = _cuttable_bonds(mol)
    if len(bonds) < 2:
        return None
    for _ in range(max_tries):
        k = rng.choice(len(bonds), 2, replace=False)
        cuts = [bonds[k[0]], bonds[k[1]]]
        comps = _components_without(mol, cuts)
        if len(comps) != 3:
            continue
        # the linker touches both cuts
        cut_atoms = set(a for c in cuts for a in c)
        linker = None
        for c in comps:
            touched = sum(1 for cut in cuts if set(cut) & set(c))
            if touched == 2:
                linker = c
        if linker is None or len(linker) < min_linker:
            continue
        others = [c for c in comps if c is not linker]
        if any(len(c) < min_frag for c in others):
            continue
        gen = np.array(sorted(linker), int)
        ctx = np.array(sorted(a for c in others for a in c), int)
        return gen, ctx
    return None


def fragment_decomp(mol: Molecule, rng: np.random.Generator,
                    min_frag: int = 3, max_tries: int = 30
                    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """One cut: ctx = one fragment (kept), gen = the grown part
    (reference: molecule_parser.py:269-313)."""
    bonds = _cuttable_bonds(mol)
    if not bonds:
        return None
    for _ in range(max_tries):
        cut = bonds[int(rng.integers(0, len(bonds)))]
        comps = _components_without(mol, [cut])
        if len(comps) != 2:
            continue
        if min(len(c) for c in comps) < min_frag:
            continue
        comps.sort(key=len)
        ctx = np.array(comps[-1] if rng.random() < 0.5 else comps[0], int)
        gen = np.array(sorted(set(range(mol.num_atoms)) - set(ctx)), int)
        return gen, ctx
    return None


def scaffold_decomp(mol: Molecule) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Scaffold hopping: gen = Murcko scaffold, ctx = side chains
    (reference: molecule_parser.py:314-348)."""
    scaf = murcko_scaffold(mol)
    if len(scaf) == 0 or len(scaf) == mol.num_atoms:
        return None
    ctx = np.array(sorted(set(range(mol.num_atoms)) - set(scaf)), int)
    return np.asarray(scaf, int), ctx


def sidechain_decomp(mol: Molecule) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Side-chain decoration: gen = side chains, ctx = scaffold
    (reference: molecule_parser.py:349-383)."""
    out = scaffold_decomp(mol)
    if out is None:
        return None
    scaf, side = out
    return side, scaf
