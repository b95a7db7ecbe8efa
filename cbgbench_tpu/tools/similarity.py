"""Molecular similarity (reference: repo/tools/similarity.py).

Tanimoto similarity over circular (ECFP/Morgan-style) fingerprints plus a
ring counter. RDKit's RDKFingerprint is used verbatim when importable; the
fallback is a pure-python Morgan fingerprint over the framework's Molecule
graph (iterative neighborhood hashing, radius 2, hashed-set fingerprint) —
the same similarity ordering for the case-study use (rank generated mols
against the reference ligand), without the RDKit dependency.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

try:
    from rdkit import Chem, DataStructs  # type: ignore
    _HAS_RDKIT = True
except ImportError:
    _HAS_RDKIT = False


def morgan_fingerprint(mol, radius: int = 2) -> frozenset:
    """Pure-python Morgan-style fingerprint: the set of hashed atom
    environments at radii 0..radius."""
    adj = mol.neighbors()
    # invariant: (element, degree, aromatic-ish bond participation)
    inv = []
    for i in range(mol.num_atoms):
        arom = any(mol.bonds.get((min(i, j), max(i, j))) == 4
                   for j in adj[i])
        inv.append(hash((int(mol.atomic_numbers[i]), len(adj[i]), arom)))
    feats = set(inv)
    cur = list(inv)
    for _ in range(radius):
        nxt = []
        for i in range(mol.num_atoms):
            env = sorted(
                (mol.bonds[(min(i, j), max(i, j))], cur[j]) for j in adj[i])
            h = hash((cur[i], tuple(env)))
            nxt.append(h)
            feats.add(h)
        cur = nxt
    return frozenset(feats)


def tanimoto_sim(mol, ref) -> float:
    """Tanimoto similarity between two molecules (framework Molecule or
    rdkit Mol; rdkit path matches the reference exactly)."""
    if _HAS_RDKIT and not hasattr(mol, "bonds"):
        fp1 = Chem.RDKFingerprint(ref)
        fp2 = Chem.RDKFingerprint(mol)
        return DataStructs.TanimotoSimilarity(fp1, fp2)
    a, b = morgan_fingerprint(mol), morgan_fingerprint(ref)
    union = len(a | b)
    return len(a & b) / union if union else 0.0


def tanimoto_sim_N_to_1(mols: Sequence, ref) -> List[float]:
    return [tanimoto_sim(m, ref) for m in mols]


def batched_number_of_rings(mols: Sequence) -> np.ndarray:
    """Ring count per molecule (cyclomatic number of the bond graph, which
    equals RDKit's CalcNumRings for connected molecules)."""
    out = []
    for m in mols:
        if _HAS_RDKIT and not hasattr(m, "bonds"):
            from rdkit.Chem import rdMolDescriptors
            out.append(rdMolDescriptors.CalcNumRings(m))
            continue
        adj = m.neighbors()
        seen = [False] * m.num_atoms
        n_comp = 0
        for s in range(m.num_atoms):
            if seen[s]:
                continue
            n_comp += 1
            stack = [s]
            seen[s] = True
            while stack:
                i = stack.pop()
                for j in adj[i]:
                    if not seen[j]:
                        seen[j] = True
                        stack.append(j)
        out.append(len(m.bonds) - m.num_atoms + n_comp)
    return np.asarray(out)
