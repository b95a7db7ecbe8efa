"""Aromatic-ring perception for kekulized molecules (pure python).

The reference parses ligands with RDKit and calls ``Chem.SanitizeMol``
(reference: repo/datasets/parsers/molecule_parser.py:27), which perceives
aromaticity even when the SDF stores kekulized single/double bonds — and
CrossDocked/fixture SDFs ARE kekulized (zero class-4 bonds in the bundled
examples). Reading only bond class 4 therefore under-detects: every
aromatic carbon featurizes as plain carbon in ``add_aromatic``/``full``
modes. This module closes that delta with simplified Hückel counting on
5-/6-membered rings, the same model OpenBabel/RDKit use for the common
drug-like aromatics (benzene, pyridine, pyrrole, furan, thiophene,
imidazole, fused systems ring-by-ring).

Per-ring pi-electron contributions (kekulized input):
  * atom with a double bond to another atom of the SAME ring     -> 1
  * N/O/S with only single ring bonds and no exocyclic double    -> 2
    (lone pair donated into the ring)
  * C with an exocyclic double bond (quinone-like)               -> 0
  * sp3 atom (only single bonds anywhere, not a lone-pair donor) -> ring
    is not aromatic
A ring is aromatic when the total is 4n+2 (n >= 1). Bond class 4 marks a
ring aromatic directly. An atom is aromatic if any ring containing it is.
"""

from __future__ import annotations

import numpy as np

# elements that can sit in an aromatic ring (C, N, O, S + the rare B/P/Se)
_AROMATIC_Z = {5, 6, 7, 8, 15, 16, 34}
# lone-pair donors when singly bonded in-ring
_DONOR_Z = {7, 8, 16, 34}


def perceive_aromatic(mol) -> np.ndarray:
    """[N] bool aromatic-atom flags for a (possibly kekulized) Molecule."""
    n = mol.num_atoms
    arom = np.zeros(n, bool)
    if n == 0:
        return arom

    # per-atom bond-order sets
    orders = [[] for _ in range(n)]           # (other, cls)
    for (i, j), cls in mol.bonds.items():
        orders[i].append((j, cls))
        orders[j].append((i, cls))

    all_rings = mol.rings(max_size=6)
    in_any_ring = np.zeros(n, bool)
    for ring in all_rings:
        in_any_ring[list(ring)] = True

    for ring in all_rings:
        if len(ring) not in (5, 6):
            continue
        rset = set(ring)
        # class-4 bonds anywhere in the ring mark it aromatic outright
        if any(cls == 4 for (a, b), cls in mol.bonds.items()
               if a in rset and b in rset):
            for a in ring:
                arom[a] = True
            continue
        pi = 0
        ok = True
        for a in ring:
            z = int(mol.atomic_numbers[a])
            if z not in _AROMATIC_Z:
                ok = False
                break
            in_ring_double = any(o in rset and cls == 2
                                 for o, cls in orders[a])
            exo_double = any(o not in rset and cls in (2, 3)
                             for o, cls in orders[a])
            if any(cls == 3 and o in rset for o, cls in orders[a]):
                ok = False                      # in-ring triple bond
                break
            exo_double_ring = any(o not in rset and cls == 2
                                  and in_any_ring[o]
                                  for o, cls in orders[a])
            if in_ring_double:
                pi += 1
            elif exo_double_ring:
                pi += 1     # fusion atom: the double sits in the other ring
            elif z in _DONOR_Z and not exo_double:
                pi += 2                         # lone pair into the ring
            elif exo_double:
                pi += 0     # quinone-like: pi pulled out to a chain atom
            else:
                ok = False                      # sp3 carbon in ring
                break
        if ok and pi >= 6 and (pi - 2) % 4 == 0:
            for a in ring:
                arom[a] = True
    return arom
