"""Chemical-family perception (Donor / Acceptor / Hydrophobe /
LumpedHydrophobe) from the bond graph — RDKit-free.

The reference parses these via RDKit's BaseFeatures.fdef
(/root/reference/repo/datasets/parsers/molecule_parser.py:17-35,
feat_mat over atom_families); only the Aromatic column feeds its models,
but the families surface in interaction profiling and are part of the
parser contract. This module approximates the fdef SMARTS with
graph-theoretic rules over heavy-atom graphs (CrossDocked SDFs carry no
hydrogens; implicit-H counts are derived from valence):

  Donor       N/O with at least one implicit hydrogen
              (bond-order sum below the neutral-valence cap)
  Acceptor    O with a free lone pair (not the NO2 oxygens, not
              aromatic-ring O); N with a lone pair not delocalized
              (pyridine yes; pyrrole/amide/aniline-type no)
  Hydrophobe  C whose neighbors are all carbon (chain or ring)
  LumpedHydrophobe  connected component of >= 2 hydrophobe carbons

Accuracy is pinned by hand-built positives/negatives in
tests/test_chem_families.py plus an RDKit-gated per-family agreement
table on the fixture ligands (same pattern as chem/aromatic.py)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .mol import BOND_ORDER, Molecule

__all__ = ["perceive_families", "FAMILY_NAMES"]

FAMILY_NAMES = ["Donor", "Acceptor", "Hydrophobe", "LumpedHydrophobe"]

_NEUTRAL_VALENCE = {7: 3, 8: 2}


def _ring_membership(mol: Molecule, aromatic_only: bool = False):
    rings = mol.rings()
    member = [set() for _ in range(mol.num_atoms)]
    for ri, ring in enumerate(rings):
        for a in ring:
            member[a].add(ri)
    return rings, member


def perceive_families(mol: Molecule) -> Dict[str, np.ndarray]:
    """-> {family: bool[num_atoms]} for the heavy-atom graph."""
    n = mol.num_atoms
    z = mol.atomic_numbers
    adj = mol.neighbors()
    val = np.array([mol.bond_valence(i) for i in range(n)])

    # per-atom aromatic flag: model-provided, else ring perception
    if mol.aromatic is not None:
        arom = np.asarray(mol.aromatic, bool)
    else:
        try:
            from .aromatic import perceive_aromatic
            arom = np.asarray(perceive_aromatic(mol), bool)
        except Exception:
            arom = np.zeros(n, bool)

    implicit_h = np.zeros(n)
    for i in range(n):
        cap = _NEUTRAL_VALENCE.get(int(z[i]))
        if cap is not None:
            implicit_h[i] = max(0.0, cap - val[i])

    donor = np.zeros(n, bool)
    acceptor = np.zeros(n, bool)
    hydrophobe = np.zeros(n, bool)

    for i in range(n):
        zi = int(z[i])
        nbr_z = [int(z[j]) for j in adj[i]]
        orders = {j: mol.bonds.get((min(i, j), max(i, j)), 1)
                  for j in adj[i]}

        if zi in (7, 8):
            # ---- Donor: any implicit H on N/O ----
            if implicit_h[i] >= 0.5:
                donor[i] = True

            # ---- Acceptor ----
            if zi == 8:
                # O: lone pair present unless it's a nitro oxygen or an
                # aromatic ring oxygen (furan O is not an fdef acceptor)
                is_nitro = any(int(z[j]) == 7 and len(adj[j]) >= 3
                               and sum(1 for k in adj[j]
                                       if int(z[k]) == 8
                                       and len(adj[k]) == 1) >= 2
                               for j in adj[i])
                if not is_nitro and not arom[i]:
                    acceptor[i] = True
            else:
                # N: lone pair not delocalized. Excluded: amide/imide-
                # type (N adjacent to C=O / C=S / P=O), aniline-type and
                # pyrrole-type (aromatic substituent or in-ring aromatic
                # N with an H), quaternary/charged (valence >= 4).
                if val[i] < 4:
                    conj = any(
                        int(z[j]) in (6, 15, 16)
                        and any(mol.bonds.get((min(j, k), max(j, k)), 1)
                                == 2 and int(z[k]) in (7, 8, 16)
                                for k in adj[j] if k != i)
                        for j in adj[i])
                    if arom[i]:
                        has_arom_cls = any(v == 4 for v in orders.values())
                        if not has_arom_cls:
                            # kekulized ring: pyridine-type N carries the
                            # double bond (no implicit H -> acceptor);
                            # pyrrole-type N is single-single (H, donor)
                            acceptor[i] = implicit_h[i] < 0.5
                        else:
                            # aromatic-class bonds: valence counting is
                            # ambiguous (both types sum to 3). Decide by
                            # ring composition: in a 5-ring the pi pair
                            # comes from O/S if present, else from one
                            # 2-connected N (lowest index, deterministic)
                            acceptor[i] = True
                            for ring in mol.rings():
                                if i not in ring or len(ring) != 5:
                                    continue
                                if any(int(z[a]) in (8, 16)
                                       for a in ring):
                                    continue       # O/S donates the pair
                                cand = sorted(
                                    a for a in ring
                                    if int(z[a]) == 7
                                    and len(adj[a]) == 2)
                                if cand and cand[0] == i:
                                    acceptor[i] = False
                    elif not conj:
                        acceptor[i] = True

        elif zi == 6:
            # ---- Hydrophobe: carbon with only carbon neighbors ----
            if nbr_z and all(v == 6 for v in nbr_z):
                hydrophobe[i] = True

    # ---- LumpedHydrophobe: connected hydrophobe groups of >= 2 ----
    lumped = np.zeros(n, bool)
    seen = set()
    for i in range(n):
        if not hydrophobe[i] or i in seen:
            continue
        comp, stack = [], [i]
        while stack:
            a = stack.pop()
            if a in seen or not hydrophobe[a]:
                continue
            seen.add(a)
            comp.append(a)
            stack.extend(j for j in adj[a] if hydrophobe[j])
        if len(comp) >= 2:
            lumped[comp] = True

    return {"Donor": donor, "Acceptor": acceptor,
            "Hydrophobe": hydrophobe, "LumpedHydrophobe": lumped}
