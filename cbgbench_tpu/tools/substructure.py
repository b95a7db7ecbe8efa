"""Substructure evaluation: atom-type / ring-size frequency JSD + MAE.

Reference behavior: repo/tools/eval_atom_type.py, eval_ring_type.py —
count frequencies over the generated set, compare against the CrossDocked
reference frequencies with Jensen-Shannon divergence and MAE.
"""

from __future__ import annotations

import collections
from typing import Dict, Sequence

import numpy as np
from scipy.spatial.distance import jensenshannon

from ..chem.mol import Molecule

# CrossDocked training-set atom-type frequencies (reference:
# eval_atom_type.py ATOM_TYPE_DISTRIBUTION, rounded)
CROSSDOCKED_ATOM_FREQ = {
    6: 0.6715020339893559, 7: 0.11703509510732567, 8: 0.16956379168491933,
    9: 0.01307879304486639, 15: 0.01113716146426898, 16: 0.01123926340861198,
    17: 0.006443861300651673,
}
# per-molecule atom-count ratios (reference: eval_atom_type.py ATOM_TYPE_RATIO)
CROSSDOCKED_ATOM_RATIO = {
    6: 15.865905905905906, 7: 2.765245245245245, 8: 4.0063663663663664,
    9: 0.309019019019019, 15: 0.26314314314314313, 16: 0.26555555555555554,
    17: 0.15225225225225225,
}

CROSSDOCKED_RING_FREQ = {
    3: 0.012974361055980106, 4: 0.0019932617923974047, 5: 0.2855064444525153,
    6: 0.6894442581028335, 7: 0.009763350901667888, 8: 0.00031832369460580204,
}
CROSSDOCKED_RING_RATIO = {
    3: 0.032995213439314997, 4: 0.0050690818605106025, 5: 0.7260739879493853,
    6: 1.7533318482861286, 7: 0.02482926484730274, 8: 0.0008095318298135904,
}


def atom_type_distribution(mols: Sequence[Molecule]) -> Dict[int, float]:
    counter = collections.Counter()
    for m in mols:
        counter.update(int(z) for z in m.atomic_numbers)
    total = sum(counter.values()) or 1
    return {z: c / total for z, c in counter.items()}


def ring_size_distribution(mols: Sequence[Molecule]) -> Dict[int, float]:
    counter = collections.Counter()
    for m in mols:
        counter.update(len(r) for r in m.rings())
    total = sum(counter.values()) or 1
    return {s: c / total for s, c in counter.items()}


def _jsd_over_ref_keys(dist: Dict, ref: Dict) -> float:
    """JSD over the reference's key set only (matches reference:
    eval_atom_type.py:36-46 / eval_ring_type.py:25-35)."""
    p = np.array([dist.get(k, 0.0) for k in ref])
    q = np.array(list(ref.values()))
    return float(jensenshannon(q, p))


def _ratio_mae(counter_per_mol: Dict, ref_ratio: Dict) -> float:
    return float(np.abs(np.array(list(ref_ratio.values()))
                        - np.array([counter_per_mol.get(k, 0.0)
                                    for k in ref_ratio])).mean())


def eval_atom_type(mols) -> Dict[str, float]:
    dist = atom_type_distribution(mols)
    counter = collections.Counter()
    for m in mols:
        counter.update(int(z) for z in m.atomic_numbers)
    per_mol = {k: counter.get(k, 0) / max(len(mols), 1)
               for k in CROSSDOCKED_ATOM_RATIO}
    return {"atom_type_jsd": _jsd_over_ref_keys(dist, CROSSDOCKED_ATOM_FREQ),
            "atom_type_mae": _ratio_mae(per_mol, CROSSDOCKED_ATOM_RATIO)}


def eval_ring_type(mols) -> Dict[str, float]:
    dist = ring_size_distribution(mols)
    counter = collections.Counter()
    for m in mols:
        counter.update(len(r) for r in m.rings())
    per_mol = {k: counter.get(k, 0) / max(len(mols), 1)
               for k in CROSSDOCKED_RING_RATIO}
    return {"ring_type_jsd": _jsd_over_ref_keys(dist, CROSSDOCKED_RING_FREQ),
            "ring_type_mae": _ratio_mae(per_mol, CROSSDOCKED_RING_RATIO)}
