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


# CrossDocked functional-group frequencies over the 25-motif vocabulary
# (reference: eval_fg_type.py:10-58 FUNCTIONAL_GROUPS_DISTRIBUTION/_RATIO).
# The reference extracts FGs with the EFGs package; here the pure-python
# VF2 motif matcher (chem/fg_detect.py) plays that role.
CROSSDOCKED_FG_FREQ = {
    "c1ccccc1": 0.39202252631956525, "NC=O": 0.14653765446491024,
    "O=CO": 0.11915693694663151, "c1ccncc1": 0.045181173066461015,
    "c1ncc2nc[nH]c2n1": 0.03398377483245751, "NS(=O)=O": 0.03025330152865709,
    "O=P(O)(O)O": 0.022272240854661, "OCO": 0.01914557813368725,
    "c1cncnc1": 0.017830347161193513, "c1cn[nH]c1": 0.016153427671263997,
    "O=P(O)O": 0.015755869218214754, "c1ccc2ccccc2c1": 0.014174602889921145,
    "c1ccsc1": 0.012955025079063317, "N=CN": 0.012898231014341996,
    "NC(N)=O": 0.012455835141775921,
    "O=c1cc[nH]c(=O)[nH]1": 0.012390073593151234,
    "c1ccc2ncccc2c1": 0.010518858618648779, "c1cscn1": 0.010360433069689307,
    "c1ccc2[nH]cnc2c1": 0.010348476424484818,
    "c1c[nH]cn1": 0.008859874096525997, "O=[N+][O-]": 0.008076713835631999,
    "O=CNO": 0.007404152542879519, "NC(=O)O": 0.007287575252135756,
    "O=S=O": 0.007099258090165062, "c1ccc2[nH]ccc2c1": 0.0068780601538820235,
}
CROSSDOCKED_FG_RATIO = {
    "c1ccccc1": 0.7125401370227701, "NC=O": 0.26634683820772914,
    "O=CO": 0.21657964652254463, "c1ccncc1": 0.08212129938008335,
    "c1ncc2nc[nH]c2n1": 0.06176890854463563, "NS(=O)=O": 0.05498840033250569,
    "O=P(O)(O)O": 0.04048202459020847, "OCO": 0.034799002482926486,
    "c1cncnc1": 0.03240843869018836, "c1cn[nH]c1": 0.029360469854447263,
    "O=P(O)O": 0.028637867617096878, "c1ccc2ccccc2c1": 0.025763757966282184,
    "c1ccsc1": 0.023547053358470474, "N=CN": 0.02344382446742042,
    "NC(N)=O": 0.02263972573713578,
    "O=c1cc[nH]c(=O)[nH]1": 0.02252019754749887,
    "c1ccc2ncccc2c1": 0.019119077242376003, "c1cscn1": 0.01883112296734164,
    "c1ccc2[nH]cnc2c1": 0.01880939056922584,
    "c1c[nH]cn1": 0.0161037070038086, "O=[N+][O-]": 0.014680234927223632,
    "O=CNO": 0.01345778753320982, "NC(=O)O": 0.01324589665158076,
    "O=S=O": 0.012903611381256893, "c1ccc2[nH]ccc2c1": 0.012501562016114574,
}


def fg_counts(mols: Sequence[Molecule]) -> collections.Counter:
    """Motif occurrence counts over the 25-FG vocabulary (reference:
    eval_fg_type.py:88-97 get_func_group_from_mol via EFGs mol2frag)."""
    from ..chem.fg_detect import decompose_fg
    counter: collections.Counter = collections.Counter()
    for m in mols:
        try:
            fgs = decompose_fg(m)
        except Exception:
            continue
        # strip chirality-split suffixes (NS(=O)=O_1 -> NS(=O)=O)
        keys = (f["key"].rsplit("_", 1)[0] if f["key"].endswith(("_1", "_2"))
                else f["key"] for f in fgs)
        counter.update(k for k in keys if k in CROSSDOCKED_FG_FREQ)
    return counter


def eval_fg_type(mols) -> Dict[str, float]:
    """FG-frequency JSD + per-molecule FG-count MAE (reference:
    eval_fg_type.py:62-86)."""
    counter = fg_counts(mols)
    total = sum(counter.values()) or 1
    dist = {k: counter.get(k, 0) / total for k in CROSSDOCKED_FG_FREQ}
    per_mol = {k: counter.get(k, 0) / max(len(mols), 1)
               for k in CROSSDOCKED_FG_RATIO}
    return {"fg_type_jsd": _jsd_over_ref_keys(dist, CROSSDOCKED_FG_FREQ),
            "fg_type_mae": _ratio_mae(per_mol, CROSSDOCKED_FG_RATIO)}


# ---------------------------------------------------------------------------
# atom-count distribution (reference: tools/eval_atom_num.py + the
# pocket-size-conditioned prior in datasets/transforms/_atom_num_dist.npy)
# ---------------------------------------------------------------------------

_MAX_ATOM_NUM = 64


def reference_atom_num_distribution() -> np.ndarray:
    """CrossDocked per-molecule atom-count distribution, marginalized over
    the pocket-size bins of the bundled prior (equal bin weights — the
    pocket-size marginal is not recorded in the reference)."""
    from ..data.transforms import _load_prior
    prior = _load_prior("_atom_num_dist.npy")
    marginal = np.zeros(_MAX_ATOM_NUM + 1)
    for nums, probs in prior["bins"]:
        for n, p in zip(nums, probs):
            if 0 <= int(n) <= _MAX_ATOM_NUM:
                marginal[int(n)] += float(p)
    return marginal / max(marginal.sum(), 1e-12)


def eval_atom_num(mols) -> Dict[str, float]:
    """JSD + MAE of the generated atom-count histogram vs the CrossDocked
    reference (reference protocol: tools/eval_atom_num.py bins)."""
    ref = reference_atom_num_distribution()
    hist = np.zeros_like(ref)
    sizes = []
    for m in mols:
        n = min(m.num_atoms, _MAX_ATOM_NUM)
        hist[n] += 1
        sizes.append(m.num_atoms)
    hist = hist / max(hist.sum(), 1e-12)
    ref_mean = float((np.arange(len(ref)) * ref).sum())
    return {"atom_num_jsd": float(jensenshannon(ref, hist)),
            "atom_num_mean": float(np.mean(sizes)) if sizes else 0.0,
            "atom_num_mae": abs(float(np.mean(sizes)) - ref_mean)
            if sizes else ref_mean}
