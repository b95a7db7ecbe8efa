"""Exact Ertl-Schuffenhauer SA score (RDKit path only).

Implements the standard SA score using the bundled fragment-score table
(assets/fpscores.pkl.gz, same file the reference ships —
reference: repo/tools/sascorer.py:53-115). Import only when RDKit exists.
"""

from __future__ import annotations

import gzip
import math
import os
import pickle

from rdkit import Chem
from rdkit.Chem import rdMolDescriptors

_fscores = None


def _read_fragment_scores():
    global _fscores
    path = os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                        "fpscores.pkl.gz")
    data = pickle.load(gzip.open(path))
    out = {}
    for row in data:
        for j in range(1, len(row)):
            out[row[j]] = float(row[0])
    _fscores = out


def _num_bridgeheads_and_spiro(mol, ri=None):
    n_spiro = rdMolDescriptors.CalcNumSpiroAtoms(mol)
    n_bridge = rdMolDescriptors.CalcNumBridgeheadAtoms(mol)
    return n_bridge, n_spiro


def calculate_sa(m) -> float:
    if _fscores is None:
        _read_fragment_scores()

    fp = rdMolDescriptors.GetMorganFingerprint(m, 2)
    fps = fp.GetNonzeroElements()
    score1 = 0.0
    nf = 0
    for bit_id, v in fps.items():
        nf += v
        score1 += _fscores.get(bit_id, -4) * v
    score1 /= nf

    n_atoms = m.GetNumAtoms()
    n_chiral = len(Chem.FindMolChiralCenters(m, includeUnassigned=True))
    ri = m.GetRingInfo()
    n_bridge, n_spiro = _num_bridgeheads_and_spiro(m, ri)
    n_macro = sum(1 for x in ri.AtomRings() if len(x) > 8)

    size_penalty = n_atoms ** 1.005 - n_atoms
    stereo_penalty = math.log10(n_chiral + 1)
    spiro_penalty = math.log10(n_spiro + 1)
    bridge_penalty = math.log10(n_bridge + 1)
    macro_penalty = math.log10(2) if n_macro > 0 else 0.0
    score2 = (0. - size_penalty - stereo_penalty - spiro_penalty
              - bridge_penalty - macro_penalty)

    score3 = 0.0
    if n_atoms > len(fps):
        score3 = math.log(float(n_atoms) / len(fps)) * 0.5

    sascore = score1 + score2 + score3
    minv, maxv = -4.0, 2.5
    sascore = 11.0 - (sascore - minv + 1) / (maxv - minv) * 9.0
    if sascore > 8.0:
        sascore = 8.0 + math.log(sascore + 1.0 - 9.0)
    return float(min(max(sascore, 1.0), 10.0))
