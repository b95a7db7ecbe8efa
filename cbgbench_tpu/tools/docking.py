"""AutoDock Vina docking orchestration (external C++ binary, host-side).

Mirrors the reference protocol (reference: repo/tools/docking_vina.py:49-298
+ evaluate_scripts/evaluate_chem_single.py:44-59): ligand -> pdbqt (meeko),
protein -> pdbqt (pdb2pqr + AutoDockTools), then Vina score_only /
minimize / dock at exhaustiveness 16. Every external tool is feature-gated;
`available()` reports what this host can run.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from dataclasses import dataclass
from typing import Dict, Optional

from ..chem.mol import Molecule
from ..chem.sdf import write_sdf

EXHAUSTIVENESS = 16


def available() -> Dict[str, bool]:
    def has(mod):
        try:
            __import__(mod)
            return True
        except Exception:
            return False
    return {
        "vina_python": has("vina"),
        "vina_binary": shutil.which("vina") is not None,
        "meeko": has("meeko"),
        "obabel": shutil.which("obabel") is not None,
        "pdb2pqr": shutil.which("pdb2pqr30") is not None
        or shutil.which("pdb2pqr") is not None,
    }


@dataclass
class VinaResult:
    score_only: Optional[float] = None
    minimize: Optional[float] = None
    dock: Optional[float] = None
    pose: Optional[str] = None


class VinaDockingTask:
    """run(mode) for mode in {score_only, minimize, dock} — same surface as
    the reference VinaDockingTask (docking_vina.py:250-273)."""

    def __init__(self, mol: Molecule, protein_pdb: str,
                 center=None, box_size=(20.0, 20.0, 20.0)):
        self.mol = mol
        self.protein_pdb = protein_pdb
        self.center = (center if center is not None
                       else mol.pos.mean(0).tolist())
        self.box_size = box_size
        caps = available()
        self.ready = caps["vina_python"] and caps["meeko"]
        self._caps = caps

    def _prepare(self, tmp: str):
        from meeko import MoleculePreparation  # type: ignore
        from rdkit import Chem  # type: ignore

        sdf = os.path.join(tmp, "lig.sdf")
        write_sdf(sdf, self.mol)
        rdmol = Chem.SDMolSupplier(sdf, removeHs=False)[0]
        rdmol = Chem.AddHs(rdmol, addCoords=True)
        prep = MoleculePreparation()
        prep.prepare(rdmol)
        lig_pdbqt = os.path.join(tmp, "lig.pdbqt")
        prep.write_pdbqt_file(lig_pdbqt)

        # protein: pdb2pqr -> pdbqt (fallback: obabel)
        pqr = os.path.join(tmp, "rec.pqr")
        rec_pdbqt = os.path.join(tmp, "rec.pdbqt")
        pdb2pqr = shutil.which("pdb2pqr30") or shutil.which("pdb2pqr")
        if pdb2pqr:
            subprocess.run([pdb2pqr, "--ff=AMBER", self.protein_pdb, pqr],
                           check=True, capture_output=True)
            src = pqr
        else:
            src = self.protein_pdb
        if shutil.which("obabel"):
            subprocess.run(["obabel", src, "-O", rec_pdbqt, "-xr"],
                           check=True, capture_output=True)
        else:
            raise RuntimeError("no receptor pdbqt route available")
        return lig_pdbqt, rec_pdbqt

    def run(self, mode: str = "dock") -> VinaResult:
        if not self.ready:
            raise RuntimeError(
                f"Vina docking unavailable on this host: {self._caps}")
        from vina import Vina  # type: ignore

        with tempfile.TemporaryDirectory() as tmp:
            lig, rec = self._prepare(tmp)
            v = Vina(sf_name="vina", verbosity=0)
            v.set_receptor(rec)
            v.set_ligand_from_file(lig)
            v.compute_vina_maps(center=self.center, box_size=self.box_size)
            res = VinaResult()
            if mode == "score_only":
                res.score_only = float(v.score()[0])
            elif mode == "minimize":
                res.minimize = float(v.optimize()[0])
            elif mode == "dock":
                v.dock(exhaustiveness=EXHAUSTIVENESS, n_poses=1)
                res.dock = float(v.energies(n_poses=1)[0][0])
                res.pose = v.poses(n_poses=1)
            else:
                raise ValueError(mode)
            return res
