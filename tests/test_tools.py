"""Evaluation tools tests on real fixture ligands."""

import glob
import os

import numpy as np
import pytest

from cbgbench_tpu.chem import read_sdf
from cbgbench_tpu.chem.pdb import parse_pdb_pocket
from cbgbench_tpu.tools.geometry import (analyze_stability, check_stability,
                                         eval_bond_angle_jsd,
                                         eval_bond_length_jsd,
                                         eval_pair_length_jsd,
                                         eval_steric_clash)
from cbgbench_tpu.tools.scoring import get_chem
from cbgbench_tpu.tools.substructure import eval_atom_type, eval_ring_type

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "examples")
LIGANDS = sorted(glob.glob(os.path.join(ASSETS, "*", "*_ligand.sdf")))
MOLS = [read_sdf(p)[0] for p in LIGANDS]


def test_bond_length_jsd_real_ligands_low():
    """Real crystal ligands should be close to the empirical CrossDocked
    distributions (JSD well below 1, present for common bond types)."""
    metrics = eval_bond_length_jsd(MOLS)
    assert metrics["JSD_BL_mean"] is not None
    assert 0 <= metrics["JSD_BL_mean"] < 0.7
    assert metrics.get("JSD_6-6") is not None


def test_bond_angle_jsd_real_ligands():
    metrics = eval_bond_angle_jsd(MOLS)
    assert metrics["JSD_BA_mean"] is not None
    assert 0 <= metrics["JSD_BA_mean"] < 0.8


def test_pair_length_jsd():
    metrics = eval_pair_length_jsd(MOLS)
    assert metrics["JSD_All_12A"] is not None
    assert metrics["JSD_All_12A"] < 0.7


def test_stability_real_vs_garbage():
    real = analyze_stability(MOLS)
    assert real["atm_stable"] > 0.5
    rng = np.random.default_rng(0)
    from cbgbench_tpu.chem.mol import Molecule
    garbage = [Molecule(np.array([6] * 10),
                        rng.normal(scale=5.0, size=(10, 3)))]
    bad = analyze_stability(garbage)
    assert bad["atm_stable"] < real["atm_stable"]


def test_clash_detection():
    pdb = LIGANDS[0].replace("_ligand.sdf", "_protein.pdb")
    atoms, _ = parse_pdb_pocket(pdb)
    mol = MOLS[0]
    clash, info = eval_steric_clash(mol, atoms.pos, atoms.element)
    # crystal pose should have few protein clashes
    assert info["lig_pro_clash"]["clash_atom_num"] <= mol.num_atoms // 2
    # shifted into the protein center -> clash
    shifted = mol.extract(list(range(mol.num_atoms)))
    shifted.pos = np.broadcast_to(atoms.pos.mean(0), shifted.pos.shape) + \
        np.random.default_rng(0).normal(scale=0.5, size=shifted.pos.shape)
    clash2, info2 = eval_steric_clash(shifted, atoms.pos, atoms.element)
    assert clash2
    assert info2["lig_pro_clash"]["clash_atom_num"] > \
        info["lig_pro_clash"]["clash_atom_num"]


def test_chem_scoring():
    for mol in MOLS[:2]:
        chem = get_chem(mol)
        assert 0 <= chem["qed"] <= 1
        assert 1 <= chem["sa"] <= 10
        assert 0 <= chem["lipinski"] <= 4
        assert np.isfinite(chem["logp"])


def test_substructure_metrics():
    at = eval_atom_type(MOLS)
    rt = eval_ring_type(MOLS)
    assert 0 <= at["atom_type_jsd"] <= 1
    assert 0 <= rt["ring_type_jsd"] <= 1
    assert at["atom_type_mae"] >= 0


def test_interactions_geometric():
    from cbgbench_tpu.tools.interaction import geometric_interactions
    pdb = LIGANDS[0].replace("_ligand.sdf", "_protein.pdb")
    atoms, _ = parse_pdb_pocket(pdb)
    counts = geometric_interactions(MOLS[0], atoms.pos, atoms.element)
    assert counts["hydrophobic"] > 0   # crystal ligand touches the pocket
    assert all(v >= 0 for v in counts.values())


def test_evaluate_folder_end_to_end(tmp_path):
    from cbgbench_tpu.chem.sdf import write_sdf
    from cbgbench_tpu.cli.evaluate_cli import evaluate_folder
    d = tmp_path / "0000_3zcw_ligand"
    d.mkdir()
    for i, m in enumerate(MOLS):
        write_sdf(str(d / f"{i}.sdf"), m)

    def lookup(name):
        return LIGANDS[0].replace("_ligand.sdf", "_protein.pdb")

    report = evaluate_folder(str(tmp_path), num_samples=len(MOLS),
                             protein_lookup=lookup)
    assert report["n_molecules"] == len(MOLS)
    assert report["validity"] == 1.0
    assert "qed_mean" in report and "JSD_BL_mean" in report
    assert "clash_ratio" in report
