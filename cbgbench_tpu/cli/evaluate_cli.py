"""Evaluation CLI: score a results directory of generated SDFs.

Replaces the reference's evaluate_scripts shell fan-out
(reference: evaluate_scripts/evaluate.sh + *_folder.py + cal_*_results.py):
chem (QED/SA/LogP/Lipinski/validity [+Vina when available]), geometry
(bond length/angle JSD, stability, clash), substructure (atom/ring
JSD+MAE), interactions (PLIP when available, geometric fallback).

Usage: python -m cbgbench_tpu.cli.evaluate_cli --result_root results \
            [--num_samples 200] [--protein_root assets/examples]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def evaluate_folder(result_root: str, num_samples: int = 200,
                    protein_lookup=None) -> dict:
    from ..chem.sdf import read_sdf
    from ..tools.geometry import (analyze_stability, eval_bond_angle_jsd,
                                  eval_bond_length_jsd, eval_pair_length_jsd,
                                  eval_steric_clash)
    from ..tools.interaction import analyze_interactions
    from ..tools.scoring import get_chem
    from ..tools.substructure import (eval_atom_type, eval_fg_type,
                                      eval_ring_type)
    from ..chem.pdb import parse_pdb_pocket

    pocket_dirs = sorted(d for d in glob.glob(os.path.join(result_root, "*"))
                         if os.path.isdir(d))
    all_mols = []
    chem_rows = []
    clash_rows = []
    inter_counts = defaultdict(list)
    n_total_slots = 0
    for pd in pocket_dirs:
        sdfs = sorted(glob.glob(os.path.join(pd, "*.sdf")))
        n_total_slots += num_samples
        protein_pdb = None
        if protein_lookup is not None:
            protein_pdb = protein_lookup(os.path.basename(pd))
        p_atoms = None
        if protein_pdb and os.path.exists(protein_pdb):
            p_atoms, _ = parse_pdb_pocket(protein_pdb)
        for f in sdfs:
            mols = read_sdf(f)
            if not mols:
                continue
            mol = mols[0]
            all_mols.append(mol)
            try:
                chem_rows.append(get_chem(mol))
            except Exception:
                pass
            if p_atoms is not None:
                try:
                    clash, info = eval_steric_clash(mol, p_atoms.pos,
                                                    p_atoms.element)
                    clash_rows.append(info)
                    ic = analyze_interactions(mol, protein_pdb=protein_pdb,
                                              protein_pos=p_atoms.pos,
                                              protein_elements=p_atoms.element)
                    for k, v in ic.items():
                        inter_counts[k].append(v)
                except Exception:
                    pass

    report = {"n_molecules": len(all_mols),
              "validity": len(all_mols) / max(n_total_slots, 1)}
    if chem_rows:
        for k in ("qed", "sa", "logp", "lipinski"):
            vals = [r[k] for r in chem_rows if r.get(k) is not None]
            report[f"{k}_mean"] = float(np.mean(vals)) if vals else None
        report["chem_approximate"] = bool(chem_rows[0].get("approx", True))
    if all_mols:
        report.update({k: v for k, v in eval_bond_length_jsd(all_mols).items()
                       if k == "JSD_BL_mean" or v is not None})
        report.update({k: v for k, v in eval_bond_angle_jsd(all_mols).items()
                       if k == "JSD_BA_mean" or v is not None})
        report.update(eval_pair_length_jsd(all_mols))
        report.update(analyze_stability(all_mols))
        report.update(eval_atom_type(all_mols))
        report.update(eval_ring_type(all_mols))
        report.update(eval_fg_type(all_mols))
    if clash_rows:
        report["clash_ratio"] = float(np.mean(
            [r["lig_pro_clash_detected"] for r in clash_rows]))
        report["clash_atom_ratio"] = float(np.mean(
            [r["lig_pro_clash"]["clash_atom_num"]
             / max(r["lig_pro_clash"]["atom_num"], 1) for r in clash_rows]))
    if inter_counts:
        for k, v in inter_counts.items():
            report[f"interaction_{k}_mean"] = float(np.mean(v))
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--result_root", required=True)
    p.add_argument("--num_samples", type=int, default=200)
    p.add_argument("--protein_root", default=None,
                   help="directory with the source complexes for clash/"
                        "interaction metrics")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    protein_lookup = None
    if args.protein_root:
        from ..data.dataset import scan_pair_dir
        pairs = scan_pair_dir(args.protein_root)

        def protein_lookup(pocket_dirname: str):
            for pdb, sdf in pairs:
                stem = os.path.splitext(os.path.basename(sdf))[0]
                if stem in pocket_dirname:
                    return pdb
            return None

    report = evaluate_folder(args.result_root, args.num_samples,
                             protein_lookup)
    out = args.out or os.path.join(args.result_root, "metrics.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps(report, indent=1, default=float))
    return report


if __name__ == "__main__":
    main()
