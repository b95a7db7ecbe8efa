"""Evaluation CLI: score a results directory of generated SDFs.

Replaces the reference's evaluate_scripts shell fan-out
(reference: evaluate_scripts/evaluate.sh + *_folder.py + cal_*_results.py):
chem (QED/SA/LogP/Lipinski/validity + Vina score_only/minimize/dock when
the toolchain is present), geometry (bond length/angle JSD, stability,
clash), substructure (atom/ring/FG JSD+MAE, atom-count JSD), interactions
(PLIP when available, 7-type geometric fallback otherwise) aggregated as
per-pocket JSD/MAE against the reference ligand's profile
(reference: evaluate_scripts/cal_intera_results.py:26-67).

Usage: python -m cbgbench_tpu.cli.evaluate_cli --result_root results \
            [--num_samples N] [--protein_root assets/examples] [--vina]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import defaultdict

import numpy as np


def _interaction_dist(counts: dict, types) -> np.ndarray:
    v = np.array([counts.get(t, 0) for t in types], float)
    return v


def _vina_all_modes(mol, protein_pdb, center):
    """score_only/minimize/dock for one molecule; None-filled on failure."""
    from ..tools.docking import VinaDockingTask
    out = {"score_only": None, "minimize": None, "dock": None}
    try:
        task = VinaDockingTask(mol, protein_pdb, center=center)
        if not task.ready:
            return out
        for mode in out:
            try:
                res = task.run(mode)
                out[mode] = getattr(res, mode)
            except Exception:
                pass
    except Exception:
        pass
    return out


def _evaluate_pocket(args) -> dict:
    """Per-pocket evaluation (module-level so multiprocessing can fan out
    like the reference's evaluate_*_folder.py subprocess pools)."""
    pd, protein_pdb, ref_sdf, vina_ready = args
    from ..chem.pdb import parse_pdb_pocket
    from ..chem.sdf import read_sdf
    from ..tools.geometry import eval_steric_clash
    from ..tools.interaction import INTERACTION_TYPES, analyze_interactions
    from ..tools.scoring import get_chem

    out = {"mols": [], "chem": [], "clash": [],
           "inter_counts": defaultdict(list),
           "pocket_gen_counts": np.zeros(len(INTERACTION_TYPES)),
           "pocket_n": 0, "ref_inter": None,
           "vina_rows": defaultdict(list), "vina_imp": defaultdict(list),
           "vina_delta": defaultdict(list), "vina_ligeff": [],
           "vina_native": [], "vina_native_imp": [],
           "vina_native_delta": [], "vina_native_min": [],
           "vina_dock_native": [], "vina_dock_imp": [],
           "vina_dock_delta": [], "vina_dock_rmsd": []}
    sdfs = sorted(glob.glob(os.path.join(pd, "*.sdf")))
    p_atoms = rec_typing = None
    if protein_pdb and os.path.exists(protein_pdb):
        p_atoms, _ = parse_pdb_pocket(protein_pdb)
        try:
            from ..tools.vina_native import typing_from_pocket
            rec_typing = typing_from_pocket(p_atoms)
        except Exception:
            rec_typing = None
    ref_mol = None
    if ref_sdf and os.path.exists(ref_sdf):
        refs = read_sdf(ref_sdf)
        ref_mol = refs[0] if refs else None
    ref_vina = {}
    if ref_mol is not None and p_atoms is not None:
        try:
            out["ref_inter"] = analyze_interactions(
                ref_mol, protein_pdb=protein_pdb, protein_pos=p_atoms.pos,
                protein_elements=p_atoms.element, atoms=p_atoms)
        except Exception:
            out["ref_inter"] = None
        if vina_ready:
            ref_vina = _vina_all_modes(ref_mol, protein_pdb,
                                       ref_mol.pos.mean(0).tolist())
    ref_native = None
    if ref_mol is not None and rec_typing is not None:
        try:
            from ..tools.vina_native import score_only as vina_score_native
            ref_native = vina_score_native(ref_mol, p_atoms.pos,
                                           rec_typing)["affinity"]
        except Exception:
            ref_native = None
    for f in sdfs:
        mols = read_sdf(f)
        if not mols:
            continue
        mol = mols[0]
        out["mols"].append(mol)
        try:
            out["chem"].append(get_chem(mol))
        except Exception:
            pass
        if vina_ready and protein_pdb:
            vr = _vina_all_modes(mol, protein_pdb, mol.pos.mean(0).tolist())
            for mode, aff in vr.items():
                if aff is None:
                    continue
                out["vina_rows"][mode].append(aff)
                raff = ref_vina.get(mode)
                # improvement only defined for negative reference
                # affinities (reference: cal_chem_results.py:55-60)
                if raff is not None and raff < 0:
                    out["vina_imp"][mode].append((aff - raff) / raff)
                    out["vina_delta"][mode].append(float(aff < raff))
                if mode == "dock":
                    out["vina_ligeff"].append(aff / max(mol.num_atoms, 1))
        if rec_typing is not None:
            # native score-only affinity: always computable (no binary);
            # reported separately, flagged approximate
            try:
                from ..tools.vina_native import minimize_rigid as _vmin
                from ..tools.vina_native import score_only as _vsn
                aff = _vsn(mol, p_atoms.pos, rec_typing)["affinity"]
                out["vina_native"].append(aff)
                # native 'minimize' column (rigid local optimization of
                # the same function; the binary's BFGS also relaxes
                # torsions — approximate like score_only)
                if not os.environ.get("CBG_SKIP_VINA_MIN"):
                    out["vina_native_min"].append(
                        _vmin(mol, p_atoms.pos, rec_typing,
                              steps=40)["affinity"])
                if ref_native is not None and ref_native < 0:
                    out["vina_native_imp"].append(
                        (aff - ref_native) / ref_native)
                    out["vina_native_delta"].append(float(aff < ref_native))
            except Exception:
                pass
        if p_atoms is not None:
            try:
                clash, info = eval_steric_clash(mol, p_atoms.pos,
                                                p_atoms.element)
                out["clash"].append(info)
                ic = analyze_interactions(mol, protein_pdb=protein_pdb,
                                          protein_pos=p_atoms.pos,
                                          protein_elements=p_atoms.element,
                                          atoms=p_atoms)
                for k, v in ic.items():
                    out["inter_counts"][k].append(v)
                out["pocket_gen_counts"] += _interaction_dist(
                    ic, INTERACTION_TYPES)
                out["pocket_n"] += 1
            except Exception:
                pass
    # native 'dock' column (Monte-Carlo search over the same scoring
    # function; reference runs dock at exhaustiveness 16 —
    # repo/tools/docking_vina.py:250-273). Expensive (~seconds/molecule),
    # so gated on CBG_VINA_DOCK_NATIVE=<exhaustiveness>; the receptor
    # grid maps are built once per pocket and shared by every molecule.
    exh = int(os.environ.get("CBG_VINA_DOCK_NATIVE", "0") or 0)
    if exh > 0 and rec_typing is not None and out["mols"]:
        try:
            from ..tools.vina_dock import dock, make_pocket_grid
            all_pos = [m.pos for m in out["mols"]]
            if ref_mol is not None:
                all_pos.append(ref_mol.pos)
            grid = make_pocket_grid(p_atoms.pos, rec_typing, all_pos)
            ref_dock = None
            if ref_mol is not None:
                ref_dock = dock(ref_mol, p_atoms.pos, rec_typing,
                                exhaustiveness=exh, grid=grid,
                                seed=0)["affinity"]
            for mi, mol in enumerate(out["mols"]):
                try:
                    dr = dock(mol, p_atoms.pos, rec_typing,
                              exhaustiveness=exh, grid=grid, seed=mi)
                    out["vina_dock_native"].append(dr["affinity"])
                    out["vina_dock_rmsd"].append(dr["rmsd_from_input"])
                    if ref_dock is not None and ref_dock < 0:
                        out["vina_dock_imp"].append(
                            (dr["affinity"] - ref_dock) / ref_dock)
                        out["vina_dock_delta"].append(
                            float(dr["affinity"] < ref_dock))
                except Exception:
                    pass
        except Exception:
            pass
    return out


def evaluate_folder(result_root: str, num_samples: int = None,
                    protein_lookup=None, run_vina: bool = False,
                    workers: int = 0) -> dict:
    """num_samples: attempted samples per pocket (the validity
    denominator). When None it is read from the sampler's summary.json
    (per-pocket n_samples), falling back to 200 — the reference protocol
    count (reference: sample.py:38) — when no summary exists. Passing an
    explicit value overrides both."""
    from ..tools.geometry import (analyze_stability, eval_bond_angle_jsd,
                                  eval_bond_length_jsd, eval_pair_length_jsd)
    from ..tools.interaction import INTERACTION_TYPES
    from ..tools.substructure import (eval_atom_num, eval_atom_type,
                                      eval_fg_type, eval_ring_type)

    if run_vina:
        from ..tools.docking import available
        caps = available()
        # obabel is required too: receptor pdbqt conversion has no other
        # route (docking.py _prepare), so without it every docking call
        # fails after wasted ligand prep while the report claims capability
        vina_ready = caps["vina_python"] and caps["meeko"] and caps["obabel"]
    else:
        vina_ready = False

    pocket_dirs = sorted(d for d in glob.glob(os.path.join(result_root, "*"))
                         if os.path.isdir(d))
    slots_per_pocket = {}
    if num_samples is None:
        summary_path = os.path.join(result_root, "summary.json")
        if os.path.exists(summary_path):
            try:
                with open(summary_path) as f:
                    for entry in json.load(f):
                        if "n_samples" in entry and "index" in entry:
                            slots_per_pocket[int(entry["index"])] = \
                                int(entry["n_samples"])
            except Exception:
                slots_per_pocket = {}
        num_samples = 200
    jobs = []
    for pd in pocket_dirs:
        protein_pdb = ref_sdf = None
        if protein_lookup is not None:
            looked = protein_lookup(os.path.basename(pd))
            if isinstance(looked, tuple):
                protein_pdb, ref_sdf = looked
            else:
                protein_pdb = looked
        jobs.append((pd, protein_pdb, ref_sdf, vina_ready))

    if workers and workers > 1 and len(jobs) > 1:
        import multiprocessing as mp
        # fork: the per-pocket worker is numpy/scipy-only (no jax device
        # state), and spawn would re-import the caller's __main__
        ctx = mp.get_context("fork" if os.name == "posix" else "spawn")
        with ctx.Pool(workers) as pool:
            pocket_results = pool.map(_evaluate_pocket, jobs)
    else:
        pocket_results = [_evaluate_pocket(j) for j in jobs]

    all_mols = []
    chem_rows = []
    clash_rows = []
    inter_counts = defaultdict(list)
    inter_jsds, inter_maes = [], []
    inter_gen_total = np.zeros(len(INTERACTION_TYPES))
    inter_ref_total = np.zeros(len(INTERACTION_TYPES))
    n_inter_gen = n_inter_pockets = 0
    vina_rows = defaultdict(list)      # mode -> per-mol affinities
    vina_imp = defaultdict(list)       # mode -> (gen - ref)/ref
    vina_delta = defaultdict(list)     # mode -> gen < ref indicator
    vina_ligeff = []
    vina_native_rows, vina_native_imp, vina_native_delta = [], [], []
    vina_native_min_rows = []
    vina_dock_rows, vina_dock_imp = [], []
    vina_dock_delta, vina_dock_rmsd = [], []
    n_total_slots = 0
    for pd in pocket_dirs:
        head = os.path.basename(pd).split("_", 1)[0]
        idx = int(head) if head.isdigit() else -1
        n_total_slots += slots_per_pocket.get(idx, num_samples)
    for res in pocket_results:
        all_mols.extend(res["mols"])
        chem_rows.extend(res["chem"])
        clash_rows.extend(res["clash"])
        for k, v in res["inter_counts"].items():
            inter_counts[k].extend(v)
        for agg, key in ((vina_rows, "vina_rows"), (vina_imp, "vina_imp"),
                         (vina_delta, "vina_delta")):
            for mode, vals in res[key].items():
                agg[mode].extend(vals)
        vina_ligeff.extend(res["vina_ligeff"])
        vina_native_rows.extend(res.get("vina_native", []))
        vina_native_min_rows.extend(res.get("vina_native_min", []))
        vina_native_imp.extend(res.get("vina_native_imp", []))
        vina_native_delta.extend(res.get("vina_native_delta", []))
        vina_dock_rows.extend(res.get("vina_dock_native", []))
        vina_dock_imp.extend(res.get("vina_dock_imp", []))
        vina_dock_delta.extend(res.get("vina_dock_delta", []))
        vina_dock_rmsd.extend(res.get("vina_dock_rmsd", []))
        # per-pocket interaction JSD/MAE vs the reference ligand
        # (reference: cal_intera_results.py:26-47)
        if res["ref_inter"] is not None and res["pocket_n"] > 0:
            from scipy.spatial.distance import jensenshannon
            ref_vec = _interaction_dist(res["ref_inter"], INTERACTION_TYPES)
            pocket_gen_counts = res["pocket_gen_counts"]
            gen_dist = pocket_gen_counts / max(pocket_gen_counts.sum(), 1e-12)
            ref_dist = ref_vec / max(ref_vec.sum(), 1e-12)
            jsd = float(jensenshannon(ref_dist, gen_dist))
            if np.isfinite(jsd):
                inter_jsds.append(jsd)
                inter_maes.append(float(np.abs(
                    ref_vec - pocket_gen_counts / res["pocket_n"]).mean()))
                inter_gen_total += pocket_gen_counts
                inter_ref_total += ref_vec
                n_inter_gen += res["pocket_n"]
                n_inter_pockets += 1

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
        report.update(eval_atom_num(all_mols))
    if clash_rows:
        report["clash_ratio"] = float(np.mean(
            [r["lig_pro_clash_detected"] for r in clash_rows]))
        report["clash_atom_ratio"] = float(np.mean(
            [r["lig_pro_clash"]["clash_atom_num"]
             / max(r["lig_pro_clash"]["atom_num"], 1) for r in clash_rows]))
        nears = [r["nearest_protein_dist"] for r in clash_rows
                 if np.isfinite(r.get("nearest_protein_dist", np.nan))]
        report["nearest_protein_dist_mean"] = (
            float(np.mean(nears)) if nears else None)
    if inter_counts:
        for k, v in inter_counts.items():
            report[f"interaction_{k}_mean"] = float(np.mean(v))
    if inter_jsds:
        from scipy.spatial.distance import jensenshannon
        report["interaction_jsd"] = float(np.mean(inter_jsds))
        report["interaction_mae"] = float(np.mean(inter_maes))
        # overall (pooled) JSD/MAE (reference: cal_intera_results.py:52-67)
        gd = inter_gen_total / max(inter_gen_total.sum(), 1e-12)
        rd = inter_ref_total / max(inter_ref_total.sum(), 1e-12)
        report["interaction_overall_jsd"] = float(jensenshannon(rd, gd))
        report["interaction_overall_mae"] = float(np.abs(
            inter_ref_total / max(n_inter_pockets, 1)
            - inter_gen_total / max(n_inter_gen, 1)).mean())
    # Vina block is always present so consumers can rely on the keys;
    # values are null when the toolchain or runs are unavailable
    for mode in ("score_only", "minimize", "dock"):
        vals = vina_rows.get(mode, [])
        report[f"vina_{mode}_mean"] = float(np.mean(vals)) if vals else None
        imps = vina_imp.get(mode, [])
        report[f"vina_{mode}_improvement_pct"] = (
            float(np.mean(imps) * 100) if imps else None)
        deltas = vina_delta.get(mode, [])
        report[f"vina_{mode}_delta_binding_pct"] = (
            float(np.mean(deltas) * 100) if deltas else None)
    report["vina_lig_efficiency_mean"] = (
        float(np.mean(vina_ligeff)) if vina_ligeff else None)
    report["vina_available"] = bool(vina_ready)
    # native score-only (no binary needed): the published 5-term function
    # + rotor penalty over our own typing — honest approximate flag
    report["vina_score_only_native_mean"] = (
        float(np.mean(vina_native_rows)) if vina_native_rows else None)
    report["vina_native_improvement_pct"] = (
        float(np.mean(vina_native_imp) * 100) if vina_native_imp else None)
    report["vina_native_delta_binding_pct"] = (
        float(np.mean(vina_native_delta) * 100)
        if vina_native_delta else None)
    report["vina_minimize_native_mean"] = (
        float(np.mean(vina_native_min_rows))
        if vina_native_min_rows else None)
    report["vina_dock_native_mean"] = (
        float(np.mean(vina_dock_rows)) if vina_dock_rows else None)
    report["vina_dock_native_improvement_pct"] = (
        float(np.mean(vina_dock_imp) * 100) if vina_dock_imp else None)
    report["vina_dock_native_delta_binding_pct"] = (
        float(np.mean(vina_dock_delta) * 100) if vina_dock_delta else None)
    report["vina_dock_native_rmsd_mean"] = (
        float(np.mean(vina_dock_rmsd)) if vina_dock_rmsd else None)
    report["vina_native_approximate"] = True
    return report


def build_protein_lookup(protein_root: str):
    """pocket-dirname -> (protein pdb, reference ligand sdf)."""
    from ..data.dataset import scan_pair_dir
    pairs = scan_pair_dir(protein_root)

    def protein_lookup(pocket_dirname: str):
        for pdb, sdf in pairs:
            stem = os.path.splitext(os.path.basename(sdf))[0]
            if stem in pocket_dirname:
                return pdb, sdf
        return None

    return protein_lookup


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--result_root", required=True)
    p.add_argument("--num_samples", type=int, default=None,
                   help="attempts per pocket (validity denominator); "
                        "default: read from summary.json, else 200")
    p.add_argument("--protein_root", default=None,
                   help="directory with the source complexes for clash/"
                        "interaction/Vina metrics")
    p.add_argument("--vina", action="store_true",
                   help="run Vina score_only/minimize/dock when the "
                        "toolchain (vina+meeko+obabel) is installed")
    p.add_argument("--no_vina_min", action="store_true",
                   help="skip the native rigid-minimize column "
                        "(~1.4 s/molecule; score-only stays)")
    p.add_argument("--vina_dock", type=int, default=0, metavar="EXH",
                   help="run the native Monte-Carlo dock column at this "
                        "exhaustiveness (0 = off; the reference protocol "
                        "uses 16 — docking_vina.py:250; ~seconds per "
                        "molecule per unit of exhaustiveness)")
    p.add_argument("--workers", type=int, default=0,
                   help="per-pocket multiprocessing fan-out (reference: "
                        "evaluate_*_folder.py pools)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    protein_lookup = (build_protein_lookup(args.protein_root)
                      if args.protein_root else None)
    if args.no_vina_min:
        os.environ["CBG_SKIP_VINA_MIN"] = "1"
    if args.vina_dock:
        os.environ["CBG_VINA_DOCK_NATIVE"] = str(args.vina_dock)
    report = evaluate_folder(args.result_root, args.num_samples,
                             protein_lookup, run_vina=args.vina,
                             workers=args.workers)
    out = args.out or os.path.join(args.result_root, "metrics.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(json.dumps(report, indent=1, default=float))
    return report


if __name__ == "__main__":
    main()
