"""Host-side declash post-processing of an existing results folder.

Reads <src>/NNNN_name/*.sdf, declashes each molecule against the SAME
full-pocket receptor the evaluator uses (parse_pdb_pocket of the paired
PDB), optionally cycles with the valence-aware pose projection, and
writes <dst> with copied summary.json so evaluate_cli sees the right
denominator. Lets the declash/geometry trade-off be measured without
resampling (the device samples are unchanged).

Usage:
  python scripts/postprocess_declash.py --src results/q4_graphbp7b \
      --dst results/q4_graphbp7e --mode declash|cycle
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np


def stamp_provenance(dst: str, src: str, mode: str, extra=None):
    """Append a self-describing provenance entry to <dst>/summary.json.

    Re-emitted results dirs must say so in the artifact itself (not only
    in BASELINE.md prose): which run the SDFs came from, what host-side
    post-processing was applied, and when. evaluate_cli's denominator
    reader skips entries without ``n_samples``/``index`` keys, so the
    trailing dict is invisible to it."""
    import time as _time
    path = os.path.join(dst, "summary.json")
    entries = []
    if os.path.exists(path):
        with open(path) as f:
            entries = json.load(f)
    entries = [e for e in entries if "reemitted_from" not in e]
    prov = {"reemitted_from": os.path.normpath(src),
            "postprocess": mode,
            "reemitted_at": _time.strftime("%Y-%m-%dT%H:%M:%S")}
    if extra:
        prov.update(extra)
    entries.append(prov)
    with open(path, "w") as f:
        json.dump(entries, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--mode", default="declash",
                    choices=["declash", "cycle", "hybrid", "gentle", "shake",
                             "project", "flagship", "flagship2"])
    ap.add_argument("--protein_root", default="assets/examples")
    args = ap.parse_args()

    from cbgbench_tpu.chem.declash import (declash_pose,
                                           declash_pose_shake)
    from cbgbench_tpu.chem.pdb import parse_pdb_pocket
    from cbgbench_tpu.chem.project import project_stable_pose
    from cbgbench_tpu.chem.sdf import read_sdf, write_sdf
    from cbgbench_tpu.cli.evaluate_cli import build_protein_lookup

    lookup = build_protein_lookup(args.protein_root)
    os.makedirs(args.dst, exist_ok=True)
    summ = os.path.join(args.src, "summary.json")
    if os.path.exists(summ):
        shutil.copy(summ, os.path.join(args.dst, "summary.json"))

    for pdir in sorted(glob.glob(os.path.join(args.src, "[0-9]*_*"))):
        name = os.path.basename(pdir)
        pair = lookup(name)
        out_dir = os.path.join(args.dst, name)
        os.makedirs(out_dir, exist_ok=True)
        rp = None
        if pair is not None:
            p_atoms, _ = parse_pdb_pocket(pair[0])
            rp = np.asarray(p_atoms.pos, np.float64)
        for f in sorted(glob.glob(os.path.join(pdir, "*.sdf"))):
            mols = read_sdf(f)
            m = mols[0] if isinstance(mols, list) else mols
            if args.mode == "project":
                # valence-aware stability projection only (the
                # --project_stable CLI path; no receptor needed)
                m = project_stable_pose(m)
            elif args.mode == "flagship2" and rp is not None:
                # flagship + restore_bonds: in-window bonds are held at
                # the generator's own lengths during the joint solve, so
                # the clearance pushes cannot drift the bond-length
                # distribution (the SHAKE insight inside the solver)
                m = project_stable_pose(m, rec_pos=rp, restore_bonds=True)
            elif args.mode == "flagship" and rp is not None:
                # the sample_cli --project_stable --declash composition:
                # JOINT solve of the stability windows and the receptor
                # clearance hinge (chem/project.py rec_pos path);
                # sequential orders lose one side (project->SHAKE: bond
                # restore drift costs mol_stable 0.94->0.59; SHAKE->
                # project re-enters the pocket, clash 0.94)
                m = project_stable_pose(m, rec_pos=rp)
            elif rp is not None:
                if args.mode == "declash":
                    m = declash_pose(m, rp)
                elif args.mode == "shake":
                    m = declash_pose_shake(m, rp)
                elif args.mode == "gentle":
                    # rigid-dominant, tightly capped per-atom, no
                    # projection: bond lengths nearly untouched
                    m = declash_pose(m, rp, iters=16, per_atom_cap=0.08)
                elif args.mode == "hybrid":
                    # geometry-first cycles, then guarantee clearance
                    # with a final unprojected declash (local damage
                    # only near residual contacts)
                    for _ in range(6):
                        m = declash_pose(m, rp, iters=4)
                        m = project_stable_pose(m)
                        d = np.linalg.norm(
                            np.asarray(m.pos)[:, None] - rp[None],
                            axis=-1).min()
                        if d >= 3.2:
                            break
                    m = declash_pose(m, rp, iters=10)
                else:
                    for _ in range(6):
                        m = declash_pose(m, rp, iters=4)
                        m = project_stable_pose(m)
                        d = np.linalg.norm(
                            np.asarray(m.pos)[:, None] - rp[None],
                            axis=-1).min()
                        if d >= 3.2:
                            break
                    m = declash_pose(m, rp, iters=6, per_atom_cap=0.0)
            write_sdf(os.path.join(out_dir, os.path.basename(f)), m)
        print(name, "done", flush=True)
    stamp_provenance(args.dst, args.src, args.mode)


if __name__ == "__main__":
    main()
