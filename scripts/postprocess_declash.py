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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--mode", default="declash",
                    choices=["declash", "cycle", "hybrid", "gentle", "shake"])
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
            if rp is not None:
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


if __name__ == "__main__":
    main()
