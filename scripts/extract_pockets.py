"""Build a pocket10-style dataset from raw protein/ligand pairs.

TPU-native rebuild of the reference's dataset builder
(/root/reference/scripts/extract_pockets.py:23-48 +
repo/datasets/parsers/protein_parser.py:167-178): for every
(protein.pdb, ligand.sdf) pair, keep the residues with any atom within
--radius Angstrom of any ligand atom and write them as
<ligand>_pocket<R>.pdb next to a copy of the ligand.

Two input layouts:
  * --index index.pkl  — the reference's CrossDocked index: a pickled list
    of (protein_fn, ligand_fn, *extra) tuples relative to --source. The
    output index.pkl records (pocket_fn, ligand_fn, protein_fn, *extra).
  * directory scan      — any tree holding *_protein.pdb / *_ligand.sdf
    siblings (the assets/examples convention).

Residue selection works on the raw PDB text so the output preserves the
original ATOM records byte-for-byte (occupancy, B-factor, altloc...),
exactly like the reference's residues_to_pdb_block.
"""

import argparse
import multiprocessing as mp
import os
import pickle
import shutil
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbgbench_tpu.chem.mol2 import read_ligand  # noqa: E402


def pocket_pdb_block(pdb_text: str, lig_pos: np.ndarray,
                     radius: float) -> str:
    """Keep ATOM records of residues with any atom within radius of the
    ligand; group key = (chain, resseq, icode) like the reference parser."""
    groups = {}        # key -> [line, ...] in first-seen order
    order = []
    for line in pdb_text.splitlines():
        if not line.startswith("ATOM"):
            continue
        key = (line[21], line[22:26], line[26])
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(line)

    lig = np.asarray(lig_pos, float)
    kept = []
    for key in order:
        lines = groups[key]
        xyz = np.array([[float(l[30:38]), float(l[38:46]), float(l[46:54])]
                        for l in lines])
        d2 = ((xyz[:, None, :] - lig[None, :, :]) ** 2).sum(-1)
        if d2.min() <= radius * radius:
            kept.extend(lines)
    return "\n".join(kept) + ("\nEND\n" if kept else "END\n")


def process_item(item, source: str, dest: str, radius: float):
    """item = (protein_fn, ligand_fn, *extra) relative to source."""
    protein_fn, ligand_fn, extra = item[0], item[1], tuple(item[2:])
    try:
        with open(os.path.join(source, protein_fn)) as f:
            pdb_text = f.read()
        mol = read_ligand(os.path.join(source, ligand_fn))[0]
        block = pocket_pdb_block(pdb_text, mol.pos, radius)

        pocket_fn = os.path.splitext(ligand_fn)[0] + "_pocket%d.pdb" % int(radius)
        ligand_dest = os.path.join(dest, ligand_fn)
        os.makedirs(os.path.dirname(ligand_dest), exist_ok=True)
        if not os.path.exists(ligand_dest):
            shutil.copyfile(os.path.join(source, ligand_fn), ligand_dest)
        with open(os.path.join(dest, pocket_fn), "w") as f:
            f.write(block)
        return (pocket_fn, ligand_fn, protein_fn) + extra
    except Exception as e:  # mirror the reference: record the failure row
        print("failed:", item[:2], e)
        return (None, ligand_fn, protein_fn) + extra


def scan_pairs(source: str):
    items = []
    for root, _dirs, files in os.walk(source):
        rel = os.path.relpath(root, source)
        for fn in sorted(files):
            if fn.endswith(("_ligand.sdf", "_ligand.mol2")):
                stem = fn[: fn.rindex("_ligand")]
                prot = stem + "_protein.pdb"
                if prot in files:
                    pfx = "" if rel == "." else rel + "/"
                    items.append((pfx + prot, pfx + fn, 0.0))
    return items


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--index", default=None,
                   help="index.pkl relative to --source (reference layout); "
                        "omit to scan for *_protein.pdb/*_ligand.sdf pairs")
    p.add_argument("--radius", type=float, default=10.0)
    p.add_argument("--workers", type=int, default=max(mp.cpu_count() - 1, 1))
    args = p.parse_args(argv)

    if args.index:
        with open(os.path.join(args.source, args.index), "rb") as f:
            items = [tuple(it) for it in pickle.load(f)]
    else:
        items = scan_pairs(args.source)
    print(f"{len(items)} pairs")

    os.makedirs(args.dest, exist_ok=True)
    fn = partial(process_item, source=args.source, dest=args.dest,
                 radius=args.radius)
    if args.workers > 1 and len(items) > 1:
        with mp.Pool(args.workers) as pool:
            index = pool.map(fn, items)
    else:
        index = [fn(it) for it in items]

    with open(os.path.join(args.dest, "index.pkl"), "wb") as f:
        pickle.dump(index, f)
    ok = sum(1 for row in index if row[0] is not None)
    print(f"done: {ok}/{len(index)} pockets -> {args.dest}")


if __name__ == "__main__":
    main()
