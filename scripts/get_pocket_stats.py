"""Regenerate the pocket-size-conditioned sampling priors from a dataset.

Rebuilds the {bounds, bins} histograms consumed by the assign_molsize /
assign_linkernum / assign_fgnum transforms
(reference: scripts/get_pocket_fg_stat.py + get_pocket_linker_stat.py:
pocket size = median of the 10 largest pairwise distances; 20 linear bins
over the observed size range; per-bin empirical count distribution).

Usage:
  python scripts/get_pocket_stats.py --raw_path <pairs dir> \
      --stat atom_num --out assets/priors/_atom_num_dist.npy
  --stat one of: atom_num (ligand heavy-atom count), linker_num
  (linker-decomp gen-atom count), fg_num (functional-group count).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--raw_path", default="assets/examples")
    p.add_argument("--stat", default="atom_num",
                   choices=["atom_num", "linker_num", "fg_num"])
    p.add_argument("--out", default=None)
    p.add_argument("--num_bins", type=int, default=20)
    p.add_argument("--pocket_radius", type=float, default=10.0)
    args = p.parse_args(argv)

    from cbgbench_tpu.chem import read_sdf
    from cbgbench_tpu.chem.mol2 import read_ligand
    from cbgbench_tpu.chem.pdb import parse_pdb_pocket, pocket_shell
    from cbgbench_tpu.data.dataset import scan_pair_dir
    from cbgbench_tpu.data.transforms import get_space_size

    rng = np.random.default_rng(0)
    sizes, counts = [], []
    pairs = scan_pair_dir(args.raw_path)
    if not pairs:
        raise SystemExit(f"no (pdb, sdf) pairs under {args.raw_path}")
    for pdb, sdf in pairs:
        try:
            atoms, residues = parse_pdb_pocket(pdb)
            mol = read_ligand(sdf)[0]
            atoms, _ = pocket_shell(atoms, residues, mol.pos,
                                    args.pocket_radius)
        except Exception as e:
            print(f"skip {sdf}: {e}", file=sys.stderr)
            continue
        size = get_space_size(atoms.pos)
        if args.stat == "atom_num":
            n = mol.num_atoms
        elif args.stat == "linker_num":
            from cbgbench_tpu.chem.decomp import linker_decomp
            out = linker_decomp(mol, rng)
            if out is None:
                continue
            n = len(out[0])
        else:
            from cbgbench_tpu.chem.fg_detect import decompose_fg
            n = sum(1 for f in decompose_fg(mol) if len(f["atoms"]) > 1)
        sizes.append(size)
        counts.append(int(n))
        print(f"{os.path.basename(sdf)}: size {size:.2f} A, "
              f"{args.stat} {n}", file=sys.stderr)

    sizes = np.asarray(sizes)
    counts = np.asarray(counts)
    bounds = np.linspace(sizes.min(), sizes.max(), args.num_bins)
    # reference binning: sample i contributes to every bin whose bound
    # exceeds its size (cumulative; get_pocket_linker_stat.py:63-68)
    per_bin = [[] for _ in bounds]
    for s, n in zip(sizes, counts):
        for i, b in enumerate(bounds):
            if b > s:
                per_bin[i].append(int(n))
    bounds = bounds[1:]
    per_bin = per_bin[1:]
    # overflow bin: sample_count_from_prior indexes bins[len(bounds)] when
    # a pocket's space_size >= every bound (the bundled reference priors
    # carry len(bounds)+1 bins for exactly this reason) — use the full
    # empirical distribution there
    per_bin.append([int(n) for n in counts])
    bins = []
    for vals in per_bin:
        if not vals:
            bins.append(([int(counts.mean())], [1.0]))
            continue
        c = Counter(vals)
        total = sum(c.values())
        keys = sorted(c)
        bins.append((keys, [c[k] / total for k in keys]))

    stat = {"bounds": bounds.tolist(), "bins": bins}
    out = args.out or f"_{args.stat}_dist.npy"
    np.save(out if out.endswith(".npy") else out + ".npy", stat,
            allow_pickle=True)
    print(f"wrote {out} ({len(bins)} bins over "
          f"[{sizes.min():.1f}, {sizes.max():.1f}] A, "
          f"{len(counts)} samples)")
    return stat


if __name__ == "__main__":
    main()
