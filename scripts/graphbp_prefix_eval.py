"""GraphBP teacher-forced prefix evaluation (VERDICT r3 #3).

Controlled test of the corpus-ceiling hypothesis: the claim is that
GraphBP's 6.6% validity comes from the first flow placements landing
slightly off the 5-pocket training manifold, after which the (accurate)
focus head reads the state as complete and the reference's min_atoms
discard rule (reference: repo/models/autoregression/graphbp.py:296-340)
kills the molecule. If that is the mechanism, conditioning the sampler
on an ON-MANIFOLD prefix — the first k atoms of the crystal ligand in
Prim order, exactly the atoms the model was trained to continue from —
must lift completion validity sharply with k. If validity stays flat,
the sampler (not the corpus) is at fault.

Usage:
  python scripts/graphbp_prefix_eval.py \
      --checkpoint logs/q3_graphbp7/run/checkpoints \
      --config configs/denovo/test/graphbp.yml \
      --ks 0,1,3,5 --num_samples 100 --out results/q4_graphbp_prefix

Writes <out>/prefix_table.json with per-k validity and atom counts.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_prefix_batch(base, rng, model, k, bs, cap):
    """Batch whose first k ligand atoms are the crystal prefix (Prim
    order, no jitter) — placed (mask/gen_flag True), so the scan grows
    the completion. k=0 reproduces the standard empty start."""
    import jax.numpy as jnp
    import numpy as np

    from cbgbench_tpu.data.graphbp_seq import (build_graphbp_sample,
                                               stack_graphbp_batch)

    samples = []
    for _ in range(bs):
        s = build_graphbp_sample(base, rng, num_atom_types=model.num_classes,
                                 step=k, pos_noise=0.0)
        if s is not None:
            samples.append(s)
    if not samples:
        raise RuntimeError("no gen atoms to sequence")
    gb = stack_graphbp_batch(samples, cap=cap)
    if k == 0:
        gen = np.array(gb.gen_flag)
        mask = np.array(gb.mask) & ~gen
        return gb.replace(mask=jnp.asarray(mask),
                          gen_flag=jnp.zeros_like(gb.gen_flag),
                          is_first_step=jnp.ones(len(samples), bool))
    # step=k builds include exactly the k-atom placed prefix in
    # mask/gen_flag already; growth continues from there
    return gb.replace(is_first_step=jnp.zeros(len(samples), bool))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default="configs/denovo/test/graphbp.yml")
    ap.add_argument("--select", default="latest")
    ap.add_argument("--ks", default="0,1,3,5")
    ap.add_argument("--num_samples", type=int, default=100,
                    help="per k, split across all pockets")
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--lig_cap", type=int, default=96)
    ap.add_argument("--rec_cap", type=int, default=928)
    ap.add_argument("--min_atoms", type=int, default=12)
    ap.add_argument("--out", default="results/q4_graphbp_prefix")
    args = ap.parse_args()

    import numpy as np

    import jax

    from cbgbench_tpu.chem import evaluate_validity, reconstruct_molecule
    from cbgbench_tpu.cli.train_cli import build_dataset
    from cbgbench_tpu.data.transforms import compose
    from cbgbench_tpu.models import get_model
    from cbgbench_tpu.models.graphbp import sample_graphbp
    from cbgbench_tpu.train.checkpoint import load_checkpoint
    from cbgbench_tpu.utils.config import Config, load_config

    cfg = load_config(args.config)
    state_raw, meta = load_checkpoint(args.checkpoint, select=args.select)
    model_cfg = Config(meta["config"])["model"]
    model = get_model(model_cfg)
    params = state_raw["params"]
    print(f"# loaded graphbp checkpoint iter {meta['iteration']}")

    mode = model_cfg.get("mode", "add_aromatic")
    ds = build_dataset({**cfg["data"]["test"], "transform": []}, mode)
    ds.transform = None
    cap = args.rec_cap + args.lig_cap

    ks = [int(x) for x in args.ks.split(",")]
    table = []
    for k in ks:
        n_valid = n_done = n_atoms_sum = n_grown_sum = 0
        t0 = time.time()
        for i in range(len(ds)):
            rng = np.random.default_rng(2022 + i)
            base = ds.get(i, rng)
            per_pocket = args.num_samples // len(ds)
            done = 0
            bi = 0
            while done < per_pocket:
                bs = min(args.batch_size, per_pocket - done)
                key = jax.random.fold_in(
                    jax.random.PRNGKey(2022), (k + 1) * 10007 + bi * 97 + i)
                batch = build_prefix_batch(base, rng, model, k, bs, cap)
                out = sample_graphbp(model, params, batch, key,
                                     max_atoms=args.lig_cap // 2,
                                     min_atoms=args.min_atoms)
                gmask = np.asarray(out["gen_flag"])
                z_raw = np.asarray(out["z"])
                pos = np.asarray(out["pos"])
                pre_mask = np.asarray(batch.mask) & np.asarray(
                    batch.gen_flag)
                for s in range(gmask.shape[0]):
                    if done >= per_pocket:
                        break
                    done += 1
                    n_done += 1
                    sel = gmask[s]
                    n_grown_sum += int(sel.sum()) - int(pre_mask[s].sum())
                    if sel.sum() < args.min_atoms:
                        continue
                    atype = np.clip(z_raw[s][sel], 0,
                                    model.num_classes - 1)
                    try:
                        mol = reconstruct_molecule(pos[s][sel], atype,
                                                   mode=mode)
                        frag, ok = evaluate_validity(mol)
                    except Exception:
                        ok = False
                    if ok:
                        n_valid += 1
                        n_atoms_sum += frag.num_atoms
                bi += 1
        row = {"k": k, "n": n_done, "valid": n_valid,
               "validity": n_valid / max(n_done, 1),
               "mean_atoms_valid": (n_atoms_sum / n_valid
                                    if n_valid else None),
               "mean_grown": n_grown_sum / max(n_done, 1),
               "seconds": round(time.time() - t0, 1)}
        table.append(row)
        print(json.dumps(row))

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "prefix_table.json"), "w") as f:
        json.dump({"checkpoint": args.checkpoint,
                   "iteration": int(meta["iteration"]),
                   "min_atoms": args.min_atoms, "rows": table}, f, indent=1)
    print(f"# wrote {args.out}/prefix_table.json")


if __name__ == "__main__":
    main()
