"""Collect GraphBP model-rollout prefixes for scheduled-sampling
fine-tuning (VERDICT r4 #4).

Runs the real sampler k=1..kmax steps from each training pocket (the
train config's own dataset/transform frame) and stores every placed
prefix. Because placement appends sequentially, one kmax-step rollout
yields a valid state at every truncation length, so a single compile
serves all k. The prefixes feed
data/graphbp_seq.build_graphbp_rollout_sample via
train_cli --graphbp_rollouts.

Usage:
  python scripts/graphbp_rollouts.py --config configs/denovo/train/graphbp.yml \
      --checkpoint logs/q3_graphbp7/... --out assets/rollouts_graphbp.npz \
      [--per_pocket 32] [--kmax 6] [--device cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--select", default="latest")
    ap.add_argument("--out", required=True)
    ap.add_argument("--per_pocket", type=int, default=32)
    ap.add_argument("--kmax", type=int, default=6)
    ap.add_argument("--device", default=None)
    ap.add_argument("--lig_cap", type=int, default=64)
    ap.add_argument("--rec_cap", type=int, default=928)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cbgbench_tpu.data.graphbp_seq import (build_graphbp_sample,
                                               stack_graphbp_batch)
    from cbgbench_tpu.models import get_model
    from cbgbench_tpu.models.graphbp import sample_graphbp
    from cbgbench_tpu.train.checkpoint import load_checkpoint
    from cbgbench_tpu.utils.config import Config, load_config
    from cbgbench_tpu.cli.train_cli import build_dataset

    cfg = load_config(args.config)
    state_raw, meta = load_checkpoint(args.checkpoint, select=args.select)
    model = get_model(Config(meta["config"])["model"])
    params = state_raw["params"]
    ds = build_dataset(cfg["data"]["train"], Config(meta["config"])["model"].get("mode", "basic"))
    print(f"dataset: {len(ds)} pockets; checkpoint iter {meta['iteration']}",
          flush=True)

    rng = np.random.default_rng(args.seed)
    store = {}
    for i in range(len(ds)):
        base = ds.get(i, rng)
        n_coll = 0
        bi = 0
        while n_coll < args.per_pocket * args.kmax and bi < 16:
            bs = 16
            samples = [build_graphbp_sample(base, rng,
                                            num_atom_types=model.num_classes)
                       for _ in range(bs)]
            samples = [s for s in samples if s is not None]
            if not samples:
                break
            gb = stack_graphbp_batch(samples,
                                     cap=args.rec_cap + args.lig_cap)
            gen = np.array(gb.gen_flag)
            mask = np.array(gb.mask) & ~gen
            empty = gb.replace(mask=jnp.asarray(mask),
                               gen_flag=jnp.zeros_like(gb.gen_flag),
                               is_first_step=jnp.ones(len(samples), bool))
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                     i * 131 + bi)
            out = sample_graphbp(model, params, empty, key,
                                 max_atoms=args.kmax, min_atoms=0)
            gmask = np.asarray(out["gen_flag"])
            pos = np.asarray(out["pos"])
            z = np.asarray(out["z"])
            for r in range(len(samples)):
                sel = np.where(gmask[r])[0]
                if len(sel) == 0:
                    continue
                # placement appends in slot order -> prefix truncations
                sel = sel[np.argsort(sel)]
                for k in range(1, len(sel) + 1):
                    store[f"p{i}_{n_coll}_pos"] = pos[r, sel[:k]]
                    store[f"p{i}_{n_coll}_types"] = z[r, sel[:k]]
                    n_coll += 1
            bi += 1
        print(f"pocket {i}: {n_coll} prefixes", flush=True)
    np.savez(args.out, **store)
    print(f"wrote {len(store) // 2} prefixes to {args.out}", flush=True)


if __name__ == "__main__":
    main()
