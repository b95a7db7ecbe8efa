"""Diagnose the persistent NaN gradient in the q3 GraphBP run.

Loads the frozen checkpoint (params stuck since ~iter 12700), rebuilds the
exact training batch pipeline, and computes grads with jax_debug_nans on CPU
to locate the first NaN-producing primitive.
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cbgbench_tpu.utils.config import load_config, set_derived_fields
from cbgbench_tpu.models import get_model
from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
from cbgbench_tpu.data.graphbp_seq import (build_graphbp_sample,
                                           stack_graphbp_batch)
from cbgbench_tpu.train.checkpoint import load_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/q3_graphbp/run/checkpoints")
    ap.add_argument("--step", type=int, default=15000)
    ap.add_argument("--debug_nans", action="store_true")
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    cfg = set_derived_fields(load_config("configs/denovo/train/graphbp.yml"))
    model = get_model(cfg["model"])
    ds = RawPairDataset(example_pairs(), mode="basic", pocket_radius=10.0)
    rng = np.random.default_rng(0)
    n_types = cfg["model"].get("num_atomtype", 13)

    samples = [build_graphbp_sample(ds.get(i % len(ds), rng), rng,
                                    num_atom_types=n_types)
               for i in range(8)]
    batch = stack_graphbp_batch(samples, cap=928 + 160)

    import os
    state, meta = load_checkpoint(os.path.join(args.ckpt, str(args.step)))
    params = state["params"]
    print(f"loaded step {meta.get('step', args.step)}")

    def loss_fn(p, key):
        loss_dict, _ = model.apply(p, batch, None, key)
        total = model.weighted_loss(loss_dict)
        return total, loss_dict

    for i in range(args.batches):
        key = jax.random.PRNGKey(100 + i)
        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key)
        gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float64) ** 2)
                                   for g in jax.tree_util.tree_leaves(grads))))
        print(f"batch {i}: loss={float(total):.4f} grad_norm={gnorm:.4f} "
              + " ".join(f"{k}={float(v):.4f}" for k, v in ld.items()))
        if not np.isfinite(gnorm):
            bad = [jax.tree_util.keystr(kp)
                   for kp, g in jax.tree_util.tree_leaves_with_path(grads)
                   if not bool(jnp.all(jnp.isfinite(g)))]
            print(f"  non-finite grad leaves ({len(bad)}):")
            for b in bad[:40]:
                print("   ", b)
    return 0


if __name__ == "__main__":
    sys.exit(main())
