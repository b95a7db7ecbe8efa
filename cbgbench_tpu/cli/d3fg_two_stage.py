"""D3FG two-stage denovo sampling CLI.

Orchestrates the reference's two-pass protocol (reference: sample.py
run twice — first with the difffg config writing gen_ctx_pool_<i>.pkl,
then with the linker config whose transforms load it; SURVEY §3.4):

  stage 1: difffg checkpoint -> FG frames per pocket -> context pools
  stage 2: targetdiff (linker) checkpoint -> diffuse linker atoms around
           the fixed FG context (load_ctx + assign_* priors +
           merge_ctx_gen) -> reconstruct + SDF via the sample CLI path.

Usage:
  python -m cbgbench_tpu.cli.d3fg_two_stage \
      --fg_checkpoint <difffg ckpt dir> \
      --linker_checkpoint <targetdiff ckpt dir> \
      --raw_path assets/examples --out_root results_d3fg \
      [--num_samples 16] [--index 0]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fg_checkpoint", required=True)
    p.add_argument("--linker_checkpoint", required=True)
    p.add_argument("--raw_path", default="assets/examples")
    p.add_argument("--out_root", default="./results_d3fg")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--index", type=int, default=None)
    p.add_argument("--pocket_radius", type=float, default=10.0)
    p.add_argument("--lig_cap", type=int, default=96)
    p.add_argument("--rec_cap", type=int, default=928)
    p.add_argument("--select", default="latest", choices=["latest", "best"],
                   help="checkpoint-dir resolution: highest step or lowest "
                        "recorded val loss")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ..chem import evaluate_validity, reconstruct_molecule, write_sdf
    from ..data.dataset import RawPairDataset, scan_pair_dir
    from ..data.transforms import compose
    from ..models import get_model
    from ..sampling.d3fg_stage import run_stage1
    from ..train.checkpoint import load_checkpoint
    from ..utils.config import Config

    logging.basicConfig(force=True, level=logging.INFO,
                        format="[%(asctime)s] %(message)s")
    log = logging.getLogger("d3fg")

    fg_state, fg_meta = load_checkpoint(args.fg_checkpoint,
                                        select=args.select)
    fg_model = get_model(Config(fg_meta["config"])["model"])
    lk_state, lk_meta = load_checkpoint(args.linker_checkpoint,
                                        select=args.select)
    lk_model = get_model(Config(lk_meta["config"])["model"])
    lk_mode = Config(lk_meta["config"])["model"].get("mode", "basic")
    log.info("stage-1 model %s | stage-2 model %s",
             Config(fg_meta["config"])["model"]["type"],
             Config(lk_meta["config"])["model"]["type"])

    ds = RawPairDataset(scan_pair_dir(args.raw_path), mode="basic",
                        pocket_radius=args.pocket_radius)
    os.makedirs(args.out_root, exist_ok=True)
    indices = [args.index] if args.index is not None else range(len(ds))
    summary = []
    for i in indices:
        t0 = time.time()
        # ---- stage 1: FG context pool ----
        pool = run_stage1(fg_model, fg_state["params"], ds, i,
                          args.num_samples, args.batch_size, args.out_root)
        log.info("pocket %d: stage-1 pool at %s", i, pool)

        # ---- stage 2: linker diffusion around the fixed FGs ----
        transform = compose([
            {"type": "center_pos", "center_flag": "protein"},
            {"type": "remove_ligand"},
            {"type": "load_ctx", "ctx_path": pool, "mode": lk_mode},
            {"type": "assign_linkernum"},
            {"type": "assign_atomtype", "distribution": "uniform",
             "mode": lk_mode},
            {"type": "assign_molpos", "distribution": "gaussian"},
            {"type": "merge_ctx_gen"},
        ])
        from ..cli.sample_cli import SAMPLERS, _register_samplers
        from ..data.dataset import repeat_for_sampling
        _register_samplers()
        sampler = SAMPLERS[Config(lk_meta["config"])["model"]["type"]]
        name = os.path.splitext(os.path.basename(ds.pairs[i][1]))[0]
        out_dir = os.path.join(args.out_root, f"{i:04d}_{name}")
        os.makedirs(out_dir, exist_ok=True)
        n_done = n_valid = 0
        for bi, batch in enumerate(repeat_for_sampling(
                ds, i, args.num_samples, args.batch_size, transform,
                lig_cap=args.lig_cap, rec_cap=args.rec_cap)):
            rng = jax.random.fold_in(jax.random.PRNGKey(2022), bi * 131 + i)
            out = sampler(lk_model, lk_state["params"], batch, rng)
            pos = np.asarray(out["pos"]) + np.asarray(
                batch.translation)[:, None]
            atype = np.asarray(out["atype"])
            mask = np.asarray(batch.ligand.mask)
            for s in range(pos.shape[0]):
                if n_done >= args.num_samples:
                    break
                n_done += 1
                try:
                    mol = reconstruct_molecule(pos[s][mask[s]],
                                               atype[s][mask[s]],
                                               mode=lk_mode)
                    frag, ok = evaluate_validity(mol)
                except Exception:
                    ok = False
                if ok:
                    write_sdf(os.path.join(out_dir, f"{n_valid}.sdf"), frag)
                    n_valid += 1
        dt = time.time() - t0
        log.info("pocket %d (%s): %d/%d valid | %.1fs", i, name,
                 n_valid, n_done, dt)
        summary.append({"index": int(i), "name": name, "n_samples": n_done,
                        "n_valid": n_valid, "seconds": dt})
    with open(os.path.join(args.out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
