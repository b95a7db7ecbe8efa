"""Sampling CLI: per-pocket generation + reconstruction + SDF export
(reference: sample.py + generate.sh).

Usage: python -m cbgbench_tpu.cli.sample_cli --config configs/denovo/test/targetdiff.yml \
           --checkpoint logs/<run>/checkpoints [--out_root results] \
           [--num_samples 16] [--batch_size 16] [--index 0]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


SAMPLERS = {}


def _register_samplers():
    from ..models.targetdiff import sample_targetdiff
    from ..models.diffbp import sample_diffbp
    from ..models.diffsbdd import sample_diffsbdd
    from ..models.d3fg import sample_d3fg
    SAMPLERS.update({"targetdiff": sample_targetdiff, "diffbp": sample_diffbp,
                     "diffsbdd": sample_diffsbdd, "difffg": sample_d3fg,
                     "difffg_v2": sample_d3fg})


def _sample_ar_batches(model_type, model, params, ds, index, num_samples,
                       batch_size, seed, lig_cap, rec_cap, transform=None,
                       refine_iters=0, refine_clash=0.0,
                       clash_cand=1, clash_min=0.0, flag_steric=False,
                       motif_prior=0.0):
    """AR growth sampling (pocket2mol / graphbp): yield (pos, atype, mask)
    numpy arrays per replica batch, in the original coordinate frame.
    When the test transform yields a decomp split (ctx_flag), the kept
    fragment is the initial growth context (reference: linker/frag/
    scaffold/sidechain test configs for the AR models)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    base = ds.get(index, rng)
    if transform is not None:
        base = transform(base, rng)
    ctx_flag = np.asarray(base["ligand"].get(
        "ctx_flag", np.zeros(len(base["ligand"]["atype"]), bool)), bool)
    has_ctx = bool(ctx_flag.any())
    done = 0
    bi = 0
    while done < num_samples:
        bs = min(batch_size, num_samples - done)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), bi * 997 + index)
        if model_type == "pocket2mol":
            from ..data.p2m import (build_p2m_ctx_start, build_p2m_sample,
                                    stack_p2m_batch)
            from ..models.pocket2mol import sample_pocket2mol
            if has_ctx:
                samples = [build_p2m_ctx_start(base, num_contrast=4,
                                               edge_cap=8)
                           for _ in range(bs)]
                start = stack_p2m_batch(samples, lig_cap=lig_cap,
                                        rec_cap=rec_cap, truncate=True)
            else:
                samples = [build_p2m_sample(base, rng, num_contrast=4,
                                            edge_cap=8) for _ in range(bs)]
                batch = stack_p2m_batch(samples, lig_cap=lig_cap,
                                        rec_cap=rec_cap, truncate=True)
                start = batch.replace(
                    ctx_pos=jnp.zeros_like(batch.ctx_pos),
                    ctx_atype=jnp.zeros_like(batch.ctx_atype),
                    ctx_mask=jnp.zeros_like(batch.ctx_mask),
                    ctx_bond=jnp.zeros_like(batch.ctx_bond),
                    ctx_frontier=jnp.zeros_like(batch.ctx_frontier),
                    rec_pred_flag=batch.rec_mask)
            out = sample_pocket2mol(model, params, start, key,
                                    max_iter=lig_cap // 2)
            yield (np.asarray(out["pos"]), np.asarray(out["atype"]),
                   np.asarray(out["mask"]))
        elif model_type == "graphbp":
            from ..data.graphbp_seq import (build_graphbp_sample,
                                            stack_graphbp_batch)
            from ..models.graphbp import sample_graphbp
            samples = [build_graphbp_sample(base, rng,
                                            num_atom_types=model.num_classes)
                       for _ in range(bs)]
            samples = [s for s in samples if s is not None]
            if not samples:
                raise RuntimeError("graphbp: no gen atoms to sequence")
            gb = stack_graphbp_batch(samples, cap=rec_cap + lig_cap)
            gen = np.array(gb.gen_flag)
            mask = np.array(gb.mask) & ~gen
            empty = gb.replace(mask=jnp.asarray(mask),
                               gen_flag=jnp.zeros_like(gb.gen_flag),
                               is_first_step=jnp.ones(len(samples), bool))
            # min_atoms=12 is the reference default (graphbp.py:227);
            # molecules completing below it are discarded, not force-grown.
            # clash_cand/clash_min come from the CLI: default 1/0.0 is the
            # reference's single-draw flow placement; --clash_cand 8
            # --clash_min 3.2 is the measured steric extension (first of 8
            # flow draws clearing 3.2 A to the receptor — the evaluator's
            # largest vdW-sum-minus-tolerance band, S/P pairs).
            out = sample_graphbp(model, params, empty, key,
                                 max_atoms=lig_cap // 2, min_atoms=12,
                                 clash_cand=clash_cand, clash_min=clash_min)
            gmask = np.asarray(out["gen_flag"])
            z_raw = np.asarray(out["z"])
            # molecule nodes: generated atoms plus ligand-vocab context
            # nodes that were already present BEFORE growth (decomp tasks).
            # Scanning out["mask"] for ligand-vocab ids would resurrect
            # atoms of discarded (completed-too-small) molecules — those
            # have gen_flag cleared but still occupy mask slots.
            lig_nodes = gmask | (mask & (z_raw < model.num_classes))
            atype = np.clip(z_raw, 0, model.num_classes - 1)
            rec_nodes = mask & (z_raw >= model.num_classes)
            yield np.asarray(out["pos"]), atype, lig_nodes, rec_nodes
        elif model_type == "flag":
            from ..sampling.flag_sample import (sample_flag_batch,
                                                vocab_from_dataset)
            if not hasattr(ds, "_flag_vocab"):
                ds._flag_vocab = vocab_from_dataset(ds)
            # one device call per growth round for the whole batch
            # (per-molecule loops cost ~48 round-trips per molecule)
            mols = sample_flag_batch(
                model, params, base, ds._flag_vocab,
                seeds=[seed + bi * 997 + s for s in range(bs)],
                max_steps=12,     # reference default (flag.py:251)
                lig_cap=min(lig_cap, 64), rec_cap=rec_cap,
                refine_iters=refine_iters, refine_clash=refine_clash,
                steric=flag_steric, motif_prior_alpha=motif_prior)
            yield ("mols", [m for m in mols if m is not None], bs)
        else:
            raise ValueError(model_type)
        done += bs
        bi += 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint step dir or checkpoints/ dir")
    p.add_argument("--select", default="latest", choices=["latest", "best"],
                   help="when --checkpoint is a dir: highest step (latest, "
                        "the reference generate.sh protocol) or lowest "
                        "recorded val loss (best)")
    p.add_argument("--out_root", default="./results")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--index", type=int, default=None,
                   help="sample only this test-pocket index")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--lig_cap", type=int, default=96)
    p.add_argument("--rec_cap", type=int, default=928)
    p.add_argument("--mesh", type=int, default=1, metavar="N",
                   help="shard each sampling batch over N devices (pockets/"
                        "samples are embarrassingly parallel; params "
                        "replicated); batch_size must be divisible by N")
    p.add_argument("--num_steps", type=int, default=None,
                   help="fast sampling: strided reverse-diffusion ladder of "
                        "~N steps instead of the full T (diffusion models "
                        "with strided-sampler support)")
    p.add_argument("--eta", type=float, default=1.0,
                   help="stochasticity of strided position steps: 1 = "
                        "ancestral DDPM (default), 0 = deterministic DDIM")
    p.add_argument("--refine_iters", type=int, default=0,
                   help="FLAG: apply the trained structure-refinement "
                        "force heads N times to each grown pose "
                        "(extension; the reference trains but never "
                        "applies them)")
    p.add_argument("--project_stable", action="store_true",
                   help="project reconstructed poses onto the stability "
                        "distance tables (valence-aware bond-length "
                        "projection, chem/project.py) before writing SDFs")
    p.add_argument("--declash", type=int, default=0, metavar="ITERS",
                   help="post-hoc protein-declash iterations on "
                        "reconstructed poses (chem/declash.py: rigid + "
                        "capped per-atom pushes out of the evaluator's "
                        "vdW clash band; combine with --project_stable "
                        "to restore bond lengths)")
    p.add_argument("--refine_clash", type=float, default=0.0,
                   help="FLAG: steric-repulsion step size added to each "
                        "refine iteration (parameter-free physics term; "
                        "pushes atoms out of <2.7 A protein overlap)")
    p.add_argument("--clash_cand", type=int, default=1,
                   help="GraphBP: flow placement draws per step; the first "
                        "clearing --clash_min to the receptor wins. 1 "
                        "(default) = the reference's single-draw placement; "
                        "8 with --clash_min 3.2 is the measured steric "
                        "extension (results/q4_graphbp7b)")
    p.add_argument("--clash_min", type=float, default=0.0,
                   help="GraphBP: receptor clearance (A) a candidate "
                        "placement must reach before acceptance (0 = off; "
                        "use >=3.2 to clear the evaluator's vdW band)")
    p.add_argument("--type_temp", type=float, default=1.0,
                   help="D3FG stage 1: temperature on the predicted FG-type "
                        "distribution before the D3PM posterior (1 = "
                        "reference; >1 flattens a mode-collapsed type head)")
    p.add_argument("--restore_bonds", action="store_true",
                   help="with --project_stable --declash: hold in-window "
                        "bonds at the generator's own lengths inside the "
                        "joint solve (q5_flagship2 recipe — bond-length "
                        "JSD cost +0.04 -> +0.015 at mol_stable 0.94)")
    p.add_argument("--type_prior", type=float, default=0.0, metavar="ALPHA",
                   help="D3FG stage 1: additive importance correction "
                        "ALPHA*(log p_corpus - log p_model) on the clean-"
                        "type logits (corpus = decompose_fg over the "
                        "dataset ligands; model marginal from "
                        "--type_prior_marginal). 0 = reference")
    p.add_argument("--type_prior_marginal",
                   default="results/q3_d3fg/stage1_metrics.json",
                   help="stage1_metrics.json whose gen_hist estimates the "
                        "model's unbiased type marginal for --type_prior")
    p.add_argument("--motif_prior", type=float, default=0.0, metavar="ALPHA",
                   help="FLAG: reweight the top-5 motif draw by the corpus "
                        "motif-frequency prior^ALPHA (0 = the reference's "
                        "uniform top-5; composition lever for the "
                        "hetero-saturation/aromatic-ring QED gap)")
    p.add_argument("--flag_steric", action="store_true",
                   help="FLAG: protein-aware growth extension (seed motif "
                        "push-out to 3.25 A, steric attachment logits, "
                        "receptor-aware placement scan — results/"
                        "q4_flag_steric*). Off = reference-parity growth")
    args = p.parse_args(argv)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ..chem import (evaluate_validity, project_stable_pose,
                        reconstruct_molecule, write_sdf)
    from ..data.dataset import RawPairDataset, repeat_for_sampling
    from ..data.transforms import compose
    from ..models import get_model, sample_time
    from ..train import TrainState, get_optimizer
    from ..train.checkpoint import load_checkpoint
    from ..utils.config import Config, load_config
    from .train_cli import build_dataset, _SUPPORTED_TRANSFORMS

    logging.basicConfig(force=True, level=logging.INFO, format="[%(asctime)s] %(message)s")
    log = logging.getLogger("sample")
    _register_samplers()

    cfg = load_config(args.config)
    state_raw, meta = load_checkpoint(args.checkpoint, select=args.select)
    train_cfg = Config(meta["config"])
    model_cfg = train_cfg["model"]
    model = get_model(model_cfg)
    params = state_raw["params"]
    log.info("loaded %s checkpoint at iter %d", model_cfg["type"],
             meta["iteration"])

    mode = model_cfg.get("mode", "add_aromatic")
    data_cfg = cfg["data"]["test"]
    transform = compose([dict(t) for t in data_cfg.get("transform", [])
                         if t["type"] in _SUPPORTED_TRANSFORMS])
    ds = build_dataset({**data_cfg, "transform": []}, mode)
    ds.transform = None

    num_samples = args.num_samples or cfg.get("sampling", {}).get(
        "num_samples", 200)
    seed = cfg.get("sampling", {}).get("seed", 2022)
    sampler = SAMPLERS.get(model_cfg["type"])
    if args.num_steps is not None:
        if args.num_steps < 1:
            raise SystemExit("--num_steps must be >= 1")
        strided = ("targetdiff", "diffsbdd", "diffbp", "difffg", "difffg_v2")
        if model_cfg["type"] not in strided:
            raise SystemExit(f"--num_steps: {model_cfg['type']} has no "
                             f"strided-sampler support {strided}")
        if model_cfg["type"] != "targetdiff" and args.eta != 1.0:
            raise SystemExit("--eta: only targetdiff has a DDIM mode")
        if sampler is not None:
            import functools
            kw = {"num_steps": args.num_steps}
            if model_cfg["type"] == "targetdiff":
                kw["eta"] = args.eta
            sampler = functools.partial(sampler, **kw)
        log.info("fast sampling: ~%d strided steps, eta=%.2f",
                 args.num_steps, args.eta)

    mesh = None
    if args.mesh > 1:
        from ..parallel.mesh import make_mesh, replicate, shard_batch
        if len(jax.devices()) < args.mesh:
            raise SystemExit(
                f"--mesh {args.mesh} needs {args.mesh} devices but only "
                f"{len(jax.devices())} are visible")
        if args.batch_size % args.mesh != 0:
            raise SystemExit(f"batch_size {args.batch_size} not divisible "
                             f"by --mesh {args.mesh}")
        mesh = make_mesh(jax.devices()[:args.mesh], data=args.mesh)
        params = jax.device_put(params, replicate(mesh))
        log.info("sampling mesh: %s", dict(mesh.shape))

    indices = [args.index] if args.index is not None else range(len(ds))
    os.makedirs(args.out_root, exist_ok=True)
    summary = []

    if model_cfg["type"] in ("difffg", "difffg_v2"):
        # D3FG stage 1 writes FG context pools, not SDFs (reference:
        # sample.py:239-241); stage 2 runs via cli/d3fg_two_stage or a
        # linker config with the load_ctx transform
        from ..sampling.d3fg_stage import corpus_type_bias, run_stage1
        type_bias = None
        if args.type_prior:
            type_bias = corpus_type_bias(
                args.type_prior,
                raw_path=data_cfg.get("raw_path", "assets/examples"),
                marginal_json=args.type_prior_marginal)
            log.info("type_prior alpha=%.3g bias range [%.2f, %.2f]",
                     args.type_prior, float(type_bias.min()),
                     float(type_bias.max()))
        for i in indices:
            t_start = time.time()
            pool = run_stage1(model, params, ds, i, num_samples,
                              args.batch_size, args.out_root, rng_seed=seed,
                              num_steps=args.num_steps,
                              type_temp=args.type_temp,
                              type_bias=type_bias)
            dt = time.time() - t_start
            log.info("pocket %d: stage-1 FG pool at %s | %.1fs", i, pool, dt)
            summary.append({"index": int(i), "pool": pool, "seconds": dt})
        if args.type_prior:
            summary.append({"postprocess": f"type_prior={args.type_prior}",
                            "type_prior_marginal": args.type_prior_marginal})
        with open(os.path.join(args.out_root, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    for i in indices:
        name = os.path.splitext(os.path.basename(ds.pairs[i][1]))[0]
        out_dir = os.path.join(args.out_root, f"{i:04d}_{name}")
        os.makedirs(out_dir, exist_ok=True)
        t_start = time.time()
        n_done = n_valid = 0
        t_warm = n_warm = None   # set once the first (compiling) batch ends
        mols = []
        rp_full = None
        if args.declash:
            # declash against the EVALUATOR's receptor set: the batch
            # carries only the dataset's extracted pocket (~500 atoms at
            # 5OU3) while evaluate_cli parses the full pocket PDB (~2400
            # heavy atoms) — clearing the subset leaves clashes against
            # the rest (measured: q4_graphbp7c cleared 3.25 A vs the
            # batch but still read mol clash 0.88)
            from ..chem.pdb import parse_pdb_pocket
            try:
                p_full, _ = parse_pdb_pocket(ds.pairs[i][0])
                rp_full = np.asarray(p_full.pos, np.float64)
            except Exception:
                rp_full = None
        if model_cfg["type"] in ("pocket2mol", "graphbp", "flag"):
            batches = _sample_ar_batches(
                model_cfg["type"], model, params, ds, i, num_samples,
                args.batch_size, seed, min(args.lig_cap, 64), args.rec_cap,
                transform=transform, refine_iters=args.refine_iters,
                refine_clash=args.refine_clash, clash_cand=args.clash_cand,
                clash_min=args.clash_min, flag_steric=args.flag_steric,
                motif_prior=args.motif_prior)
        else:
            batches = None
        if batches is not None:
            iterator = batches
        else:
            # per-pocket shape bucket: pad the receptor to the next
            # 128-multiple instead of the global cap — the one-hot gather
            # cost is O(N^2), so a 600-atom pocket in a 1024-node bucket
            # wastes ~2.6x (few distinct buckets => few compiles)
            rec_n = len(ds.get(i, np.random.default_rng(0))["protein"]["pos"])
            rec_cap_i = min(args.rec_cap, max(128, -(-rec_n // 128) * 128))
            iterator = repeat_for_sampling(
                ds, i, num_samples, args.batch_size, transform, seed=seed,
                lig_cap=args.lig_cap, rec_cap=rec_cap_i)
        for bi, batch in enumerate(iterator):
            if isinstance(batch, tuple) and isinstance(batch[0], str) \
                    and batch[0] == "mols":
                # FLAG yields whole molecules (bonds known from templates).
                # Growth failures (None results) are dropped upstream but
                # still count as attempts — the validity denominator must
                # reflect seeds tried, not molecules returned.
                for mol in batch[1] + [None] * (batch[2] - len(batch[1])):
                    if n_done >= num_samples:
                        break
                    n_done += 1
                    if mol is None:
                        continue
                    try:
                        frag, ok = evaluate_validity(mol)
                    except Exception:
                        ok = False
                    if ok:
                        # project first, SHAKE declash last (see the
                        # generic path note)
                        if args.project_stable:
                            frag = project_stable_pose(frag)
                        if args.declash and rp_full is not None:
                            from ..chem.declash import declash_pose_shake
                            frag = declash_pose_shake(
                                frag, rp_full, iters=2 * args.declash)
                        write_sdf(os.path.join(out_dir, f"{n_valid}.sdf"),
                                  frag)
                        mols.append(frag)
                        n_valid += 1
                if bi == 0:
                    t_warm, n_warm = time.time(), n_done
                continue
            rec_sel = None
            if batches is not None:
                if len(batch) == 4:
                    pos, atype, mask, rec_sel = batch
                else:
                    pos, atype, mask = batch
            else:
                rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         bi * 1000 + i)
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                out = sampler(model, params, batch, rng)
                pos = np.asarray(out["pos"]) + np.asarray(
                    batch.translation)[:, None]
                atype = np.asarray(out["atype"])
                mask = np.asarray(batch.ligand.mask)
            for s in range(pos.shape[0]):
                if n_done >= num_samples:
                    break
                n_done += 1
                try:
                    mol = reconstruct_molecule(pos[s][mask[s]],
                                               atype[s][mask[s]], mode=mode)
                    frag, ok = evaluate_validity(mol)
                except Exception:
                    ok = False
                if ok:
                    rp = None
                    if args.declash:
                        if rp_full is not None:
                            rp = rp_full
                        elif rec_sel is not None:
                            rp = pos[s][rec_sel[s]]
                        elif hasattr(batch, "protein"):
                            rp = (np.asarray(batch.protein.pos[s])[
                                np.asarray(batch.protein.mask[s])]
                                + np.asarray(batch.translation)[s])
                        else:
                            rp = np.zeros((0, 3))
                    if args.project_stable and rp is not None:
                        # BOTH flags: joint solve — stability windows and
                        # the receptor-clearance hinge in one projection
                        # (measured q5: mol_stable 0.98 AND clash 0.00;
                        # any sequential order loses one side — see
                        # chem/project.py docstring). --restore_bonds
                        # additionally holds in-window bonds at the
                        # generator's lengths (q5_flagship2: JSD_BL cost
                        # +0.04 -> +0.015 at mol_stable 0.94)
                        frag = project_stable_pose(
                            frag, rec_pos=rp,
                            restore_bonds=args.restore_bonds)
                    elif args.project_stable:
                        frag = project_stable_pose(frag)
                    elif rp is not None:
                        # declash only: SHAKE preserves the generator's
                        # bond lengths while clearing the vdW band
                        # (GraphBP measured clash 0.895 -> 0.089 at
                        # JSD_BL 0.744 -> 0.747)
                        from ..chem.declash import declash_pose_shake
                        frag = declash_pose_shake(frag,
                                                  rp,
                                                  iters=2 * args.declash)
                    write_sdf(os.path.join(out_dir, f"{n_valid}.sdf"), frag)
                    mols.append(frag)
                    n_valid += 1
            if bi == 0:
                t_warm, n_warm = time.time(), n_done
        dt = time.time() - t_start
        warm_rate = None
        if t_warm is not None and n_done > n_warm:
            # rate excluding the first batch (jit compile + device contact
            # land there; on remote-compile platforms that fixed cost can
            # be minutes and swamps the cold number for one-pocket runs)
            warm_rate = (n_done - n_warm) / max(time.time() - t_warm, 1e-9)
        log.info("pocket %d (%s): %d/%d valid | %.1fs | %.2f mol/s%s",
                 i, name, n_valid, n_done, dt, n_done / max(dt, 1e-9),
                 f" | warm {warm_rate:.2f} mol/s" if warm_rate else "")
        summary.append({"index": int(i), "name": name, "n_samples": n_done,
                        "n_valid": n_valid, "seconds": dt,
                        "warm_mol_per_s": warm_rate})
    # self-describing artifacts: record any non-default post-processing /
    # steric-extension flags in the summary itself (not only in run logs)
    flags = {}
    if args.project_stable:
        flags["project_stable"] = True
    if args.declash:
        flags["declash"] = int(args.declash)
    if args.clash_cand != 1 or args.clash_min:
        flags["clash_cand"], flags["clash_min"] = (int(args.clash_cand),
                                                   float(args.clash_min))
    if args.flag_steric:
        flags["flag_steric"] = True
    if args.motif_prior:
        flags["motif_prior"] = float(args.motif_prior)
    if args.refine_iters or args.refine_clash:
        flags["refine_iters"] = int(args.refine_iters)
        flags["refine_clash"] = float(args.refine_clash)
    if flags:
        flags["postprocess_flags"] = True   # marker key, skipped by the
        summary.append(flags)               # denominator reader
    with open(os.path.join(args.out_root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
