"""Training CLI: config-driven train loop with validation, plateau LR,
checkpointing (reference: train.py).

Usage: python -m cbgbench_tpu.cli.train_cli --config configs/denovo/train/targetdiff.yml \
           --logdir logs [--max_iters N] [--device cpu]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def build_dataset(data_cfg, mode: str):
    from ..data.dataset import (CrossDockedShards, RawPairDataset,
                                example_pairs, scan_pair_dir)
    from ..data.transforms import compose

    raw_path = data_cfg.get("raw_path", "assets/examples")
    transform = compose([dict(t) for t in data_cfg.get("transform", [])
                         if t["type"] in _SUPPORTED_TRANSFORMS])
    if os.path.isfile(os.path.join(raw_path, "index.json")):
        # a processed shard cache (scripts/build_shard_cache.py) — the
        # lmdb/torch-free stand-in for the reference's LMDB protocol
        ds = CrossDockedShards(raw_path, split_path=data_cfg.get("split"),
                               split=data_cfg.get("split_name", "train"),
                               transform=transform, mode=mode)
        ds.pairs = [(n, n) for n in ds.names]    # name lookups (sample CLI)
        return ds
    if os.path.isdir(raw_path):
        pairs = scan_pair_dir(raw_path)
    else:
        pairs = example_pairs()
    return RawPairDataset(pairs, transform=transform, mode=mode,
                          pocket_radius=data_cfg.get("pocket_radius", 0.0))


def _dump_nan_forensics(logdir, model, state, batch, rng, it, log):
    """First-non-finite-step forensics (SURVEY §5 failure detection):
    recompute the gradient on the current batch and write per-leaf
    finiteness/norms + the batch arrays + the (reverted, still-finite)
    params, so the failure is reproducible offline without rerunning
    training under jax_debug_nans."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import sample_time
    from ..train.trainer import make_grad_forensics

    out_dir = os.path.join(logdir, "nan_forensics")
    os.makedirs(out_dir, exist_ok=True)
    try:
        b = batch.batch_size
        # the step counter was advanced by the failing step; its t draw
        # used the pre-step counter (trainer.py step_fn fold_in)
        step_used = int(state.step) - 1
        k_t, k_noise = jax.random.split(
            jax.random.fold_in(rng, jnp.asarray(step_used, jnp.int32)))
        t = sample_time(k_t, b, model.num_timesteps, model.time_sampler)
        rep = make_grad_forensics(model)(state.params, batch, t, k_noise)
        flat_fin = jax.tree_util.tree_leaves_with_path(rep["finite"])
        flat_nrm = jax.tree_util.tree_leaves(rep["norms"])
        rows = sorted(
            ((jax.tree_util.keystr(kp), bool(f), float(n))
             for (kp, f), n in zip(flat_fin, flat_nrm)),
            key=lambda r: (r[1], -r[2]))
        report = {
            "iter": it, "step_used": step_used,
            "total": float(rep["total"]),
            "loss_dict": {k: float(v) for k, v in rep["loss_dict"].items()},
            "nonfinite_leaves": [r[0] for r in rows if not r[1]],
            "top_norms": rows[:40],
        }
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=1)
        leaves = {f"arr_{i}": np.asarray(v) for i, v in
                  enumerate(jax.tree_util.tree_leaves(batch))}
        np.savez(os.path.join(out_dir, "batch.npz"), **leaves)
        from ..train.checkpoint import save_checkpoint
        save_checkpoint(out_dir, it, state, {}, {}, None)
        log.warning(
            "non-finite step at iter %d: %d/%d grad leaves non-finite; "
            "forensics in %s (worst: %s)", it,
            len(report["nonfinite_leaves"]), len(rows), out_dir,
            report["nonfinite_leaves"][:6])
    except Exception:                                    # noqa: BLE001
        log.exception("nan forensics dump failed")


def make_model_loader(model_type: str, ds, batch_size: int, lig_cap: int,
                      rec_cap: int, seed: int = 0,
                      graphbp_rollouts: str = None,
                      rollout_frac: float = 0.5):
    """Infinite batch iterator routed by model family: diffusion models use
    PocketLigandBatch; Pocket2Mol/GraphBP/FLAG/D3FG have their own padded
    builders (the reference's per-model collates)."""
    import numpy as np
    from ..data.dataset import make_loader

    if model_type in ("targetdiff", "diffbp", "diffsbdd"):
        return make_loader(ds, batch_size, lig_cap=lig_cap, rec_cap=rec_cap,
                           seed=seed)

    def generic(build, stack):
        rng = np.random.default_rng(seed)
        buf = []               # carried across epochs: datasets smaller
        dry_epochs = 0         # consecutive epochs with zero yields
        while True:            # than batch_size still fill batches
            n_built = 0
            n_yielded = 0
            order = rng.permutation(len(ds))
            for i in order:
                try:
                    s_ = ds.get(int(i), rng)
                    s_["_index"] = int(i)      # pocket id for rollout mixing
                    b_ = build(s_, rng)
                except Exception:
                    continue
                if b_ is None:
                    continue
                buf.append(b_)
                n_built += 1
                if len(buf) == batch_size:
                    try:
                        yield stack(buf)
                        n_yielded += 1
                    except ValueError:
                        pass       # a sample exceeded the shape bucket
                    buf = []
            # no-progress guard: samples that build but always overflow the
            # shape bucket at stack() must also trip this, or next(loader)
            # blocks forever (n_built alone can stay > 0 in that state).
            # Tiny fixture datasets legitimately have unlucky epochs (every
            # stack attempt contains the one oversized sample), so only
            # several CONSECUTIVE dry epochs with real batch attempts —
            # or a totally empty epoch — count as no progress.
            attempted = n_built >= batch_size
            dry_epochs = dry_epochs + 1 if (
                n_yielded == 0 and (attempted or (n_built == 0 and not buf))
            ) else 0
            if dry_epochs >= (10 if attempted else 1):
                raise RuntimeError(
                    "no batch yielded in "
                    f"{dry_epochs} consecutive epoch(s): every sample "
                    "failed to build or exceeded the shape bucket (lig_cap="
                    f"{lig_cap}, rec_cap={rec_cap}); use larger caps")

    if model_type == "pocket2mol":
        from ..data.p2m import build_p2m_sample, stack_p2m_batch
        return generic(
            lambda s_, r: build_p2m_sample(s_, r),
            lambda b_: stack_p2m_batch(b_, lig_cap=min(lig_cap, 64),
                                       rec_cap=rec_cap))
    if model_type == "graphbp":
        from ..constants.molecule import NUM_ATOM_TYPES_BY_MODE
        from ..data.graphbp_seq import (build_graphbp_rollout_sample,
                                        build_graphbp_sample,
                                        stack_graphbp_batch)
        # the vocab offset for protein nodes MUST match the model's
        # num_classes (mode-derived) or embedding lookups go out of range
        n_types = NUM_ATOM_TYPES_BY_MODE[ds.mode]
        roll_by_pocket = {}
        if graphbp_rollouts:
            # scheduled-sampling prefixes (scripts/graphbp_rollouts.py):
            # p{pocket}_{n}_pos / _types pairs
            import numpy as _np
            data = _np.load(graphbp_rollouts)
            for key in data.files:
                if not key.endswith("_pos"):
                    continue
                pi = int(key.split("_")[0][1:])
                roll_by_pocket.setdefault(pi, []).append(
                    (data[key], data[key[:-4] + "_types"]))

        def build_gbp(s_, r):
            rolls = roll_by_pocket.get(s_.get("_index", -1))
            if rolls and r.uniform() < rollout_frac:
                rp, rt = rolls[int(r.integers(0, len(rolls)))]
                out = build_graphbp_rollout_sample(
                    s_, rp, rt, r, num_atom_types=n_types, mode=ds.mode)
                if out is not None:
                    return out
            return build_graphbp_sample(s_, r, num_atom_types=n_types)

        return generic(
            build_gbp,
            lambda b_: stack_graphbp_batch(b_, cap=lig_cap + rec_cap))
    if model_type == "flag":
        from ..data.flag_data import build_flag_sample, stack_flag_batch
        from ..sampling.flag_sample import vocab_from_dataset
        # deterministic pre-seed (index order) so sampling-time vocab wids
        # match training regardless of shuffling
        vocab = vocab_from_dataset(ds)
        return generic(
            lambda s_, r: build_flag_sample(s_, vocab, r),
            lambda b_: stack_flag_batch(b_, lig_cap=min(lig_cap, 64),
                                        rec_cap=rec_cap))
    if model_type in ("difffg", "difffg_v2"):
        from ..data.fg_pipeline import build_fg_sample, stack_fg_batch
        return generic(
            lambda s_, r: build_fg_sample(s_),
            lambda b_: stack_fg_batch(b_, fg_cap=32,
                                      res_cap=max(rec_cap // 8, 64)))
    raise ValueError(f"no loader for model type {model_type}")


_SUPPORTED_TRANSFORMS = {
    "center_pos", "center_whole_pos", "add_pos_noise", "remove_ligand",
    "assign_molsize", "assign_atomtype", "assign_molpos", "assign_linkernum",
    "assign_fgnum", "random_mask", "bfs_mask", "mixed_mask", "select_linker",
    "select_frag", "select_scaffold", "select_sidechain", "keep_ctx_only",
    "load_ctx", "merge_ctx_gen",
    "featurize_protein_fa", "featurize_ligand_fa", "featurize_ligand_ar",
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--logdir", default="./logs")
    p.add_argument("--tag", default="")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--resume", default=None)
    p.add_argument("--finetune", action="store_true",
                   help="with --resume (or a config `resume:` key): load "
                        "model params only — fresh optimizer/scheduler/"
                        "iteration (reference: train.py:64,165 — decomp "
                        "tasks finetune from the denovo checkpoint)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of a few post-compile "
                        "train steps to DIR")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lig_cap", type=int, default=96)
    p.add_argument("--rec_cap", type=int, default=928)
    p.add_argument("--mesh", type=int, default=1, metavar="N",
                   help="data-parallel mesh size: shard the batch over N "
                        "devices (params replicated, grads psum over ICI); "
                        "batch_size must be divisible by N")
    p.add_argument("--tp", type=int, default=1, metavar="M",
                   help="tensor-parallel factor: --mesh N splits into a "
                        "(N/M data) x (M model) mesh; Dense output dims "
                        "shard over 'model' (parallel/mesh.py "
                        "tensor_parallel_shardings)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-host "
                        "slices before touching devices (DCN orchestration;"
                        " each host feeds its local batch shard)")
    p.add_argument("--no_tensorboard", action="store_true")
    p.add_argument("--impl", default=None,
                   choices=[None, "xla", "pallas", "pallas_pre",
                            "pallas_pre3", "pallas_pre4", "pallas2"],
                   help="denoiser implementation override for training "
                        "(UniTransformer models); pallas_pre3 trains "
                        "through the fused kernel's recompute custom_vjp")
    p.add_argument("--graphbp_rollouts", default=None, metavar="NPZ",
                   help="GraphBP scheduled-sampling fine-tune: mix "
                        "model-rollout prefix continuations (from "
                        "scripts/graphbp_rollouts.py) into the training "
                        "stream at --rollout_frac")
    p.add_argument("--rollout_frac", type=float, default=0.5)
    p.add_argument("--no_nan_forensics", action="store_true",
                   help="disable the on-first-NaN grad forensics dump "
                        "(logdir/nan_forensics: per-leaf grad finiteness/"
                        "norms + the reproducing batch + state)")
    args = p.parse_args(argv)

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from ..parallel.mesh import init_multihost
        n_proc = init_multihost()
        print(f"multihost: process {jax.process_index()}/{n_proc}")
    import jax.numpy as jnp
    import numpy as np

    from ..models import get_model, sample_time
    from ..train import (PlateauController, TrainState, get_optimizer,
                         make_train_step, make_eval_step)
    from ..train.checkpoint import load_checkpoint, save_checkpoint
    from ..train.optim import set_learning_rate
    from ..utils.config import load_config, set_derived_fields
    from ..data.dataset import make_loader

    cfg = set_derived_fields(load_config(args.config))
    train_cfg = cfg["train"]
    if args.batch_size:
        train_cfg["batch_size"] = args.batch_size
    if args.max_iters is not None:
        train_cfg["max_iters"] = args.max_iters
    cfg["model"]["loss_weights"] = train_cfg.get("loss_weights", {})

    method = cfg["model"]["type"]
    run_name = args.tag or time.strftime(f"{method}_%Y_%m_%d__%H_%M_%S")
    logdir = os.path.join(args.logdir, run_name)
    os.makedirs(logdir, exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="[%(asctime)s] %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(logdir, "train.log"))])
    log = logging.getLogger("train")
    log.info("devices: %s", jax.devices())
    with open(os.path.join(logdir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=1, default=str)

    model = get_model(cfg["model"])
    if args.impl and hasattr(model, "impl") and model.impl != args.impl:
        # pallas_pre3 is train-capable (recompute custom_vjp, identical
        # param tree — tests/test_pallas.py pins grad equivalence to 1e-3)
        model = model.clone(impl=args.impl)
        log.info("denoiser impl overridden to %s", args.impl)
    mode = cfg["model"].get("mode", "add_aromatic")
    ds = build_dataset(cfg["data"]["train"], mode)
    from ..data.prefetch import prefetch
    loader = prefetch(make_model_loader(
        cfg["model"]["type"], ds, train_cfg["batch_size"], args.lig_cap,
        args.rec_cap, seed=train_cfg.get("seed", 2022),
        graphbp_rollouts=args.graphbp_rollouts,
        rollout_frac=args.rollout_frac), buffer_size=2)
    val_loader = make_model_loader(cfg["model"]["type"], ds,
                                   train_cfg["batch_size"], args.lig_cap,
                                   args.rec_cap, seed=123)

    rng = jax.random.PRNGKey(train_cfg.get("seed", 2022))
    batch0 = next(loader)
    b = batch0.batch_size
    t0 = sample_time(rng, b, model.num_timesteps, model.time_sampler)
    params = jax.jit(model.init)(rng, batch0, t0, rng)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    log.info("model %s: %.2fM params", method, n_params / 1e6)

    opt_cfg = cfg["train"]["optimizer"]
    tx = get_optimizer(opt_cfg, max_grad_norm=train_cfg.get("max_grad_norm"))
    state = TrainState.create(params, tx)

    mesh = None
    if args.mesh > 1:
        from ..parallel.mesh import make_mesh, replicate
        if len(jax.devices()) < args.mesh:
            raise SystemExit(
                f"--mesh {args.mesh} needs {args.mesh} devices but only "
                f"{len(jax.devices())} are visible (for CPU testing set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{args.mesh} JAX_PLATFORMS=cpu)")
        if args.mesh % args.tp != 0:
            raise SystemExit(f"--mesh {args.mesh} not divisible by "
                             f"--tp {args.tp}")
        n_data = args.mesh // args.tp
        if train_cfg["batch_size"] % n_data != 0:
            raise SystemExit(f"batch_size {train_cfg['batch_size']} not "
                             f"divisible by the data axis {n_data}")
        mesh = make_mesh(jax.devices()[:args.mesh], data=n_data,
                         model=args.tp)
        if args.tp > 1:
            from ..parallel.mesh import shard_params_tp
            state = shard_params_tp(state, mesh)
        else:
            state = jax.device_put(state, replicate(mesh))
        log.info("mesh: %s", dict(mesh.shape))
        from ..parallel.mesh import global_batch_from_host

        def _shard(b):
            # single-host: device_put over the data axis; multi-host: each
            # process contributes its local loader batch as its shard
            return global_batch_from_host(b, mesh)
    else:
        def _shard(b):
            return b
    plateau = PlateauController(
        opt_cfg.get("lr", 5e-4),
        factor=train_cfg.get("scheduler", {}).get("factor", 0.6),
        patience=train_cfg.get("scheduler", {}).get("patience", 10),
        min_lr=train_cfg.get("scheduler", {}).get("min_lr", 1e-6))

    start_it = 0
    resume_path = args.resume or cfg.get("resume")
    if resume_path:
        if args.finetune:
            # raw (target-free) restore tolerates architecture drift: new
            # heads absent from the checkpoint keep their fresh init
            from ..train.checkpoint import merge_param_trees
            raw, meta = load_checkpoint(resume_path)
            merged, got, fresh, unexpected = merge_param_trees(state.params,
                                                               raw["params"])
            state = state.replace(params=merged)
            if mesh is not None:
                # the merge replaced sharded params with host arrays;
                # restore the explicit layout (multi-host correctness)
                if args.tp > 1:
                    from ..parallel.mesh import shard_params_tp
                    state = shard_params_tp(state, mesh)
                else:
                    from ..parallel.mesh import replicate
                    state = jax.device_put(state, replicate(mesh))
            log.info("finetuning from %s (params only, iter 0): %d leaves "
                     "loaded, %d fresh%s", resume_path, len(got), len(fresh),
                     (" (" + ", ".join(fresh[:6]) + ")") if fresh else "")
            if unexpected:
                log.info("checkpoint-only (unexpected) leaves ignored: %s",
                         ", ".join(unexpected[:8]))
        else:
            loaded, meta = load_checkpoint(resume_path, state)
            state = loaded
            start_it = meta["iteration"]
            plateau.load_state_dict(meta.get("plateau")
                                    or plateau.state_dict())
            log.info("resumed from %s at iter %d", resume_path, start_it)

    step_fn = make_train_step(model, tx)
    eval_fn = make_eval_step(model, cfg.get("eval", {}).get("eval_interval", 10))
    # jitted metrics forward (eager dispatch is ~100x slower on
    # remote-compile platforms)
    metric_apply = jax.jit(model.apply)
    from ..train.evaluate import build_metrics
    from ..train.metrics_log import ScalarWriter
    metric_fns = build_metrics(cfg.get("eval", {}).get("metrics", []))
    ckpt_dir = os.path.join(logdir, "checkpoints")
    scalars = ScalarWriter(logdir, tensorboard=not args.no_tensorboard)

    max_iters = train_cfg.get("max_iters", 1000)
    report = train_cfg.get("report_freq", 100)
    val_freq = cfg.get("eval", {}).get("val_freq", 1000)
    t_start = time.time()
    best_val = float("inf")
    val_loss = None
    profile_at = (start_it + 3) if args.profile else -1
    nan_dumped = False
    for it in range(start_it + 1, max_iters + 1):
        if it == profile_at:
            # capture a handful of post-compile steps (view in xprof /
            # tensorboard; aux subsystem, SURVEY §5 tracing)
            jax.profiler.start_trace(args.profile)
        batch = _shard(next(loader))
        state, metrics = step_fn(state, batch, rng)
        if it == profile_at + 4 and profile_at > 0:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            log.info("profiler trace (iters %d-%d) written to %s",
                     profile_at, it, args.profile)
        if it % report == 0 or it == 1:
            m = {k: float(v) for k, v in metrics.items()}
            rate = report / max(time.time() - t_start, 1e-9)
            t_start = time.time()
            log.info("iter %d | %s | %.2f it/s | lr %.2e", it,
                     " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())),
                     rate, plateau.lr)
            scalars.write_dict(it, m, prefix="train/")
            scalars.write(it, "train/it_per_s", rate)
            scalars.write(it, "train/lr", plateau.lr)
            if (m.get("update_skipped", 0.0) > 0 and not nan_dumped
                    and not args.no_nan_forensics):
                nan_dumped = True
                _dump_nan_forensics(logdir, model, state, batch, rng, it,
                                    log)
        if it % val_freq == 0:
            val_batch = _shard(next(val_loader))
            vm = eval_fn(state.params, val_batch, rng)
            val_loss = float(vm["loss"])
            extra = ""
            if metric_fns:
                t_mid = jnp.full((val_batch.ligand.pos.shape[0],),
                                 model.num_timesteps // 2, jnp.int32)
                _, results = metric_apply(state.params, val_batch, t_mid,
                                          rng)
                extra = " " + " ".join(
                    f"{name}={fn(jax.tree.map(np.asarray, results)):.4f}"
                    for name, fn in metric_fns.items())
            log.info("validate iter %d | %s%s", it,
                     " ".join(f"{k}={float(v):.4f}"
                              for k, v in sorted(vm.items())), extra)
            scalars.write_dict(it, {k: float(v) for k, v in vm.items()},
                               prefix="val/")
            new_lr = plateau.step(val_loss)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr))
            if val_loss < best_val:
                best_val = val_loss
                path = save_checkpoint(ckpt_dir, it, state, cfg.to_dict(),
                                       plateau.state_dict(), val_loss)
                log.info("saved checkpoint %s (val %.4f)", path, val_loss)
    # the final checkpoint records ITS OWN last-computed val loss, not the
    # best-so-far: meta.avg_val_loss is what best-checkpoint selection
    # reads, and the final params are not the best-val params
    save_checkpoint(ckpt_dir, max_iters, state, cfg.to_dict(),
                    plateau.state_dict(), val_loss)
    scalars.close()
    log.info("done: %d iters", max_iters)
    return state


if __name__ == "__main__":
    main()
