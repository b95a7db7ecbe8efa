"""Task x model config-matrix smoke tests.

Every (task, model) combination the config tree claims must actually
train (2 steps, tiny model override) and its test config's transform
pipeline must produce a sane sampling start state. Mirrors the reference's
5-task x 5-model coverage (reference: configs/{linker,frag,scaffold,
sidechain}/{train,test}/*.yml).
"""

import glob
import os

import jax
import numpy as np
import pytest

from cbgbench_tpu.cli.train_cli import (_SUPPORTED_TRANSFORMS, build_dataset,
                                        make_model_loader)
from cbgbench_tpu.data.transforms import compose
from cbgbench_tpu.models import get_model, sample_time
from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step
from cbgbench_tpu.utils.config import load_config, set_derived_fields

REPO = os.path.join(os.path.dirname(__file__), "..")
TASKS = ["linker", "frag", "scaffold", "sidechain"]
MODELS = ["targetdiff", "diffbp", "diffsbdd", "pocket2mol", "graphbp"]
LIG_CAP, REC_CAP = 96, 928


def _shrink(model_cfg):
    enc = model_cfg.get("encoder", {})
    for k, v in (("node_feat_dim", 32), ("num_layers", 2), ("n_heads", 4),
                 ("vec_feat_dim", 16), ("k", 8), ("num_components", 2),
                 ("num_layers_com", 1)):
        if k in enc:
            enc[k] = v
    if "embedder" in model_cfg:
        model_cfg["embedder"]["emb_dim"] = 32
        if "num_layers" in model_cfg["embedder"]:
            model_cfg["embedder"]["num_layers"] = 2
    gen = model_cfg.get("generator", {})
    if "num_diffusion_timesteps" in gen:
        gen["num_diffusion_timesteps"] = 20
    return model_cfg


def test_config_matrix_complete():
    for task in TASKS:
        for m in MODELS:
            for split in ("train", "test"):
                p = os.path.join(REPO, "configs", task, split, f"{m}.yml")
                assert os.path.exists(p), p
    # casestudy configs for all 7 denovo models (+ d3fg two-stage pair)
    cs = glob.glob(os.path.join(REPO, "configs", "denovo", "casestudy",
                                "*.yml"))
    assert len(cs) >= 8, cs


def test_all_configs_parse():
    for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yml"),
                       recursive=True):
        if "common" in p:
            continue
        cfg = load_config(p)
        assert "model" in cfg, p
        tf_list = (cfg.get("data", {}).get("train", {}).get("transform")
                   or cfg.get("data", {}).get("test", {}).get("transform")
                   or [])
        for t in tf_list:
            assert t["type"] in _SUPPORTED_TRANSFORMS, (p, t["type"])


@pytest.mark.parametrize("task", TASKS)
@pytest.mark.parametrize("method", MODELS)
def test_task_model_trains(task, method):
    cfg = set_derived_fields(load_config(
        os.path.join(REPO, "configs", task, "train", f"{method}.yml")))
    cfg["model"]["loss_weights"] = cfg["train"].get("loss_weights", {})
    model_cfg = _shrink(cfg["model"])
    model = get_model(model_cfg)
    mode = model_cfg.get("mode", "add_aromatic")
    ds = build_dataset(cfg["data"]["train"], mode)
    loader = make_model_loader(method, ds, batch_size=2, lig_cap=LIG_CAP,
                               rec_cap=REC_CAP, seed=0)
    rng = jax.random.PRNGKey(0)
    batch0 = next(loader)
    t0 = sample_time(rng, batch0.batch_size, model.num_timesteps,
                     model.time_sampler)
    params = jax.jit(model.init)(rng, batch0, t0, rng)
    tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, donate=False)
    for _ in range(2):
        state, metrics = step(state, next(loader), rng)
    assert np.isfinite(float(metrics["loss"])), (task, method, metrics)


@pytest.mark.parametrize("task", TASKS)
def test_task_test_transform_keeps_ctx(task):
    """Diffusion test configs must keep the context fragment fixed
    (round-1 configs clobbered ctx with assign_* after keep_ctx_only)."""
    cfg = load_config(os.path.join(REPO, "configs", task, "test",
                                   "targetdiff.yml"))
    data_cfg = cfg["data"]["test"]
    tf = compose([dict(t) for t in data_cfg["transform"]])
    ds = build_dataset({**data_cfg, "transform": []}, "add_aromatic")
    ds.transform = None
    rng = np.random.default_rng(0)
    base = ds.get(0, rng)
    n_orig = len(base["ligand"]["atype"])
    orig_types = base["ligand"]["atype"].copy()
    out = tf(ds.get(0, rng), rng)
    lig = out["ligand"]
    gen = np.asarray(lig["gen_flag"])
    assert gen.any(), "no generated atoms"
    n_ctx = int((~gen).sum())
    if n_ctx:
        assert n_ctx < n_orig
        # kept atoms preserve their original types (ctx really is fixed)
        kept = lig["atype"][~gen]
        counts_orig = np.bincount(orig_types, minlength=32)
        counts_kept = np.bincount(kept, minlength=32)
        assert (counts_kept <= counts_orig).all()


@pytest.mark.parametrize("task", TASKS)
def test_ar_test_transform_ctx_flag(task):
    cfg = load_config(os.path.join(REPO, "configs", task, "test",
                                   "pocket2mol.yml"))
    data_cfg = cfg["data"]["test"]
    tf = compose([dict(t) for t in data_cfg["transform"]])
    ds = build_dataset({**data_cfg, "transform": []}, "add_aromatic")
    ds.transform = None
    rng = np.random.default_rng(0)
    out = tf(ds.get(0, rng), rng)
    assert "ctx_flag" in out["ligand"]


def test_p2m_ctx_start_state():
    from cbgbench_tpu.data.p2m import build_p2m_ctx_start, stack_p2m_batch
    cfg = load_config(os.path.join(REPO, "configs", "linker", "test",
                                   "pocket2mol.yml"))
    data_cfg = cfg["data"]["test"]
    tf = compose([dict(t) for t in data_cfg["transform"]])
    ds = build_dataset({**data_cfg, "transform": []}, "add_aromatic")
    ds.transform = None
    rng = np.random.default_rng(0)
    base = tf(ds.get(0, rng), rng)
    s = build_p2m_ctx_start(base)
    n_ctx = len(s["ctx_atype"])
    assert n_ctx > 0
    assert s["frontier"].shape == (n_ctx,)
    assert s["frontier"].any()        # growth can start from the fragment
    assert not s["rec_pred"].any()    # focal comes from the ligand ctx
    batch = stack_p2m_batch([s, s], lig_cap=64, rec_cap=REC_CAP)
    assert int(batch.ctx_mask.sum()) == 2 * n_ctx


def test_graphbp_ctx_conditioning():
    from cbgbench_tpu.data.graphbp_seq import build_graphbp_sample
    cfg = load_config(os.path.join(REPO, "configs", "linker", "test",
                                   "graphbp.yml"))
    data_cfg = cfg["data"]["test"]
    tf = compose([dict(t) for t in data_cfg["transform"]])
    ds = build_dataset({**data_cfg, "transform": []}, "basic")
    ds.transform = None
    rng = np.random.default_rng(0)
    base = tf(ds.get(0, rng), rng)
    ctx_flag = np.asarray(base["ligand"]["ctx_flag"])
    assert ctx_flag.any()
    s = build_graphbp_sample(base, rng, num_atom_types=8)
    assert s is not None
    n_rec_nodes = int((~np.asarray(s["gen_flag"])).sum())
    # context section holds protein atoms + the kept ligand fragment
    n_rec_atoms = len(base["protein"]["pos"])
    assert n_rec_nodes == n_rec_atoms + int(ctx_flag.sum())
    # ligand-vocab ids for kept fragment atoms (< num_atom_types)
    z = np.asarray(s["z"])[~np.asarray(s["gen_flag"])]
    assert (z[n_rec_atoms:] < 8).all()
    assert (z[:n_rec_atoms] >= 8).all()
