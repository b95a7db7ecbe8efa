"""D3FG two-stage denovo protocol end-to-end (tiny model, fixtures)."""

import numpy as np
import jax
import jax.numpy as jnp

from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
from cbgbench_tpu.data.transforms import compose
from cbgbench_tpu.models.d3fg import D3FG
from cbgbench_tpu.sampling.d3fg_stage import prior_fg_sample, run_stage1


def test_two_stage_denovo(tmp_path):
    ds = RawPairDataset(example_pairs()[:1], mode="basic", pocket_radius=8.0)
    rng = np.random.default_rng(0)
    base = ds.get(0, rng)

    # stage 1: tiny D3FG, 3 samples
    model = D3FG(num_fg_types=28, num_timesteps=6, emb_dim=32, num_layers=2,
                 n_heads=4, k=8)
    from cbgbench_tpu.data.fg_pipeline import stack_fg_batch
    init = stack_fg_batch(
        [prior_fg_sample(base["residues"], rng, 28)], fg_cap=24, res_cap=96)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init,
                                 jnp.array([3]), jax.random.PRNGKey(0))
    pool_path = run_stage1(model, params, ds, 0, num_samples=3,
                           batch_size=3, out_dir=str(tmp_path))
    from cbgbench_tpu.data.fg_pipeline import load_ctx_pool
    pool = load_ctx_pool(pool_path)
    assert len(pool) == 3
    assert all(len(p["element"]) >= 1 for p in pool)

    # stage 2: load_ctx + linker priors + merge -> mixed gen/ctx ligand
    tf = compose([
        {"type": "center_pos", "center_flag": "protein"},
        {"type": "load_ctx", "ctx_path": pool_path, "mode": "basic"},
        {"type": "assign_linkernum"},
        {"type": "assign_atomtype", "mode": "basic"},
        {"type": "assign_molpos"},
        {"type": "merge_ctx_gen"},
    ])
    s = ds.get(0, rng)
    s = tf(s, rng)
    gen = s["ligand"]["gen_flag"]
    assert gen.any() and (~gen).any()          # fixed FG ctx + new linker
    assert len(s["ligand"]["pos"]) == len(gen)
