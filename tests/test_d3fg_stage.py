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


def test_corpus_type_bias_properties(tmp_path):
    """The --type_prior importance correction: over-drawn classes tilt
    negative, corpus-only classes positive, unseen-in-both exactly the
    smoothing-floor log-ratio of 0 (eps-mixture cancels), alpha scales
    linearly, and alpha=0 would disable (sample_cli skips the call)."""
    import json

    from cbgbench_tpu.constants.fg import CLASS2FG, FG2CLASS, NUM_FG_TYPES
    from cbgbench_tpu.sampling.d3fg_stage import corpus_type_bias

    # synthetic model marginal: benzene-collapsed (like the measured q3
    # head), never draws NC=O
    marg = tmp_path / "m.json"
    marg.write_text(json.dumps(
        {"gen_hist": {"Others": 1000, "c1ccccc1": 150, "O=CO": 30}}))
    b = corpus_type_bias(1.0, marginal_json=str(marg))
    assert b.shape == (NUM_FG_TYPES,)
    assert b[FG2CLASS["c1ccccc1"]] < 0          # over-drawn vs corpus
    assert b[FG2CLASS["NC=O"]] > 1.0            # in corpus, never drawn
    # a class in neither corpus nor marginal: smoothing floors cancel
    unseen = [i for i in range(NUM_FG_TYPES)
              if b[i] == 0.0 and CLASS2FG[i] != "Others"]
    assert unseen, "eps-mixture must zero unseen-in-both classes"
    b2 = corpus_type_bias(0.5, marginal_json=str(marg))
    np.testing.assert_allclose(b2, 0.5 * b, rtol=1e-5)


def test_type_bias_zero_is_reference(tmp_path):
    """sample_d3fg with an all-zero bias vector must be bit-exact with
    the default (scalar-0) path — the lever is off at alpha=0."""
    from cbgbench_tpu.data.fg_pipeline import stack_fg_batch
    from cbgbench_tpu.models.d3fg import sample_d3fg

    ds = RawPairDataset(example_pairs()[:1], mode="basic", pocket_radius=8.0)
    rng = np.random.default_rng(0)
    base = ds.get(0, rng)
    model = D3FG(num_fg_types=28, num_timesteps=6, emb_dim=32, num_layers=2,
                 n_heads=4, k=8)
    init = stack_fg_batch(
        [prior_fg_sample(base["residues"], rng, 28)], fg_cap=24, res_cap=96)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init,
                                 jnp.array([3]), jax.random.PRNGKey(0))
    a = sample_d3fg(model, params, init, jax.random.PRNGKey(1))
    z = sample_d3fg(model, params, init, jax.random.PRNGKey(1),
                    type_bias=np.zeros(28, np.float32))
    np.testing.assert_array_equal(np.asarray(a["type_fg"]),
                                  np.asarray(z["type_fg"]))
    np.testing.assert_array_equal(np.asarray(a["pos"]), np.asarray(z["pos"]))
