"""End-to-end TargetDiff: init, loss, train-step overfit, sampling scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.data.batch import synthetic_batch
from cbgbench_tpu.models.targetdiff import TargetDiff, sample_targetdiff
from cbgbench_tpu.train import get_optimizer, make_train_step, TrainState

TINY = dict(num_classes=8, num_timesteps=20, emb_dim=32, num_layers=2,
            n_heads=4, k=8)


@pytest.fixture(scope="module")
def setup():
    model = TargetDiff(**TINY)
    batch = synthetic_batch(0, batch_size=2, n_lig=10, n_rec=40,
                            num_atom_types=8, lig_cap=16, rec_cap=48)
    rng = jax.random.PRNGKey(0)
    t = jnp.array([5, 10])
    params = jax.jit(model.init)(rng, batch, t, rng)
    return model, batch, params


def test_loss_finite_and_structured(setup):
    model, batch, params = setup
    t = jnp.array([3, 17])
    loss_dict, results = model.apply(params, batch, t, jax.random.PRNGKey(1))
    assert set(loss_dict) == {"pos", "atom"}
    for v in loss_dict.values():
        assert np.isfinite(float(v))
    assert "c_pred" in results and "x_pred" in results


def test_context_atoms_never_move(setup):
    """gen_flag=False ligand atoms and all protein atoms must be fixed
    points of the denoiser's coordinate update."""
    model, batch, params = setup
    lig = batch.ligand
    gen = lig.gen_flag.at[:, :5].set(False)
    batch2 = batch.replace(ligand=lig.replace(gen_flag=gen))
    c = jax.nn.one_hot(lig.atype, 8)
    t = jnp.array([5, 5])
    x_pred, _ = model.apply(params, lig.pos, c, batch2, t, method="denoise")
    np.testing.assert_allclose(np.asarray(x_pred[:, :5]),
                               np.asarray(lig.pos[:, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(x_pred[:, 5:10]),
                           np.asarray(lig.pos[:, 5:10]))


def test_train_step_overfits(setup):
    """Training must reduce the loss at FIXED timesteps (the raw per-step
    loss mixes random t's whose scales differ by orders of magnitude, so
    comparing first-vs-last raw steps is noise, not signal)."""
    model, batch, params = setup
    tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(2)
    t_fix = jnp.array([5, 10])
    k_fix = jax.random.PRNGKey(7)

    def eval_loss(params):
        ld, _ = model.apply(params, batch, t_fix, k_fix)
        return float(model.weighted_loss(ld))

    before = eval_loss(state.params)
    losses = []
    for i in range(40):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    after = eval_loss(state.params)
    assert after < before, (before, after)


def test_sampling_scan(setup):
    model, batch, params = setup
    out = jax.jit(lambda b, r: sample_targetdiff(model, params, b, r))(
        batch, jax.random.PRNGKey(3))
    assert out["pos"].shape == batch.ligand.pos.shape
    assert out["atype"].shape == batch.ligand.atype.shape
    assert np.isfinite(np.asarray(out["pos"])).all()
    a = np.asarray(out["atype"])
    assert (a >= 0).all() and (a < 8).all()


def test_padding_invariance(setup):
    """Adding padding rows must not change the loss (masking correctness)."""
    model, _, _ = setup
    rng = jax.random.PRNGKey(4)
    b_small = synthetic_batch(7, batch_size=2, n_lig=10, n_rec=40,
                              num_atom_types=8, lig_cap=16, rec_cap=48)
    b_big = synthetic_batch(7, batch_size=2, n_lig=10, n_rec=40,
                            num_atom_types=8, lig_cap=32, rec_cap=96)
    t = jnp.array([5, 10])
    params = jax.jit(model.init)(rng, b_small, t, rng)
    noise_rng = jax.random.PRNGKey(5)
    # Use identical noise by seeding identically; shapes differ, so compare
    # via deterministic t and the denoiser only.
    c_small = jax.nn.one_hot(b_small.ligand.atype, 8)
    c_big = jax.nn.one_hot(b_big.ligand.atype, 8)
    x1, c1 = model.apply(params, b_small.ligand.pos, c_small, b_small, t,
                         method="denoise")
    x2, c2 = model.apply(params, b_big.ligand.pos, c_big, b_big, t,
                         method="denoise")
    m = np.asarray(b_small.ligand.mask)
    np.testing.assert_allclose(np.asarray(x1)[m], np.asarray(x2[:, :16])[m],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(c1)[m], np.asarray(c2[:, :16])[m],
                               atol=2e-3)


def test_grads_finite_with_self_gathering_padded_rows():
    """k > padded-row index used to produce dist=0 self-edges whose norm
    gradient is NaN (0*NaN leak in backward). Regression for safe_norm."""
    model = TargetDiff(num_classes=8, num_timesteps=20, emb_dim=32,
                       num_layers=2, n_heads=4, k=32)
    batch = synthetic_batch(1, batch_size=2, n_lig=10, n_rec=30,
                            num_atom_types=8, lig_cap=16, rec_cap=48)
    rng = jax.random.PRNGKey(0)
    t = jnp.array([5, 10])
    params = jax.jit(model.init)(rng, batch, t, rng)

    def loss_fn(p):
        ld, _ = model.apply(p, batch, t, jax.random.PRNGKey(1))
        return model.weighted_loss(ld)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_sample_traj_stride():
    """traj_stride returns strided intermediate positions across chunks."""
    import numpy as np
    from cbgbench_tpu.data.batch import synthetic_batch
    from cbgbench_tpu.models.targetdiff import TargetDiff, sample_targetdiff
    import jax
    batch = synthetic_batch(0, batch_size=2, n_lig=8, n_rec=24,
                            num_atom_types=8, lig_cap=16, rec_cap=32)
    model = TargetDiff(num_classes=8, num_timesteps=20, emb_dim=16,
                       num_layers=1, n_heads=2, k=4)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    params = jax.jit(model.init)(rng, batch, jnp.zeros(2, jnp.int32), rng)
    out = sample_targetdiff(model, params, batch, rng, chunk_size=7,
                            impl="xla", traj_stride=5)
    assert out["traj_pos"].shape == (4, 2, 16, 3)   # 20 steps / stride 5
    assert np.isfinite(out["traj_pos"]).all()
    # last traj frame precedes the final state in the denoise chain
    assert np.isfinite(np.asarray(out["pos"])).all()


def test_prefetch_iterator():
    from cbgbench_tpu.data.prefetch import prefetch
    assert list(prefetch(iter(range(100)), 4)) == list(range(100))
    def boom():
        yield 1
        raise ValueError("x")
    it = prefetch(boom(), 2)
    assert next(it) == 1
    import pytest
    with pytest.raises(ValueError):
        next(it)


def test_nonfinite_batch_skips_update(setup):
    """A batch that produces NaN loss/grads must leave params and
    opt_state untouched (the skip-nonfinite guard in make_train_step) and
    report update_skipped=1; a finite batch afterwards still trains."""
    model, batch, params = setup
    tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(3)

    bad = batch.replace(ligand=batch.ligand.replace(
        pos=batch.ligand.pos.at[0, 0].set(jnp.nan)))
    state1, m1 = step(state, bad, rng)
    assert float(m1["update_skipped"]) == 1.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, state1.params)

    state2, m2 = step(state1, batch, rng)
    assert float(m2["update_skipped"]) == 0.0
    assert np.isfinite(float(m2["loss"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state1.params, state2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_resolve_impl_bucket_crossover(monkeypatch):
    """impl='auto' picks pallas_pre11 at every bucket (round-4 ladder:
    the packed-lane kernel won all measured sizes — BASELINE.md); falls
    back to the model's own impl when kernels are unavailable."""
    from cbgbench_tpu.models import targetdiff as td
    model = TargetDiff(**TINY)

    monkeypatch.setattr(td, "edge_attn_available", None, raising=False)
    import cbgbench_tpu.ops.pallas_edge_attn as pea
    monkeypatch.setattr(pea, "edge_attn_available", lambda: True)
    for n in (512, 639, 640, 1024):
        assert td._resolve_impl(model, "auto", n).impl == "pallas_pre11"

    monkeypatch.setattr(pea, "edge_attn_available", lambda: False)
    assert td._resolve_impl(model, "auto", 1024).impl == model.impl
    # explicit impl always wins over auto heuristics
    assert td._resolve_impl(model, "pallas2", 0).impl == "pallas2"


def test_fast_sampling_strided(setup):
    """num_steps < T samples the strided ladder: finite output, correct
    shapes, and explicit num_steps=T equals the default full-T path."""
    import numpy as np
    model, batch, params = setup
    rng = jax.random.PRNGKey(5)
    full = sample_targetdiff(model, params, batch, rng, impl="xla")
    full_explicit = sample_targetdiff(model, params, batch, rng, impl="xla",
                                      num_steps=model.num_timesteps)
    np.testing.assert_array_equal(np.asarray(full["pos"]),
                                  np.asarray(full_explicit["pos"]))
    np.testing.assert_array_equal(np.asarray(full["atype"]),
                                  np.asarray(full_explicit["atype"]))
    fast = sample_targetdiff(model, params, batch, rng, impl="xla",
                             num_steps=5)
    assert fast["pos"].shape == batch.ligand.pos.shape
    assert np.isfinite(np.asarray(fast["pos"])).all()
    a = np.asarray(fast["atype"])
    assert (a >= 0).all() and (a < model.num_classes).all()
    # context atoms stay fixed through the strided ladder
    ctx = ~np.asarray(batch.ligand.gen_flag) & np.asarray(batch.ligand.mask)
    np.testing.assert_allclose(np.asarray(fast["pos"])[ctx],
                               np.asarray(batch.ligand.pos)[ctx])


def test_sample_timesteps_ladders():
    from cbgbench_tpu.models.targetdiff import sample_timesteps
    import numpy as np
    full = sample_timesteps(100, None)
    np.testing.assert_array_equal(full, np.arange(99, -1, -1))
    ts = sample_timesteps(1000, 100)
    assert ts[0] == 999 and ts[-1] == 0
    assert (np.diff(ts) < 0).all()
    assert 90 <= len(ts) <= 100


def test_denoise_with_knn_cache_matches_plain():
    """The sampler's static-receptor kNN cache must be transparent: a
    denoise step with knn_cache gives the same outputs as the plain
    per-step kNN (same graph selection; distances differ only by XLA
    fusion rounding ~1e-6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.data.batch import synthetic_batch
    from cbgbench_tpu.models.targetdiff import TargetDiff
    from cbgbench_tpu.ops.knn import knn_static_candidates

    model = TargetDiff(num_classes=8, num_timesteps=50, emb_dim=32,
                       num_layers=2, n_heads=4, k=6)
    batch = synthetic_batch(0, batch_size=2, n_lig=10, n_rec=40,
                            num_atom_types=8, lig_cap=16, rec_cap=48)
    rng = jax.random.PRNGKey(0)
    t = jnp.full((2,), 25, jnp.int32)
    params = jax.jit(model.init)(rng, batch, t, rng)
    c = jax.nn.one_hot(batch.ligand.atype, 8)
    x = batch.ligand.pos

    plain = model.apply(params, x, c, batch, t, method="denoise")
    cache = knn_static_candidates(batch.protein.pos, batch.protein.mask,
                                  model.k)
    cached = model.apply(params, x, c, batch, t, cache, method="denoise")
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(cached)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-4, rtol=2e-3)
