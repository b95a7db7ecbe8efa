"""GraphBP: sequencer, flow invertibility, loss, growth sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
from cbgbench_tpu.data.graphbp_seq import (GraphBPBatch, build_graphbp_sample,
                                           internal_coords, prim_order,
                                           stack_graphbp_batch)
from cbgbench_tpu.models.graphbp import (GraphBP, dat_to_xyz, sample_graphbp)

CAP = 320


@pytest.fixture(scope="module")
def gbp_batch():
    ds = RawPairDataset(example_pairs()[:2], mode="basic", pocket_radius=6.0)
    rng = np.random.default_rng(0)
    samples = [build_graphbp_sample(ds.get(i, rng), rng, num_atom_types=8)
               for i in range(2)]
    return stack_graphbp_batch(samples, cap=CAP)


@pytest.fixture(scope="module")
def setup(gbp_batch):
    model = GraphBP(num_classes=8, emb_dim=32, num_embed_layers=2,
                    num_flow_layers=2, flow_hid_dim=32, k=16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), gbp_batch,
                                 rng=jax.random.PRNGKey(0))
    return model, params


def test_prim_order_spanning():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(12, 3))
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    order, parents = prim_order(d)
    assert sorted(order.tolist()) == list(range(12))
    assert order[0] == 0
    assert len(parents) == 11


def test_internal_coords_roundtrip():
    """dat_to_xyz(internal_coords(p)) must recover p."""
    rng = np.random.default_rng(1)
    for _ in range(10):
        f, c1, c2, p = rng.normal(size=(4, 3))
        d, angle, torsion = internal_coords(p, f, c1, c2)
        back = np.asarray(dat_to_xyz(
            jnp.asarray(f)[None], jnp.asarray(c1)[None], jnp.asarray(c2)[None],
            jnp.asarray([d]), jnp.asarray([angle]), jnp.asarray([torsion])))[0]
        np.testing.assert_allclose(back, p, atol=1e-4)


def test_flow_invertibility(setup, gbp_batch):
    from cbgbench_tpu.models.graphbp import STNetExp, flow_forward, flow_reverse
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, feat, reverse=False):
            layers = [STNetExp(4, 16, name=f"l{i}") for i in range(3)]
            if reverse:
                return flow_reverse(layers, x, feat)
            return flow_forward(layers, x, feat)

    m = Tiny()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, feat)
    # params at init are ~identity; perturb them for a non-trivial check
    p = jax.tree.map(lambda a: a + 0.3, p)
    lat, _ = m.apply(p, x, feat)
    back = m.apply(p, lat, feat, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_loss_structure(setup, gbp_batch):
    model, params = setup
    losses, _ = model.apply(params, gbp_batch, rng=jax.random.PRNGKey(1))
    assert set(losses) == {"node", "dist", "angle", "torsion", "focus",
                           "contact"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_training_decreases(setup, gbp_batch):
    import optax
    model, params = setup
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            ld, _ = model.apply(p, gbp_batch, rng=key)
            return model.weighted_loss(ld)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(20):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_sampling_grows(setup, gbp_batch):
    model, params = setup
    # start with just the protein (no gen atoms): clear placed atoms
    gen = np.asarray(gbp_batch.gen_flag)
    mask = np.asarray(gbp_batch.mask) & ~gen
    empty = gbp_batch.replace(mask=jnp.asarray(mask),
                              gen_flag=jnp.zeros_like(gbp_batch.gen_flag),
                              is_first_step=jnp.ones(2, bool))
    out = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                         max_atoms=5, min_atoms=1)
    placed = np.asarray(out["gen_flag"]).sum(1)
    assert (placed >= 1).all()
    assert np.isfinite(np.asarray(out["pos"])).all()


def test_termination_rule(setup, gbp_batch):
    """Reference semantics (graphbp.py:296-313): a molecule whose focus
    head reports no eligible atom is COMPLETE — kept if it has at least
    min_atoms placed, DISCARDED (empty gen_flag) otherwise; it is never
    force-grown past an unwilling focus head."""
    model, params = setup
    gen = np.asarray(gbp_batch.gen_flag)
    mask = np.asarray(gbp_batch.mask) & ~gen
    empty = gbp_batch.replace(mask=jnp.asarray(mask),
                              gen_flag=jnp.zeros_like(gbp_batch.gen_flag),
                              is_first_step=jnp.ones(2, bool))
    lo = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                        max_atoms=6, min_atoms=1)
    hi = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                        max_atoms=6, min_atoms=30)
    placed_lo = np.asarray(lo["gen_flag"]).sum(1)
    placed_hi = np.asarray(hi["gen_flag"]).sum(1)
    # same rng: identical growth while alive; raising min_atoms can only
    # discard (zero out) small completions, never grow them bigger
    for a, b in zip(placed_hi, placed_lo):
        assert a == b or a == 0, (a, b)
    # untrained head: something completes under max_atoms=6 and min=30,
    # and the discard path zeroes it rather than force-growing
    assert (placed_hi <= np.asarray(hi["mask"]).sum(1)).all()


def test_first_step_uses_contact_head(setup, gbp_batch):
    """The first focus must come from the trained contact head over
    context atoms (reference: graphbp.py:281-291), not from a
    preassigned index."""
    model, params = setup
    gen = np.asarray(gbp_batch.gen_flag)
    mask = np.asarray(gbp_batch.mask) & ~gen
    empty = gbp_batch.replace(mask=jnp.asarray(mask),
                              gen_flag=jnp.zeros_like(gbp_batch.gen_flag),
                              is_first_step=jnp.ones(2, bool),
                              # poison the preassigned focus: it must be
                              # ignored by the first-step contact choice
                              focus=jnp.zeros(2, jnp.int32) - 1)
    focus, c1, c2, ok, finite = model.apply(
        params, empty, jax.random.PRNGKey(0), method="pick_focus_sample")
    assert bool(ok.all()) and bool(finite.all())
    m = np.asarray(mask)
    f = np.asarray(focus)
    assert (f >= 0).all()
    for g in range(2):
        assert m[g, f[g]], "first focus must be a real context atom"


def test_sampling_scan_matches_host(setup, gbp_batch):
    """On-device fori_loop growth == host-stepped loop (same rng splits)."""
    from cbgbench_tpu.models.graphbp import sample_graphbp_host
    model, params = setup
    gen = np.asarray(gbp_batch.gen_flag)
    mask = np.asarray(gbp_batch.mask) & ~gen
    empty = gbp_batch.replace(mask=jnp.asarray(mask),
                              gen_flag=jnp.zeros_like(gbp_batch.gen_flag),
                              is_first_step=jnp.ones(2, bool))
    dev = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                         max_atoms=4, min_atoms=1)
    host = sample_graphbp_host(model, params, empty, jax.random.PRNGKey(4),
                               max_atoms=4, min_atoms=1)
    np.testing.assert_array_equal(np.asarray(dev["mask"]),
                                  np.asarray(host["mask"]))
    np.testing.assert_array_equal(np.asarray(dev["gen_flag"]),
                                  np.asarray(host["gen_flag"]))
    np.testing.assert_array_equal(np.asarray(dev["z"]),
                                  np.asarray(host["z"]))
    np.testing.assert_allclose(np.asarray(dev["pos"]),
                               np.asarray(host["pos"]), atol=1e-5)


def test_saturated_focus_head_keeps_grads_finite(setup, gbp_batch):
    """Regression for the r3 iter-9.9k permanent NaN: with a focus/contact
    head confident enough that f32 sigmoid saturates to exactly 1.0, the
    logit-space BCE must still produce finite loss AND gradients (the old
    -(c*log(s+1e-12)+(1-c)*log(1-s+1e-12)) form emits -inf on TPU where
    XLA reassociates 1-s+1e-12)."""
    model, params = setup
    # blow up the focus head so its logits saturate the sigmoid
    p = jax.tree_util.tree_map(lambda a: a, params)
    import flax
    flat = flax.traverse_util.flatten_dict(p)
    for k in list(flat):
        if "focus_mlp" in k and k[-1] == "kernel":
            flat[k] = flat[k] * 300.0
    p = flax.traverse_util.unflatten_dict(flat)

    def loss(pp):
        ld, _ = model.apply(pp, gbp_batch, rng=jax.random.PRNGKey(3))
        return ld["focus"] + ld["contact"]

    v, g = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(v))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)


def test_clash_cand_placement(setup, gbp_batch):
    """clash_cand=1 must reproduce the plain sampler bit-for-bit (same
    key order); clash_cand=4 must not reduce the min protein clearance
    of placed atoms (it keeps the first of 4 draws clearing 2.9 A)."""
    model, params = setup
    gen = np.asarray(gbp_batch.gen_flag)
    mask = np.asarray(gbp_batch.mask) & ~gen
    empty = gbp_batch.replace(mask=jnp.asarray(mask),
                              gen_flag=jnp.zeros_like(gbp_batch.gen_flag),
                              is_first_step=jnp.ones(2, bool))
    plain = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                           max_atoms=5, min_atoms=1)
    one = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                         max_atoms=5, min_atoms=1, clash_cand=1)
    assert np.allclose(np.asarray(plain["pos"]), np.asarray(one["pos"]))

    def min_clearance(out):
        pos = np.asarray(out["pos"])
        gm = np.asarray(out["gen_flag"])
        pm = mask & (np.asarray(gbp_batch.z) >= model.num_classes)
        vals = []
        for b in range(pos.shape[0]):
            if gm[b].any() and pm[b].any():
                d = np.linalg.norm(pos[b][gm[b]][:, None]
                                   - pos[b][pm[b]][None], axis=-1)
                vals.append(d.min())
        return min(vals) if vals else np.inf

    avoid = sample_graphbp(model, params, empty, jax.random.PRNGKey(4),
                           max_atoms=5, min_atoms=1, clash_cand=4)
    assert np.isfinite(np.asarray(avoid["pos"])).all()
    assert min_clearance(avoid) >= min_clearance(plain) - 1e-5
