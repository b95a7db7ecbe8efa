"""Pocket2Mol: data builder, loss, training step, sampling growth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.chem import read_sdf
from cbgbench_tpu.data.dataset import example_pairs, RawPairDataset
from cbgbench_tpu.data.p2m import build_p2m_sample, stack_p2m_batch
from cbgbench_tpu.models.pocket2mol import (Pocket2Mol, sample_pocket2mol)
from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step

LIG_CAP, REC_CAP, MSK_CAP = 48, 288, 48


@pytest.fixture(scope="module")
def p2m_batch():
    ds = RawPairDataset(example_pairs()[:2], mode="add_aromatic",
                        pocket_radius=6.0)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(2):
        s = ds.get(i, rng)
        samples.append(build_p2m_sample(s, rng, num_contrast=8, edge_cap=8))
    return stack_p2m_batch(samples, lig_cap=LIG_CAP, rec_cap=REC_CAP,
                           msk_cap=MSK_CAP, ef_cap=24)


@pytest.fixture(scope="module")
def setup(p2m_batch):
    model = Pocket2Mol(num_classes=13, emb_dim=32, vec_dim=16, num_layers=2,
                       k=16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, p2m_batch)
    return model, params


def test_sample_builder_invariants(p2m_batch):
    b = p2m_batch
    # masked + ctx partition: every sample has some masked atoms
    assert np.asarray(b.msk_mask).sum(1).min() >= 1
    # bridge bonds: focal ctx atoms only where ctx exists
    has_ctx = np.asarray(b.ctx_mask).any(1)
    focal_ctx = np.asarray(b.ctx_focal_flag).any(1)
    focal_rec = np.asarray(b.rec_focal_flag).any(1)
    assert np.all(focal_ctx[has_ctx] | focal_rec[has_ctx] | True)
    # adjacency symmetric
    bond = np.asarray(b.ctx_bond)
    assert (bond == bond.transpose(0, 2, 1)).all()
    # contrast edges index valid ctx atoms
    ec = np.asarray(b.con_edge_ctx)
    em = np.asarray(b.con_edge_mask)
    cm = np.asarray(b.ctx_mask)
    for g in range(b.batch_size):
        if em[g].any():
            assert cm[g][ec[g][em[g]]].all()


def test_loss_structure(setup, p2m_batch):
    model, params = setup
    losses, results = model.apply(params, p2m_batch)
    expected = {"atom", "edge", "real", "fake", "lig_focal", "rec_focal",
                "pos_from_lig", "pos_from_rec"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_train_step_decreases(setup, p2m_batch):
    model, params = setup
    tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)

    def loss_fn(p):
        ld, _ = model.apply(p, p2m_batch)
        return model.weighted_loss(ld)

    import optax
    losses = []
    for i in range(15):
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        state = state.replace(params=optax.apply_updates(state.params, updates),
                              opt_state=opt_state)
        losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_sampling_grows_molecules(setup, p2m_batch):
    model, params = setup
    # start from an EMPTY context (denovo): blank the ctx buffers
    empty = p2m_batch.replace(
        ctx_pos=jnp.zeros_like(p2m_batch.ctx_pos),
        ctx_atype=jnp.zeros_like(p2m_batch.ctx_atype),
        ctx_mask=jnp.zeros_like(p2m_batch.ctx_mask),
        ctx_bond=jnp.zeros_like(p2m_batch.ctx_bond),
        ctx_frontier=jnp.zeros_like(p2m_batch.ctx_frontier),
        rec_pred_flag=p2m_batch.rec_mask,
    )
    out = sample_pocket2mol(model, params, empty, jax.random.PRNGKey(1),
                            max_iter=6)
    n_atoms = np.asarray(out["mask"]).sum(1)
    # untrained model: growth may stop early, but buffers must stay sane
    assert (n_atoms <= 6).all()
    assert np.isfinite(np.asarray(out["pos"])).all()
    bond = np.asarray(out["bond"])
    assert (bond == bond.transpose(0, 2, 1)).all()


def test_sampling_scan_matches_host(setup, p2m_batch):
    """The on-device fori_loop growth must reproduce the host-stepped
    loop exactly (same rng split sequence, masked commits)."""
    from cbgbench_tpu.models.pocket2mol import sample_pocket2mol_host
    model, params = setup
    empty = p2m_batch.replace(
        ctx_pos=jnp.zeros_like(p2m_batch.ctx_pos),
        ctx_atype=jnp.zeros_like(p2m_batch.ctx_atype),
        ctx_mask=jnp.zeros_like(p2m_batch.ctx_mask),
        ctx_bond=jnp.zeros_like(p2m_batch.ctx_bond),
        ctx_frontier=jnp.zeros_like(p2m_batch.ctx_frontier),
        rec_pred_flag=p2m_batch.rec_mask,
    )
    dev = sample_pocket2mol(model, params, empty, jax.random.PRNGKey(1),
                            max_iter=5)
    host = sample_pocket2mol_host(model, params, empty,
                                  jax.random.PRNGKey(1), max_iter=5)
    np.testing.assert_array_equal(np.asarray(dev["mask"]),
                                  np.asarray(host["mask"]))
    np.testing.assert_array_equal(np.asarray(dev["atype"]),
                                  np.asarray(host["atype"]))
    np.testing.assert_array_equal(np.asarray(dev["bond"]),
                                  np.asarray(host["bond"]))
    np.testing.assert_allclose(np.asarray(dev["pos"]),
                               np.asarray(host["pos"]), atol=1e-5)


def test_stack_p2m_batch_truncates_oversized_ligand():
    """Real CrossDocked ligands can exceed lig_cap (6HAX: 66 atoms at cap
    64); the stacker must clip to capacity, not crash (regression: the
    q2 100x5 protocol run died on pocket 4)."""
    import numpy as np

    from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
    from cbgbench_tpu.data.p2m import build_p2m_sample, stack_p2m_batch
    pairs = [p for p in example_pairs() if "6HAX" in p[1] or "6hax" in p[1]]
    assert pairs, "6HAX fixture missing"
    ds = RawPairDataset(pairs, mode="add_aromatic", pocket_radius=10.0)
    rng = np.random.default_rng(0)
    base = ds.get(0, rng)
    assert len(base["ligand"]["atype"]) > 64
    s = build_p2m_sample(base, rng, num_contrast=4, edge_cap=8)
    import pytest
    with pytest.raises(ValueError, match="shape bucket"):
        stack_p2m_batch([s], lig_cap=64, rec_cap=928)   # training default
    batch = stack_p2m_batch([s], lig_cap=64, rec_cap=928,
                            truncate=True)
    assert batch.ctx_pos.shape[1] == 64
    assert batch.msk_pos.shape[1] == 64
    # no surviving supervision edge may reference a truncated atom
    lfe = np.asarray(batch.lig_focal_edge)[np.asarray(
        batch.lig_focal_edge_mask)]
    assert (lfe[:, 0] < 64).all() and (lfe[:, 1] < 64).all()
    cec = np.asarray(batch.con_edge_ctx)[np.asarray(batch.con_edge_mask)]
    assert (cec < 64).all()
