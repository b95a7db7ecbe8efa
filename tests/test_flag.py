"""FLAG: mol-tree decomposition, vocab, training losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.chem import read_ligand
from cbgbench_tpu.chem.moltree import MotifVocab, bfs_motif_order, tree_decomp
from cbgbench_tpu.data.dataset import RawPairDataset, example_pairs
from cbgbench_tpu.data.flag_data import build_flag_sample, stack_flag_batch
from cbgbench_tpu.models.flag import FLAG


@pytest.fixture(scope="module")
def mols():
    return [read_ligand(p)[0] for p, in
            [(pair[1],) for pair in example_pairs()]]


def test_tree_decomp_covers_molecule(mols):
    for mol in mols:
        cliques, edges = tree_decomp(mol)
        covered = set(a for c in cliques for a in c)
        assert covered == set(range(mol.num_atoms))
        # every ring is inside some clique
        for ring in mol.rings():
            assert any(set(ring) <= set(c) for c in cliques)


def test_vocab_build_and_templates(mols):
    vocab = MotifVocab.build(mols)
    assert vocab.size() > 5
    for wid, tmpl in vocab.templates.items():
        assert len(tmpl["z"]) == len(tmpl["pos"])
        # template centered
        np.testing.assert_allclose(tmpl["pos"].mean(0), 0.0, atol=1e-5)


def test_bfs_motif_order(mols):
    cliques, edges = tree_decomp(mols[0])
    order = bfs_motif_order(cliques, edges, 0, np.random.default_rng(0))
    assert sorted(order) == list(range(len(cliques)))
    assert order[0] == 0


@pytest.fixture(scope="module")
def flag_setup(mols):
    vocab = MotifVocab.build(mols)
    ds = RawPairDataset(example_pairs()[:2], mode="basic", pocket_radius=6.0)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(2):
        s = ds.get(i, rng)
        fs = build_flag_sample(s, vocab, rng)
        assert fs is not None
        samples.append(fs)
    batch = stack_flag_batch(samples, lig_cap=64, rec_cap=288)
    model = FLAG(num_classes=8, vocab_size=max(vocab.size(), 8), emb_dim=32,
                 vec_dim=16, num_layers=2, k=16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, params, batch, vocab


def test_flag_loss_structure(flag_setup):
    model, params, batch, _ = flag_setup
    losses, _ = model.apply(params, batch)
    assert set(losses) == {"pred", "comb", "focal", "dm", "torsion", "sr"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["sr"]) >= 0.0


def test_flag_sr_zero_when_forces_vanish(flag_setup):
    """The sr loss measures distance distortion of the force-displaced
    pose; with both refine heads' output layers zeroed the pose is
    untouched and the loss must be exactly 0 (stationarity target)."""
    model, params, batch, _ = flag_setup
    import flax
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    zeroed = {k: (jnp.zeros_like(v)
                  if ("refine_protein" in k or "refine_ligand" in k)
                  and k.endswith(("kernel", "bias")) else v)
              for k, v in flat.items()}
    params_z = flax.traverse_util.unflatten_dict(zeroed, sep="/")
    losses, _ = model.apply(params_z, batch)
    assert float(losses["sr"]) < 1e-9
    # and the ca gather actually selected alpha carbons
    assert int(np.asarray(batch.ca_mask).sum()) > 0


def test_flag_training_decreases(flag_setup):
    import optax
    model, params, batch, _ = flag_setup
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            ld, _ = model.apply(p, batch)
            return model.weighted_loss(ld)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(25):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_flag_predict_step(flag_setup):
    model, params, batch, vocab = flag_setup
    motif_logits, lf, pf, comb, pred_dm, pred_angle = model.apply(
        params, batch, method="predict_step")
    assert motif_logits.shape[-1] == model.vocab_size
    assert np.isfinite(np.asarray(motif_logits)).all()
    assert np.isfinite(np.asarray(pred_dm)).all()
    assert np.all(np.abs(np.asarray(pred_angle)) <= np.pi + 1e-5)


def test_flag_sampling_grows_molecule(flag_setup):
    from cbgbench_tpu.sampling.flag_sample import sample_flag
    model, params, batch, vocab = flag_setup
    ds = RawPairDataset(example_pairs()[:1], mode="basic", pocket_radius=6.0)
    base = ds.get(0, np.random.default_rng(0))
    mol = sample_flag(model, params, base, vocab, seed=3, max_steps=4,
                      lig_cap=64, rec_cap=288)
    assert mol is not None
    assert mol.num_atoms >= 2
    assert len(mol.bonds) >= 1
    assert np.isfinite(mol.pos).all()
    # grown structure is connected
    seen = {0}
    frontier = [0]
    adj = {i: [] for i in range(mol.num_atoms)}
    for (a, b) in mol.bonds:
        adj[a].append(b)
        adj[b].append(a)
    while frontier:
        cur = frontier.pop()
        for n in adj[cur]:
            if n not in seen:
                seen.add(n)
                frontier.append(n)
    assert len(seen) == mol.num_atoms


def test_flag_refine_iters_moves_pose_preserves_topology(flag_setup):
    """refine_iters applies the trained force heads post-growth: same
    atoms/bonds, displaced finite positions; 0 iters is untouched."""
    from cbgbench_tpu.sampling.flag_sample import sample_flag_batch
    model, params, batch, vocab = flag_setup
    ds = RawPairDataset(example_pairs()[:1], mode="basic", pocket_radius=6.0)
    base = ds.get(0, np.random.default_rng(0))
    kw = dict(max_steps=4, lig_cap=64, rec_cap=288)
    plain = sample_flag_batch(model, params, base, vocab, [3], **kw)[0]
    refined = sample_flag_batch(model, params, base, vocab, [3],
                                refine_iters=2, **kw)[0]
    assert plain is not None and refined is not None
    np.testing.assert_array_equal(plain.atomic_numbers,
                                  refined.atomic_numbers)
    assert plain.bonds == refined.bonds
    assert np.isfinite(refined.pos).all()
    # the randomly initialized heads emit nonzero forces -> pose moved
    assert not np.allclose(plain.pos, refined.pos)


def test_flag_mds_placement_roundtrip():
    """MDS + Kabsch reproduces a known geometry when fed exact distances."""
    from cbgbench_tpu.sampling.flag_sample import _mds_place
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(4, 3)) * 3
    tmpl_true = rng.normal(size=(5, 3)) * 2 + np.array([5.0, 0, 0])
    d_cross = np.linalg.norm(ref[:, None] - tmpl_true[None], axis=-1)
    tmpl_centered = tmpl_true - tmpl_true.mean(0)
    placed = _mds_place(ref, tmpl_centered, d_cross)
    np.testing.assert_allclose(placed, tmpl_true, atol=1e-4)


def test_flag_sample_batch_matches_sequential(flag_setup):
    """The lockstep batch driver must reproduce the single-molecule
    sampler exactly: same per-row rng streams, same model outputs
    (row-independent padded forward), so identical molecules."""
    from cbgbench_tpu.sampling.flag_sample import (_flag_grow, _predict_rows,
                                                   sample_flag_batch)
    model, params, batch, vocab = flag_setup
    ds = RawPairDataset(example_pairs()[:1], mode="basic", pocket_radius=6.0)
    base = ds.get(0, np.random.default_rng(0))
    seeds = [3, 4, 5]

    # sequential reference: drive each coroutine with batch-1 predicts
    seq = []
    for s in seeds:
        g = _flag_grow(base, vocab, seed=s, max_steps=4, lig_cap=64)
        req = g.send(None)
        while True:
            try:
                row = _predict_rows(model, params, [req[1]], req[0],
                                    64, 288, 1)[0]
                req = g.send(row)
            except StopIteration as e:
                seq.append(e.value)
                break

    got = sample_flag_batch(model, params, base, vocab, seeds,
                            max_steps=4, lig_cap=64, rec_cap=288)
    assert len(got) == len(seq)
    for m_b, m_s in zip(got, seq):
        assert (m_b is None) == (m_s is None)
        if m_b is None:
            continue
        assert m_b.num_atoms == m_s.num_atoms
        np.testing.assert_array_equal(m_b.atomic_numbers, m_s.atomic_numbers)
        assert set(map(tuple, np.sort(np.array(
            [[a, b] for (a, b) in m_b.bonds]), axis=1))) == \
            set(map(tuple, np.sort(np.array(
                [[a, b] for (a, b) in m_s.bonds]), axis=1)))
        np.testing.assert_allclose(m_b.pos, m_s.pos, atol=1e-4)
