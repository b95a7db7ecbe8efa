"""Round-5 sampling-quality levers: GraphBP scheduled-sampling rollout
continuations (VERDICT r4 #4), the FLAG motif-frequency prior (#5), and
the D3FG stage-1 type temperature (#6).
"""

import numpy as np
import pytest

from cbgbench_tpu.data.graphbp_seq import (build_graphbp_rollout_sample,
                                           build_graphbp_sample)


def _toy_sample(n_lig=10, n_rec=30, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ligand": {"pos": rng.normal(0, 2, (n_lig, 3)).astype(np.float32),
                   "atype": (np.arange(n_lig) % 5).astype(np.int32)},
        "protein": {"pos": rng.normal(5, 3, (n_rec, 3)).astype(np.float32),
                    "element": np.full(n_rec, 6)},
    }


def test_rollout_sample_structure():
    s = _toy_sample()
    rng = np.random.default_rng(1)
    roll = np.asarray(s["ligand"]["pos"][:3]) + 0.4   # drifted prefix
    out = build_graphbp_rollout_sample(s, roll, np.array([0, 1, 2]), rng)
    n_rec = len(s["protein"]["pos"])
    assert out is not None
    assert len(out["z"]) == n_rec + 3
    assert out["gen_flag"].sum() == 3
    assert not out["is_first_step"]
    # the focus anchors a prefix atom, not a receptor atom
    assert out["focus"] >= n_rec
    assert np.isfinite([out["new_dist"], out["new_angle"],
                        out["new_torsion"]]).all()
    # target type is a crystal gen type
    assert 0 <= out["new_type"] < 5


def test_rollout_targets_continue_toward_crystal():
    """The supervised placement (d wrt focus) must reconstruct an actual
    unclaimed crystal atom position when the prefix IS crystal atoms."""
    s = _toy_sample()
    rng = np.random.default_rng(2)
    pos = np.asarray(s["ligand"]["pos"])
    roll = pos[:4].copy()                 # exact prefix
    out = build_graphbp_rollout_sample(s, roll, s["ligand"]["atype"][:4],
                                       rng)
    # the focus-to-target distance equals new_dist for some crystal atom
    f_pos = out["pos"][out["focus"]]
    d_all = np.linalg.norm(pos[4:] - f_pos, axis=-1)
    assert np.isclose(d_all.min(), out["new_dist"], atol=1e-5)


def test_rollout_sample_rejects_exhausted():
    s = _toy_sample(n_lig=3)
    rng = np.random.default_rng(0)
    roll = np.asarray(s["ligand"]["pos"])          # all atoms placed
    out = build_graphbp_rollout_sample(s, roll, s["ligand"]["atype"], rng)
    assert out is None


def test_rollout_batch_stacks_with_teacher_rows():
    from cbgbench_tpu.data.graphbp_seq import stack_graphbp_batch
    s = _toy_sample()
    rng = np.random.default_rng(3)
    teacher = build_graphbp_sample(s, rng)
    roll = np.asarray(s["ligand"]["pos"][:2]) + 0.3
    ro = build_graphbp_rollout_sample(s, roll, np.array([1, 2]), rng)
    batch = stack_graphbp_batch([teacher, ro], cap=64)
    assert batch.z.shape == (2, 64)
    assert bool(batch.is_first_step[1]) is False


def test_flag_prior_weighted_top5():
    from cbgbench_tpu.sampling.flag_sample import _top5_sample
    rng = np.random.default_rng(0)
    logits = np.array([5.0, 4.9, 4.8, 4.7, 4.6, -10.0])
    # prior concentrated on class 2: the weighted draw should pick it
    # far more often than uniform top-5 (20%)
    prior = np.array([0.01, 0.01, 0.95, 0.01, 0.01, 0.01])
    hits = sum(_top5_sample(logits, 6, rng, prior, 1.0) == 2
               for _ in range(300))
    assert hits > 150
    # alpha = 0 reduces to softmax-only weighting; never the off-top5 id
    draws = {_top5_sample(logits, 6, rng, prior, 0.0) for _ in range(100)}
    assert 5 not in draws


def test_flag_prior_none_is_reference_uniform():
    from cbgbench_tpu.sampling.flag_sample import _top5_sample
    rng = np.random.default_rng(0)
    logits = np.array([3.0, 2.0, 1.0, 0.5, 0.2, -1.0])
    counts = np.zeros(6, int)
    for _ in range(600):
        counts[_top5_sample(logits, 6, rng)] += 1
    assert counts[5] == 0
    # uniform over top-5: every member near 120/600
    assert (counts[:5] > 60).all()


def test_vocab_counts_frequency():
    from cbgbench_tpu.chem.mol import Molecule
    from cbgbench_tpu.chem.moltree import MotifVocab

    m = Molecule(np.array([6, 6]), np.array([[0.0, 0, 0], [1.5, 0, 0]]))
    m.add_bond(0, 1, 1)
    v = MotifVocab()
    w1 = v.add(m, [0, 1])
    w2 = v.add(m, [0, 1])
    assert w1 == w2
    assert v.counts[w1] == 2


def test_d3fg_type_temp_flattens():
    """Tempered posterior math: T>1 strictly flattens the class dist."""
    import jax
    import jax.numpy as jnp
    c = jnp.array([[0.9, 0.08, 0.02]])
    flat = jax.nn.softmax(jnp.log(jnp.maximum(c, 1e-20)) / 2.0, axis=-1)
    assert float(flat[0, 0]) < 0.9
    assert float(flat[0, 2]) > 0.02
    same = jax.nn.softmax(jnp.log(jnp.maximum(c, 1e-20)) / 1.0, axis=-1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(c), atol=1e-6)
