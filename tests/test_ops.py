"""Unit tests for the ops layer: kNN, RBF, masked reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.ops import (GaussianSmearingTable, gather_neighbors,
                              knn_neighbors, masked_mean, masked_softmax)
from cbgbench_tpu.ops.knn import hybrid_neighbors, pairwise_sqdist


def _brute_knn(pos, mask, k):
    """Reference kNN: per batch row, k nearest valid non-self neighbors."""
    b, n, _ = pos.shape
    idx = np.zeros((b, n, k), np.int32)
    valid = np.zeros((b, n, k), bool)
    for bi in range(b):
        for i in range(n):
            if not mask[bi, i]:
                continue
            d = np.linalg.norm(pos[bi] - pos[bi, i], axis=-1)
            d[i] = np.inf
            d[~mask[bi]] = np.inf
            order = np.argsort(d, kind="stable")[:k]
            for j, src in enumerate(order):
                if np.isfinite(d[src]):
                    idx[bi, i, j] = src
                    valid[bi, i, j] = True
    return idx, valid


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(3, 40, 3)).astype(np.float32)
    mask = rng.random((3, 40)) < 0.8
    k = 8
    idx, valid = jax.jit(lambda p, m: knn_neighbors(p, m, k))(pos, mask)
    idx, valid = np.asarray(idx), np.asarray(valid)
    ref_idx, ref_valid = _brute_knn(pos, mask, k)
    assert (valid == ref_valid).all()
    # Compare neighbor *distances* (ties may reorder indices).
    for bi in range(3):
        for i in range(40):
            got = sorted(np.linalg.norm(pos[bi, idx[bi, i, j]] - pos[bi, i])
                         for j in range(k) if valid[bi, i, j])
            want = sorted(np.linalg.norm(pos[bi, ref_idx[bi, i, j]] - pos[bi, i])
                          for j in range(k) if ref_valid[bi, i, j])
            np.testing.assert_allclose(got, want, rtol=1e-5)


def test_knn_no_self_loops_no_padding():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(2, 16, 3)).astype(np.float32)
    mask = np.ones((2, 16), bool)
    mask[:, 12:] = False
    idx, valid = knn_neighbors(jnp.asarray(pos), jnp.asarray(mask), 6)
    idx, valid = np.asarray(idx), np.asarray(valid)
    self_idx = np.arange(16)[None, :, None]
    assert not (valid & (idx == self_idx)).any()
    assert not valid[:, 12:].any()              # padded dst has no edges
    assert not (valid & (idx >= 12)).any()      # padded src never selected


def test_gather_neighbors():
    x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    idx = jnp.array([[[1, 2], [0, 0], [4, 3], [2, 2], [0, 1]]] * 2)
    out = gather_neighbors(x, idx)
    assert out.shape == (2, 5, 2, 3)
    np.testing.assert_allclose(out[0, 0, 0], x[0, 1])
    np.testing.assert_allclose(out[1, 2, 1], x[1, 3])


def test_pairwise_sqdist():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(2, 10, 3)).astype(np.float32)
    d2 = np.asarray(pairwise_sqdist(jnp.asarray(pos)))
    ref = ((pos[:, :, None] - pos[:, None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, ref, atol=1e-4)


def test_gaussian_smearing_fixed_offsets():
    """The fixed-offset path must reproduce the reference table exactly."""
    table = GaussianSmearingTable(0.0, 10.0, 20, fixed_offset=True)
    d = jnp.array([0.0, 1.0, 2.5])
    out = np.asarray(table(d))
    assert out.shape == (3, 20)
    offsets = np.array([0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3,
                        3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10])
    ref = np.exp(-0.5 * (np.array([0.0, 1.0, 2.5])[:, None] - offsets) ** 2)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_masked_mean():
    x = jnp.array([[1.0, 2.0, 100.0], [3.0, 5.0, 7.0]])
    mask = jnp.array([[True, True, False], [True, True, True]])
    out = np.asarray(masked_mean(x[..., None], mask, axis=1))
    np.testing.assert_allclose(out[:, 0], [1.5, 5.0])


def test_masked_softmax_sums_to_one_and_zeroes_invalid():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 4, 6, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 4, 6)) < 0.5)
    alpha = np.asarray(masked_softmax(logits, mask, axis=-2))
    m = np.asarray(mask)
    assert (alpha[~m] == 0).all()
    sums = alpha.sum(axis=-2)
    has_valid = m.any(axis=-1)
    np.testing.assert_allclose(sums[has_valid], 1.0, atol=1e-5)
    np.testing.assert_allclose(sums[~has_valid], 0.0, atol=1e-6)


def test_hybrid_neighbors_shapes():
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    mask = jnp.ones((2, 20), bool)
    lig = jnp.asarray(np.arange(20)[None].repeat(2, 0) < 6)
    idx, valid = hybrid_neighbors(pos, mask, lig, 4)
    assert idx.shape == (2, 20, 8) and valid.shape == (2, 20, 8)
    # ligand dst rows: first 4 slots are ligand srcs, last 4 protein srcs
    lig_np, idx_np, val_np = np.asarray(lig), np.asarray(idx), np.asarray(valid)
    for bi in range(2):
        for i in range(6):
            srcs1 = idx_np[bi, i, :4][val_np[bi, i, :4]]
            srcs2 = idx_np[bi, i, 4:][val_np[bi, i, 4:]]
            assert lig_np[bi][srcs1].all()
            assert (~lig_np[bi][srcs2]).all()


def test_unitransformer_cutoff_modes():
    """hybrid + radius edge schemes run and differ from plain knn."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.nn.unitransformer import UniTransformer
    rng = np.random.default_rng(0)
    B, N, D = 2, 64, 32
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 6, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    mask = jnp.ones((B, N), bool)
    lig = jnp.asarray(rng.random((B, N)) > 0.7)
    kw = dict(num_classes=8, num_layers=1, hidden_dim=D, n_heads=4, k=8)
    outs = {}
    for mode in ("knn", "hybrid", "radius"):
        m = UniTransformer(cutoff_mode=mode, **kw)
        p = m.init(jax.random.PRNGKey(0), x, h, mask, lig, lig)
        xo, ho, _ = m.apply(p, x, h, mask, lig, lig)
        assert np.isfinite(np.asarray(ho)).all(), mode
        outs[mode] = np.asarray(ho)
    assert not np.allclose(outs["knn"], outs["hybrid"])


def test_masked_mean_ignores_nonfinite_at_masked_slots():
    """inf/NaN at a masked-out slot must not poison the sum (the r3
    GraphBP focus-loss incident: log(1-sigmoid) = -inf at a padded slot
    turned the whole gradient NaN via inf*0)."""
    x = jnp.array([[1.0, 3.0, np.inf], [2.0, np.nan, 4.0]])
    mask = jnp.array([[True, True, False], [True, False, True]])
    out = np.asarray(masked_mean(x[..., None], mask, axis=1))
    np.testing.assert_allclose(out[:, 0], [2.0, 3.0])
    g = jax.grad(lambda a: masked_mean(a[..., None], mask, axis=1).sum())(x)
    assert np.isfinite(np.asarray(g)[np.asarray(mask)]).all()


def test_chunked_top_k_exact():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.ops.knn import chunked_top_k

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 7, 512)).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 32)
    v, i = chunked_top_k(x, 32)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))
    # indices may differ only where values tie; values equality suffices
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(x), np.asarray(i), -1),
        np.asarray(v_ref))
    # non-divisible width falls back to plain top_k
    v2, i2 = chunked_top_k(x[..., :500], 32)
    vr2, _ = jax.lax.top_k(x[..., :500], 32)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vr2))
