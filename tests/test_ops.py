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


def test_gather_neighbors_prefix_matches_zero_padded_full():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.ops.knn import gather_neighbors, gather_neighbors_prefix

    rng = np.random.default_rng(7)
    b, n, k, p, d = 2, 48, 6, 12, 3
    idx = jnp.asarray(rng.integers(0, n, size=(b, n, k)).astype(np.int32))
    dx = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    # full gather of dx zero-extended to all n rows == prefix gather
    dx_full = jnp.concatenate([dx, jnp.zeros((b, n - p, d))], 1)
    ref = np.asarray(gather_neighbors(dx_full, idx))
    out = np.asarray(gather_neighbors_prefix(dx, idx))
    np.testing.assert_allclose(out, ref, atol=0, rtol=0)
    # bf16 payload path
    ref_b = np.asarray(gather_neighbors(dx_full.astype(jnp.bfloat16), idx),
                       dtype=np.float32)
    out_b = np.asarray(gather_neighbors_prefix(dx.astype(jnp.bfloat16), idx),
                       dtype=np.float32)
    np.testing.assert_allclose(out_b, ref_b, atol=0, rtol=0)


def test_incremental_rel_x_matches_direct_recompute():
    """The UniTransformer layer loop maintains rel_x incrementally
    (rel' = rel + dx_i - dx_j with a ligand-prefix delta gather); pin
    its drift against direct x'_i - x'_j recomputation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.ops.knn import (gather_neighbors,
                                      gather_neighbors_prefix,
                                      knn_neighbors)

    rng = np.random.default_rng(3)
    b, n, k, nl = 2, 64, 8, 16
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32) * 5)
    mask = jnp.ones((b, n), bool)
    idx, _ = jax.jit(lambda p, m: knn_neighbors(p, m, k))(x, mask)
    rel = x[..., :, None, :] - gather_neighbors(x, idx)
    for step in range(9):
        dx = jnp.zeros((b, n, 3)).at[:, :nl].set(
            jnp.asarray(rng.normal(size=(b, nl, 3)).astype(np.float32))
            * 0.05)
        x = x + dx
        rel = rel + dx[..., :, None, :] - gather_neighbors_prefix(
            dx[:, :nl], idx)
    direct = np.asarray(x[..., :, None, :] - gather_neighbors(x, idx))
    np.testing.assert_allclose(np.asarray(rel), direct, atol=5e-6)


def test_knn_cached_matches_full():
    """knn_neighbors_cached (static receptor candidates merged with the
    dynamic ligand columns) must reproduce knn_neighbors exactly on
    valid slots: idx where valid, valid everywhere, dist where valid."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbgbench_tpu.ops.knn import (knn_neighbors, knn_neighbors_cached,
                                      knn_static_candidates)

    rng = np.random.default_rng(11)
    b, nl, nr, k = 3, 16, 80, 8
    n = nl + nr
    pos = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32) * 4)
    mask = jnp.asarray(rng.random((b, n)) > 0.15)
    # ensure enough valid receptor rows
    mask = mask.at[:, nl:nl + 40].set(True)

    idx_f, val_f, dist_f = knn_neighbors(pos, mask, k, return_dist=True)
    cand = knn_static_candidates(pos[:, nl:], mask[:, nl:], k)
    idx_c, val_c, dist_c = knn_neighbors_cached(
        pos, mask, k, nl, cand[0], cand[1], return_dist=True)

    vf, vc = np.asarray(val_f), np.asarray(val_c)
    np.testing.assert_array_equal(vf, vc)
    i_f, i_c = np.asarray(idx_f), np.asarray(idx_c)
    # valid slots must agree as SETS per row with matching distances
    # (top_k tie order may differ between merged and full paths)
    df, dc = np.asarray(dist_f), np.asarray(dist_c)
    for bi in range(b):
        for r in range(n):
            sf = sorted(zip(df[bi, r][vf[bi, r]], i_f[bi, r][vf[bi, r]]))
            sc = sorted(zip(dc[bi, r][vc[bi, r]], i_c[bi, r][vc[bi, r]]))
            assert len(sf) == len(sc)
            for (da, ia), (db_, ib) in zip(sf, sc):
                # same formula, different XLA fusion: ~4e-6 rel drift
                np.testing.assert_allclose(da, db_, rtol=1e-4, atol=1e-5)
                assert ia == ib, (bi, r, ia, ib)


def test_mlp_param_mirror_matches_flax_original():
    """MLP was rewritten over param-mirrored Dense/LayerNorm (so callers
    can fuse projections into its first matmul). Pin: identical param
    tree AND outputs vs the original nn.Dense/nn.LayerNorm composition,
    for the configs used across the codebase."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn
    from cbgbench_tpu.nn.common import ACT, MLP

    class MLPRef(nn.Module):
        out_dim: int
        hidden_dim: int
        num_layer: int = 2
        norm: bool = True
        act: str = "relu"
        act_last: bool = False
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            act = ACT[self.act]
            for i in range(self.num_layer):
                feat = (self.out_dim if i == self.num_layer - 1
                        else self.hidden_dim)
                x = nn.Dense(feat, dtype=self.dtype)(x)
                if i < self.num_layer - 1 or self.act_last:
                    if self.norm:
                        x = nn.LayerNorm(dtype=self.dtype)(x)
                    x = act(x)
            return x

    rng = jax.random.PRNGKey(0)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 24))
    for cfg in (dict(out_dim=16, hidden_dim=16),
                dict(out_dim=8, hidden_dim=12, num_layer=3),
                dict(out_dim=8, hidden_dim=12, act_last=True),
                dict(out_dim=16, hidden_dim=16, norm=False),
                dict(out_dim=16, hidden_dim=16, dtype=jnp.bfloat16),
                dict(out_dim=5, hidden_dim=9, num_layer=3,
                     act="silu", act_last=True, dtype=jnp.bfloat16)):
        x = x32.astype(cfg.get("dtype") or jnp.float32)
        new = MLP(**cfg)
        ref = MLPRef(**cfg)
        p_new = new.init(rng, x)
        p_ref = ref.init(rng, x)
        flat_new = jax.tree_util.tree_flatten_with_path(p_new)[0]
        flat_ref = jax.tree_util.tree_flatten_with_path(p_ref)[0]
        assert [k for k, _ in flat_new] == [k for k, _ in flat_ref], cfg
        for (k, a), (_, b) in zip(flat_new, flat_ref):
            assert a.shape == b.shape and a.dtype == b.dtype, (cfg, k)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       err_msg=str((cfg, k)))
        o_new = np.asarray(new.apply(p_ref, x), dtype=np.float32)
        o_ref = np.asarray(ref.apply(p_ref, x), dtype=np.float32)
        np.testing.assert_allclose(o_new, o_ref, rtol=2e-5, atol=2e-5,
                                   err_msg=str(cfg))

    # fused extra projection == separate matmul
    wd = jax.random.normal(jax.random.PRNGKey(2), (24, 10))
    bd = jax.random.normal(jax.random.PRNGKey(3), (10,))
    m = MLP(out_dim=16, hidden_dim=16, dtype=jnp.bfloat16)
    p = m.init(rng, x32.astype(jnp.bfloat16))
    q_fused, ex = m.apply(p, x32.astype(jnp.bfloat16), extra_weight=wd,
                          extra_bias=bd)
    q_plain = m.apply(p, x32.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(q_fused, dtype=np.float32),
                               np.asarray(q_plain, dtype=np.float32))
    ref_ex = (x32.astype(jnp.bfloat16) @ wd.astype(jnp.bfloat16)
              + bd.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(ex, dtype=np.float32),
                               np.asarray(ref_ex, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)
