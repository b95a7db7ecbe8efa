"""Pallas kernel tests (interpret mode on CPU; same code compiles on TPU).

Covers ops/pallas_gather.py (fused one-hot gather; exact bf16 and
3-plane-exact f32) and ops/pallas_edge_attn.py (fused dual edge attention
vs the differentiable XLA path over identical params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.ops.knn import gather_neighbors
from cbgbench_tpu.ops.pallas_gather import fused_gather


def test_fused_gather_matches_onehot():
    rng = np.random.default_rng(0)
    B, N, K, D = 2, 96, 8, 64
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 20, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    hg, xg = fused_gather([h, x], idx, interpret=True)
    assert bool(jnp.all(hg == gather_neighbors(h, idx)))
    assert float(jnp.abs(xg - gather_neighbors(x, idx)).max()) < 1e-5
    assert hg.shape == (B, N, K, D) and xg.shape == (B, N, K, 3)


def test_gather_neighbors_f32_is_plane_exact():
    """The one-hot path must not round f32 payloads to bf16 (TPU MXU f32
    matmuls silently use bf16 inputs; the 3-plane split avoids that)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 3)) * 40, jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, (1, 64, 4)), jnp.int32)
    g = gather_neighbors(x, idx)
    ref = np.asarray(x)[0][np.asarray(idx)[0]]
    np.testing.assert_allclose(np.asarray(g)[0], ref, atol=1e-5)


def test_gather_neighbors_int_exact():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.integers(0, 4000, (1, 64)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 64, (1, 64, 4)), jnp.int32)
    g = gather_neighbors(z, idx)
    ref = np.asarray(z)[0][np.asarray(idx)[0]]
    assert (np.asarray(g)[0] == ref).all()


@pytest.fixture(scope="module")
def uni_setup():
    from cbgbench_tpu.nn.unitransformer import UniTransformer
    B, N, D, K = 2, 128, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 5, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N)) > 0.1)
    lig = jnp.asarray(rng.random((B, N)) > 0.7) & mask
    kw = dict(num_classes=8, num_layers=2, hidden_dim=D, n_heads=8, k=K)
    params = UniTransformer(impl="xla", **kw).init(
        jax.random.PRNGKey(0), x, h, mask, lig, lig)
    return UniTransformer, kw, params, (x, h, mask, lig, lig)


def test_edge_attn_param_structure_identical(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    p2 = UniTransformer(impl="pallas", **kw).init(jax.random.PRNGKey(0),
                                                  *args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_edge_attn_pallas_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas", **kw).apply(params, *args)
    # kernel runs matmuls at bf16; tolerances scaled to activations
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    # and the outputs are meaningfully nonzero
    assert float(jnp.abs(ho).max()) > 0.1


def test_edge_attn_respects_gen_flag(uni_setup):
    """Context atoms must not move under the pallas path either."""
    UniTransformer, kw, params, args = uni_setup
    x, h, mask, lig, _gen = args
    gen = lig.at[:, :16].set(False)
    xp, _, _ = UniTransformer(impl="pallas", **kw).apply(
        params, x, h, mask, lig, gen)
    np.testing.assert_allclose(np.asarray(xp[:, :16]),
                               np.asarray(x[:, :16]), atol=1e-6)


def test_targetdiff_pallas_forward(uni_setup):
    """Full model forward under impl='pallas' stays close to 'xla'."""
    from cbgbench_tpu.data.batch import synthetic_batch
    from cbgbench_tpu.models.targetdiff import TargetDiff
    batch = synthetic_batch(0, batch_size=2, n_lig=10, n_rec=40,
                            num_atom_types=8, lig_cap=16, rec_cap=48)
    kw = dict(num_classes=8, num_timesteps=20, emb_dim=32, num_layers=2,
              n_heads=4, k=8)
    rng = jax.random.PRNGKey(0)
    t = jnp.array([5, 10])
    m_x = TargetDiff(impl="xla", **kw)
    params = jax.jit(m_x.init)(rng, batch, t, rng)
    ld_x, _ = m_x.apply(params, batch, t, rng)
    ld_p, _ = TargetDiff(impl="pallas", **kw).apply(params, batch, t, rng)
    for k_ in ld_x:
        a, b = float(ld_x[k_]), float(ld_p[k_])
        assert abs(a - b) < 0.05 * max(abs(a), 1.0), (k_, a, b)


def test_edge_attn_pallas_pre_matches_xla(uni_setup):
    """Hybrid path (the sampling default): XLA pre-gathered projections +
    fused kernel must match the XLA path."""
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre", **kw).apply(params,
                                                              *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre_param_structure(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    p2 = UniTransformer(impl="pallas_pre", **kw).init(
        jax.random.PRNGKey(0), *args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_edge_attn_pallas_pre3_matches_xla(uni_setup):
    """pre3 hybrid (XLA projection gathers + in-kernel edge features)
    must match the XLA path."""
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre3", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre3_grads_match_xla(uni_setup):
    """pre3 is differentiable (recompute custom_vjp over the pure-JAX
    reference): parameter gradients through the full UniTransformer must
    match the XLA path (VERDICT r2 #6 grad-equivalence to 1e-3)."""
    UniTransformer, kw, params, args = uni_setup

    def loss(p, impl):
        x, h, c = UniTransformer(impl=impl, **kw).apply(p, *args)
        return (jnp.sum(x ** 2) + jnp.sum(h ** 2)
                + sum(jnp.sum(v ** 2) for v in jax.tree.leaves(c)))

    from jax.flatten_util import ravel_pytree
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p3 = jax.grad(lambda p: loss(p, "pallas_pre3"))(params)
    flat_x, _ = ravel_pytree(g_xla)
    flat_p, _ = ravel_pytree(g_p3)
    denom = float(jnp.abs(flat_x).max())
    assert denom > 0
    rel = float(jnp.abs(flat_x - flat_p).max()) / denom
    assert rel < 1e-3, rel


def test_edge_attn_pallas_pre3_param_structure(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    p2 = UniTransformer(impl="pallas_pre3", **kw).init(
        jax.random.PRNGKey(0), *args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_edge_attn_pallas2_matches_xla(uni_setup):
    """v2 fully fused path (node-level src projections gathered in-kernel
    with one one-hot matmul) must match the XLA path."""
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas2", **kw).apply(params, *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas2_param_structure(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    p2 = UniTransformer(impl="pallas2", **kw).init(jax.random.PRNGKey(0),
                                                   *args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_edge_attn_pallas_pre4_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre4", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre4_param_structure(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    p2 = UniTransformer(impl="pallas_pre4", **kw).init(
        jax.random.PRNGKey(0), *args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_edge_attn_pallas_pre4_grads_match_xla(uni_setup):
    """pre4 trains through the recompute custom_vjp; grads vs XLA to 1e-3."""
    UniTransformer, kw, params, args = uni_setup

    def loss(p, impl):
        x, h, c = UniTransformer(impl=impl, **kw).apply(p, *args)
        return (jnp.sum(x ** 2) + jnp.sum(h ** 2)
                + sum(jnp.sum(v ** 2) for v in jax.tree.leaves(c)))

    from jax.flatten_util import ravel_pytree
    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_p4 = jax.grad(lambda p: loss(p, "pallas_pre4"))(params)
    flat_x, _ = ravel_pytree(g_xla)
    flat_p, _ = ravel_pytree(g_p4)
    denom = float(jnp.abs(flat_x).max())
    assert denom > 0
    rel = float(jnp.abs(flat_x - flat_p).max()) / denom
    assert rel < 1e-3, rel


def test_edge_attn_pallas_pre5_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre5", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre6_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre6", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre7_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre7", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre8_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre8", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre9_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre9", **kw).apply(params,
                                                                *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre10_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre10", **kw).apply(params,
                                                                 *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1


def test_edge_attn_pallas_pre11_matches_xla(uni_setup):
    UniTransformer, kw, params, args = uni_setup
    xo, ho, co = UniTransformer(impl="xla", **kw).apply(params, *args)
    xp, hp, cp = UniTransformer(impl="pallas_pre11", **kw).apply(params,
                                                                 *args)
    assert float(jnp.abs(xo - xp).max()) < 2e-2
    assert float(jnp.abs(ho - hp).max()) < 2e-2
    assert float(jnp.abs(co - cp).max()) < 2e-2
    assert float(jnp.abs(hp).max()) > 0.1
