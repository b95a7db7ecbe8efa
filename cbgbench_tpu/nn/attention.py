"""Neighbor attention over padded kNN graphs: X2H (invariant feature
update) and H2X (equivariant coordinate update).

TPU-native rewrite of the reference's scatter-softmax edge attention
(reference: repo/modules/attention/x2h_attention.py:8-100 and
h2x_attention.py:8-73). The flat edge list + scatter_softmax/scatter_sum
becomes a dense [B, N, K, ...] neighbor tensor with a masked softmax over
the K axis — bitwise-equivalent semantics (softmax over each destination
node's incoming edges), but static-shape and MXU-friendly: the edge MLPs
are [B*N*K, F] matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.rbf import GaussianSmearingTable
from ..ops.segment import masked_softmax
from ..utils.geometry import safe_norm
from .common import ACT, MLP, outer_product


class X2HAttention(nn.Module):
    """Invariant multi-head attention: h_i <- h_i + sum_k alpha_ik v_ik.

    Edge features: [edge_type, edge_type (x) RBF(dist), h_i, h_j].
    """

    hidden_dim: int = 128
    n_heads: int = 16
    edge_feat_dim: int = 4
    num_r_gaussian: int = 20
    r_max: float = 10.0
    act: str = "relu"
    norm: bool = True
    ew_net_type: str = "global"        # 'r' | 'm' | 'global' | 'none'
    out_fc: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, rel_x, h_dst, h_src, edge_attr, valid,
                 e_w: Optional[jnp.ndarray] = None):
        """rel_x [B,N,K,3]; h_dst/h_src [B,N,K,D]... h is the center node's
        feature broadcast over K for h_dst; edge_attr [B,N,K,4];
        valid [B,N,K]; e_w [B,N,K,1] (global edge weights) or None."""
        d = self.hidden_dim
        dh = d // self.n_heads

        dist = safe_norm(rel_x, axis=-1, keepdims=True)
        rbf = GaussianSmearingTable(0.0, self.r_max, self.num_r_gaussian)(dist)
        dist_feat = outer_product(edge_attr, rbf)

        kv_input = jnp.concatenate([edge_attr, dist_feat, h_dst, h_src], -1)

        k = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hk_func")(kv_input)
        k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
        v = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hv_func")(kv_input)

        if self.ew_net_type == "r":
            e_w = nn.sigmoid(nn.Dense(1, name="ew_net")(dist_feat))
        elif self.ew_net_type == "m":
            e_w = nn.sigmoid(nn.Dense(1, name="ew_net")(v[..., :d]))
        elif e_w is None:
            e_w = 1.0
        v = v * e_w
        v = v.reshape(v.shape[:-1] + (self.n_heads, dh))

        h_center = h_dst[..., 0, :]    # [B, N, D] (h_dst is broadcast over K)
        q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="hq_func")(h_center)
        q = q.reshape(q.shape[:-1] + (self.n_heads, dh))

        logits = jnp.sum(q[..., None, :, :] * k, -1) / math.sqrt(dh)  # [B,N,K,H]
        alpha = masked_softmax(logits, valid, axis=-2)
        out = jnp.sum(alpha[..., None] * v, axis=-3)        # [B, N, H, dh]
        out = out.reshape(out.shape[:-2] + (d,)).astype(h_center.dtype)

        if self.out_fc:
            out = MLP(d, d, norm=self.norm, act=self.act,
                      name="node_output")(
                jnp.concatenate([out, h_center], -1))
        return out + h_center


class _EdgeAttnBase(nn.Module):
    """Shared param set + dual implementation of the fused edge attention.

    Params implement  Dense([edge_feat, h_dst, h_src])  decomposed as
    edge/dst/src pieces (identical math to a concat Dense; every weight
    initialized with var 1/total_fan_in to match the concat init), then
    LayerNorm + act + second Dense, for both the k and v nets.

    impl='xla' runs jnp ops over pre-gathered h_src + shared edge_feat
    (differentiable, any backend). impl='pallas' runs the whole edge phase
    in one fused TPU kernel (ops/pallas_edge_attn.py, forward-only) —
    gathers happen inside the kernel."""

    hidden_dim: int = 128
    n_heads: int = 16
    act: str = "relu"
    norm: bool = True
    dtype: Any = None
    impl: str = "xla"

    EDGE_FEAT = 84           # 4 edge types + 4x20 type (x) RBF

    def _params(self, v_out_dim):
        d = self.hidden_dim
        ef, total = self.EDGE_FEAT, self.EDGE_FEAT + 2 * d

        def vinit(fan):
            return nn.initializers.variance_scaling(
                fan / total, "fan_in", "truncated_normal")

        p = {}
        for tag, vout in (("k", d), ("v", v_out_dim)):
            p[f"{tag}_in_edge"] = self.param(f"{tag}_in_edge", vinit(ef),
                                             (ef, d))
            p[f"{tag}_in_bias"] = self.param(
                f"{tag}_in_bias", nn.initializers.zeros, (d,))
            p[f"{tag}_in_dst"] = self.param(f"{tag}_in_dst", vinit(d),
                                            (d, d))
            p[f"{tag}_in_src"] = self.param(f"{tag}_in_src", vinit(d),
                                            (d, d))
            p[f"{tag}_ln_scale"] = self.param(
                f"{tag}_ln_scale", nn.initializers.ones, (d,))
            p[f"{tag}_ln_bias"] = self.param(
                f"{tag}_ln_bias", nn.initializers.zeros, (d,))
            p[f"{tag}_out"] = self.param(
                f"{tag}_out", nn.initializers.lecun_normal(), (d, vout))
            p[f"{tag}_out_bias"] = self.param(
                f"{tag}_out_bias", nn.initializers.zeros, (vout,))
        return p

    def _edge_net(self, p, tag, edge_feat, h, h_src, cdt):
        """XLA path of one edge MLP: [B,N,K,vout]. Everything stays in the
        compute dtype — an f32 bias/LN param would promote the big [B,N,K,D]
        intermediates to f32 and double their HBM traffic."""
        z = (jnp.einsum("...e,ed->...d", edge_feat.astype(cdt),
                        p[f"{tag}_in_edge"].astype(cdt))
             + p[f"{tag}_in_bias"].astype(cdt)
             + jnp.einsum("...d,de->...e", h.astype(cdt),
                          p[f"{tag}_in_dst"].astype(cdt))[..., None, :]
             + jnp.einsum("...d,de->...e", h_src.astype(cdt),
                          p[f"{tag}_in_src"].astype(cdt)))
        if self.norm:
            mu = jnp.mean(z, -1, keepdims=True)
            var = jnp.mean(jnp.square(z - mu), -1, keepdims=True)
            z = ((z - mu) * jax.lax.rsqrt(var + 1e-6)
                 * p[f"{tag}_ln_scale"].astype(cdt)
                 + p[f"{tag}_ln_bias"].astype(cdt))
        z = ACT[self.act](z)
        return (jnp.einsum("...d,dv->...v", z.astype(cdt),
                           p[f"{tag}_out"].astype(cdt))
                + p[f"{tag}_out_bias"].astype(cdt))

    def _kernel_weights(self, p):
        return {
            "wea": jnp.concatenate([p["k_in_edge"][:4], p["v_in_edge"][:4]],
                                   1),
            "web": jnp.concatenate([p["k_in_edge"][4:], p["v_in_edge"][4:]],
                                   1),
            "ws": jnp.concatenate([p["k_in_src"], p["v_in_src"]], 1),
            "ln": jnp.stack([p["k_ln_scale"], p["k_ln_bias"],
                             p["v_ln_scale"], p["v_ln_bias"]]),
            "w2k": p["k_out"], "b2k": p["k_out_bias"],
            "w2v": p["v_out"], "b2v": p["v_out_bias"],
        }

    def _t_dst(self, p, h):
        """Node-level dst terms (+ first biases), concat k|v."""
        wd = jnp.concatenate([p["k_in_dst"], p["v_in_dst"]], 1)
        b = jnp.concatenate([p["k_in_bias"], p["v_in_bias"]])
        return h @ wd + b

    def _kernel_weights_pre(self, p):
        """Weights for the hybrid (pre-gathered) kernel."""
        return {
            "we": jnp.concatenate([p["k_in_edge"], p["v_in_edge"]], 1),
            "ln": jnp.stack([p["k_ln_scale"], p["k_ln_bias"],
                             p["v_ln_scale"], p["v_ln_bias"]]),
            "w2k": p["k_out"], "b2k": p["k_out_bias"],
            "w2v": p["v_out"], "b2v": p["v_out_bias"],
        }

    def _t_src_gathered(self, p, h, idx):
        """Node-level src projections, gathered to edges via the XLA
        one-hot matmul (runs at MXU peak): [B,N,K,2D] bf16."""
        from ..ops.knn import gather_neighbors
        return gather_neighbors(self._t_src_node(p, h), idx)

    def _kernel_weights_pre4(self, p):
        """Weights for the raw-h-gather kernel (src projection in-kernel)."""
        w = self._kernel_weights_pre(p)
        w["ws"] = jnp.concatenate([p["k_in_src"], p["v_in_src"]], 1)
        return w

    def _kernel_weights_pre7(self, p):
        """pre4 set + the dst Dense (computed in-kernel by pre7)."""
        w = self._kernel_weights_pre4(p)
        w["wd"] = jnp.concatenate([p["k_in_dst"], p["v_in_dst"]], 1)
        w["bd"] = jnp.concatenate([p["k_in_bias"], p["v_in_bias"]])
        return w

    def _h_gathered(self, p, h, idx):
        """Raw neighbor h rows [B,N,K,D] bf16 — half the HBM footprint of
        the projected _t_src_gathered; pre4 projects in-kernel."""
        from ..ops.knn import gather_neighbors
        return gather_neighbors(h.astype(jnp.bfloat16), idx)

    def _t_src_node(self, p, h):
        """Node-level src projections [B,N,2D] bf16 (gathered in-kernel
        by the v2 fully fused path)."""
        ws = jnp.concatenate([p["k_in_src"], p["v_in_src"]], 1)
        return h.astype(jnp.bfloat16) @ ws.astype(jnp.bfloat16)

    def _kernel_weights2(self, p):
        """Weights for the v2 fused kernel (src projection is node-level
        precomputed, so no ws; edge Dense + LN happen in-kernel)."""
        w = self._kernel_weights(p)
        del w["ws"]
        return w


class X2HAttnFused(_EdgeAttnBase):
    """X2H invariant attention (fused hot path for UniTransformer)."""

    out_fc: bool = False

    @nn.compact
    def __call__(self, h, valid, e_w, *, h_src=None, edge_feat=None,
                 idx=None, edge_attr=None, rel_x=None, x=None, cls=None):
        d = self.hidden_dim
        dh = d // self.n_heads
        cdt = self.dtype or h.dtype
        p = self._params(d)
        t_dst_fused = None
        if self.impl == "pallas_pre11":
            # q = MLP(h) and t_dst = h @ wd + b both read h: fuse into
            # one first-layer matmul (MLP.extra_weight path; ~0.05 ms
            # x 18 instances per denoise step at [16,512,128])
            wd = jnp.concatenate([p["k_in_dst"], p["v_in_dst"]], 1)
            bd = jnp.concatenate([p["k_in_bias"], p["v_in_bias"]])
            q, t_dst_fused = MLP(d, d, norm=self.norm, act=self.act,
                                 dtype=self.dtype, name="hq_func")(
                h, extra_weight=wd, extra_bias=bd)
        else:
            q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype,
                    name="hq_func")(h)

        if self.impl == "pallas":
            from ..ops.pallas_edge_attn import edge_attention
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention(
                h, idx, valid, edge_attr, ew, rel_x, q, self._t_dst(p, h),
                self._kernel_weights(p), mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre":
            from ..ops.pallas_edge_attn import edge_attention_pre
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre(
                self._t_src_gathered(p, h, idx), edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre3":
            from ..ops.pallas_edge_attn import edge_attention_pre3
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre3(
                self._t_src_gathered(p, h, idx), valid, edge_attr, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights2(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre4":
            from ..ops.pallas_edge_attn import edge_attention_pre4
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre4(
                self._h_gathered(p, h, idx), edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl in ("pallas_pre5", "pallas_pre8", "pallas_pre9"):
            from ..ops.pallas_edge_attn import edge_attention_pre5
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre5(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="x2h", heads=self.n_heads,
                variant=self.impl.removeprefix("pallas_"))
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre10":
            from ..ops.pallas_edge_attn import edge_attention_pre10
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre10(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre11":
            from ..ops.pallas_edge_attn import edge_attention_pre11
            out = edge_attention_pre11(
                h.astype(jnp.bfloat16), edge_feat, q, t_dst_fused,
                self._kernel_weights_pre4(p), mode="x2h",
                heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre6":
            from ..ops.pallas_edge_attn import edge_attention_pre6
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre6(
                h.astype(jnp.bfloat16), x, idx, cls, valid, ew,
                q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas_pre7":
            from ..ops.pallas_edge_attn import edge_attention_pre7
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention_pre7(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._kernel_weights_pre7(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        elif self.impl == "pallas2":
            from ..ops.pallas_edge_attn import edge_attention2
            ew = e_w if e_w is not None else jnp.ones(valid.shape + (1,),
                                                      jnp.float32)
            out = edge_attention2(
                self._t_src_node(p, h), idx, valid, edge_attr, ew, rel_x,
                q, self._t_dst(p, h), self._kernel_weights2(p),
                mode="x2h", heads=self.n_heads)
            out = out.astype(h.dtype)
        else:
            k = self._edge_net(p, "k", edge_feat, h, h_src, cdt)
            k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
            v = self._edge_net(p, "v", edge_feat, h, h_src, cdt)
            if e_w is not None:
                v = v * e_w
            v = v.reshape(v.shape[:-1] + (self.n_heads, dh))
            qh = q.reshape(q.shape[:-1] + (self.n_heads, dh))
            logits = jnp.sum(qh[..., None, :, :] * k, -1) / math.sqrt(dh)
            alpha = masked_softmax(logits, valid, axis=-2)
            out = jnp.sum(alpha[..., None] * v, axis=-3)
            out = out.reshape(out.shape[:-2] + (d,)).astype(h.dtype)

        if self.out_fc:
            out = MLP(d, d, norm=self.norm, act=self.act,
                      name="node_output")(jnp.concatenate([out, h], -1))
        return out + h


class H2XAttnFused(_EdgeAttnBase):
    """H2X equivariant coordinate update (fused hot path)."""

    ew_scale: bool = True

    @nn.compact
    def __call__(self, h, valid, e_w, rel_x, *, h_src=None, edge_feat=None,
                 idx=None, edge_attr=None, x=None, cls=None):
        d = self.hidden_dim
        dh = d // self.n_heads
        cdt = self.dtype or h.dtype
        p = self._params(self.n_heads)
        t_dst_fused = None
        if self.impl == "pallas_pre11":
            wd = jnp.concatenate([p["k_in_dst"], p["v_in_dst"]], 1)
            bd = jnp.concatenate([p["k_in_bias"], p["v_in_bias"]])
            q, t_dst_fused = MLP(d, d, norm=self.norm, act=self.act,
                                 dtype=self.dtype, name="xq_func")(
                h, extra_weight=wd, extra_bias=bd)
        else:
            q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype,
                    name="xq_func")(h)

        if self.impl == "pallas":
            from ..ops.pallas_edge_attn import edge_attention
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention(
                h, idx, valid, edge_attr, ew, rel_x, q, self._t_dst(p, h),
                self._kernel_weights(p), mode="h2x",
                heads=self.n_heads).astype(rel_x.dtype)
        if self.impl == "pallas_pre":
            from ..ops.pallas_edge_attn import edge_attention_pre
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre(
                self._t_src_gathered(p, h, idx), edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre(p),
                mode="h2x", heads=self.n_heads).astype(rel_x.dtype)
        if self.impl == "pallas_pre3":
            from ..ops.pallas_edge_attn import edge_attention_pre3
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre3(
                self._t_src_gathered(p, h, idx), valid, edge_attr, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights2(p),
                mode="h2x", heads=self.n_heads).astype(rel_x.dtype)
        if self.impl == "pallas_pre4":
            from ..ops.pallas_edge_attn import edge_attention_pre4
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre4(
                self._h_gathered(p, h, idx), edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="h2x", heads=self.n_heads).astype(rel_x.dtype)
        if self.impl in ("pallas_pre5", "pallas_pre8", "pallas_pre9"):
            from ..ops.pallas_edge_attn import edge_attention_pre5
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre5(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="h2x", heads=self.n_heads,
                variant=self.impl.removeprefix("pallas_")).astype(
                    rel_x.dtype)
        if self.impl == "pallas_pre10":
            from ..ops.pallas_edge_attn import edge_attention_pre10
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre10(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="h2x", heads=self.n_heads).astype(rel_x.dtype)
        if self.impl == "pallas_pre11":
            from ..ops.pallas_edge_attn import edge_attention_pre11
            return edge_attention_pre11(
                h.astype(jnp.bfloat16), edge_feat, q, t_dst_fused,
                self._kernel_weights_pre4(p), mode="h2x",
                heads=self.n_heads).astype(rel_x.dtype)
        if self.impl == "pallas_pre6":
            from ..ops.pallas_edge_attn import edge_attention_pre6
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre6(
                h.astype(jnp.bfloat16), x, idx, cls, valid, ew,
                q, self._t_dst(p, h), self._kernel_weights_pre4(p),
                mode="h2x", heads=self.n_heads).astype(jnp.float32)
        if self.impl == "pallas_pre7":
            from ..ops.pallas_edge_attn import edge_attention_pre7
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention_pre7(
                h.astype(jnp.bfloat16), idx, edge_feat, valid, ew,
                rel_x, q, self._kernel_weights_pre7(p),
                mode="h2x", heads=self.n_heads).astype(jnp.float32)
        if self.impl == "pallas2":
            from ..ops.pallas_edge_attn import edge_attention2
            ew = e_w if (self.ew_scale and e_w is not None) else jnp.ones(
                valid.shape + (1,), jnp.float32)
            return edge_attention2(
                self._t_src_node(p, h), idx, valid, edge_attr, ew, rel_x,
                q, self._t_dst(p, h), self._kernel_weights2(p),
                mode="h2x", heads=self.n_heads).astype(rel_x.dtype)

        k = self._edge_net(p, "k", edge_feat, h, h_src, cdt)
        k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
        v = self._edge_net(p, "v", edge_feat, h, h_src, cdt)
        if self.ew_scale and e_w is not None:
            v = v * e_w
        v = v[..., :, None] * rel_x[..., None, :]        # [B,N,K,H,3]
        qh = q.reshape(q.shape[:-1] + (self.n_heads, dh))
        logits = jnp.sum(qh[..., None, :, :] * k, -1) / math.sqrt(dh)
        alpha = masked_softmax(logits, valid, axis=-2)
        out = jnp.sum(alpha[..., None] * v, axis=-3)
        return out.mean(axis=-2).astype(rel_x.dtype)


class H2XAttention(nn.Module):
    """Equivariant coordinate update: dx_i = mean_h sum_k alpha v_scalar rel_x."""

    hidden_dim: int = 128
    n_heads: int = 16
    edge_feat_dim: int = 4
    num_r_gaussian: int = 20
    r_max: float = 10.0
    act: str = "relu"
    norm: bool = True
    ew_net_type: str = "global"
    dtype: Any = None

    @nn.compact
    def __call__(self, rel_x, h_dst, h_src, edge_attr, valid,
                 e_w: Optional[jnp.ndarray] = None):
        d = self.hidden_dim
        dh = d // self.n_heads

        dist = safe_norm(rel_x, axis=-1, keepdims=True)
        rbf = GaussianSmearingTable(0.0, self.r_max, self.num_r_gaussian)(dist)
        dist_feat = outer_product(edge_attr, rbf)

        kv_input = jnp.concatenate([edge_attr, dist_feat, h_dst, h_src], -1)
        k = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="xk_func")(kv_input)
        k = k.reshape(k.shape[:-1] + (self.n_heads, dh))
        v = MLP(self.n_heads, d, norm=self.norm, act=self.act,
                dtype=self.dtype, name="xv_func")(kv_input)                  # [B,N,K,H] scalars

        if self.ew_net_type == "global" and e_w is not None:
            v = v * e_w
        # ('r' in the reference is dead code feeding edge_index into a Dense;
        #  'm' and None fall through to weight 1.)

        v = v[..., :, None] * rel_x[..., None, :]           # [B,N,K,H,3]

        h_center = h_dst[..., 0, :]
        q = MLP(d, d, norm=self.norm, act=self.act, dtype=self.dtype, name="xq_func")(h_center)
        q = q.reshape(q.shape[:-1] + (self.n_heads, dh))

        logits = jnp.sum(q[..., None, :, :] * k, -1) / math.sqrt(dh)
        alpha = masked_softmax(logits, valid, axis=-2)      # [B,N,K,H]
        out = jnp.sum(alpha[..., None] * v, axis=-3)        # sum over K -> [B,N,H,3]
        return out.mean(axis=-2).astype(rel_x.dtype)        # [B,N,3]
