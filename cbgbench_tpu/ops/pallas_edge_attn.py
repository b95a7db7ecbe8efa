"""Pallas TPU kernels: fully fused dual edge attention (X2H + H2X).

One UniTransformer layer spends its time materializing per-edge
intermediates in HBM: gathered neighbor features, the [E, 84] edge
features, two decomposed edge MLPs each with two matmuls + LayerNorm, the
attention logits, and the softmax — ~1 GB of HBM round-trips per layer at
[16, 512, 32] while the useful FLOPs would take <0.5 ms. These kernels run
the whole edge phase in VMEM per (batch, node-tile) program:

  one-hot gather (MXU, on-the-fly one-hot)  ->  RBF edge features
  ->  decomposed edge MLP (edge @ W_e + dst-broadcast + h_src @ W_s)
  ->  LayerNorm + ReLU + second Dense  ->  per-head logits (HeadSum trick)
  ->  masked softmax over K  ->  aggregation (X2H: sum a*v; H2X: sum
      a*v_scalar*rel_x, mean over heads)

Semantics match nn.attention.{X2HAttnFused, H2XAttnFused} (same params,
same math; logits/matmuls at bf16 MXU precision with f32 accumulation).
The kernels are forward-only: training uses the differentiable XLA path,
sampling switches to these (reference hot loop:
repo/modules/attention/x2h_attention.py:49-57 + h2x_attention.py:8-73).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rbf import FIXED_OFFSETS

LANE = 128
NEG = -1e9


def _attn_tail(z, valid_ref, ew_ref, relx, q_t, tdst_t, ln_ref,
               w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref, *,
               mode: str, k_nb: int, heads: int):
    """Shared back half of every edge-attention kernel: dst-broadcast +
    LayerNorm halves + ReLU + second Dense + per-head logits (HeadSum
    trick) + masked softmax over K + aggregation."""
    d = w2k_ref.shape[0]
    tile_n = q_t.shape[0]
    e = tile_n * k_nb
    dh = d // heads
    f32 = jnp.float32

    # dst-broadcast by reshape (edges are (node, neighbor) row-major, so
    # [E, C] == [TILE_N, K, C] for free) — no [E, TILE_N] one-hot matmul
    two_d = z.shape[-1]
    z = (z.reshape(tile_n, k_nb, two_d)
         + tdst_t.astype(f32)[:, None, :]).reshape(e, two_d)

    def layer_norm(x, scale, bias):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    zk, zv = z[:, :d], z[:, d:]
    ln = ln_ref[:].astype(f32)                           # [4, D]
    k = jnp.maximum(layer_norm(zk, ln[0:1, :], ln[1:2, :]), 0.0)
    v = jnp.maximum(layer_norm(zv, ln[2:3, :], ln[3:4, :]), 0.0)
    k = (jnp.dot(k.astype(jnp.bfloat16), w2k_ref[:],
                 preferred_element_type=f32) + b2k_ref[0][None, :])
    v = (jnp.dot(v.astype(jnp.bfloat16), w2v_ref[:],
                 preferred_element_type=f32) + b2v_ref[0][None, :])
    v = v * ew_ref[0].astype(f32)

    qb = jnp.broadcast_to(q_t[:, None, :].astype(f32),
                          (tile_n, k_nb, d)).reshape(e, d)       # [E, D]
    li = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // dh
    lj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // dh
    head_sum = jnp.where(li == lj, 1.0 / np.sqrt(dh), 0.0
                         ).astype(jnp.bfloat16)          # [D, D]
    logits = jnp.dot((qb * k).astype(jnp.bfloat16), head_sum,
                     preferred_element_type=f32)         # [E, D]
    valid = valid_ref[0].astype(f32)                     # [E, 1]
    logits = logits + (valid - 1.0) * (-NEG)

    l3 = logits.reshape(tile_n, k_nb, d)
    v3m = valid.reshape(tile_n, k_nb, 1)
    m = jnp.max(l3, axis=1, keepdims=True)
    p = jnp.exp(l3 - m) * v3m
    s = jnp.sum(p, axis=1, keepdims=True)
    alpha = p / jnp.maximum(s, 1e-9)                     # [T, K, D]

    if mode == "x2h":
        out_ref[0] = jnp.sum(alpha * v.reshape(tile_n, k_nb, d), axis=1)
    else:
        # v: [E, H] head scalars; expand across each head's dh lanes with
        # a block-diagonal matmul (a broadcast+reshape would be free, but
        # Mosaic rejects the [E,H,dh]->[T,K,D] lane-regrouping shape cast)
        vout = v.shape[1]
        rep = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 1) // dh
        expand = jnp.where(rep == tgt, 1.0, 0.0).astype(jnp.bfloat16)
        v128 = jnp.dot(v.astype(jnp.bfloat16), expand,
                       preferred_element_type=f32)       # [E, D]
        w = alpha * v128.reshape(tile_n, k_nb, d)
        coeff = jnp.sum(w, axis=-1, keepdims=True) / (dh * heads)  # [T,K,1]
        r3 = relx.reshape(tile_n, k_nb, 3)
        out_ref[0] = jnp.sum(coeff * r3, axis=1)         # [T, 3]


def _attn_tail2(z, valid_ref, ew_ref, relx, q_t, tdst_t, ln_ref,
                w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref, *,
                mode: str, k_nb: int, heads: int):
    """Hand-scheduled tail v2 (the VPU-bound LN/softmax chains are the
    measured residual of the pre5 kernel — BASELINE.md round-3 ladder):

      * LayerNorm moments in one pass (var = E[x^2] - mu^2): one fewer
        [E, D] f32 sweep per LN; activations are O(10) post-matmul so the
        cancellation form is safe in f32.
      * softmax division deferred out of the [T, K, D] domain: compute
        the [T, 1, D] reciprocal once and scale the K-reduced outputs —
        replaces a K-wide multi-cycle divide with one rcp + multiplies.
      * exp in bf16 (inputs are <= 0 after max-subtraction; bf16 relative
        error ~0.4% on [0, 1] outputs, inside the 2e-2 kernel-equivalence
        budget) with f32 numerator accumulation.

    MEASURED FLAT (v5e, [16,512,32,128]): 23.44 ms vs pre5's 23.21 —
    and the round-4 kernel decomposition (scripts/probe_kernel_split.py)
    explains why: the whole tail costs only ~0.2 ms of the 1.06 ms x2h
    call; ~0.7 ms is compute-insensitive (input-block DMA + per-program
    overhead). The r3 "VPU-bound LN/softmax tail" residual theory is
    retired; the lever is fewer/bigger programs and leaner input blocks,
    not tail micro-scheduling.
    """
    d = w2k_ref.shape[0]
    tile_n = q_t.shape[0]
    e = tile_n * k_nb
    dh = d // heads
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    two_d = z.shape[-1]
    z = (z.reshape(tile_n, k_nb, two_d)
         + tdst_t.astype(f32)[:, None, :]).reshape(e, two_d)

    def layer_norm1(x, scale, bias):
        mu = jnp.mean(x, -1, keepdims=True)
        ms = jnp.mean(x * x, -1, keepdims=True)
        rs = jax.lax.rsqrt(jnp.maximum(ms - mu * mu, 0.0) + 1e-6)
        return (x - mu) * rs * scale + bias

    zk, zv = z[:, :d], z[:, d:]
    ln = ln_ref[:].astype(f32)                           # [4, D]
    k = jnp.maximum(layer_norm1(zk, ln[0:1, :], ln[1:2, :]), 0.0)
    v = jnp.maximum(layer_norm1(zv, ln[2:3, :], ln[3:4, :]), 0.0)
    k = (jnp.dot(k.astype(bf16), w2k_ref[:],
                 preferred_element_type=f32) + b2k_ref[0][None, :])
    v = (jnp.dot(v.astype(bf16), w2v_ref[:],
                 preferred_element_type=f32) + b2v_ref[0][None, :])
    v = v * ew_ref[0].astype(f32)

    qb = jnp.broadcast_to(q_t[:, None, :].astype(f32),
                          (tile_n, k_nb, d)).reshape(e, d)       # [E, D]
    li = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // dh
    lj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // dh
    head_sum = jnp.where(li == lj, 1.0 / np.sqrt(dh), 0.0
                         ).astype(bf16)                  # [D, D]
    logits = jnp.dot((qb * k).astype(bf16), head_sum,
                     preferred_element_type=f32)         # [E, D]
    valid = valid_ref[0].astype(f32)                     # [E, 1]
    logits = logits + (valid - 1.0) * (-NEG)

    l3 = logits.reshape(tile_n, k_nb, d)
    v3m = valid.reshape(tile_n, k_nb, 1)
    m = jnp.max(l3, axis=1, keepdims=True)
    p = jnp.exp((l3 - m).astype(bf16)).astype(f32) * v3m
    s = jnp.sum(p, axis=1)                               # [T, D]
    rs = 1.0 / jnp.maximum(s, 1e-9)                      # [T, D]

    if mode == "x2h":
        num = jnp.sum(p * v.reshape(tile_n, k_nb, d), axis=1)
        out_ref[0] = num * rs
    else:
        vout = v.shape[1]
        rep = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 1) // dh
        expand = jnp.where(rep == tgt, 1.0, 0.0).astype(bf16)
        v128 = jnp.dot(v.astype(bf16), expand,
                       preferred_element_type=f32)       # [E, D]
        # deferred division: alpha = p * rs, folded as (p * v128) summed
        # over D per edge, then scaled by the per-(t, head) reciprocal —
        # but rs varies per lane (head), so scale v128 by rs broadcast
        # over K first ([T,1,D] -> [T,K,D] multiply replaces the divide)
        w = p * (v128.reshape(tile_n, k_nb, d) * rs[:, None, :])
        coeff = jnp.sum(w, axis=-1, keepdims=True) / (dh * heads)  # [T,K,1]
        r3 = relx.reshape(tile_n, k_nb, 3)
        out_ref[0] = jnp.sum(coeff * r3, axis=1)         # [T, 3]


def _edge_attn_pre9_kernel(hn_ref, idx_ref, ef_ref, valid_ref, ew_ref,
                           relx_ref, q_ref, tdst_ref, ws_ref, we_ref,
                           ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref,
                           out_ref, *, mode: str, n_src: int, k_nb: int,
                           heads: int):
    """pre9: pre5's edge phase (in-VMEM one-hot gather + src projection)
    with the hand-scheduled tail v2 (_attn_tail2)."""
    f32 = jnp.float32
    e = q_ref.shape[1] * k_nb

    idx = idx_ref[0]                                     # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    hnb = jnp.dot(oh, hn_ref[0],
                  preferred_element_type=f32).astype(jnp.bfloat16)
    z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)

    _attn_tail2(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
                q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref, w2v_ref,
                b2v_ref, out_ref, mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn2_kernel(tsn_ref, idx_ref, valid_ref, ea_ref, ew_ref,
                       relx_ref, q_ref, tdst_ref, offs_ref,
                       wea_ref, web_ref, ln_ref, w2k_ref, b2k_ref,
                       w2v_ref, b2v_ref, out_ref, *,
                       mode: str, n_src: int, k_nb: int, heads: int,
                       eps: float):
    """Fully fused v2: the src projections are node-level precomputed in
    XLA (tsn = h @ [W_src_k|W_src_v], [1, N, 2D] bf16 — 32x fewer
    projection FLOPs than projecting gathered edges) and gathered here
    with a single one-shot one-hot matmul, so no [E, *] intermediate ever
    touches HBM. Edge features (RBF x edge-type) are built in-kernel."""
    tile_n = q_ref.shape[1]
    e = tile_n * k_nb
    f32 = jnp.float32

    idx = idx_ref[0]                                     # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    z = jnp.dot(oh, tsn_ref[0], preferred_element_type=f32)  # [E, 2D]

    relx = relx_ref[0][:, :3].astype(f32)                # [E, 3]
    dist = jnp.sqrt(jnp.sum(relx * relx, -1, keepdims=True) + eps)
    diff = dist - offs_ref[0][None, :]                   # [E,1]-[1,20]
    rbf = jnp.exp(-0.5 * diff * diff).astype(jnp.bfloat16)   # [E, 20]
    ea = ea_ref[0].astype(jnp.bfloat16)                  # [E, 4]

    z = z + jnp.dot(ea, wea_ref[:], preferred_element_type=f32)
    for c in range(4):
        zc = jnp.dot(rbf, web_ref[c * 20:(c + 1) * 20, :],
                     preferred_element_type=f32)
        z = z + ea[:, c:c + 1].astype(f32) * zc

    _attn_tail(z, valid_ref, ew_ref, relx, q_ref[0], tdst_ref[0], ln_ref,
               w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref,
               mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_kernel(payload_ref, idx_ref, valid_ref, ea_ref, ew_ref,
                      relx_ref, q_ref, tdst_ref, offs_ref,
                      wea_ref, web_ref, ws_ref, ln_ref, w2k_ref, b2k_ref,
                      w2v_ref, b2v_ref, out_ref, *,
                      mode: str, n_src: int, k_nb: int, heads: int,
                      eps: float):
    """One (batch, node-tile) program.

    payload: [1, N, D] bf16 node features (h)
    idx/valid/ew: [1, E, 1]; ea: [1, E, 4]; relx: [1, E, 3] f32
    q/tdst: [1, TILE_N, D] / [1, TILE_N, 2D]
    weights: wea [4, 2D], web [80, 2D], ws [D, 2D], ln [4, 2D],
             w2k [D, D], b2k [1, D], w2v [D, VOUT], b2v [1, VOUT]
    out: [1, TILE_N, D] (x2h) or [1, TILE_N, 3] (h2x)
    """
    d = payload_ref.shape[2]
    tile_n = q_ref.shape[1]
    e = tile_n * k_nb
    dh = d // heads
    f32 = jnp.float32

    idx = idx_ref[0]                                     # [E, 1]
    # ---- gather h_src: on-the-fly one-hot, accumulate f32 on the MXU ----
    hs = jnp.zeros((e, d), f32)
    for n0 in range(0, n_src, LANE):
        chunk = min(LANE, n_src - n0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (e, chunk), 1) + n0
        oh = (idx == cols).astype(jnp.bfloat16)
        hs = hs + jnp.dot(oh, payload_ref[0, n0:n0 + chunk, :],
                          preferred_element_type=f32)
    hs = hs.astype(jnp.bfloat16)

    # ---- edge features -> first (decomposed) Dense of k|v ----
    relx = relx_ref[0][:, :3].astype(f32)                # [E, 3]
    dist = jnp.sqrt(jnp.sum(relx * relx, -1, keepdims=True) + eps)
    diff = dist - offs_ref[0][None, :]                   # [E,1]-[1,20]
    rbf = jnp.exp(-0.5 * diff * diff).astype(jnp.bfloat16)   # [E, 20]
    ea = ea_ref[0].astype(jnp.bfloat16)                  # [E, 4]

    two_d = wea_ref.shape[1]
    z = jnp.dot(ea, wea_ref[:], preferred_element_type=f32)
    for c in range(4):
        zc = jnp.dot(rbf, web_ref[c * 20:(c + 1) * 20, :],
                     preferred_element_type=f32)
        z = z + ea[:, c:c + 1].astype(f32) * zc
    z = z + jnp.dot(hs, ws_ref[:], preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx, q_ref[0], tdst_ref[0], ln_ref,
               w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref,
               mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre3_kernel(tsrc_ref, valid_ref, ea_ref, ew_ref, relx_ref,
                           q_ref, tdst_ref, offs_ref, wea_ref, web_ref,
                           ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref,
                           out_ref, *, mode: str, k_nb: int, heads: int,
                           eps: float):
    """pre3 hybrid: neighbor projections arrive pre-gathered from XLA
    (pipelines across layers at MXU peak) like the pre kernel, but the
    [E, 84] edge features are built in-kernel from edge_attr [E, 4] +
    rel_x like the v2 kernel — the edge-feature tensor (and its XLA
    outer-product construction) never touches HBM."""
    f32 = jnp.float32

    z = tsrc_ref[0].astype(f32)                          # [E, 2D]
    relx = relx_ref[0][:, :3].astype(f32)                # [E, 3]
    dist = jnp.sqrt(jnp.sum(relx * relx, -1, keepdims=True) + eps)
    diff = dist - offs_ref[0][None, :]                   # [E,1]-[1,20]
    rbf = jnp.exp(-0.5 * diff * diff).astype(jnp.bfloat16)   # [E, 20]
    ea = ea_ref[0].astype(jnp.bfloat16)                  # [E, 4]

    z = z + jnp.dot(ea, wea_ref[:], preferred_element_type=f32)
    for c in range(4):
        zc = jnp.dot(rbf, web_ref[c * 20:(c + 1) * 20, :],
                     preferred_element_type=f32)
        z = z + ea[:, c:c + 1].astype(f32) * zc

    _attn_tail(z, valid_ref, ew_ref, relx, q_ref[0], tdst_ref[0], ln_ref,
               w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref,
               mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre4_kernel(hnb_ref, ef_ref, valid_ref, ew_ref, relx_ref,
                           q_ref, tdst_ref, ws_ref, we_ref, ln_ref,
                           w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref, *,
                           mode: str, k_nb: int, heads: int):
    """pre4: neighbors arrive as RAW h rows ([E, D] bf16 — HALF the HBM
    traffic of the pre kernel's pre-projected [E, 2D]); the src projection
    happens here as one well-shaped [E, D] @ [D, 2D] MXU matmul. Edge
    features stay XLA-side (shared across both directions per layer)."""
    f32 = jnp.float32

    z = jnp.dot(hnb_ref[0], ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
               q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref, w2v_ref,
               b2v_ref, out_ref, mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre5_kernel(hn_ref, idx_ref, ef_ref, valid_ref, ew_ref,
                           relx_ref, q_ref, tdst_ref, ws_ref, we_ref,
                           ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref,
                           out_ref, *, mode: str, n_src: int, k_nb: int,
                           heads: int):
    """pre5: like pre4 but the neighbor gather happens HERE — one-shot
    one-hot [E, N] built in VMEM registers (the XLA gather materializes
    the [B, N*K, N] one-hot in HBM: 268 MB per call at [16,512,32]).
    Gather-then-project ordering ([E,N]@[N,D] then [E,D]@[D,2D]) is 25%
    fewer FLOPs than projecting node-level first like pallas2 did."""
    f32 = jnp.float32
    e = q_ref.shape[1] * k_nb

    idx = idx_ref[0]                                     # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    hnb = jnp.dot(oh, hn_ref[0],
                  preferred_element_type=f32).astype(jnp.bfloat16)
    z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
               q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref, w2v_ref,
               b2v_ref, out_ref, mode=mode, k_nb=k_nb, heads=heads)


def _gather_grouped(idx, hn_ref, e, n_src):
    """In-VMEM neighbor gather via a hi/lo index split: one [E, 128]
    lane-iota compare + per-group [E,1] masks replace the full [E, N]
    int32 iota compare of the pre5 kernel.

    The pre5 one-hot build is the kernel's single largest VPU cost
    (~[E, N] int32 iota + compare + select = ~3x N/128 vreg passes); here
    the lane-iota is one 128-wide constant, the lo compare touches [E,128]
    once, and each group costs one [E,128] bf16 mask-multiply + one
    [E,128]@[128,D] MXU matmul (same total MACs as the single wide
    matmul). VPU work drops from O(E*N) to O(E*128 + E*groups)."""
    f32 = jnp.float32
    lo = jax.lax.bitwise_and(idx, 127)                   # [E, 1]
    hi = jax.lax.shift_right_logical(idx, 7)             # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, 128), 1)
    lo_oh = (lo == cols).astype(jnp.bfloat16)            # [E, 128]
    d = hn_ref.shape[-1]
    hs = jnp.zeros((e, d), f32)
    n_groups = (n_src + 127) // 128
    for g in range(n_groups):
        sel = (hi == g).astype(jnp.bfloat16)             # [E, 1]
        ohg = lo_oh * sel                                # [E, 128]
        chunk = min(128, n_src - g * 128)
        if chunk < 128:
            ohg = ohg[:, :chunk]
        hs = hs + jnp.dot(ohg, hn_ref[0, g * 128:g * 128 + chunk, :],
                          preferred_element_type=f32)
    return hs


def _edge_attn_pre8_kernel(hn_ref, idx_ref, ef_ref, valid_ref, ew_ref,
                           relx_ref, q_ref, tdst_ref, ws_ref, we_ref,
                           ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref,
                           out_ref, *, mode: str, n_src: int, k_nb: int,
                           heads: int):
    """pre8: pre5 with the in-VMEM one-hot gather restructured as a
    grouped (hi/lo split) gather — same math, intended ~4x less VPU work
    in the one-hot build at N=512 (see _gather_grouped).

    MEASURED NEGATIVE (v5e, [16,512,32,128]): 27.66 ms vs pre5's 23.14 —
    the N/128 dependent-accumulation matmul chain serializes on the MXU
    where pre5's single wide [E,N]@[N,D] pipelines, and the per-group
    [E,1]->[E,128] mask broadcasts are VPU passes the wide iota compare
    never paid. Kept as a documented negative; pre5 stays the champion."""
    f32 = jnp.float32
    e = q_ref.shape[1] * k_nb

    hs = _gather_grouped(idx_ref[0], hn_ref, e, n_src)
    z = jnp.dot(hs.astype(jnp.bfloat16), ws_ref[:],
                preferred_element_type=f32)
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
               q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref, w2v_ref,
               b2v_ref, out_ref, mode=mode, k_nb=k_nb, heads=heads)


def _attn_tail_arrays(z, valid, ew, relx, q_t, tdst_t, ln_ref,
                      w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref, *,
                      mode: str, k_nb: int, heads: int):
    """_attn_tail with valid/ew as in-register arrays (pre10 unpacks them
    from the packed edge tensor instead of reading standalone refs)."""
    d = w2k_ref.shape[0]
    tile_n = q_t.shape[0]
    e = tile_n * k_nb
    dh = d // heads
    f32 = jnp.float32

    two_d = z.shape[-1]
    z = (z.reshape(tile_n, k_nb, two_d)
         + tdst_t.astype(f32)[:, None, :]).reshape(e, two_d)

    def layer_norm(x, scale, bias):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    zk, zv = z[:, :d], z[:, d:]
    ln = ln_ref[:].astype(f32)                           # [4, D]
    k = jnp.maximum(layer_norm(zk, ln[0:1, :], ln[1:2, :]), 0.0)
    v = jnp.maximum(layer_norm(zv, ln[2:3, :], ln[3:4, :]), 0.0)
    k = (jnp.dot(k.astype(jnp.bfloat16), w2k_ref[:],
                 preferred_element_type=f32) + b2k_ref[0][None, :])
    v = (jnp.dot(v.astype(jnp.bfloat16), w2v_ref[:],
                 preferred_element_type=f32) + b2v_ref[0][None, :])
    v = v * ew.astype(f32)

    qb = jnp.broadcast_to(q_t[:, None, :].astype(f32),
                          (tile_n, k_nb, d)).reshape(e, d)       # [E, D]
    li = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // dh
    lj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // dh
    head_sum = jnp.where(li == lj, 1.0 / np.sqrt(dh), 0.0
                         ).astype(jnp.bfloat16)          # [D, D]
    logits = jnp.dot((qb * k).astype(jnp.bfloat16), head_sum,
                     preferred_element_type=f32)         # [E, D]
    logits = logits + (valid - 1.0) * (-NEG)

    l3 = logits.reshape(tile_n, k_nb, d)
    v3m = valid.reshape(tile_n, k_nb, 1)
    m = jnp.max(l3, axis=1, keepdims=True)
    p = jnp.exp(l3 - m) * v3m
    s = jnp.sum(p, axis=1, keepdims=True)
    alpha = p / jnp.maximum(s, 1e-9)                     # [T, K, D]

    if mode == "x2h":
        out_ref[0] = jnp.sum(alpha * v.reshape(tile_n, k_nb, d), axis=1)
    else:
        vout = v.shape[1]
        rep = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (vout, d), 1) // dh
        expand = jnp.where(rep == tgt, 1.0, 0.0).astype(jnp.bfloat16)
        v128 = jnp.dot(v.astype(jnp.bfloat16), expand,
                       preferred_element_type=f32)       # [E, D]
        w = alpha * v128.reshape(tile_n, k_nb, d)
        coeff = jnp.sum(w, axis=-1, keepdims=True) / (dh * heads)  # [T,K,1]
        r3 = relx.reshape(tile_n, k_nb, 3)
        out_ref[0] = jnp.sum(coeff * r3, axis=1)         # [T, 3]


# pre10 packed edge-tensor lane map (all narrow per-edge inputs ride ONE
# [B, E, 94] bf16 array — every [B, E, c<128] operand is lane-padded to
# 128 by the TPU tiled layout, so the pre5 input set (idx int32 134 MB +
# relx f32 134 MB + valid/ew bf16 67 MB each at [16,512,32]) cost ~470 MB
# of DMA per call while carrying <40 MB of payload; measured noop floor
# 0.84 ms of the 1.06 ms call, scripts/probe_kernel_split.py)
EP_EF = 84           # lanes 0-83: edge features
EP_VALID = 84        # lane 84
EP_EW = 85           # lane 85
EP_RXH = 86          # lanes 86-88: rel_x bf16 high parts
EP_RXL = 89          # lanes 89-91: rel_x bf16 low corrections
EP_IHI = 92          # lane 92: idx // 32 (exact in bf16: < 32)
EP_ILO = 93          # lane 93: idx % 32
EP_LANES = 94


def _edge_attn_pre10_kernel(hn_ref, ep_ref, q_ref, tdst_ref, ws_ref,
                            we_ref, ln_ref, w2k_ref, b2k_ref, w2v_ref,
                            b2v_ref, out_ref, *, mode: str, n_src: int,
                            k_nb: int, heads: int):
    """pre10: pre5 with every narrow per-edge input packed into one
    [E, 94] bf16 block (see the EP_* lane map). idx rides as an exact
    hi/lo bf16 pair, rel_x as a hi+lo bf16 double (16 effective mantissa
    bits, ~1e-4 relative — well inside the kernel-equivalence budget)."""
    f32 = jnp.float32
    e = q_ref.shape[1] * k_nb

    ep = ep_ref[0]                                       # [E, 94] bf16
    idx = (ep[:, EP_IHI:EP_IHI + 1].astype(f32) * 32.0
           + ep[:, EP_ILO:EP_ILO + 1].astype(f32)).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    hnb = jnp.dot(oh, hn_ref[0],
                  preferred_element_type=f32).astype(jnp.bfloat16)
    z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ep[:, :EP_EF], we_ref[:], preferred_element_type=f32)

    valid = ep[:, EP_VALID:EP_VALID + 1].astype(f32)
    ew = ep[:, EP_EW:EP_EW + 1]
    relx = (ep[:, EP_RXH:EP_RXH + 3].astype(f32)
            + ep[:, EP_RXL:EP_RXL + 3].astype(f32))

    _attn_tail_arrays(z, valid, ew, relx, q_ref[0], tdst_ref[0], ln_ref,
                      w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref,
                      mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre6_kernel(hn_ref, pos9_ref, post_ref, idx_ref, cls_ref,
                           valid_ref, ew_ref, q_ref, tdst_ref, offs_ref,
                           ws_ref, we_ref, ln_ref, w2k_ref, b2k_ref,
                           w2v_ref, b2v_ref, out_ref, *, mode: str,
                           n_src: int, k_nb: int, heads: int, eps: float):
    """pre6: the ENTIRE edge phase lives here. In-kernel one-hot gather of
    h (bf16) and pos (3 exact bf16 planes — TPU f32 dots run at bf16 input
    precision), rel_x/dist/RBF computed in-registers, and the [E,84] edge
    features assembled by a lane-mask trick: rbf tiled x4 along lanes,
    masked by (lane//20 == edge_class), so the SINGLE [E,84]@[84,2D]
    matmul of the pre kernels is preserved (pre3's per-class narrow
    matmuls were the measured regression). Nothing edge-shaped ever
    touches HBM."""
    f32 = jnp.float32
    tile_n = q_ref.shape[1]
    e = tile_n * k_nb

    idx = idx_ref[0]                                     # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    hnb = jnp.dot(oh, hn_ref[0],
                  preferred_element_type=f32).astype(jnp.bfloat16)
    p9 = jnp.dot(oh, pos9_ref[0], preferred_element_type=f32)   # [E, 9]
    x_src = p9[:, 0:3] + p9[:, 3:6] + p9[:, 6:9]
    x_dst = jnp.broadcast_to(post_ref[0][:, None, :3].astype(f32),
                             (tile_n, k_nb, 3)).reshape(e, 3)
    relx = x_dst - x_src                                 # [E, 3] f32

    dist = jnp.sqrt(jnp.sum(relx * relx, -1, keepdims=True) + eps)
    diff = dist - offs_ref[0][None, :]                   # [E, 20]
    rbf = jnp.exp(-0.5 * diff * diff)                    # [E, 20] f32
    cls = cls_ref[0]                                     # [E, 1] int32
    lane80 = jax.lax.broadcasted_iota(jnp.int32, (e, 80), 1) // 20
    mask80 = (lane80 == cls).astype(f32)
    rbf4 = jnp.concatenate([rbf, rbf, rbf, rbf], axis=1) * mask80
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (e, 4), 1)
    ea4 = (lane4 == cls).astype(f32)
    ef = jnp.concatenate([ea4, rbf4], axis=1).astype(jnp.bfloat16)

    z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ef, we_ref[:], preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx, q_ref[0], tdst_ref[0], ln_ref,
               w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref,
               mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre7_kernel(hn_ref, ht_ref, idx_ref, ef_ref, valid_ref,
                           ew_ref, relx_ref, q_ref, wd_ref, bd_ref, ws_ref,
                           we_ref, ln_ref, w2k_ref, b2k_ref, w2v_ref,
                           b2v_ref, out_ref, *, mode: str, n_src: int,
                           k_nb: int, heads: int):
    """pre7 = pre5 + the node-level dst projection computed HERE from the
    tile's own h rows (t_dst was a [B,N,2D] f32 input = 67 MB of HBM per
    call; wd is a [D,2D] weight) and a bf16 q input (halves another
    33 MB). The tile matmul [TILE,D]@[D,2D] is tiny MXU work."""
    f32 = jnp.float32
    e = q_ref.shape[1] * k_nb

    idx = idx_ref[0]                                     # [E, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
    oh = (idx == cols).astype(jnp.bfloat16)              # [E, N]
    hnb = jnp.dot(oh, hn_ref[0],
                  preferred_element_type=f32).astype(jnp.bfloat16)
    z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)
    td = (jnp.dot(ht_ref[0], wd_ref[:], preferred_element_type=f32)
          + bd_ref[0][None, :])                          # [TILE, 2D]

    _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
               q_ref[0], td, ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref,
               out_ref, mode=mode, k_nb=k_nb, heads=heads)


def _edge_attn_pre_kernel(tsrc_ref, ef_ref, valid_ref, ew_ref, relx_ref,
                          q_ref, tdst_ref, we_ref, ln_ref, w2k_ref, b2k_ref,
                          w2v_ref, b2v_ref, out_ref, *,
                          mode: str, k_nb: int, heads: int):
    """Hybrid variant: neighbor projections (t_src = h @ W_src, gathered)
    and edge features arrive pre-computed from XLA (whose one-hot gather
    runs at MXU peak); the kernel fuses everything after — the edge Dense,
    LayerNorm, second Dense, logits, masked softmax and aggregation — so
    no [E, D] intermediate ever touches HBM."""
    d = w2k_ref.shape[0]
    tile_n = q_ref.shape[1]
    e = tile_n * k_nb
    dh = d // heads
    f32 = jnp.float32

    z = tsrc_ref[0].astype(f32)                          # [E, 2D]
    z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                    preferred_element_type=f32)

    _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
               q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref, w2v_ref,
               b2v_ref, out_ref, mode=mode, k_nb=k_nb, heads=heads)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret"))
def edge_attention_pre(t_src, edge_feat, valid, e_w, rel_x, q, t_dst,
                       weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                       tile_n: int = 64, heads: int = 16,
                       interpret: bool = False):
    """Hybrid fused edge attention over pre-gathered neighbor projections.

    t_src [B,N,K,2D] bf16 (gathered h @ [W_src_k|W_src_v]);
    edge_feat [B,N,K,84] bf16; valid [B,N,K]; e_w [B,N,K,1];
    rel_x [B,N,K,3] f32 (h2x only); q [B,N,D]; t_dst [B,N,2D].
    weights: we [84,2D] ln [4,D] w2k [D,D] b2k [D] w2v [D,VOUT] b2v [VOUT].
    """
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = valid.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    tsrc_f = t_src.reshape(b, r, 2 * d).astype(jnp.bfloat16)
    ef_f = edge_feat.reshape(b, r, ef_dim).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre_kernel, mode=mode, k_nb=k_nb,
                          heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            edge_spec(2 * d), edge_spec(ef_dim), edge_spec(1), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((ef_dim, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (ef_dim * 2 * d + d * d + d * vout + 2 * d),
            bytes_accessed=b * r * (2 * d * 2 + ef_dim * 2 + 20),
            transcendentals=b * r * d),
        interpret=interpret,
    )(tsrc_f, ef_f, valid_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      w["we"].astype(jnp.bfloat16), w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


def _edge_attention_pre4_ref(h_nb, edge_feat, valid, e_w, rel_x, q, t_dst,
                             weights, *, mode: str, heads: int):
    """Pure-JAX reference of the pre4 kernel math (bf16 matmuls, f32
    accumulation) — supplies the backward pass via the recompute
    custom_vjp and pins the kernel in tests."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    d = q.shape[-1]
    dh = d // heads
    w = weights

    z = jnp.einsum("...d,de->...e", h_nb.astype(bf16), w["ws"].astype(bf16),
                   preferred_element_type=f32)
    z = z + jnp.einsum("...f,fe->...e", edge_feat.astype(bf16),
                       w["we"].astype(bf16), preferred_element_type=f32)
    z = z + t_dst.astype(f32)[:, :, None, :]

    def layer_norm(x, scale, bias):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    ln = w["ln"].astype(f32)
    k = jnp.maximum(layer_norm(z[..., :d], ln[0], ln[1]), 0.0)
    v = jnp.maximum(layer_norm(z[..., d:], ln[2], ln[3]), 0.0)
    k = jnp.einsum("...d,dv->...v", k.astype(bf16), w["w2k"].astype(bf16),
                   preferred_element_type=f32) + w["b2k"].astype(f32)
    v = jnp.einsum("...d,dv->...v", v.astype(bf16), w["w2v"].astype(bf16),
                   preferred_element_type=f32) + w["b2v"].astype(f32)
    v = v * e_w.astype(bf16).astype(f32)

    qh = q.astype(f32).reshape(q.shape[:-1] + (heads, dh))
    kh = k.reshape(k.shape[:-1] + (heads, dh))
    logits = jnp.einsum("bnhe,bnkhe->bnkh", qh.astype(bf16),
                        kh.astype(bf16),
                        preferred_element_type=f32) / np.sqrt(dh)
    val = valid.astype(f32)[..., None]
    logits = logits + (val - 1.0) * (-NEG)
    m = jnp.max(logits, axis=-2, keepdims=True)
    p = jnp.exp(logits - m) * val
    s = jnp.sum(p, axis=-2, keepdims=True)
    alpha = p / jnp.maximum(s, 1e-9)

    if mode == "x2h":
        vh = v.reshape(v.shape[:-1] + (heads, dh))
        out = jnp.sum(alpha[..., None] * vh, axis=-3)
        return out.reshape(out.shape[:-2] + (d,))
    relx = rel_x.astype(f32)
    coeff = jnp.mean(alpha * v, axis=-1, keepdims=True)
    return jnp.sum(coeff * relx, axis=-2)


@functools.lru_cache(maxsize=None)
def _pre4_vjp(mode: str, tile_n: int, heads: int, interpret: bool):
    """Recompute custom_vjp for pre4 (same pattern as _pre3_vjp): fused
    kernel forward, pure-JAX-reference backward."""
    kernel = functools.partial(_edge_attention_pre4_call, mode=mode,
                               tile_n=tile_n, heads=heads,
                               interpret=interpret)
    ref = functools.partial(_edge_attention_pre4_ref, mode=mode,
                            heads=heads)

    @jax.custom_vjp
    def f(h_nb, edge_feat, valid, e_w, rel_x, q, t_dst, weights):
        return kernel(h_nb, edge_feat, valid, e_w, rel_x, q, t_dst,
                      weights)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret"))
def edge_attention_pre4(h_nb, edge_feat, valid, e_w, rel_x, q, t_dst,
                        weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                        tile_n: int = 64, heads: int = 16,
                        interpret: bool = False):
    """Fused edge attention over RAW gathered neighbor features.
    DIFFERENTIABLE via the recompute custom_vjp (_pre4_vjp).

    h_nb [B,N,K,D] bf16 (gathered h — half the HBM footprint of the pre
    kernel's [B,N,K,2D] projections; the src projection runs in-kernel);
    edge_feat [B,N,K,84] bf16; valid [B,N,K]; e_w [B,N,K,1];
    rel_x [B,N,K,3] f32; q [B,N,D]; t_dst [B,N,2D].
    weights: ws [D,2D] we [84,2D] ln [4,D] w2k [D,D] b2k [D] w2v [D,VOUT]
    b2v [VOUT]."""
    return _pre4_vjp(mode, tile_n, heads, interpret)(
        h_nb, edge_feat, valid, e_w, rel_x, q, t_dst, weights)


def _edge_attention_pre4_call(h_nb, edge_feat, valid, e_w, rel_x, q, t_dst,
                              weights: Dict[str, jnp.ndarray],
                              mode: str = "x2h",
                              tile_n: int = 64, heads: int = 16,
                              interpret: bool = False):
    """The raw pallas_call forward (wrapped by _pre4_vjp)."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = valid.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    hnb_f = h_nb.reshape(b, r, d).astype(jnp.bfloat16)
    ef_f = edge_feat.reshape(b, r, ef_dim).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre4_kernel, mode=mode, k_nb=k_nb,
                          heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            edge_spec(d), edge_spec(ef_dim), edge_spec(1), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((d, 2 * d)), w_spec((ef_dim, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (d * 2 * d + ef_dim * 2 * d + d * d
                               + d * vout + 2 * d),
            bytes_accessed=b * r * (d * 2 + ef_dim * 2 + 20),
            transcendentals=b * r * d),
        interpret=interpret,
    )(hnb_f, ef_f, valid_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      w["ws"].astype(jnp.bfloat16), w["we"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret"))
def edge_attention_pre7(h_node, idx, edge_feat, valid, e_w, rel_x, q,
                        weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                        tile_n: int = 64, heads: int = 16,
                        interpret: bool = False):
    """pre5 + in-kernel dst projection + bf16 q (see _edge_attn_pre7_kernel).

    weights: pre4 set + wd [D,2D] bd [2D] (the dst Dense). Forward-only."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    ef_f = edge_feat.reshape(b, r, ef_dim).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    hb = h_node.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre7_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d), tile_spec(d),
            edge_spec(1), edge_spec(ef_dim), edge_spec(1), edge_spec(1),
            edge_spec(3),
            tile_spec(d),
            w_spec((d, 2 * d)), w_spec((1, 2 * d)),
            w_spec((d, 2 * d)), w_spec((ef_dim, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * d + d * 2 * d + ef_dim * 2 * d
                               + d * d + d * vout),
            bytes_accessed=b * (n * d * 2 + r * (ef_dim * 2 + 20)),
            transcendentals=b * r * d),
        interpret=interpret,
    )(hb, hb, idx_f, ef_f, valid_f, ew_f, relx_f,
      q.astype(jnp.bfloat16),
      w["wd"].astype(jnp.bfloat16),
      w["bd"].reshape(1, -1).astype(jnp.float32),
      w["ws"].astype(jnp.bfloat16), w["we"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "eps", "interpret"))
def edge_attention_pre6(h_node, pos, idx, cls, valid, e_w, q, t_dst,
                        weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                        tile_n: int = 64, heads: int = 16,
                        eps: float = 1e-12, interpret: bool = False):
    """Self-contained fused edge attention (see _edge_attn_pre6_kernel).

    h_node [B,N,D] bf16; pos [B,N,3] f32 (current-layer coordinates);
    idx/cls/valid [B,N,K] (cls = 4-class edge type index); e_w [B,N,K,1];
    q [B,N,D]; t_dst [B,N,2D]. weights: ws [D,2D] we [84,2D] ln w2k b2k
    w2v b2v (the pre4 set). No edge-shaped tensor is read or written in
    HBM. Forward-only (sampling path)."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    # 3 exact bf16 planes of pos (node-level, tiny)
    posf = pos.astype(jnp.float32)
    hi = posf.astype(jnp.bfloat16)
    r1 = posf - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    pos9 = jnp.concatenate([hi, mid, lo], axis=-1)       # [B, N, 9] bf16

    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    cls_f = cls.reshape(b, r, 1).astype(jnp.int32)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre6_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d), node_spec(n, 9),
            tile_spec(3),
            edge_spec(1), edge_spec(1), edge_spec(1), edge_spec(1),
            tile_spec(d), tile_spec(2 * d),
            w_spec((1, 20)),
            w_spec((d, 2 * d)), w_spec((84, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * (d + 9) + d * 2 * d + 84 * 2 * d
                               + d * d + d * vout),
            bytes_accessed=b * (n * (d + 9) * 2 + r * 8),
            transcendentals=b * r * 21),
        interpret=interpret,
    )(h_node.astype(jnp.bfloat16), pos9, posf, idx_f, cls_f, valid_f, ew_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      jnp.asarray(np.asarray(FIXED_OFFSETS), jnp.float32).reshape(1, 20),
      w["ws"].astype(jnp.bfloat16), w["we"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret", "variant"))
def edge_attention_pre5(h_node, idx, edge_feat, valid, e_w, rel_x, q, t_dst,
                        weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                        tile_n: int = 64, heads: int = 16,
                        interpret: bool = False, variant: str = "pre5"):
    """pre4 with the neighbor gather in-kernel (see _edge_attn_pre5_kernel).

    h_node [B,N,D] bf16 node features; idx [B,N,K] int32; the rest as
    edge_attention_pre4. Forward-only (sampling path).

    variant="pre8" selects the grouped hi/lo-split gather kernel
    (_edge_attn_pre8_kernel) — identical inputs/outputs, less VPU work
    in the one-hot build."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    ef_f = edge_feat.reshape(b, r, ef_dim).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    kern = {"pre5": _edge_attn_pre5_kernel,
            "pre8": _edge_attn_pre8_kernel,
            "pre9": _edge_attn_pre9_kernel}[variant]
    out = pl.pallas_call(
        functools.partial(kern, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d),
            edge_spec(1), edge_spec(ef_dim), edge_spec(1), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((d, 2 * d)), w_spec((ef_dim, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * d + d * 2 * d + ef_dim * 2 * d
                               + d * d + d * vout),
            bytes_accessed=b * (n * d * 2 + r * (ef_dim * 2 + 20)),
            transcendentals=b * r * d),
        compiler_params=pltpu.CompilerParams(
            # both grid dims are embarrassingly parallel (disjoint output
            # tiles) — lets Mosaic pipeline DMA across programs
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(h_node.astype(jnp.bfloat16), idx_f, ef_f, valid_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      w["ws"].astype(jnp.bfloat16), w["we"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret"))
def edge_attention_pre10(h_node, idx, edge_feat, valid, e_w, rel_x, q,
                         t_dst, weights: Dict[str, jnp.ndarray],
                         mode: str = "x2h", tile_n: int = 64,
                         heads: int = 16, interpret: bool = False):
    """pre5 with all narrow per-edge inputs packed into one [B, E, 94]
    bf16 tensor (_edge_attn_pre10_kernel). Same API as pre5; XLA CSEs the
    pack across the two per-layer calls. Forward-only (sampling path)."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]
    if ef_dim != EP_EF:
        raise ValueError(f"pre10 packs {EP_EF} edge-feature lanes, "
                         f"got {ef_dim}")
    if n > 32 * 32:
        raise ValueError("pre10 hi/lo idx split encodes indices < 1024")

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    bf16 = jnp.bfloat16
    f32 = jnp.float32
    idx_f = idx.reshape(b, r).astype(jnp.int32)
    rel = rel_x.reshape(b, r, 3).astype(f32)
    rhi = rel.astype(bf16)
    rlo = (rel - rhi.astype(f32)).astype(bf16)
    ep = jnp.concatenate([
        edge_feat.reshape(b, r, ef_dim).astype(bf16),
        valid.reshape(b, r, 1).astype(bf16),
        e_w.reshape(b, r, 1).astype(bf16),
        rhi, rlo,
        (idx_f // 32).astype(bf16)[..., None],
        (idx_f % 32).astype(bf16)[..., None],
    ], -1)                                               # [B, E, 94]

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre10_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d),
            pl.BlockSpec((1, e, EP_LANES), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(d), tile_spec(2 * d),
            w_spec((d, 2 * d)), w_spec((EP_EF, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * d + d * 2 * d + EP_EF * 2 * d
                               + d * d + d * vout),
            bytes_accessed=b * (n * d * 2 + r * 128 * 2),
            transcendentals=b * r * d),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(h_node.astype(bf16), ep,
      q.astype(f32), t_dst.astype(f32),
      w["ws"].astype(bf16), w["we"].astype(bf16),
      w["ln"].astype(f32),
      w["w2k"].astype(bf16),
      w["b2k"].reshape(1, -1).astype(f32),
      w["w2v"].astype(bf16),
      w["b2v"].reshape(1, -1).astype(f32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "interpret"))
def edge_attention_pre11(h_node, ep, q, t_dst,
                         weights: Dict[str, jnp.ndarray],
                         mode: str = "x2h", tile_n: int = 64,
                         heads: int = 16, interpret: bool = False):
    """pre10 kernel fed a PRE-PACKED [B, N, K, 94] bf16 edge tensor built
    where the edge features are concatenated anyway (unitransformer
    pallas_pre11 branch) — the pre10 wrapper's own pack measured a 41%
    REGRESSION (32.6 vs 23.1 ms) because a standalone lane-unaligned
    concat relayouts 67 MB per layer; appending lanes to the existing
    edge-feature concat reuses its 128-lane padded footprint for free."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = ep.shape[-2]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    if ep.shape[-1] != EP_LANES:
        raise ValueError(f"pre11 expects a packed [B,N,K,{EP_LANES}] edge"
                         f" tensor, got trailing dim {ep.shape[-1]}")
    if n > 32 * 32:
        raise ValueError("pre11 hi/lo idx split encodes indices < 1024")

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    bf16 = jnp.bfloat16
    f32 = jnp.float32
    ep_f = ep.reshape(b, r, EP_LANES).astype(bf16)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre10_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d),
            pl.BlockSpec((1, e, EP_LANES), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(d), tile_spec(2 * d),
            w_spec((d, 2 * d)), w_spec((EP_EF, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * d + d * 2 * d + EP_EF * 2 * d
                               + d * d + d * vout),
            bytes_accessed=b * (n * d * 2 + r * 128 * 2),
            transcendentals=b * r * d),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(h_node.astype(bf16), ep_f,
      q.astype(f32), t_dst.astype(f32),
      w["ws"].astype(bf16), w["we"].astype(bf16),
      w["ln"].astype(f32),
      w["w2k"].astype(bf16),
      w["b2k"].reshape(1, -1).astype(f32),
      w["w2v"].astype(bf16),
      w["b2v"].reshape(1, -1).astype(f32))
    return out


def _edge_attention_pre3_ref(t_src, valid, edge_attr, e_w, rel_x, q, t_dst,
                             weights, *, mode: str, heads: int, eps: float):
    """Pure-JAX reference of the pre3 kernel math (same precision policy:
    bf16 matmuls, f32 accumulation). Differentiable — it supplies the
    backward pass of edge_attention_pre3 via the recompute custom_vjp, and
    pins the kernel in tests."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    d = q.shape[-1]
    dh = d // heads
    w = weights

    z = t_src.astype(bf16).astype(f32)                    # [B,N,K,2D]
    relx = rel_x.astype(f32)
    dist = jnp.sqrt(jnp.sum(relx * relx, -1, keepdims=True) + eps)
    offs = jnp.asarray(np.asarray(FIXED_OFFSETS), f32)
    diff = dist - offs                                    # [B,N,K,20]
    rbf = jnp.exp(-0.5 * diff * diff).astype(bf16)
    ea = edge_attr.astype(bf16)
    z = z + jnp.einsum("...e,ed->...d", ea, w["wea"].astype(bf16),
                       preferred_element_type=f32)
    web = w["web"].astype(bf16)
    for c in range(4):
        zc = jnp.einsum("...r,rd->...d", rbf, web[c * 20:(c + 1) * 20],
                        preferred_element_type=f32)
        z = z + ea[..., c:c + 1].astype(f32) * zc
    z = z + t_dst.astype(f32)[:, :, None, :]

    def layer_norm(x, scale, bias):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    ln = w["ln"].astype(f32)
    k = jnp.maximum(layer_norm(z[..., :d], ln[0], ln[1]), 0.0)
    v = jnp.maximum(layer_norm(z[..., d:], ln[2], ln[3]), 0.0)
    k = jnp.einsum("...d,dv->...v", k.astype(bf16), w["w2k"].astype(bf16),
                   preferred_element_type=f32) + w["b2k"].astype(f32)
    v = jnp.einsum("...d,dv->...v", v.astype(bf16), w["w2v"].astype(bf16),
                   preferred_element_type=f32) + w["b2v"].astype(f32)
    v = v * e_w.astype(bf16).astype(f32)

    qh = q.astype(f32).reshape(q.shape[:-1] + (heads, dh))
    kh = k.reshape(k.shape[:-1] + (heads, dh))
    logits = jnp.einsum("bnhe,bnkhe->bnkh",
                        qh.astype(bf16), kh.astype(bf16),
                        preferred_element_type=f32) / np.sqrt(dh)
    val = valid.astype(f32)[..., None]                    # [B,N,K,1]
    logits = logits + (val - 1.0) * (-NEG)
    m = jnp.max(logits, axis=-2, keepdims=True)
    p = jnp.exp(logits - m) * val
    s = jnp.sum(p, axis=-2, keepdims=True)
    alpha = p / jnp.maximum(s, 1e-9)                      # [B,N,K,H]

    if mode == "x2h":
        vh = v.reshape(v.shape[:-1] + (heads, dh))
        out = jnp.sum(alpha[..., None] * vh, axis=-3)     # [B,N,H,dh]
        return out.reshape(out.shape[:-2] + (d,))
    coeff = jnp.mean(alpha * v, axis=-1, keepdims=True)   # [B,N,K,1]
    return jnp.sum(coeff * relx, axis=-2)                 # [B,N,3]


@functools.lru_cache(maxsize=None)
def _pre3_vjp(mode: str, tile_n: int, heads: int, eps: float,
              interpret: bool):
    """custom_vjp around the pre3 kernel: the fused kernel is the forward
    (no [E,*] residuals ever written to HBM); the backward recomputes via
    the pure-JAX reference's VJP — the jax.checkpoint/remat pattern with a
    faster forward, making impl='pallas_pre3' usable for training."""
    kernel = functools.partial(_edge_attention_pre3_call, mode=mode,
                               tile_n=tile_n, heads=heads, eps=eps,
                               interpret=interpret)
    ref = functools.partial(_edge_attention_pre3_ref, mode=mode,
                            heads=heads, eps=eps)

    @jax.custom_vjp
    def f(t_src, valid, edge_attr, e_w, rel_x, q, t_dst, weights):
        return kernel(t_src, valid, edge_attr, e_w, rel_x, q, t_dst,
                      weights)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "eps", "interpret"))
def edge_attention_pre3(t_src, valid, edge_attr, e_w, rel_x, q, t_dst,
                        weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                        tile_n: int = 64, heads: int = 16, eps: float = 1e-12,
                        interpret: bool = False):
    """pre3 hybrid fused edge attention: pre-gathered neighbor projections
    + in-kernel edge features. DIFFERENTIABLE: the backward pass is the
    recompute custom_vjp over _edge_attention_pre3_ref (see _pre3_vjp).

    t_src [B,N,K,2D] bf16 (gathered h @ [W_src_k|W_src_v]);
    valid [B,N,K]; edge_attr [B,N,K,4]; e_w [B,N,K,1]; rel_x [B,N,K,3] f32;
    q [B,N,D]; t_dst [B,N,2D].
    weights: wea [4,2D] web [80,2D] ln [4,D] w2k [D,D] b2k [D]
             w2v [D,VOUT] b2v [VOUT] (same set as the v2 kernel).
    Returns [B,N,D] f32 (x2h) or [B,N,3] f32 (h2x)."""
    return _pre3_vjp(mode, tile_n, heads, eps, interpret)(
        t_src, valid, edge_attr, e_w, rel_x, q, t_dst, weights)


def _edge_attention_pre3_call(t_src, valid, edge_attr, e_w, rel_x, q, t_dst,
                              weights: Dict[str, jnp.ndarray],
                              mode: str = "x2h", tile_n: int = 64,
                              heads: int = 16, eps: float = 1e-12,
                              interpret: bool = False):
    """The raw pallas_call forward (wrapped by _pre3_vjp)."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = valid.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb

    tsrc_f = t_src.reshape(b, r, 2 * d).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ea_f = edge_attr.reshape(b, r, 4).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn_pre3_kernel, mode=mode, k_nb=k_nb,
                          heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            edge_spec(2 * d), edge_spec(1), edge_spec(4), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((1, 20)),
            w_spec((4, 2 * d)), w_spec((80, 2 * d)),
            w_spec((4, d)), w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (84 * 2 * d + d * d + d * vout + 2 * d),
            bytes_accessed=b * r * (2 * d * 2 + 4 + 3 * 4),
            transcendentals=b * r * 21),
        interpret=interpret,
    )(tsrc_f, valid_f, ea_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      jnp.asarray(np.asarray(FIXED_OFFSETS), jnp.float32).reshape(1, 20),
      w["wea"].astype(jnp.bfloat16), w["web"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "eps", "interpret"))
def edge_attention2(t_src_node, idx, valid, edge_attr, e_w, rel_x, q, t_dst,
                    weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                    tile_n: int = 32, heads: int = 16, eps: float = 1e-12,
                    interpret: bool = False):
    """Fully fused v2 edge attention over node-level src projections.

    t_src_node [B,N,2D] bf16 (h @ [W_src_k|W_src_v], projected in XLA at
    node level); idx/valid [B,N,K]; edge_attr [B,N,K,4]; e_w [B,N,K,1];
    rel_x [B,N,K,3] f32; q [B,N,D]; t_dst [B,N,2D].
    weights: wea [4,2D] web [80,2D] ln [4,D] w2k [D,D] b2k [D]
             w2v [D,VOUT] b2v [VOUT].
    Returns [B,N,D] f32 (x2h) or [B,N,3] f32 (h2x).

    vs edge_attention: the in-kernel gather pulls the already-projected
    [N, 2D] payload with ONE one-hot matmul (no chunk loop, no per-edge
    W_src matmul); vs edge_attention_pre: no [B,N,K,2D] edge tensor ever
    reaches HBM (~128 MB/layer at [16,512,32,128] saved each way)."""
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:          # largest power-of-two tile dividing N
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb
    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ea_f = edge_attr.reshape(b, r, 4).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    out = pl.pallas_call(
        functools.partial(_edge_attn2_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, 2 * d),                  # t_src_node
            edge_spec(1), edge_spec(1), edge_spec(4), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((1, 20)),
            w_spec((4, 2 * d)), w_spec((80, 2 * d)),
            w_spec((4, d)), w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * (n * 2 * d + 84 * 2 * d + d * d + d * vout),
            bytes_accessed=b * (n * 2 * d * 2 + r * (4 + 9 * 2)),
            transcendentals=b * r * 21),
        interpret=interpret,
    )(t_src_node.astype(jnp.bfloat16), idx_f, valid_f, ea_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      jnp.asarray(np.asarray(FIXED_OFFSETS), jnp.float32).reshape(1, 20),
      w["wea"].astype(jnp.bfloat16), w["web"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile_n", "heads", "eps", "interpret"))
def edge_attention(payload, idx, valid, edge_attr, e_w, rel_x, q, t_dst,
                   weights: Dict[str, jnp.ndarray], mode: str = "x2h",
                   tile_n: int = 64, heads: int = 16, eps: float = 1e-12,
                   interpret: bool = False):
    """Fused edge attention.

    payload [B,N,D] bf16; idx/valid [B,N,K]; edge_attr [B,N,K,4];
    e_w [B,N,K,1] (pass ones if unused); rel_x [B,N,K,3] f32;
    q [B,N,D]; t_dst [B,N,2D] (node-level Dense outputs + first bias).
    weights: wea [4,2D] web [80,2D] ws [D,2D] ln [4,2D] w2k [D,D]
             b2k [D] w2v [D,VOUT] b2v [VOUT].
    Returns [B,N,D] f32 (x2h) or [B,N,3] f32 (h2x)."""
    b, n, d = payload.shape
    k_nb = idx.shape[-1]
    r = n * k_nb
    e = tile_n * k_nb
    vout = weights["w2v"].shape[1]

    interpret = interpret or not edge_attn_available()
    while n % tile_n != 0:          # largest power-of-two tile dividing N
        tile_n //= 2
        if tile_n < 1:
            raise ValueError(f"node count {n} has no power-of-two tiling")
    e = tile_n * k_nb
    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ea_f = edge_attr.reshape(b, r, 4).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)

    out_d = d if mode == "x2h" else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    flops_gather = 2 * b * r * n * d
    flops_mlp = 2 * b * r * (84 * 2 * d + d * 2 * d + d * d + d * vout)
    out = pl.pallas_call(
        functools.partial(_edge_attn_kernel, mode=mode, n_src=n,
                          k_nb=k_nb, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d),                      # payload
            edge_spec(1), edge_spec(1), edge_spec(4), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((1, 20)),
            w_spec((4, 2 * d)), w_spec((80, 2 * d)), w_spec((d, 2 * d)),
            w_spec((4, d)), w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_gather + flops_mlp,
            bytes_accessed=b * (n * d * 2 + r * (4 + 9 * 2) + n * 3 * d * 2),
            transcendentals=b * r * 21),
        interpret=interpret,
    )(payload.astype(jnp.bfloat16), idx_f, valid_f, ea_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      jnp.asarray(np.asarray(FIXED_OFFSETS), jnp.float32).reshape(1, 20),
      w["wea"].astype(jnp.bfloat16), w["web"].astype(jnp.bfloat16),
      w["ws"].astype(jnp.bfloat16), w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16), w["b2k"].reshape(1, -1).astype(
          jnp.float32),
      w["w2v"].astype(jnp.bfloat16), w["b2v"].reshape(1, -1).astype(
          jnp.float32),
      )
    return out


def edge_attn_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
