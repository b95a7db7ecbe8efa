"""Masked k-nearest-neighbor selection over padded node sets.

XLA-native replacement for torch_cluster's ``knn_graph`` (used per
UniTransformer block, reference: repo/modules/e3nn/unitransformer.py:75-86).
In the padded layout the graph is simply a neighbor-index tensor
``idx [B, N, K]`` + validity mask: for each destination node, the K nearest
valid source nodes (self excluded), matching
``knn_graph(flow='source_to_target', loop=False)`` semantics.

The distance matrix + top-k runs entirely on the VPU/MXU with static shapes;
no scatter, no dynamic edge counts. For N ≤ ~2k this beats a sparse kernel on
TPU; beyond that, a Pallas block-local top-k is the upgrade path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e30


def chunked_top_k(x: jnp.ndarray, k: int, chunk: int = 128):
    """Exact top-k along the last axis via two-level selection: top-k
    within each ``chunk``-wide slice, then top-k over the concatenated
    candidates. Exact because every true top-k element is necessarily in
    its own chunk's top-k. XLA's top_k lowers to a full bitonic sort of
    the row (O(n log^2 n) VPU passes); two sorts of ``chunk`` and
    ceil(n/chunk)*k elements are much cheaper for k << n.

    Returns (values, indices) like jax.lax.top_k."""
    n = x.shape[-1]
    if n <= chunk or n % chunk != 0:
        return jax.lax.top_k(x, k)
    vs, ix = [], []
    for c in range(0, n, chunk):
        v, i = jax.lax.top_k(x[..., c:c + chunk], k)
        vs.append(v)
        ix.append(i + c)
    v = jnp.concatenate(vs, -1)
    i = jnp.concatenate(ix, -1)
    v2, sel = jax.lax.top_k(v, k)
    return v2, jnp.take_along_axis(i, sel, -1)


def pairwise_sqdist(pos: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] -> [..., N, N] squared distances (MXU-friendly form)."""
    # |x-y|^2 = |x|^2 + |y|^2 - 2 x.y ; the cross term is a matmul.
    sq = jnp.sum(pos * pos, axis=-1)
    cross = jnp.einsum("...nd,...md->...nm", pos, pos)
    d2 = sq[..., :, None] + sq[..., None, :] - 2 * cross
    return jnp.maximum(d2, 0.0)


def knn_neighbors(pos: jnp.ndarray, mask: jnp.ndarray, k: int,
                  include_self: bool = False, return_dist: bool = False):
    """For each node, indices of its k nearest valid neighbors.

    Args:
      pos:  [B, N, 3]
      mask: [B, N] bool — valid nodes
      k:    neighbor count (static)
      return_dist: also return the neighbor distances — they fall out of
        the top_k for free, and consumers that only need |rel_x| (the
        global e_w gate) can then skip a one-hot gather whose [B,N*K,N]
        one-hot read costs ~0.3 ms/call at [16,512,32]

    Returns:
      idx:   [B, N, K] int32 — source-node indices per destination
      valid: [B, N, K] bool  — neighbor slot is a real edge
      dist:  [B, N, K] f32 (only when return_dist) — Euclidean distance
             (invalid slots hold sqrt(_BIG)-scale garbage; mask first)
    """
    n = pos.shape[-2]
    d2 = pairwise_sqdist(pos)
    # Invalidate edges from/to padding and self-loops.
    inval = ~(mask[..., :, None] & mask[..., None, :])
    if not include_self:
        eye = jnp.eye(n, dtype=bool)
        inval = inval | eye
    d2 = jnp.where(inval, _BIG, d2)
    neg, idx = jax.lax.top_k(-d2, k)            # [B, N, K]
    valid = (-neg) < _BIG * 0.5
    valid = valid & mask[..., :, None]          # padded dst rows -> no edges
    if return_dist:
        return (idx.astype(jnp.int32), valid,
                jnp.sqrt(jnp.maximum(-neg, 0.0)))
    return idx.astype(jnp.int32), valid


def _split_planes(x: jnp.ndarray):
    """f32 -> 3 exact bf16 planes (hi + two residuals). A one-hot gather of
    each plane is exact (selection by a 1.0-weighted bf16 dot), so the
    recombined f32 is exact to ~2^-24 — unlike a direct f32 MXU matmul,
    which TPUs silently run at bf16 input precision."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighbor features — as a one-hot matmul on the MXU.

    x [B, N, D], idx [B, N, K] -> [B, N, K, D]
    x [B, N],    idx [B, N, K] -> [B, N, K]

    XLA's dynamic gather lowers to a near-serial loop on TPU (~300ms for
    [16,512,32,128]); the one-hot contraction runs on the systolic array in
    ~1ms. bf16 payloads gather exactly with a bf16 one-hot; f32/int
    payloads ride as three exact bf16 planes (TPU f32 matmuls run at bf16
    input precision by default, which silently rounded coordinates before).
    """
    squeeze = x.ndim == idx.ndim - 1
    if squeeze:
        x = x[..., None]
    in_dtype = x.dtype
    b, n, d = x.shape[0], x.shape[1], x.shape[-1]
    flat_idx = idx.reshape(b, -1)                       # [B, N*K]
    onehot = (flat_idx[..., None] == jnp.arange(n, dtype=idx.dtype)
              ).astype(jnp.bfloat16)                    # [B, N*K, N]

    if in_dtype == jnp.bfloat16:
        payload = x
        n_planes = 1
    elif in_dtype == jnp.bool_:
        payload = x.astype(jnp.bfloat16)
        n_planes = 1
    else:
        hi, mid, lo = _split_planes(x.astype(jnp.float32))
        payload = jnp.concatenate([hi, mid, lo], axis=-1)
        n_planes = 3
    out = jax.lax.dot_general(onehot, payload, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if n_planes == 3:
        out = out[..., :d] + out[..., d:2 * d] + out[..., 2 * d:]
    out = out.reshape(idx.shape + (d,))
    if in_dtype == jnp.bool_:
        out = out > 0.5
    elif in_dtype in (jnp.int32, jnp.int8, jnp.int64):
        out = jnp.round(out).astype(in_dtype)
    else:
        out = out.astype(in_dtype)
    return out[..., 0] if squeeze else out


def gather_neighbors_multi(xs, idx):
    """Gather several [B, N, D_i] tensors with ONE one-hot matmul
    (concat on features, split after). Cheaper than separate gathers."""
    dims = [x.shape[-1] for x in xs]
    cat = jnp.concatenate(xs, axis=-1)
    out = gather_neighbors(cat, idx)
    splits = np.cumsum(dims)[:-1].tolist()
    return jnp.split(out, splits, axis=-1)


def smart_gather(xs, idx, method: str = "auto"):
    """Multi-tensor neighbor gather with backend dispatch.

    method: 'pallas' (fused VMEM kernel, TPU only, forward-only — NOT
    differentiable), 'onehot' (XLA one-hot matmul, differentiable,
    runs at MXU peak), or 'auto' (onehot: measured faster than the
    standalone pallas gather AND safe under jax.grad; the pallas win
    comes from the fused edge-attention kernels instead). Both paths are
    exact for bf16 and f32 payloads (f32 rides as 3 bf16 planes)."""
    if method in ("auto", "onehot"):
        return [gather_neighbors(x, idx) for x in xs]
    if method == "pallas":
        from .pallas_gather import fused_gather
        return list(fused_gather(xs, idx))
    raise ValueError(method)


def hybrid_neighbors(pos, mask, lig_flag, k: int):
    """Hybrid edge scheme (reference: repo/modules/graph.py
    batch_hybrid_edge_connection): ligand nodes attend to k nearest ligand
    nodes AND k nearest protein nodes; protein nodes to k nearest overall.
    Returns idx [B, N, 2K] + valid mask."""
    n = pos.shape[-2]
    d2 = pairwise_sqdist(pos)
    eye = jnp.eye(n, dtype=bool)
    base_inval = ~(mask[..., :, None] & mask[..., None, :]) | eye

    src_is_lig = lig_flag[..., None, :]
    d2_lig = jnp.where(base_inval | ~src_is_lig, _BIG, d2)
    d2_rec = jnp.where(base_inval | src_is_lig, _BIG, d2)
    d2_any = jnp.where(base_inval, _BIG, d2)

    neg_l, idx_l = jax.lax.top_k(-d2_lig, k)
    neg_r, idx_r = jax.lax.top_k(-d2_rec, k)
    neg_a, idx_a = jax.lax.top_k(-d2_any, k)

    dst_is_lig = lig_flag[..., :, None]
    idx1 = jnp.where(dst_is_lig, idx_l, idx_a)
    neg1 = jnp.where(dst_is_lig, neg_l, neg_a)
    idx2 = idx_r
    neg2 = jnp.where(dst_is_lig, neg_r, -_BIG * jnp.ones_like(neg_r))

    idx = jnp.concatenate([idx1, idx2], axis=-1).astype(jnp.int32)
    valid = jnp.concatenate([-neg1, -neg2], axis=-1) < _BIG * 0.5
    valid = valid & mask[..., :, None]
    return idx, valid


def knn_cross(query_pos, ctx_pos, query_mask, ctx_mask, k: int):
    """For each query, indices of its k nearest valid context nodes
    (replaces torch_cluster.knn(x=ctx, y=query) — reference:
    predict_heads.py:244-246). Returns (idx [B, NQ, K], valid [B, NQ, K])."""
    sq_q = jnp.sum(query_pos * query_pos, axis=-1)
    sq_c = jnp.sum(ctx_pos * ctx_pos, axis=-1)
    cross = jnp.einsum("...qd,...cd->...qc", query_pos, ctx_pos)
    d2 = jnp.maximum(sq_q[..., :, None] + sq_c[..., None, :] - 2 * cross, 0.0)
    inval = ~(query_mask[..., :, None] & ctx_mask[..., None, :])
    d2 = jnp.where(inval, _BIG, d2)
    neg, idx = jax.lax.top_k(-d2, k)
    valid = (-neg) < _BIG * 0.5
    valid = valid & query_mask[..., :, None]
    return idx.astype(jnp.int32), valid
