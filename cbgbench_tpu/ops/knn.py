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
    # |x-y|^2 = |x|^2 + |y|^2 - 2 x.y ; the cross term is a matmul with
    # the coordinate channel ZERO-PADDED 3 -> 8: XLA lowers the bare d=3
    # contraction catastrophically on TPU (measured 10.5 ms vs 1.05 ms
    # padded at [16,512,512], round-4 probe) — the sub-sublane
    # contraction forces relayouts that dwarf the 25 MFLOP matmul.
    # Zero padding keeps the math exact.
    sq = jnp.sum(pos * pos, axis=-1)
    pp = jnp.pad(pos, [(0, 0)] * (pos.ndim - 1) + [(0, 5)])
    cross = pp @ jnp.swapaxes(pp, -1, -2)
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
    # plain top_k, deliberately: chunked_top_k measured 4.36 vs 10.57 ms
    # for STANDALONE knn (it lets XLA fuse the pairwise build into the
    # chunk slices), but IN-GRAPH the full denoise step regressed 21.55
    # -> 24.22 ms with it — the surrounding graph already fuses the
    # plain path better (round-4 measurement; see BASELINE.md)
    neg, idx = jax.lax.top_k(-d2, k)            # [B, N, K]
    valid = (-neg) < _BIG * 0.5
    valid = valid & mask[..., :, None]          # padded dst rows -> no edges
    if return_dist:
        return (idx.astype(jnp.int32), valid,
                jnp.sqrt(jnp.maximum(-neg, 0.0)))
    return idx.astype(jnp.int32), valid


def pairwise_cross_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., M, 3] x [..., N, 3] -> [..., M, N] squared distances (same
    MXU-friendly 3->8 zero-padded form as pairwise_sqdist)."""
    sq_a = jnp.sum(a * a, axis=-1)
    sq_b = jnp.sum(b * b, axis=-1)
    pa = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 5)])
    pb = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, 5)])
    cross = pa @ jnp.swapaxes(pb, -1, -2)
    return jnp.maximum(sq_a[..., :, None] + sq_b[..., None, :] - 2 * cross,
                       0.0)


def knn_static_candidates(pos: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Per-node top-k WITHIN a static block (the pocket's receptor atoms,
    frozen for an entire sampling run): compute once, feed
    knn_neighbors_cached every step. The receptor-receptor block is
    (N_rec/N)^2 of the distance matrix (~77% at 448/512) and its top-k
    candidates never change while only ligand atoms move.

    Returns (neg_d2 [B, R, K] f32, idx [B, R, K] int32 LOCAL indices).
    """
    r = pos.shape[-2]
    if r <= k:
        raise ValueError(f"static block of {r} nodes <= k={k}; "
                         "use knn_neighbors directly")
    d2 = pairwise_sqdist(pos)
    inval = ~(mask[..., :, None] & mask[..., None, :])
    inval = inval | jnp.eye(r, dtype=bool)
    neg, idx = jax.lax.top_k(-jnp.where(inval, _BIG, d2), k)
    return neg, idx.astype(jnp.int32)


def knn_neighbors_cached(pos: jnp.ndarray, mask: jnp.ndarray, k: int,
                         n_dyn: int, cand_neg: jnp.ndarray,
                         cand_idx: jnp.ndarray,
                         return_dist: bool = False):
    """knn_neighbors with the static-block candidates precomputed.

    Layout contract: rows [0, n_dyn) are dynamic (ligand), rows
    [n_dyn, N) are static, and (cand_neg, cand_idx) come from
    knn_static_candidates(pos[:, n_dyn:], mask[:, n_dyn:], k). Exact:
    a static row's k nearest among all N nodes is the k-best of
    (its k-best static neighbors) U (all n_dyn dynamic columns), so the
    merged top-k equals the full top-k up to tie order. Cost: the
    [N_rec, N_rec] distance block and its top-k drop out of the per-step
    graph; top-k shrinks from [N, N] rows to [n_dyn, N] + [N_rec, K+n_dyn].
    """
    n = pos.shape[-2]
    if n > 16 * 256:
        # the hi/lo one-hot recombination below encodes global indices as
        # bf16 (idx//16, idx%16) pairs; bf16 integers are exact only to
        # 256, so indices >= 4096 would silently corrupt (same bound as
        # the pre10/pre11 kernel packing guards)
        raise ValueError(f"knn_neighbors_cached: N={n} exceeds the exact "
                         "bf16 hi/lo index-encoding bound of 4096 nodes")
    nl = n_dyn
    pos_l = pos[:, :nl]
    mask_l = mask[:, :nl]
    mask_r = mask[:, nl:]

    # dynamic rows: full top-k over all columns (self excluded)
    d2_l = pairwise_cross_sqdist(pos_l, pos)
    inval_l = ~(mask_l[..., :, None] & mask[..., None, :])
    eye_l = (jnp.arange(n)[None, :] == jnp.arange(nl)[:, None])
    inval_l = inval_l | eye_l
    neg_l, idx_l = jax.lax.top_k(-jnp.where(inval_l, _BIG, d2_l), k)

    # static rows: merge k static candidates with the n_dyn dynamic cols
    d2_rl = pairwise_cross_sqdist(pos[:, nl:], pos_l)
    inval_rl = ~(mask_r[..., :, None] & mask_l[..., None, :])
    vals = jnp.concatenate(
        [cand_neg, -jnp.where(inval_rl, _BIG, d2_rl)], -1)  # [B,R,K+NL]
    neg_r, sel = jax.lax.top_k(vals, k)
    # Map merged positions to global indices. Static picks need a
    # per-row gather of cand_idx by sel; done as two bf16-exact one-hot
    # einsums over hi/lo nibbles (values < 16*32=512; bf16 is only exact
    # to 256, and take_along_axis lowers to a serial gather on TPU).
    oh = jax.nn.one_hot(jnp.minimum(sel, k - 1), k, dtype=jnp.bfloat16)
    glob_static = cand_idx + nl                         # [B,R,K]
    hi = (glob_static // 16).astype(jnp.bfloat16)
    lo = (glob_static % 16).astype(jnp.bfloat16)
    pick_hi = jnp.einsum("brkc,brc->brk", oh, hi)
    pick_lo = jnp.einsum("brkc,brc->brk", oh, lo)
    picked = (pick_hi.astype(jnp.int32) * 16 + pick_lo.astype(jnp.int32))
    idx_r = jnp.where(sel < k, picked, sel - k)

    idx = jnp.concatenate([idx_l, idx_r], 1).astype(jnp.int32)
    neg = jnp.concatenate([neg_l, neg_r], 1)
    valid = ((-neg) < _BIG * 0.5) & mask[..., :, None]
    if return_dist:
        return idx, valid, jnp.sqrt(jnp.maximum(-neg, 0.0))
    return idx, valid


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


def gather_neighbors_prefix(x_prefix: jnp.ndarray,
                            idx: jnp.ndarray) -> jnp.ndarray:
    """One-hot gather restricted to the first P source rows.

    x_prefix [B, P, D], idx [B, N, K] with GLOBAL indices in [0, N);
    any idx >= P gathers exact zeros (its one-hot row is empty). The
    one-hot shrinks from [B, N*K, N] to [B, N*K, P] — ~N/P cheaper in
    HBM traffic. Used by the incremental rel_x update: between layers
    only ligand rows (the first ``n_lig``) ever move, so the per-layer
    delta gather only needs the ligand block. Same 3-plane f32
    exactness as gather_neighbors."""
    in_dtype = x_prefix.dtype
    b, p, d = x_prefix.shape
    flat_idx = idx.reshape(b, -1)                       # [B, N*K]
    onehot = (flat_idx[..., None] == jnp.arange(p, dtype=idx.dtype)
              ).astype(jnp.bfloat16)                    # [B, N*K, P]
    if in_dtype == jnp.bfloat16:
        payload = x_prefix
        n_planes = 1
    else:
        hi, mid, lo = _split_planes(x_prefix.astype(jnp.float32))
        payload = jnp.concatenate([hi, mid, lo], axis=-1)
        n_planes = 3
    out = jax.lax.dot_general(onehot, payload, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if n_planes == 3:
        out = out[..., :d] + out[..., d:2 * d] + out[..., 2 * d:]
    return out.reshape(idx.shape + (d,)).astype(in_dtype)


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
