"""Banded spatial neighbor search + gather: O(N·W) instead of O(N²).

The one-hot MXU gather (ops/knn.py) streams a [B, N·K, N] bf16 one-hot
through the systolic array; at protocol pocket sizes (N≈900) that matrix
dominates the denoise step (~half the step time, BASELINE.md round-2b).
This module cuts the one-hot width from N to a constant W' by exploiting
the composed layout [ligand block | receptor block]:

  * receptor atoms are STATIC during sampling and can be pre-sorted along
    a space-filling curve (``morton_order``), so a receptor's nearest
    receptors live within a narrow index band around its own position;
  * the ligand block is small (L ≈ 64) and always included as candidates,
    so receptor→ligand edges stay exact while the ligand itself moves;
  * ligand rows keep the full-width search/gather (they move freely, and
    L·K ≪ N·K so their full one-hot is cheap).

Each receptor tile of ``tile`` rows draws its K neighbors from the
candidate set  [0, L) ∪ [lo_t, lo_t + W)  with W = tile + 2·pad and lo_t
the tile's band start (clamped to the receptor block, constant width).
Because neighbors are *defined* as the k nearest among candidates, the
scheme is self-consistent (no dangling indices); it equals exact kNN
exactly when every receptor's true k nearest receptors fall inside its
band — checkable per pocket with ``band_recall``.

STATUS — measured negative result, kept as an experimental op, NOT wired
into the denoisers. On real 896-atom pocket shells (assets/examples,
Morton-sorted) exact-kNN edge recall at k=32 is only 0.73–0.85 at W=256
and 0.89–0.94 even at W=512 (Hilbert ordering is slightly worse, greedy
nearest-neighbor chaining far worse): a 1-D space-filling order cannot
bound the 3-D kNN support tightly enough for the widths that would pay.
The denoisers were trained on exact kNN graphs, so shipping a ~85%-recall
approximation risks silent quality drift; the gather-bandwidth problem is
attacked in ops/pallas_gather.py (VMEM one-hot) instead.

No reference counterpart (torch_cluster knn_graph is sparse/scatter).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cbgbench_tpu.ops.knn import _BIG, _split_planes, knn_neighbors


class BandSpec(NamedTuple):
    """Static banding geometry (hashable; safe as a flax module attr)."""
    lig_cap: int          # L: ligand block size (rows [0, L) move freely)
    tile: int             # receptor rows per tile
    pad: int              # band margin on each side of a tile

    @property
    def width(self) -> int:
        return self.tile + 2 * self.pad


def band_starts(spec: BandSpec, n: int):
    """Static band start offsets per receptor tile (python ints)."""
    l, t, w = spec.lig_cap, spec.tile, spec.width
    n_rec = n - l
    if n_rec % t:
        raise ValueError(f"receptor block {n_rec} not divisible by "
                         f"tile {t}")
    starts = []
    for ti in range(n_rec // t):
        lo = l + ti * t - spec.pad
        starts.append(int(np.clip(lo, l, max(l, n - w))))
    return starts


def banded_applicable(spec: BandSpec, n: int) -> bool:
    """Banding only helps when the candidate width is actually narrower
    than the full node set (small pockets just use the dense path)."""
    return (n - spec.lig_cap) > 0 and (spec.lig_cap + spec.width) < n \
        and (n - spec.lig_cap) % spec.tile == 0 and spec.width <= n - spec.lig_cap


# ---------------------------------------------------------------------------
# host-side spatial sort


def morton_order(pos: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting 3-D points along a Morton (Z-order) curve.

    Host-side numpy, run once per pocket at bucket build time. 10 bits per
    axis quantize a 40 Å pocket shell to ~0.04 Å cells — far below atom
    spacing, so equal codes are rare and tie order is irrelevant."""
    p = np.asarray(pos, np.float64)
    lo = p.min(0)
    span = np.maximum(p.max(0) - lo, 1e-9)
    q = np.minimum(((p - lo) / span * ((1 << bits) - 1)).astype(np.uint64),
                   (1 << bits) - 1)

    def spread(v):
        # interleave: insert two zero bits between each of the low 21 bits
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable")


def sort_protein_spatial(sample: dict) -> dict:
    """Permute a sample's protein arrays into Morton order (in place on a
    shallow copy). Applied at bucket build time so the banded neighbor
    assumption (index locality == spatial locality) holds."""
    prot = sample.get("protein")
    if not prot or "pos" not in prot or len(prot["pos"]) == 0:
        return sample
    perm = morton_order(np.asarray(prot["pos"]))
    new_prot = dict(prot)
    n = len(perm)
    for key, val in prot.items():
        arr = np.asarray(val)
        if arr.ndim >= 1 and arr.shape[0] == n:
            new_prot[key] = arr[perm]
    out = dict(sample)
    out["protein"] = new_prot
    return out


# ---------------------------------------------------------------------------
# device-side banded kNN + gather


def _tile_candidates(x, spec: BandSpec, starts):
    """Stack per-tile candidate slices: [B, T, L+W, ...]. Static slices
    only — XLA sees a handful of slice+concat ops, no dynamic gather."""
    l, w = spec.lig_cap, spec.width
    lig = x[:, :l]
    return jnp.stack([jnp.concatenate([lig, x[:, lo:lo + w]], axis=1)
                      for lo in starts], axis=1)


def banded_neighbors(pos, mask, k: int, spec: BandSpec):
    """k nearest valid candidates per node (self excluded).

    pos [B,N,3], mask [B,N] -> idx [B,N,K] int32 (GLOBAL indices),
    valid [B,N,K]. Ligand rows [0,L) search the full node set; receptor
    tile rows search [0,L) ∪ their spatial band."""
    b, n, _ = pos.shape
    l, t, w = spec.lig_cap, spec.tile, spec.width
    starts = band_starts(spec, n)
    n_t = len(starts)

    # --- ligand rows: full-width (reuses the dense masked top-k) --------
    sq = jnp.sum(pos * pos, -1)
    cross_l = jnp.einsum("bqd,bnd->bqn", pos[:, :l], pos)
    d2_l = jnp.maximum(sq[:, :l, None] + sq[:, None, :] - 2 * cross_l, 0.0)
    inval_l = ~(mask[:, :l, None] & mask[:, None, :])
    self_l = jnp.arange(l)[:, None] == jnp.arange(n)[None]
    d2_l = jnp.where(inval_l | self_l[None], _BIG, d2_l)
    neg_l, idx_l = jax.lax.top_k(-d2_l, k)
    val_l = ((-neg_l) < _BIG * 0.5) & mask[:, :l, None]

    # --- receptor tiles: banded candidates ------------------------------
    q_pos = pos[:, l:].reshape(b, n_t, t, 3)              # [B,T,t,3]
    q_mask = mask[:, l:].reshape(b, n_t, t)
    c_pos = _tile_candidates(pos, spec, starts)           # [B,T,L+W,3]
    c_mask = _tile_candidates(mask, spec, starts)
    sq_q = jnp.sum(q_pos * q_pos, -1)
    sq_c = jnp.sum(c_pos * c_pos, -1)
    cross = jnp.einsum("btqd,btcd->btqc", q_pos, c_pos)
    d2 = jnp.maximum(sq_q[..., :, None] + sq_c[..., None, :] - 2 * cross,
                     0.0)                                  # [B,T,t,L+W]
    inval = ~(q_mask[..., None] & c_mask[..., None, :])
    # self-exclusion: global row g = L + ti*t + r sits at local L + g - lo
    row_g = (l + jnp.arange(n_t)[:, None] * t + jnp.arange(t)[None])  # [T,t]
    lo_arr = jnp.asarray(starts)                           # [T]
    self_local = l + row_g - lo_arr[:, None]               # [T,t]
    is_self = (jnp.arange(l + w)[None, None]
               == self_local[..., None])                   # [T,t,L+W]
    d2 = jnp.where(inval | is_self[None], _BIG, d2)
    neg_r, loc_r = jax.lax.top_k(-d2, k)                   # [B,T,t,K]
    val_r = ((-neg_r) < _BIG * 0.5) & q_mask[..., None]
    glob_r = jnp.where(loc_r < l, loc_r,
                       loc_r - l + lo_arr[None, :, None, None])

    idx = jnp.concatenate([idx_l, glob_r.reshape(b, n - l, k)], axis=1)
    valid = jnp.concatenate([val_l, val_r.reshape(b, n - l, k)], axis=1)
    return idx.astype(jnp.int32), valid


def _local_onehot(idx, spec: BandSpec, starts, dtype):
    """Map global neighbor indices of receptor rows to band-local
    positions and one-hot them: [B, T, t·K, L+W]."""
    b = idx.shape[0]
    l, t, w = spec.lig_cap, spec.tile, spec.width
    n_t = len(starts)
    k = idx.shape[-1]
    idx_r = idx[:, l:].reshape(b, n_t, t * k)
    lo_arr = jnp.asarray(starts, idx.dtype)
    local = jnp.where(idx_r < l, idx_r,
                      idx_r - lo_arr[None, :, None] + l)
    return (local[..., None] == jnp.arange(l + w, dtype=idx.dtype)
            ).astype(dtype)


def banded_gather(x, idx, spec: BandSpec):
    """Drop-in for ops.knn.gather_neighbors when ``idx`` was produced by
    ``banded_neighbors`` with the same spec: every receptor-row index is
    guaranteed inside that row's candidate set, so the narrow one-hot
    selects exactly the same values (bitwise: both paths are 1.0-weighted
    bf16 dots over the identical 3-plane payload)."""
    from cbgbench_tpu.ops.knn import gather_neighbors

    squeeze = x.ndim == idx.ndim - 1
    if squeeze:
        x = x[..., None]
    b, n, d = x.shape[0], x.shape[1], x.shape[-1]
    l, t = spec.lig_cap, spec.tile
    k = idx.shape[-1]
    starts = band_starts(spec, n)
    n_t = len(starts)

    lig_out = gather_neighbors(x, idx[:, :l])              # [B,L,K,D]

    onehot = _local_onehot(idx, spec, starts, jnp.bfloat16)
    in_dtype = x.dtype
    if in_dtype == jnp.bfloat16:
        payload, n_planes = x, 1
    elif in_dtype == jnp.bool_:
        payload, n_planes = x.astype(jnp.bfloat16), 1
    else:
        hi, mid, lo = _split_planes(x.astype(jnp.float32))
        payload = jnp.concatenate([hi, mid, lo], axis=-1)
        n_planes = 3
    cand = _tile_candidates(payload, spec, starts)         # [B,T,L+W,D']
    out = jax.lax.dot_general(
        onehot, cand, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                # [B,T,tK,D']
    if n_planes == 3:
        out = out[..., :d] + out[..., d:2 * d] + out[..., 2 * d:]
    out = out.reshape(b, n - l, k, d)
    if in_dtype == jnp.bool_:
        out = out > 0.5
    elif in_dtype in (jnp.int32, jnp.int8, jnp.int64):
        out = jnp.round(out).astype(in_dtype)
    else:
        out = out.astype(in_dtype)
    out = jnp.concatenate([lig_out, out], axis=1)
    return out[..., 0] if squeeze else out


def band_recall(pos: np.ndarray, k: int, spec: BandSpec) -> float:
    """Fraction of exact kNN edges reproduced by the banded search on a
    single (already Morton-sorted) point cloud — the per-pocket check
    that banding is lossless. Host-side numpy diagnostic."""
    pos_j = jnp.asarray(pos)[None]
    mask = jnp.ones((1, pos.shape[0]), bool)
    idx_e, val_e = knn_neighbors(pos_j, mask, k)
    idx_b, val_b = banded_neighbors(pos_j, mask, k, spec)
    ie, ib = np.asarray(idx_e[0]), np.asarray(idx_b[0])
    ve = np.asarray(val_e[0])
    hits = sum(len(set(ie[r][ve[r]]) & set(ib[r]))
               for r in range(ie.shape[0]))
    total = int(ve.sum())
    return hits / max(total, 1)
