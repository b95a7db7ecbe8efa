"""Pallas TPU kernel: fused one-hot row gather.

The hot op of every denoiser layer is gathering neighbor features
``src[B, N, D] x idx[B, R] -> out[B, R, D]`` (R = N*K). XLA's dynamic
gather lowers to a near-serial loop on TPU, and the one-hot-matmul
workaround (ops/knn.py:gather_neighbors) materializes a [B, R, N] one-hot
in HBM (~134 MB at [16, 16384, 512]) — bandwidth-bound.

This kernel keeps everything in VMEM: for each row tile it generates the
one-hot comparison tile on the VPU **on the fly** and contracts it against
the source tile on the MXU, accumulating in f32. No HBM one-hot, no
dynamic-gather loop. Multiple tensors ride in one payload
(``fused_gather``); f32 tensors are split into three exact bf16 planes
(hi/mid/lo) so reconstruction is f32-accurate while the matmul stays at
bf16 MXU rate.

Replaces the gather half of the reference hot loop
(reference: repo/modules/attention/x2h_attention.py:49-57 edge gathers via
PyG indexing; SURVEY §7 stage 3).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _gather_kernel(idx_ref, src_ref, out_ref, *, n_src: int, tile_n: int):
    """One (batch, row-tile) program: out[r, :] = src[idx[r], :].

    idx_ref: [1, TILE_R, 1] int32 (VMEM)
    src_ref: [1, N_pad, P]  bf16  (VMEM)
    out_ref: [1, TILE_R, P] f32   (VMEM)
    """
    tile_r = out_ref.shape[1]
    p = out_ref.shape[2]
    idx = idx_ref[0]                                   # [TILE_R, 1]
    acc = jnp.zeros((tile_r, p), jnp.float32)
    for n0 in range(0, n_src, tile_n):
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_r, tile_n), 1) + n0
        onehot = (idx == cols).astype(jnp.bfloat16)    # [TILE_R, TILE_N]
        acc = acc + jnp.dot(onehot, src_ref[0, n0:n0 + tile_n, :],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def pallas_gather_rows(src: jnp.ndarray, idx: jnp.ndarray,
                       tile_r: int = 512, interpret: bool = False
                       ) -> jnp.ndarray:
    """src [B, N, P] bf16, idx [B, R] int32 -> [B, R, P] f32.

    P must be a multiple of 128 (pad the payload before calling)."""
    b, n, p = src.shape
    r = idx.shape[1]
    assert p % LANE == 0, p
    n_pad = _round_up(n, LANE)
    if n_pad != n:
        src = jnp.pad(src, ((0, 0), (0, n_pad - n), (0, 0)))
    r_pad = _round_up(r, tile_r)
    if r_pad != r:
        idx = jnp.pad(idx, ((0, 0), (0, r_pad - r)))
    idx2 = idx[..., None].astype(jnp.int32)            # [B, R_pad, 1]

    grid = (b, r_pad // tile_r)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_src=n_pad, tile_n=LANE),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_r, 1), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, p), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, p), lambda bi, ri: (bi, ri, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r_pad * n_pad * p,
            bytes_accessed=(b * r_pad * 4 + b * n_pad * p * 2
                            + b * r_pad * p * 4),
            transcendentals=0),
        interpret=interpret,
    )(idx2, src)
    return out[:, :r]


def _split_bf16x3(x: jnp.ndarray) -> List[jnp.ndarray]:
    """f32 -> 3 exact bf16 planes; single implementation lives in ops.knn
    (_split_planes) so accuracy fixes propagate to every gather path."""
    from .knn import _split_planes
    return list(_split_planes(x))


def fused_gather(tensors: Sequence[jnp.ndarray], idx: jnp.ndarray,
                 interpret: bool = False) -> Tuple[jnp.ndarray, ...]:
    """Gather several [B, N, D_i] tensors with ONE Pallas kernel pass.

    bf16 tensors ride as-is (selection by a 1.0-weighted dot is exact);
    f32 tensors ride as 3 exact bf16 planes and are reassembled to f32.
    idx may be [B, R] or [B, N, K] (flattened internally).

    Returns the gathered tensors with idx's shape prepended per tensor:
    [B, R, D_i] (or [B, N, K, D_i]).
    """
    lead = idx.shape
    b = lead[0]
    flat_idx = idx.reshape(b, -1)

    planes: List[jnp.ndarray] = []
    specs = []               # (dtype, D, n_planes, offset)
    off = 0
    for t in tensors:
        d = t.shape[-1]
        if t.dtype == jnp.bfloat16:
            planes.append(t)
            specs.append((t.dtype, d, 1, off))
            off += d
        else:
            tf = t.astype(jnp.float32)
            planes.extend(_split_bf16x3(tf))
            specs.append((t.dtype, d, 3, off))
            off += 3 * d
    payload = jnp.concatenate([p_.astype(jnp.bfloat16) for p_ in planes],
                              axis=-1)
    p_total = _round_up(payload.shape[-1], LANE)
    if p_total != payload.shape[-1]:
        payload = jnp.pad(payload,
                          ((0, 0), (0, 0), (0, p_total - payload.shape[-1])))

    nk = flat_idx.shape[1]
    tile_r = 512 if nk % 512 == 0 else (256 if nk % 256 == 0 else 128)
    out = pallas_gather_rows(payload, flat_idx, tile_r=tile_r,
                             interpret=interpret)      # [B, R, P] f32

    results = []
    for dtype, d, n_planes, off in specs:
        if n_planes == 1:
            g = out[..., off:off + d].astype(dtype)
        else:
            g = (out[..., off:off + d]
                 + out[..., off + d:off + 2 * d]
                 + out[..., off + 2 * d:off + 3 * d]).astype(dtype)
        results.append(g.reshape(lead + (d,)))
    return tuple(results)


def gather_available() -> bool:
    """True when the Pallas path can compile on this backend."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")
