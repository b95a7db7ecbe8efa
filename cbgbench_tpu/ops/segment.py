"""Masked reductions over padded node sets.

These replace torch_scatter's scatter_mean/scatter_softmax for the padded
layout: a "segment" is simply the valid slice of one batch row.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -1e9


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 1,
                keepdims: bool = False, eps: float = 1e-8) -> jnp.ndarray:
    """Mean of x over `axis` counting only mask==True entries.
    mask broadcasts against x (append trailing dims as needed)."""
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    mf = m.astype(x.dtype)
    # where, not x*m: a non-finite x at a masked-out slot must not poison
    # the sum (inf*0 = NaN — the GraphBP focus-loss incident, r3)
    num = jnp.sum(jnp.where(m.astype(bool), x, 0), axis=axis,
                  keepdims=keepdims)
    den = jnp.sum(mf, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, eps)


def masked_sum(x, mask, axis: int = 1, keepdims: bool = False):
    m = mask
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m.astype(x.dtype), axis=axis, keepdims=keepdims)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` with invalid entries forced to ~0 probability.
    Rows with no valid entry return all-zeros (not NaN)."""
    m = mask
    while m.ndim < logits.ndim:
        m = m[..., None]
        # mask trails logits when heads dim present; broadcast from the left
    logits = jnp.where(m, logits, _NEG)
    z = logits - jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp(z) * m.astype(logits.dtype)
    den = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(den, 1e-20)


def mean_center(pos: jnp.ndarray, mask: jnp.ndarray,
                where_mask: jnp.ndarray | None = None):
    """Subtract the masked centroid; returns (centered, centroid [B,3])."""
    com = masked_mean(pos, mask, axis=1, keepdims=True)
    centered = jnp.where(
        (where_mask if where_mask is not None else mask)[..., None],
        pos - com, pos)
    return centered, com[:, 0]
