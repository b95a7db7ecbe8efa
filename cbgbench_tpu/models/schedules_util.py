"""Small shared loss-reduction helpers for models."""

from __future__ import annotations

import jax.numpy as jnp


def per_graph_mean(per_node, gen_flag, eps: float = 1e-8):
    """[B, N] per-node values -> scalar: masked per-graph mean, then batch
    mean (matches reference scatter_mean(...)[gen].mean())."""
    g = gen_flag.astype(per_node.dtype)
    per_graph = jnp.sum(per_node * g, axis=1) / jnp.maximum(g.sum(axis=1), eps)
    return jnp.mean(per_graph)
