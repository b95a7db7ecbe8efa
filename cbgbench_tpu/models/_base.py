"""Model registry + shared diffusion-model utilities.

(reference: repo/models/_base.py:3-13, repo/models/diffusion/_base.py:4-34)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import MODELS


def get_model(cfg):
    """Build a model from a config subtree (cfg.model in full configs)."""
    return MODELS.get(cfg["type"])(cfg)


def sample_time(key, batch_size: int, num_timesteps: int,
                sampler: str = "symmetric", ctn: bool = False):
    """Per-graph diffusion time sampling.

    'symmetric' draws antithetic pairs (t, T-t-1) to halve loss variance
    (reference: repo/models/diffusion/_base.py:13-34)."""
    if sampler == "uniform":
        time = jax.random.uniform(key, (batch_size,))
        if not ctn:
            time = jnp.clip(jnp.round(time * num_timesteps), 0,
                            num_timesteps - 1).astype(jnp.int32)
        return time
    if sampler == "symmetric":
        half = batch_size // 2 + 1
        t = jax.random.randint(key, (half,), 0, num_timesteps)
        time = jnp.concatenate([t, num_timesteps - t - 1])[:batch_size]
        if ctn:
            time = time.astype(jnp.float32) / num_timesteps
        return time
    if sampler == "random":
        return jax.random.randint(key, (batch_size,), 0,
                                  num_timesteps + 1).astype(jnp.float32)
    raise ValueError(f"unknown time sampler: {sampler}")
