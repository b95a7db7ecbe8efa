"""Log-space categorical utilities for D3PM-style type diffusion, pure jnp.

(reference: repo/models/utils/categorical.py)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_to_log_onehot(x, num_classes: int):
    onehot = jax.nn.one_hot(x, num_classes)
    return jnp.log(jnp.clip(onehot, 1e-30, None))


def log_onehot_to_index(log_x):
    return jnp.argmax(log_x, axis=-1)


def categorical_kl(log_prob1, log_prob2, axis=-1):
    return jnp.sum(jnp.exp(log_prob1) * (log_prob1 - log_prob2), axis=axis)


def log_categorical(log_x_start, log_prob, axis=-1):
    return jnp.sum(jnp.exp(log_x_start) * log_prob, axis=axis)


def log_sample_categorical(key, logits):
    """Gumbel-max sample; returns class indices with logits' leading shape."""
    uniform = jax.random.uniform(key, logits.shape)
    gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
    return jnp.argmax(gumbel + logits, axis=-1)


def log_add_exp(a, b):
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def clamped_one_hot(x, max_class: int, min_class: int = 0):
    mask = (x >= 0) & (x <= max_class)
    x = jnp.clip(x, 0, max_class)
    y = jax.nn.one_hot(x, max_class) * mask[..., None]
    if min_class > 0:
        y = y.at[..., :min_class].set(0)
    return y
