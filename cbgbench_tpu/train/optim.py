"""Optimizer / LR-controller factory (reference: repo/utils/train.py:8-44).

The reference uses Adam + ReduceLROnPlateau. In optax the plateau logic is a
host-side controller mutating the injected learning-rate hyperparameter.
"""

from __future__ import annotations

from typing import Optional

import optax


def get_optimizer(cfg, max_grad_norm: Optional[float] = None):
    """cfg: {type: adam, lr, weight_decay, beta1, beta2}."""
    kind = cfg.get("type", "adam")
    lr = cfg.get("lr", 5e-4)
    if kind == "adam":
        if cfg.get("weight_decay", 0.0):
            opt = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, b1=cfg.get("beta1", 0.95),
                b2=cfg.get("beta2", 0.999),
                weight_decay=cfg.get("weight_decay", 0.0))
        else:
            opt = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr, b1=cfg.get("beta1", 0.95),
                b2=cfg.get("beta2", 0.999))
    else:
        raise ValueError(f"unknown optimizer {kind}")
    if max_grad_norm:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt


class PlateauController:
    """Host-side ReduceLROnPlateau: call .step(val_loss) after each
    validation; read .lr and write it into the optimizer hyperparams."""

    def __init__(self, init_lr: float, factor: float = 0.6,
                 patience: int = 10, min_lr: float = 1e-6):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad = 0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best - 1e-12:
            self.best = val_loss
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "bad": self.bad}

    def load_state_dict(self, d):
        self.lr, self.best, self.bad = d["lr"], d["best"], d["bad"]


def set_learning_rate(opt_state, lr: float):
    """Write a new learning rate into an inject_hyperparams opt state
    (possibly nested inside a chain)."""
    import jax.numpy as jnp

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr)
            return True
        if isinstance(s, tuple):
            return any(visit(x) for x in s)
        return False

    visit(opt_state)
    return opt_state
