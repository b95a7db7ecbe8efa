"""Jitted train/eval steps over padded pocket batches.

Replaces the reference's Python train loop body (train.py:173-249) with a
single fused XLA program: forward, weighted loss, grad, global-norm clip,
optimizer update. Data parallelism is added by jitting with sharded batch
inputs (see cbgbench_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @staticmethod
    def create(params, tx):
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))


def make_train_step(model, tx, donate: bool = True) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch, t, rng):
        loss_dict, _ = model.apply(params, batch, t, rng)
        total = model.weighted_loss(loss_dict)
        return total, loss_dict

    def step_fn(state: TrainState, batch, rng) -> tuple:
        from ..models import sample_time
        b = batch.batch_size
        k_t, k_noise = jax.random.split(jax.random.fold_in(rng, state.step))
        t = sample_time(k_t, b, model.num_timesteps, model.time_sampler)
        (total, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, t, k_noise)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # skip non-finite updates: one bad batch (e.g. a flow log-det
        # blowup in GraphBP — observed NaN at ~13k iters, after which
        # clipped-NaN updates kill the run permanently) keeps the previous
        # params/opt_state instead of poisoning them. Stateless (no optax
        # wrapper state), so checkpoints stay resume-compatible.
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(total) & jnp.isfinite(gnorm)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            params, state.params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            opt_state, state.opt_state)
        metrics = {"loss": total, "grad_norm": gnorm,
                   "update_skipped": (~finite).astype(jnp.float32),
                   **{f"loss_{k}": v for k, v in loss_dict.items()}}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_grad_forensics(model) -> Callable:
    """Failure-forensics probe (SURVEY §5 failure detection): recomputes
    the gradient for one (params, batch, t, rng) and reports per-leaf
    finiteness and norms, so a non-finite training step can be localized
    to a module without rerunning under jax_debug_nans. Compiled lazily —
    only the first triggering step pays the compile."""

    def fn(params, batch, t, rng):
        def loss_fn(p):
            loss_dict, _ = model.apply(p, batch, t, rng)
            return model.weighted_loss(loss_dict), loss_dict

        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        finite = jax.tree_util.tree_map(
            lambda g: jnp.all(jnp.isfinite(g)), grads)
        norms = jax.tree_util.tree_map(
            lambda g: jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)))),
            grads)
        return {"total": total, "loss_dict": ld,
                "finite": finite, "norms": norms}

    return jax.jit(fn)


def make_eval_step(model, eval_interval: int = 10) -> Callable:
    """Validation loss at fixed timesteps (reference: train.py:207-249)."""

    def eval_fn(params, batch, rng) -> Dict[str, jnp.ndarray]:
        b = batch.batch_size
        import numpy as np
        times = jnp.asarray(
            np.round(np.linspace(0, model.num_timesteps - 1,
                                 eval_interval)).astype(np.int32))

        # lax.scan over the timesteps: the model body compiles ONCE, not
        # eval_interval times (an unrolled 10-forward graph takes tens of
        # minutes on remote-compile platforms)
        def body(_, ti):
            tv, i = ti
            t = jnp.full((b,), tv, jnp.int32)
            loss_dict, _res = model.apply(params, batch, t,
                                          jax.random.fold_in(rng, i))
            return None, loss_dict
        _, stacked = jax.lax.scan(
            body, None, (times, jnp.arange(eval_interval)))
        total = {k: v.mean(0) for k, v in stacked.items()}
        total["loss"] = model.weighted_loss(total)
        return total

    return jax.jit(eval_fn)
