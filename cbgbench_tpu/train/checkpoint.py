"""Self-describing checkpoints (orbax).

Mirrors the reference checkpoint payload {config, model, optimizer,
scheduler, iteration} (reference: train.py:264-273) so checkpoints carry
their own model config; sampling rebuilds the model from the checkpoint
(reference: sample.py:153-156). Latest-checkpoint discovery is by step
number (reference: generate.sh:36-48).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state, config: dict,
                    plateau_state: Optional[dict] = None,
                    avg_val_loss: Optional[float] = None) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    os.makedirs(ckpt_dir, exist_ok=True)
    state_dir = os.path.join(path, "state")
    if os.path.exists(state_dir):       # idempotent re-save of a step
        import shutil
        shutil.rmtree(state_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(state_dir, jax.tree.map(np.asarray, state))
    meta = {"config": config, "iteration": int(step),
            "plateau": plateau_state or {},
            "avg_val_loss": avg_val_loss}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=float)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(ckpt_dir, str(max(int(s) for s in steps)))


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """The saved step with the lowest recorded avg_val_loss (meta.json).
    Steps without a recorded val loss (e.g. the final iter save when no
    validation coincided) are skipped; returns latest if none recorded."""
    if not os.path.isdir(ckpt_dir):
        return None
    scored = []
    for d in os.listdir(ckpt_dir):
        if not d.isdigit():
            continue
        meta_path = os.path.join(ckpt_dir, d, "meta.json")
        try:
            with open(meta_path) as f:
                val = json.load(f).get("avg_val_loss")
        except (OSError, ValueError):    # missing or truncated meta
            val = None
        # a NaN val (diverged validation) must never win min()
        if val is not None and np.isfinite(float(val)):
            scored.append((float(val), int(d)))
    if not scored:
        return latest_checkpoint(ckpt_dir)
    _, step = min(scored)
    return os.path.join(ckpt_dir, str(step))


def merge_param_trees(init_tree, loaded_tree, _prefix=""):
    """Overlay ``loaded_tree`` onto ``init_tree`` by matching path+shape.

    Finetune helper for architecture evolution (e.g. a checkpoint trained
    before a new head existed): leaves present in both trees with equal
    shapes take the loaded value (cast to the init leaf's dtype so the
    opt_state initialized from the fresh init stays consistent); everything
    else keeps its fresh init. Returns (merged, loaded_paths, fresh_paths,
    unexpected_paths) where unexpected_paths are checkpoint leaves with no
    counterpart in the init tree. This mirrors the reference's
    ``load_state_dict(..., strict=False)`` + missing/unexpected-key logging
    (train.py:165), and additionally tolerates shape mismatches (which
    PyTorch strict=False does not).
    """
    loaded_paths, fresh_paths, unexpected = [], [], []
    if isinstance(init_tree, dict):
        merged = {}
        for k, v in init_tree.items():
            sub = (loaded_tree or {}).get(k) if isinstance(loaded_tree, dict) \
                else None
            m, lp, fp, up = merge_param_trees(v, sub, f"{_prefix}{k}/")
            merged[k] = m
            loaded_paths += lp
            fresh_paths += fp
            unexpected += up
        if isinstance(loaded_tree, dict):
            for k in loaded_tree:
                if k not in init_tree:
                    unexpected.append(f"{_prefix}{k}")
        return merged, loaded_paths, fresh_paths, unexpected
    # leaf
    if loaded_tree is not None and \
            np.shape(loaded_tree) == np.shape(init_tree):
        dtype = getattr(init_tree, "dtype", None)
        return np.asarray(loaded_tree, dtype=dtype), [_prefix[:-1]], [], []
    return init_tree, [], [_prefix[:-1]], []


def load_checkpoint(path: str, target_state=None,
                    select: str = "latest") -> Tuple[Any, dict]:
    """path: a specific step dir or a ckpt_dir (resolved via ``select``:
    "latest" = highest step, reference generate.sh:36-48; "best" = lowest
    recorded avg_val_loss). Returns (state, meta)."""
    path = os.path.abspath(path)    # orbax/tensorstore requires absolute
    if not os.path.basename(path).isdigit():
        found = (best_checkpoint(path) if select == "best"
                 else latest_checkpoint(path))
        if found is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = found
    with ocp.StandardCheckpointer() as ckptr:
        if target_state is not None:
            state = ckptr.restore(os.path.join(path, "state"), target_state)
        else:
            state = ckptr.restore(os.path.join(path, "state"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
