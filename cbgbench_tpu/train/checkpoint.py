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


def load_checkpoint(path: str, target_state=None) -> Tuple[Any, dict]:
    """path: a specific step dir or a ckpt_dir (takes latest).
    Returns (state, meta)."""
    path = os.path.abspath(path)    # orbax/tensorstore requires absolute
    if not os.path.basename(path).isdigit():
        found = latest_checkpoint(path)
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
