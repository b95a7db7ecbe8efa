"""Scalar metric streaming: JSONL always, TensorBoard when available.

Replaces the reference's TensorBoard-only log_losses/ScalarMetricAccumulator
(reference: repo/utils/train.py:47-101). The JSONL stream
(<logdir>/scalars.jsonl, one {"step","tag","value","wall_time"} object per
line) is the canonical record — greppable, plottable, no native deps; a
torch.utils.tensorboard SummaryWriter mirrors it when torch+tensorboard are
importable so `tensorboard --logdir` works like the reference.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class ScalarWriter:
    def __init__(self, logdir: str, tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a",
                       buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

    def write(self, step: int, tag: str, value: float):
        self._f.write(json.dumps({"step": int(step), "tag": tag,
                                  "value": float(value),
                                  "wall_time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def write_dict(self, step: int, scalars: Dict[str, float],
                   prefix: str = ""):
        """Reference log_losses semantics: one tag per loss key
        (utils/train.py:47-62)."""
        for k, v in scalars.items():
            self.write(step, f"{prefix}{k}", v)

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def read_scalars(logdir: str, tag: Optional[str] = None):
    """Load the JSONL stream back as a list of dicts (analysis/tests)."""
    path = os.path.join(logdir, "scalars.jsonl")
    out = []
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if tag is None or row.get("tag") == tag:
                out.append(row)
    return out
