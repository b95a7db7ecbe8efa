"""Train-time metric registry (reference: repo/utils/evaluate.py:5-73).

Metrics consume the `results` dict each model returns alongside its losses
(keys like v0/c_pred/mask_gen), configured as in the reference:
    eval.metrics: [{name: auroc, true_key: v0, pred_key: c_pred,
                    mask_key: mask_gen}]
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..utils.registry import Registry

METRICS = Registry("metric")


@METRICS.register("auroc")
def auroc(true_key: str = "v0", pred_key: str = "c_pred",
          mask_key: str = "mask_gen", **_):
    """Macro one-vs-rest AUROC of the type classifier over generated atoms."""

    def fn(results: Dict) -> float:
        y = np.asarray(results[true_key]).reshape(-1)
        p = np.asarray(results[pred_key])
        p = p.reshape(-1, p.shape[-1])
        m = np.asarray(results[mask_key]).reshape(-1).astype(bool)
        y, p = y[m], p[m]
        if len(y) == 0:
            return float("nan")
        aucs = []
        for c in range(p.shape[-1]):
            pos = y == c
            if pos.sum() == 0 or (~pos).sum() == 0:
                continue
            scores = p[:, c]
            order = np.argsort(scores)
            ranks = np.empty(len(scores))
            ranks[order] = np.arange(1, len(scores) + 1)
            n_pos, n_neg = pos.sum(), (~pos).sum()
            aucs.append((ranks[pos].sum() - n_pos * (n_pos + 1) / 2)
                        / (n_pos * n_neg))
        return float(np.mean(aucs)) if aucs else float("nan")

    return fn


@METRICS.register("accuracy")
def accuracy(true_key: str = "v0", pred_key: str = "c_pred",
             mask_key: str = "mask_gen", **_):
    def fn(results: Dict) -> float:
        y = np.asarray(results[true_key]).reshape(-1)
        p = np.asarray(results[pred_key])
        pred = p.reshape(-1, p.shape[-1]).argmax(-1)
        m = np.asarray(results[mask_key]).reshape(-1).astype(bool)
        if m.sum() == 0:
            return float("nan")
        return float((pred[m] == y[m]).mean())
    return fn


def build_metrics(metric_cfgs: List[dict]):
    fns = {}
    for cfg in metric_cfgs or []:
        cfg = dict(cfg)
        name = cfg.pop("name")
        fns[name] = METRICS.get(name)(**cfg)
    return fns
