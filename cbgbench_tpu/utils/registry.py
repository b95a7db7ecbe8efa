"""Simple named registries for models / transforms / datasets / denoisers.

Mirrors the reference's @register_* decorator pattern
(reference: repo/models/_base.py:3-13, repo/datasets/transforms/_base.py:3-8).
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._d: Dict[str, Callable] = {}

    def register(self, *names: str):
        def deco(fn):
            for name in names:
                if name in self._d:
                    raise KeyError(f"duplicate {self.kind} registration: {name}")
                self._d[name] = fn
            return fn
        return deco

    def get(self, name: str):
        if name not in self._d:
            raise KeyError(
                f"unknown {self.kind} '{name}'; known: {sorted(self._d)}")
        return self._d[name]

    def __contains__(self, name: str) -> bool:
        return name in self._d

    def keys(self):
        return self._d.keys()


MODELS = Registry("model")
TRANSFORMS = Registry("transform")
DATASETS = Registry("dataset")
DENOISERS = Registry("denoiser")
EMBEDDERS = Registry("context embedder")
