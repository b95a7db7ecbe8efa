"""YAML config system with ``!include`` composition and attribute access.

Mirrors the reference's config surface (load_config + EasyDict with
pervasive ``.get()`` defaulting, reference: repo/utils/misc.py:106-143) so
that configs carry the same tree shape, while staying dependency-free.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access and recursive wrapping ("EasyDict")."""

    def __init__(self, d: Mapping | None = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, Mapping) and not isinstance(v, Config):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, self._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v
        return unwrap(self)


class _IncludeLoader(yaml.SafeLoader):
    """SafeLoader with a ``!include path/relative/to/current/file.yml`` tag."""

    def __init__(self, stream):
        self._root = os.path.dirname(getattr(stream, "name", ".") or ".")
        super().__init__(stream)


def _include(loader: _IncludeLoader, node: yaml.Node):
    path = os.path.join(loader._root, str(loader.construct_scalar(node)))
    with open(path, "r") as f:
        return yaml.load(f, _IncludeLoader)


_IncludeLoader.add_constructor("!include", _include)


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        raw = yaml.load(f, _IncludeLoader)
    return Config(raw or {})


def load_config_str(text: str) -> Config:
    return Config(yaml.load(text, yaml.SafeLoader) or {})


# ---------------------------------------------------------------------------
# Derived-field inference (reference: repo/utils/configuration.py:6-69).
# The atom-type class count follows the ligand featurizer's `mode`.
# ---------------------------------------------------------------------------

_NUM_ATOM_TYPE_BY_MODE = {
    "basic": 8,
    "add_aromatic": 13,
    "full": 23,
}


def _find_transform(cfg: Config, names) -> Config | None:
    transforms = cfg.get("data", {}).get("train", {}).get("transform", [])
    for tr in transforms:
        if tr.get("type") in names:
            return tr
    return None


def infer_num_atom_type(cfg: Config) -> int:
    tr = _find_transform(cfg, ("featurize_ligand_fa", "featurize_ligand_ar",
                               "featurize_ligand_fg"))
    mode = tr.get("mode", "basic") if tr is not None else "basic"
    if mode in _NUM_ATOM_TYPE_BY_MODE:
        return _NUM_ATOM_TYPE_BY_MODE[mode]
    if mode == "fg_only":
        from ..constants.fg import NUM_FG_TYPES
        return NUM_FG_TYPES + 1
    if mode == "protein_fg_merge":
        from ..constants.fg import NUM_FG_TYPES
        from ..constants.protein import NUM_AA_TYPES
        return NUM_FG_TYPES + NUM_AA_TYPES + 1
    raise ValueError(f"unknown featurize mode {mode}")


def set_derived_fields(cfg: Config) -> Config:
    """Inject num_atomtype / num_bondtype / mode into cfg.model, like the
    reference's set_num_atom_type/set_num_bond_type at startup."""
    model = cfg.setdefault("model", Config())
    if "num_atomtype" not in model:
        model.num_atomtype = infer_num_atom_type(cfg)
    if "num_bondtype" not in model:
        model.num_bondtype = 5
    tr = _find_transform(cfg, ("featurize_ligand_fa", "featurize_ligand_ar",
                               "featurize_ligand_fg"))
    if tr is not None and "mode" not in model:
        model.mode = tr.get("mode", "basic")
    return cfg
