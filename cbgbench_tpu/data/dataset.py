"""Datasets + loaders feeding padded device batches.

Two sources:
  * RawPairDataset — (pocket.pdb, ligand.sdf) file pairs parsed with the
    pure-python chem layer (works on the bundled assets/examples fixtures
    and on CrossDocked's extracted pocket10 directory tree).
  * CrossDockedLMDB — the reference's LMDB cache (optional, requires lmdb;
    reference: repo/datasets/pl.py:38-87).

The loader replaces PyG DataLoader + Collater (reference:
repo/utils/loader.py): it pads each sample into the shape bucket and stacks
— every batch has identical shapes, so the jitted train step never
retraces.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..chem.pdb import parse_pdb_pocket, pocket_shell
from ..chem.mol2 import read_ligand
from .batch import (DEFAULT_LIG_CAP, DEFAULT_REC_CAP, PocketLigandBatch,
                    stack_batch)
from .featurize import featurize_ligand, featurize_protein


class RawPairDataset:
    """Parse + featurize (pdb, sdf) pairs lazily with caching."""

    def __init__(self, pairs: Sequence[Tuple[str, str]],
                 transform: Optional[Callable] = None,
                 mode: str = "add_aromatic", pocket_radius: float = 0.0,
                 keep_bonds: bool = True):
        self.pairs = list(pairs)
        self.transform = transform
        self.mode = mode
        self.pocket_radius = pocket_radius
        self.keep_bonds = keep_bonds
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.pairs)

    def _parse(self, i: int) -> dict:
        if i in self._cache:
            return self._cache[i]
        pdb_path, sdf_path = self.pairs[i]
        atoms, residues = parse_pdb_pocket(pdb_path)
        lig = read_ligand(sdf_path)[0]
        if self.pocket_radius > 0:
            atoms, residues = pocket_shell(atoms, residues, lig.pos,
                                           self.pocket_radius)
        sample = {
            "protein": featurize_protein(atoms),
            "ligand": featurize_ligand(lig, self.mode,
                                       keep_bonds=self.keep_bonds),
            "residues": {
                "pos_heavyatom": residues.pos_heavyatom.astype(np.float32),
                "mask_heavyatom": residues.mask_heavyatom,
                "aa": residues.aa.astype(np.int32),
                "res_nb": residues.res_nb.astype(np.int32),
                "chain_nb": residues.chain_nb.astype(np.int32),
            },
            "name": os.path.basename(sdf_path),
        }
        self._cache[i] = sample
        return sample

    def get(self, i: int, rng: np.random.Generator) -> dict:
        import copy
        sample = copy.deepcopy(self._parse(i))
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample


def example_pairs(assets_dir: Optional[str] = None) -> List[Tuple[str, str]]:
    """The 5 bundled example complexes (Eg5, IMDPH, adrb1, drd2, smarca2)."""
    if assets_dir is None:
        assets_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                  "assets", "examples")
    pairs = []
    for d in sorted(os.listdir(assets_dir)):
        sub = os.path.join(assets_dir, d)
        if not os.path.isdir(sub):
            continue
        pdb = [f for f in os.listdir(sub) if f.endswith("_protein.pdb")]
        sdf = [f for f in os.listdir(sub)
               if f.endswith("_ligand.sdf") or f.endswith("_ligand.mol2")]
        sdf.sort(key=lambda f: f.endswith(".mol2"))   # prefer sdf if both
        if pdb and sdf:
            pairs.append((os.path.join(sub, pdb[0]), os.path.join(sub, sdf[0])))
    return pairs


def make_loader(dataset: RawPairDataset, batch_size: int,
                lig_cap: int = DEFAULT_LIG_CAP, rec_cap: int = DEFAULT_REC_CAP,
                shuffle: bool = True, seed: int = 0, infinite: bool = True,
                drop_oversize: bool = True) -> Iterator[PocketLigandBatch]:
    """Yield fixed-shape PocketLigandBatch forever (training) or one epoch."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset))
    buf = []               # carried across epochs in infinite mode so
    while True:            # datasets smaller than batch_size still batch
        if shuffle:
            rng.shuffle(order)
        if not infinite:
            buf = []
        n_kept = 0
        for i in order:
            try:
                s = dataset.get(int(i), rng)
            except Exception:
                continue
            if drop_oversize and (
                    len(s["ligand"].get("atype", [])) > lig_cap
                    or len(s["protein"]["pos"]) > rec_cap):
                continue
            n_kept += 1
            buf.append(_to_stackable(s))
            if len(buf) == batch_size:
                yield stack_batch(buf, lig_cap=lig_cap, rec_cap=rec_cap)
                buf = []
        if n_kept == 0:
            raise RuntimeError(
                f"every sample exceeded the shape bucket (lig_cap={lig_cap}, "
                f"rec_cap={rec_cap}) or failed to parse; use a larger bucket")
        if not infinite:
            if len(buf):
                while len(buf) < batch_size:   # pad final batch by repetition
                    buf.append(buf[-1])
                yield stack_batch(buf, lig_cap=lig_cap, rec_cap=rec_cap)
            return


def _to_stackable(s: dict) -> dict:
    lig = s["ligand"]
    out_lig = dict(pos=lig["pos"], atype=lig["atype"])
    if "gen_flag" in lig:
        out_lig["gen_flag"] = lig["gen_flag"]
    if "bond_index" in lig:
        out_lig["bond_index"] = lig["bond_index"]
        out_lig["bond_type"] = lig["bond_type"]
    return {"ligand": out_lig, "protein": s["protein"],
            "translation": s.get("translation", np.zeros(3, np.float32))}


def repeat_for_sampling(dataset: RawPairDataset, index: int,
                        num_samples: int, batch_size: int,
                        transform: Callable, seed: int = 0,
                        lig_cap: int = DEFAULT_LIG_CAP,
                        rec_cap: int = DEFAULT_REC_CAP):
    """Reference sampler protocol: replicate one test pocket num_samples
    times with fresh prior draws each (sample.py:159-181). Yields batches."""
    rng = np.random.default_rng(seed)
    buf = []
    for _ in range(num_samples):
        s = dataset.get(index, rng)
        s = transform(s, rng) if transform is not None else s
        buf.append(_to_stackable(s))
        if len(buf) == batch_size:
            yield stack_batch(buf, lig_cap=lig_cap, rec_cap=rec_cap)
            buf = []
    if buf:
        while len(buf) < batch_size:
            buf.append(buf[-1])
        yield stack_batch(buf, lig_cap=lig_cap, rec_cap=rec_cap)


def scan_pair_dir(root: str) -> List[Tuple[str, str]]:
    """Scan a directory tree for (pocket pdb, ligand sdf) pairs.

    Handles the CrossDocked pocket10 layout (<name>_pocket10.pdb next to
    <name>.sdf in per-target subdirs) and the assets/examples layout
    (*_protein.pdb + *_ligand.sdf)."""
    pairs: List[Tuple[str, str]] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        pdbs = [f for f in filenames if f.endswith(".pdb")]
        sdfs = [f for f in filenames
                if (f.endswith(".sdf") or f.endswith(".mol2"))
                and "frag" not in f.lower()]
        if not pdbs or not sdfs:
            continue
        for sdf in sorted(sdfs):
            stem = os.path.splitext(sdf)[0].replace("_ligand", "")
            best = None
            for pdb in pdbs:
                p = pdb[:-4]
                if p.startswith(stem) or stem.startswith(p.split("_pocket")[0]) \
                        or p.replace("_protein", "") == stem:
                    best = pdb
                    break
            if best is None:
                best = sorted(pdbs)[0]
            pairs.append((os.path.join(dirpath, best),
                          os.path.join(dirpath, sdf)))
    return sorted(pairs)


class CrossDockedLMDB:
    """The reference's LMDB cache + name->id split files
    (reference: repo/datasets/pl.py:38-87 LMDataBase + :12-34 get_pl_dataset).
    Requires the `lmdb` package and a prebuilt cache; raises a clear error
    otherwise. Yields the same per-sample dicts as RawPairDataset."""

    def __init__(self, lmdb_path: str, split_path: Optional[str] = None,
                 split: str = "train", transform: Optional[Callable] = None,
                 mode: str = "add_aromatic"):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "CrossDockedLMDB requires the 'lmdb' package; use "
                "RawPairDataset over the extracted pocket10 directory "
                "instead") from e
        import lmdb
        import pickle
        self._pickle = pickle
        self.env = lmdb.open(lmdb_path, readonly=True, lock=False,
                             readahead=False, subdir=os.path.isdir(lmdb_path))
        with self.env.begin() as txn:
            self.keys = [k for k, _ in txn.cursor()]
        if split_path:
            split_map = load_torch_pickle(split_path)
            names = set(n for pair in split_map[split] for n in pair)
            self.keys = [k for k in self.keys
                         if k.decode(errors="ignore") in names] or self.keys
        self.transform = transform
        self.mode = mode

    def __len__(self):
        return len(self.keys)

    def get(self, i: int, rng: np.random.Generator) -> dict:
        with self.env.begin() as txn:
            raw = self._pickle.loads(txn.get(self.keys[i]))
        sample = normalize_reference_sample(raw, self.mode)
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample


def normalize_reference_sample(raw: dict, mode: str = "add_aromatic") -> dict:
    """Reference caches pickle {'protein': {...}, 'ligand': {...}} dicts
    with torch tensors holding raw atomic numbers (reference:
    repo/datasets/pl.py:58-71); normalize field names + dtypes AND apply
    the mode featurization the reference does in its featurize transforms
    (repo/datasets/transforms.py FeaturizeLigandAtom), yielding the numpy
    per-sample schema RawPairDataset produces at parse time."""
    from ..chem.pdb import _POCKET_Z_INDEX
    from ..constants.molecule import (MAP_ATOM_TYPE_AROMATIC_TO_INDEX,
                                      MAP_ATOM_TYPE_ONLY_TO_INDEX)

    def np_(v):
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    # reference schema stores atomic numbers; ours stores table indices
    p_el = np_(raw["protein"]["element"])
    p_el = np.asarray([_POCKET_Z_INDEX.get(int(z), 1) for z in p_el])

    lig = raw["ligand"]
    z_arr = np_(lig["element"] if "element" in lig
                else lig["atom_type"]).astype(np.int32)
    arom = np_(lig.get("aromatic",
                       lig.get("atom_aromatic",
                               np.zeros(len(z_arr), bool)))).astype(bool)
    atype = np.zeros(len(z_arr), np.int32)
    for i, z in enumerate(z_arr):
        if mode == "basic":
            atype[i] = MAP_ATOM_TYPE_ONLY_TO_INDEX.get(int(z), 1)
        else:
            key = (int(z), bool(arom[i]))
            if key not in MAP_ATOM_TYPE_AROMATIC_TO_INDEX:
                key = (int(z), False)
            atype[i] = MAP_ATOM_TYPE_AROMATIC_TO_INDEX.get(key, 1)
    return {
        "protein": {
            "pos": np_(raw["protein"]["pos"]).astype(np.float32),
            "element": p_el.astype(np.int32),
            "is_backbone": np_(raw["protein"]["is_backbone"]).astype(bool),
            "aa": np_(raw["protein"]["atom_to_aa_type"]).astype(np.int32),
        },
        "ligand": {
            "pos": np_(lig["pos"]).astype(np.float32),
            "atype": atype,
            "bond_index": np_(lig.get("bond_index", np.zeros((2, 0), int))),
            "bond_type": np_(lig.get("bond_type", np.zeros(0, int))),
        },
    }


class CrossDockedShards:
    """LMDB-free processed cache: pickle shards + an index.json written by
    scripts/build_shard_cache.py (from either the reference LMDB cache or a
    raw pocket10 tree). Serves the same per-sample dicts as CrossDockedLMDB
    with zero non-stdlib dependencies at train time — the TPU-host answer
    to the reference's lmdb+torch cache (repo/datasets/pl.py:38-87).

    Layout: root/index.json {"names": [...], "shards": ["shard_00000.pkl",
    ...], "shard_of": {name: shard_idx}}; each shard pickles {name: raw
    sample dict}. Shards are loaded lazily and LRU-cached (2)."""

    def __init__(self, root: str, split_path: Optional[str] = None,
                 split: str = "train", transform: Optional[Callable] = None,
                 mode: str = "add_aromatic"):
        import json
        self.root = root
        with open(os.path.join(root, "index.json")) as f:
            index = json.load(f)
        self.shards = index["shards"]
        self.shard_of = index["shard_of"]
        self.names = list(index["names"])
        # 'reference': lmdb-converted atomic-number schema, featurized at
        # load; 'native': RawPairDataset samples pre-featurized at build
        self.schema = index.get("schema", "reference")
        if self.schema == "native" and index.get("mode", mode) != mode:
            raise ValueError(
                f"shard cache was built with mode={index['mode']!r} but "
                f"mode={mode!r} was requested; rebuild with "
                f"scripts/build_shard_cache.py")
        if split_path:
            split_map = load_torch_pickle(split_path)
            wanted = set(n for pair in split_map[split] for n in pair)
            kept = [n for n in self.names if n in wanted]
            self.names = kept or self.names
        self.transform = transform
        self.mode = mode
        self._cache: "dict[int, dict]" = {}
        import threading
        self._cache_lock = threading.Lock()

    def __len__(self):
        return len(self.names)

    def _shard(self, si: int) -> dict:
        # lock: the train prefetch thread and the main-thread val loader
        # share one dataset object; unsynchronized insert+evict races a
        # concurrent reader into KeyError
        with self._cache_lock:
            if si not in self._cache:
                import pickle
                with open(os.path.join(self.root, self.shards[si]),
                          "rb") as f:
                    self._cache[si] = pickle.load(f)
                while len(self._cache) > 2:      # LRU-2: drop oldest
                    self._cache.pop(next(iter(self._cache)))
            return self._cache[si]

    def get(self, i: int, rng: np.random.Generator) -> dict:
        import copy
        name = self.names[i]
        raw = self._shard(self.shard_of[name])[name]
        if self.schema == "native":
            sample = copy.deepcopy(raw)
        else:
            sample = normalize_reference_sample(raw, self.mode)
        sample["name"] = name
        if self.transform is not None:
            sample = self.transform(sample, rng)
        return sample


def load_torch_pickle(path: str):
    """Torch-free reader for `torch.save` payloads that contain no tensors
    (e.g. the reference's split_by_name.pt name->id maps,
    reference: repo/datasets/pl.py:21-34). torch.save writes a zip archive
    whose `data.pkl` member is a regular pickle; tensor-free payloads load
    with a plain Unpickler. A .npz/.json sibling format is also accepted.
    Falls back to `torch.load` if torch is importable and the payload does
    carry tensors."""
    import io
    import pickle
    import zipfile

    if path.endswith(".json"):
        import json
        with open(path) as f:
            return json.load(f)
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=True)
        return {k: data[k].tolist() for k in data.files}

    class _Stub:
        def __init__(self, *a, **k):
            pass

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "torch":
                return _Stub
            return super().find_class(module, name)

        def persistent_load(self, pid):
            return None

    _TORCH_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C

    def _load_bytes(data: bytes):
        stream = io.BytesIO(data)
        obj = _Unpickler(stream).load()
        if obj == _TORCH_LEGACY_MAGIC:
            # legacy torch.save: magic, protocol, sys_info, then the object
            _Unpickler(stream).load()
            _Unpickler(stream).load()
            obj = _Unpickler(stream).load()
        return obj

    try:
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as zf:
                member = next(n for n in zf.namelist()
                              if n.endswith("data.pkl"))
                return _load_bytes(zf.read(member))
        with open(path, "rb") as f:
            return _load_bytes(f.read())
    except Exception:
        import torch
        return torch.load(path, map_location="cpu", weights_only=False)
