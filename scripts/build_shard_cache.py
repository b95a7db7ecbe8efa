"""Build a CrossDockedShards pickle cache (lmdb/torch-free at train time).

Sources:
  --lmdb PATH     convert the reference's LMDB cache (requires lmdb here,
                  but not on the training host; reference:
                  repo/datasets/pl.py:38-87)
  --raw DIR       parse a raw pocket10 / examples directory tree with the
                  pure-python chem layer (writes the already-normalized
                  per-sample schema)

Usage:
  python scripts/build_shard_cache.py --lmdb crossdocked_pocket10.lmdb \
      --out cache_shards [--shard_size 1024]
  python scripts/build_shard_cache.py --raw assets/examples --out cache_shards
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def iter_lmdb(path):
    import lmdb
    env = lmdb.open(path, readonly=True, lock=False, readahead=False,
                    subdir=os.path.isdir(path))
    with env.begin() as txn:
        for k, v in txn.cursor():
            yield k.decode(errors="ignore"), pickle.loads(v)
    env.close()


def iter_raw(root, mode, pocket_radius):
    """Parse + featurize once; shards store the ready 'native' schema."""
    from cbgbench_tpu.data.dataset import RawPairDataset, scan_pair_dir
    import numpy as np
    ds = RawPairDataset(scan_pair_dir(root), mode=mode,
                        pocket_radius=pocket_radius)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        try:
            s = ds.get(i, rng)
        except Exception as e:   # noqa: BLE001 - skip unparseable entries
            print(f"skip {ds.pairs[i][1]}: {e}", file=sys.stderr)
            continue
        yield s.pop("name"), s


def main(argv=None):
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--lmdb")
    src.add_argument("--raw")
    p.add_argument("--out", required=True)
    p.add_argument("--shard_size", type=int, default=1024)
    p.add_argument("--mode", default="add_aromatic",
                   help="featurization mode baked into --raw shards")
    p.add_argument("--pocket_radius", type=float, default=10.0)
    args = p.parse_args(argv)

    it = (iter_lmdb(args.lmdb) if args.lmdb
          else iter_raw(args.raw, args.mode, args.pocket_radius))
    schema = "reference" if args.lmdb else "native"
    os.makedirs(args.out, exist_ok=True)
    names, shards, shard_of = [], [], {}
    buf = {}

    def flush():
        if not buf:
            return
        fname = f"shard_{len(shards):05d}.pkl"
        with open(os.path.join(args.out, fname), "wb") as f:
            pickle.dump(dict(buf), f, protocol=pickle.HIGHEST_PROTOCOL)
        for n in buf:
            shard_of[n] = len(shards)
        shards.append(fname)
        buf.clear()

    for name, raw in it:
        names.append(name)
        buf[name] = raw
        if len(buf) >= args.shard_size:
            flush()
    flush()
    with open(os.path.join(args.out, "index.json"), "w") as f:
        json.dump({"names": names, "shards": shards, "shard_of": shard_of,
                   "schema": schema, "mode": args.mode}, f)
    print(f"wrote {len(names)} samples in {len(shards)} shards to {args.out}")


if __name__ == "__main__":
    main()
