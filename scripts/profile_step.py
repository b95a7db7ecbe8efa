"""Micro-benchmark one denoise forward across impls + component timings.

Usage: python scripts/profile_step.py [--reps N]

Platform notes (axon remote tunnel): per-call dispatch jitter is 2-30 ms
and there is a hard 60 s budget per device execution, so every measurement
here is an IN-PROGRAM `lax.fori_loop` of `reps` iterations inside one jit,
with the loop body depending on the loop index (defeats XLA loop-invariant
hoisting) and the result value-fetched to host (block_until_ready alone
returns at RPC resolve, before compute finishes).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from cbgbench_tpu.data.batch import synthetic_batch
from cbgbench_tpu.models.targetdiff import TargetDiff


def timed_loop(fn, reps):
    """fn(i) -> array. Returns ms per iteration, measured in-program."""

    @jax.jit
    def run():
        def body(i, acc):
            return acc + jnp.sum(fn(i).astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(run())                       # compile + warm
    t0 = time.perf_counter()
    v = float(run())
    dt = time.perf_counter() - t0
    assert jnp.isfinite(v)
    return dt / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=512)
    ap.add_argument("--lig", type=int, default=64)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--impls", default="xla,pallas,pallas_pre,pallas2")
    ap.add_argument("--f32", action="store_true",
                    help="f32 compute (default bf16, matching bench.py)")
    ap.add_argument("--components", action="store_true")
    args = ap.parse_args()

    b, n, k = args.batch, args.nodes, args.k
    lig_cap = args.lig
    rec_cap = n - lig_cap
    d = 128

    batch = synthetic_batch(0, batch_size=b, n_lig=lig_cap - 2,
                            n_rec=rec_cap - 8, num_atom_types=13,
                            lig_cap=lig_cap, rec_cap=rec_cap)
    rng = jax.random.PRNGKey(0)
    t0 = jnp.full((b,), 500, jnp.int32)

    base = TargetDiff(num_classes=13, num_timesteps=1000, emb_dim=d,
                      num_layers=9, n_heads=16, k=k, bf16=not args.f32)
    params = jax.jit(base.init)(rng, batch, t0, rng)
    c_lig = jax.nn.one_hot(batch.ligand.atype, 13)
    x_lig = batch.ligand.pos

    print(f"[B,N,K,D] = [{b},{n},{k},{d}]  backend="
          f"{jax.devices()[0].platform}  reps={args.reps}")

    for impl in args.impls.split(","):
        model = base.clone(impl=impl)

        def fwd(i, model=model):
            t = (t0 + i) % 1000
            x = x_lig + 1e-6 * i
            out = model.apply(params, x, c_lig, batch, t, method="denoise")
            return out[0]

        ms = timed_loop(fwd, args.reps)
        print(f"denoise fwd  impl={impl:11s}: {ms:8.2f} ms")

    if args.components:
        from cbgbench_tpu.ops.knn import (gather_neighbors, knn_neighbors,
                                          pairwise_sqdist)

        pos = jax.random.normal(rng, (b, n, 3)) * 5
        mask = jnp.ones((b, n), bool)
        h2d = jax.random.normal(rng, (b, n, 2 * d)).astype(jnp.bfloat16)
        idx, valid = jax.jit(
            lambda p, m: knn_neighbors(p, m, k))(pos, mask)

        comps = {
            "knn_neighbors": lambda i: knn_neighbors(
                pos + 1e-6 * i, mask, k)[0],
            "pairwise_sqdist": lambda i: pairwise_sqdist(pos + 1e-6 * i),
            "topk_only": lambda i: jax.lax.top_k(
                -(pairwise_sqdist(pos) + i * 0.0), k)[1],
            "gather[N,2D]bf16": lambda i: gather_neighbors(
                h2d + jnp.bfloat16(i * 0), idx),
            "gather[N,3]f32": lambda i: gather_neighbors(
                pos + 1e-6 * i, idx),
        }
        for name, fn in comps.items():
            ms = timed_loop(fn, args.reps)
            print(f"component    {name:16s}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
