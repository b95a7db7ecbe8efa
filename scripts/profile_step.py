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
        from cbgbench_tpu.ops.pallas_edge_attn import (edge_attention_pre,
                                                       edge_attention_pre3,
                                                       edge_attention_pre4)
        from cbgbench_tpu.ops.rbf import GaussianSmearingTable
        from cbgbench_tpu.nn.common import outer_product

        pos = jax.random.normal(rng, (b, n, 3)) * 5
        mask = jnp.ones((b, n), bool)
        h1d = jax.random.normal(rng, (b, n, d)).astype(jnp.bfloat16)
        h2d = jax.random.normal(rng, (b, n, 2 * d)).astype(jnp.bfloat16)
        ws = jax.random.normal(rng, (d, 2 * d)).astype(jnp.bfloat16)
        idx, valid = jax.jit(
            lambda p, m: knn_neighbors(p, m, k))(pos, mask)

        # kernel-direct inputs at the pallas_pre/pre3 contract
        keys = jax.random.split(rng, 12)
        tsrc = jax.random.normal(keys[0], (b, n, k, 2 * d)).astype(
            jnp.bfloat16)
        ef84 = jax.random.normal(keys[1], (b, n, k, 84)).astype(jnp.bfloat16)
        ea4 = jax.nn.one_hot(
            jax.random.randint(keys[2], (b, n, k), 0, 4), 4)
        eww = jax.nn.sigmoid(jax.random.normal(keys[3], (b, n, k, 1)))
        relx = jax.random.normal(keys[4], (b, n, k, 3))
        qq = jax.random.normal(keys[5], (b, n, d))
        tdst = jax.random.normal(keys[6], (b, n, 2 * d))
        wpre = {"we": jax.random.normal(keys[7], (84, 2 * d)) * 0.05,
                "ln": jnp.ones((4, d)),
                "w2k": jax.random.normal(keys[8], (d, d)) * 0.05,
                "b2k": jnp.zeros(d),
                "w2v": jax.random.normal(keys[9], (d, d)) * 0.05,
                "b2v": jnp.zeros(d)}
        w3 = {"wea": jax.random.normal(keys[10], (4, 2 * d)) * 0.05,
              "web": jax.random.normal(keys[11], (80, 2 * d)) * 0.05,
              "ln": jnp.ones((4, d)), "w2k": wpre["w2k"],
              "b2k": wpre["b2k"], "w2v": wpre["w2v"], "b2v": wpre["b2v"]}
        w3h = dict(w3, w2v=jax.random.normal(keys[9], (d, 16)) * 0.05,
                   b2v=jnp.zeros(16))
        wpreh = dict(wpre, w2v=w3h["w2v"], b2v=w3h["b2v"])
        hnb = jax.random.normal(keys[0], (b, n, k, d)).astype(jnp.bfloat16)
        w4 = dict(wpre, ws=ws)
        rbf_t = GaussianSmearingTable(0.0, 10.0, 20)

        def edge_feat_build(i):
            rel = pos[..., :, None, :] - gather_neighbors(pos + 1e-6 * i,
                                                          idx)
            dist = jnp.sqrt(jnp.sum(rel * rel, -1, keepdims=True) + 1e-12)
            rbf = rbf_t(dist)
            return jnp.concatenate([ea4, outer_product(ea4, rbf)],
                                   -1).astype(jnp.bfloat16)

        def vary(x, i):
            return x + jnp.asarray(i, x.dtype) * jnp.asarray(0, x.dtype)

        comps = {
            "knn_neighbors": lambda i: knn_neighbors(
                pos + 1e-6 * i, mask, k)[0],
            "pairwise_sqdist": lambda i: pairwise_sqdist(pos + 1e-6 * i),
            "gather[N,2D]bf16": lambda i: gather_neighbors(
                vary(h2d, i), idx),
            "gather[N,D]bf16": lambda i: gather_neighbors(
                vary(h1d, i), idx),
            "gather[N,3]f32": lambda i: gather_neighbors(
                pos + 1e-6 * i, idx),
            "proj+gather(pre)": lambda i: gather_neighbors(
                vary(h1d, i) @ ws, idx),
            "edge_feat_84": edge_feat_build,
            "kern_pre_x2h": lambda i: edge_attention_pre(
                vary(tsrc, i), ef84, valid, eww, relx, qq, tdst, wpre,
                mode="x2h"),
            "kern_pre_h2x": lambda i: edge_attention_pre(
                vary(tsrc, i), ef84, valid, eww, relx, qq, tdst, wpreh,
                mode="h2x"),
            "kern_pre3_x2h": lambda i: edge_attention_pre3(
                vary(tsrc, i), valid, ea4, eww, relx, qq, tdst, w3,
                mode="x2h"),
            "kern_pre4_x2h": lambda i: edge_attention_pre4(
                vary(hnb, i), ef84, valid, eww, relx, qq, tdst, w4,
                mode="x2h"),
            "kern_pre4_t128": lambda i: edge_attention_pre4(
                vary(hnb, i), ef84, valid, eww, relx, qq, tdst, w4,
                mode="x2h", tile_n=128),
        }
        for name, fn in comps.items():
            try:
                ms = timed_loop(fn, args.reps)
            except Exception as e:                       # noqa: BLE001
                print(f"component    {name:16s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"component    {name:16s}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
