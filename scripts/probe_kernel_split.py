"""Decompose the pre5 kernel's per-call cost on real hardware.

Builds three throwaway kernel variants sharing pre5's exact inputs/specs:
  full       — the shipping pre5 kernel (gather + edge MLP + tail)
  edges_only — gather + src/edge projections, tail replaced by a cheap
               slice-reduce (isolates the MXU edge phase)
  tail_only  — gather skipped (z = ef @ we only), full tail
  gather_only— just the in-VMEM one-hot gather + a slice-reduce
so (full - edges_only) ~ tail cost, (full - tail_only) ~ gather+proj
cost. In-program fori_loop timing (see profile_step.py platform notes).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cbgbench_tpu.ops.pallas_edge_attn import _attn_tail


def make_kernel(stop: str, *, mode, n_src, k_nb, heads):
    def kern(hn_ref, idx_ref, ef_ref, valid_ref, ew_ref,
             relx_ref, q_ref, tdst_ref, ws_ref, we_ref,
             ln_ref, w2k_ref, b2k_ref, w2v_ref, b2v_ref, out_ref):
        f32 = jnp.float32
        tile_n = q_ref.shape[1]
        e = tile_n * k_nb
        d = ws_ref.shape[0]

        if stop == "noop":
            # touch nothing: isolates input-block DMA + program overhead
            out_ref[0] = jnp.zeros((tile_n, out_ref.shape[2]), f32)
            return
        if stop in ("full", "edges_only", "gather_only"):
            idx = idx_ref[0]
            cols = jax.lax.broadcasted_iota(jnp.int32, (e, n_src), 1)
            oh = (idx == cols).astype(jnp.bfloat16)
            hnb = jnp.dot(oh, hn_ref[0],
                          preferred_element_type=f32).astype(jnp.bfloat16)
            if stop == "gather_only":
                out_ref[0] = hnb.astype(f32).reshape(
                    tile_n, k_nb, d)[:, 0, :]
                return
            z = jnp.dot(hnb, ws_ref[:], preferred_element_type=f32)
            z = z + jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                            preferred_element_type=f32)
        else:  # tail_only: no gather, cheap z
            z = jnp.dot(ef_ref[0].astype(jnp.bfloat16), we_ref[:],
                        preferred_element_type=f32)

        if stop == "edges_only":
            out_ref[0] = z.reshape(tile_n, k_nb, 2 * d)[:, 0, :d]
            return

        _attn_tail(z, valid_ref, ew_ref, relx_ref[0][:, :3].astype(f32),
                   q_ref[0], tdst_ref[0], ln_ref, w2k_ref, b2k_ref,
                   w2v_ref, b2v_ref, out_ref, mode=mode, k_nb=k_nb,
                   heads=heads)
    return kern


@functools.partial(jax.jit, static_argnames=("mode", "stop", "tile_n"))
def call(h_node, idx, edge_feat, valid, e_w, rel_x, q, t_dst, weights,
         mode="x2h", stop="full", tile_n=64):
    b, n = q.shape[0], q.shape[1]
    d = q.shape[-1]
    k_nb = idx.shape[-1]
    r = n * k_nb
    vout = weights["w2v"].shape[1]
    ef_dim = edge_feat.shape[-1]
    e = tile_n * k_nb

    idx_f = idx.reshape(b, r, 1).astype(jnp.int32)
    ef_f = edge_feat.reshape(b, r, ef_dim).astype(jnp.bfloat16)
    valid_f = valid.reshape(b, r, 1).astype(jnp.bfloat16)
    ew_f = e_w.reshape(b, r, 1).astype(jnp.bfloat16)
    relx_f = rel_x.reshape(b, r, 3).astype(jnp.float32)
    out_d = d if (mode == "x2h" or stop in ("edges_only", "gather_only")) \
        else 3
    grid = (b, n // tile_n)

    def edge_spec(c):
        return pl.BlockSpec((1, e, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def node_spec(nn_, c):
        return pl.BlockSpec((1, nn_, c), lambda bi, ti: (bi, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile_spec(c):
        return pl.BlockSpec((1, tile_n, c), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w = weights
    return pl.pallas_call(
        make_kernel(stop, mode=mode, n_src=n, k_nb=k_nb, heads=16),
        out_shape=jax.ShapeDtypeStruct((b, n, out_d), jnp.float32),
        grid=grid,
        in_specs=[
            node_spec(n, d),
            edge_spec(1), edge_spec(ef_dim), edge_spec(1), edge_spec(1),
            edge_spec(3),
            tile_spec(d), tile_spec(2 * d),
            w_spec((d, 2 * d)), w_spec((ef_dim, 2 * d)), w_spec((4, d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, vout)), w_spec((1, vout)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, out_d),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(h_node.astype(jnp.bfloat16), idx_f, ef_f, valid_f, ew_f, relx_f,
      q.astype(jnp.float32), t_dst.astype(jnp.float32),
      w["ws"].astype(jnp.bfloat16), w["we"].astype(jnp.bfloat16),
      w["ln"].astype(jnp.float32),
      w["w2k"].astype(jnp.bfloat16),
      w["b2k"].reshape(1, -1).astype(jnp.float32),
      w["w2v"].astype(jnp.bfloat16),
      w["b2v"].reshape(1, -1).astype(jnp.float32))


def timed_loop(fn, reps):
    @jax.jit
    def run():
        def body(i, acc):
            return acc + jnp.sum(fn(i).astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, 0.0)

    float(run())
    t0 = time.perf_counter()
    v = float(run())
    dt = time.perf_counter() - t0
    assert jnp.isfinite(v)
    return dt / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=512)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--tile_n", type=int, default=64)
    ap.add_argument("--stops", default="full,edges_only,tail_only,"
                    "gather_only")
    ap.add_argument("--modes", default="x2h")
    args = ap.parse_args()
    b, n, k, d = args.batch, args.nodes, args.k, 128

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 10)
    h = jax.random.normal(keys[0], (b, n, d)).astype(jnp.bfloat16)
    idx = jax.random.randint(keys[1], (b, n, k), 0, n)
    ef = jax.random.normal(keys[2], (b, n, k, 84)).astype(jnp.bfloat16)
    valid = jnp.ones((b, n, k), bool)
    ew = jax.nn.sigmoid(jax.random.normal(keys[3], (b, n, k, 1)))
    relx = jax.random.normal(keys[4], (b, n, k, 3))
    q = jax.random.normal(keys[5], (b, n, d))
    tdst = jax.random.normal(keys[6], (b, n, 2 * d))
    wx = {"ws": jax.random.normal(keys[7], (d, 2 * d)) * 0.05,
          "we": jax.random.normal(keys[8], (84, 2 * d)) * 0.05,
          "ln": jnp.ones((4, d)),
          "w2k": jax.random.normal(keys[9], (d, d)) * 0.05,
          "b2k": jnp.zeros(d),
          "w2v": jax.random.normal(keys[9], (d, d)) * 0.05,
          "b2v": jnp.zeros(d)}
    wh = dict(wx, w2v=jax.random.normal(keys[9], (d, 16)) * 0.05,
              b2v=jnp.zeros(16))

    print(f"[B,N,K,D] = [{b},{n},{k},{d}] tile={args.tile_n} "
          f"backend={jax.devices()[0].platform}")
    for mode in args.modes.split(","):
        w = wx if mode == "x2h" else wh
        for stop in args.stops.split(","):
            ms = timed_loop(
                lambda i, s=stop, m=mode, ww=w: call(
                    h + 0 * i.astype(jnp.bfloat16), idx, ef, valid, ew,
                    relx, q + 1e-6 * i, tdst, ww, mode=m, stop=s,
                    tile_n=args.tile_n),
                args.reps)
            print(f"kern[{mode}] stop={stop:12s}: {ms:8.3f} ms")


if __name__ == "__main__" and "--pre11" not in __import__("sys").argv:
    main()


def probe_pre11():
    """Standalone pre11 x2h/h2x call times (run with --pre11)."""
    import cbgbench_tpu.ops.pallas_edge_attn as pea

    b, n, k, d = 16, 512, 32, 128
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 10)
    h = jax.random.normal(keys[0], (b, n, d)).astype(jnp.bfloat16)
    ep = jax.random.normal(keys[1], (b, n, k, pea.EP_LANES)).astype(
        jnp.bfloat16)
    q = jax.random.normal(keys[5], (b, n, d))
    tdst = jax.random.normal(keys[6], (b, n, 2 * d))
    wx = {"ws": jax.random.normal(keys[7], (d, 2 * d)) * 0.05,
          "we": jax.random.normal(keys[8], (84, 2 * d)) * 0.05,
          "ln": jnp.ones((4, d)),
          "w2k": jax.random.normal(keys[9], (d, d)) * 0.05,
          "b2k": jnp.zeros(d),
          "w2v": jax.random.normal(keys[9], (d, d)) * 0.05,
          "b2v": jnp.zeros(d)}
    wh = dict(wx, w2v=jax.random.normal(keys[9], (d, 16)) * 0.05,
              b2v=jnp.zeros(16))
    for mode, w in (("x2h", wx), ("h2x", wh)):
        ms = timed_loop(
            lambda i, m=mode, ww=w: pea.edge_attention_pre11(
                h, ep, q + 1e-6 * i, tdst, ww, mode=m), 100)
        print(f"pre11 call [{mode}]: {ms:8.3f} ms")


if __name__ == "__main__" and "--pre11" in __import__("sys").argv:
    probe_pre11()
    raise SystemExit(0)
