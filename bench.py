"""Headline benchmark: de novo sampling throughput (molecules/sec/chip).

Protocol mirrors the reference sampler (sample.py:108, configs/denovo/test/
targetdiff.yml): batch of 16 molecules per pocket, 1000 denoising steps of
the full-size TargetDiff model (128 dim, 9 layers, k=32) on a realistic
pocket bucket (64 ligand + 448 receptor slots = 512 composed nodes).

Baseline: the reference repo records no numbers in-tree (BASELINE.md). The
PyTorch TargetDiff pipeline on an A100 samples ~100 molecules in ~20 min
(~0.083 mol/s) per the TargetDiff paper's protocol; that constant is the
vs_baseline denominator until a measured reference number replaces it.

Self-validation (round-2 hardening — BENCH_r01 recorded a physically
impossible 17.28 mol/s because `block_until_ready` on the remote platform
returns before compute finishes):
  * >=3 timed reps; the timed region ends in an actual device->host VALUE
    fetch of every rep's result (np.asarray) — data cannot arrive before
    compute completes. Reps are dispatched back-to-back (pipelined, like
    the protocol sampler's consecutive per-pocket batches) so the number
    is sustained throughput; see the timed-region comment.
  * outputs must be finite and must differ between reps (rng-dependent).
  * analytic FLOPs/step is printed, and the implied sustained TFLOP/s must
    not exceed any single chip's bf16 peak — exceeding it exits non-zero.

Prints ONE json line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_PYTORCH_MOLS_PER_SEC = 0.083  # see module docstring

BATCH = 16
LIG_CAP = 64
REC_CAP = 448
T = 1000
N_REP = 3
CHUNK = 500  # 500 x ~19 ms = ~10 s per execution, 6x under the 60 s budget;
             # chunk boundaries cost ~250 ms each on the remote tunnel
             # (r4 measured: 0.7944 -> 0.8108 mol/s going 250 -> 500;
             # 1000 gains only +0.001 and halves the budget margin)

# Generous single-chip dense-bf16 ceiling (v6e ~918 TFLOP/s is the largest
# current chip); sustained throughput above this means the timer lied.
SINGLE_CHIP_PEAK_TFLOPS = 950.0


def _analytic_flops_per_step(n_layers=9, d=128, n=LIG_CAP + REC_CAP,
                             k=32, b=BATCH, ff=None):
    """Dominant matmul FLOPs of one denoise step (lower bound, documented
    so the sanity gate is auditable).

    Per layer: 2 one-hot neighbor gathers ([B,N,K,N]@[N,D] each) plus the
    edge/key/value/message MLPs over [B,N,K] edges (~3 matmuls of D x D
    each side) plus node MLPs. Elementwise work is ignored (the gate only
    needs a lower bound).
    """
    gather = 2 * (2.0 * b * n * k * n * d)              # one-hot matmuls
    edge_mlp = 6 * (2.0 * b * n * k * d * d)            # edge-path matmuls
    node_mlp = 4 * (2.0 * b * n * d * d)                # node-path matmuls
    return n_layers * (gather + edge_mlp + node_mlp)


def main():
    from cbgbench_tpu.data.batch import synthetic_batch
    from cbgbench_tpu.models.targetdiff import TargetDiff, sample_targetdiff

    model = TargetDiff(num_classes=13, num_timesteps=T, emb_dim=128,
                       num_layers=9, n_heads=16, k=32, bf16=True)
    batch = synthetic_batch(0, batch_size=BATCH, n_lig=24, n_rec=360,
                            num_atom_types=13, lig_cap=LIG_CAP,
                            rec_cap=REC_CAP)
    rng = jax.random.PRNGKey(0)
    t0 = jnp.zeros((BATCH,), jnp.int32)
    params = jax.jit(model.init)(rng, batch, t0, rng)

    # FLOPs per step: prefer the compiler's own count, fall back to the
    # analytic formula above.
    flops_step = None
    try:
        from cbgbench_tpu.models.targetdiff import _sample_chunk
        c_in = jax.nn.one_hot(batch.ligand.atype, model.num_classes)
        t_arr = jnp.arange(T - 1, T - 1 - CHUNK, -1, dtype=jnp.int32)
        # unit_stride=True: cost-model the exact program the full-T
        # protocol sampler compiles (table-based unit steps)
        lowered = _sample_chunk.lower(
            model, params, batch, (batch.ligand.pos, c_in, rng),
            t_arr, t_arr - 1, unit_stride=True)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            # XLA counts a while/scan body ONCE, so this is flops for one
            # step, not CHUNK steps (measured: 0.015e12 here ~= the
            # analytic per-step value / 100 — i.e. body counted once).
            flops_step = float(cost["flops"]) / CHUNK
            print(f"# flops/step (XLA cost model / CHUNK): "
                  f"{flops_step/1e12:.3f} TFLOP", file=sys.stderr)
    except Exception as e:  # remote-compile platforms may not expose this
        print(f"# cost_analysis unavailable ({type(e).__name__}); using "
              "analytic formula", file=sys.stderr)
    analytic = _analytic_flops_per_step()
    print(f"# flops/step (analytic lower bound): {analytic/1e12:.3f} TFLOP",
          file=sys.stderr)
    # Gate on the larger of the two so the peak check stays meaningful even
    # where the cost model under-counts (scan-body ambiguity, fused gathers).
    flops_step = max(flops_step or 0.0, analytic)

    # compile + warmup (sample_targetdiff hosts its own chunked dispatch —
    # the platform enforces a per-execution wall-clock budget, so the T-step
    # scan runs as jitted chunks)
    # sync_chunks=False queues chunk dispatches behind the in-flight
    # execution (each execution stays one CHUNK long); measured +0.3%
    warm = sample_targetdiff(model, params, batch, rng, chunk_size=CHUNK,
                             sync_chunks=False)
    warm_pos = np.asarray(warm["pos"])  # value fetch = true barrier
    assert np.isfinite(warm_pos).all(), "warmup produced non-finite pos"

    # timed reps, PIPELINED: dispatch all reps back-to-back (the protocol
    # sampler's per-pocket batches queue the same way — 100 molecules =
    # ~7 consecutive batches), then value-fetch each. Earlier reps'
    # device->host fetches overlap later reps' compute, so the region
    # measures sustained throughput rather than single-batch latency
    # (the serial fetch+dispatch boundary cost ~1.5% per rep). Every
    # execution is still one CHUNK long, so the per-execution wall-clock
    # budget is untouched, and the region still ends in N_REP true value
    # fetches — compute cannot finish after the timer stops.
    start = time.perf_counter()
    outs = [sample_targetdiff(model, params, batch,
                              jax.random.fold_in(rng, i + 1),
                              chunk_size=CHUNK, sync_chunks=False)
            for i in range(N_REP)]
    rep_pos = [np.asarray(out["pos"]) for out in outs]
    dt = (time.perf_counter() - start) / N_REP

    # -- validation ---------------------------------------------------
    for i, p in enumerate(rep_pos):
        assert np.isfinite(p).all(), f"rep {i}: non-finite positions"
    for i in range(1, N_REP):
        diff = float(np.abs(rep_pos[i] - rep_pos[0]).max())
        assert diff > 1e-6, (
            f"rep {i} identical to rep 0 (max|diff|={diff}); outputs do "
            "not depend on the rng — the benchmark is not running real "
            "sampling")

    steps_per_sec = T / dt
    implied_tflops = flops_step * steps_per_sec / 1e12
    mols_per_sec = BATCH / dt
    print(f"# {N_REP} reps, {dt:.3f} s/rep, {steps_per_sec:.1f} denoise "
          f"steps/s, implied {implied_tflops:.1f} TFLOP/s sustained",
          file=sys.stderr)

    if implied_tflops > SINGLE_CHIP_PEAK_TFLOPS:
        print(f"FATAL: implied {implied_tflops:.0f} TFLOP/s exceeds any "
              f"single chip's bf16 peak ({SINGLE_CHIP_PEAK_TFLOPS:.0f}); "
              "the timed region is not synchronizing with device compute.",
              file=sys.stderr)
        raise SystemExit(2)

    print(json.dumps({
        "metric": "denovo_sampling_throughput",
        "value": round(mols_per_sec, 4),
        "unit": "molecules/sec/chip",
        "vs_baseline": round(mols_per_sec / A100_PYTORCH_MOLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
