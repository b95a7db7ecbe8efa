"""Headline benchmark: de novo sampling throughput (molecules/sec/chip).

Protocol mirrors the reference sampler (sample.py:108, configs/denovo/test/
targetdiff.yml): batch of 16 molecules per pocket, 1000 denoising steps of
the full-size TargetDiff model (128 dim, 9 layers, k=32) on a realistic
pocket bucket (64 ligand + 448 receptor slots = 512 composed nodes).

Baseline: the reference repo records no numbers in-tree (BASELINE.md). The
PyTorch TargetDiff pipeline on an A100 samples ~100 molecules in ~20 min
(~0.083 mol/s) per the TargetDiff paper's protocol; that constant is the
vs_baseline denominator until a measured reference number replaces it.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_PYTORCH_MOLS_PER_SEC = 0.083  # see module docstring

BATCH = 16
LIG_CAP = 64
REC_CAP = 448
T = 1000


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

    # compile + warmup (sample_targetdiff hosts its own chunked dispatch —
    # the platform enforces a per-execution wall-clock budget, so the T-step
    # scan runs as jitted chunks)
    out = sample_targetdiff(model, params, batch, rng)
    out["pos"].block_until_ready()

    # timed run
    n_rep = 1
    start = time.perf_counter()
    for i in range(n_rep):
        out = sample_targetdiff(model, params, batch, jax.random.fold_in(rng, i))
    out["pos"].block_until_ready()
    dt = (time.perf_counter() - start) / n_rep

    mols_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "denovo_sampling_throughput",
        "value": round(mols_per_sec, 4),
        "unit": "molecules/sec/chip",
        "vs_baseline": round(mols_per_sec / A100_PYTORCH_MOLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
