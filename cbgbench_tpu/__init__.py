"""CBGBench-TPU: a TPU-native framework for structure-based drug design.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CBGBench
(EDAPINENUT/CBGBench): generative "fill-in-the-blank" models over
protein-ligand complexes (de novo design, linker design, fragment growing,
scaffold hopping, side-chain decoration) plus the evaluation stack.

Design stance (TPU-first, not a port):
  * fixed-shape padded pocket batches ``[B, N, ...]`` instead of PyG flat
    graphs with batch-index vectors;
  * dense masked top-k kNN + ``[B, N, K]`` neighbor attention instead of
    torch_cluster/torch_scatter CUDA kernels;
  * ``lax.scan`` over diffusion time instead of Python sampling loops;
  * ``jax.sharding`` + ``shard_map`` over a device mesh instead of (absent
    in the reference) DDP;
  * stateless pytree schedulers with precomputed tables.
"""

__version__ = "0.1.0"
