"""TargetDiff: joint Gaussian-coordinate + categorical atom-type diffusion.

TPU-native rebuild of the reference TargetDiff
(reference: repo/models/diffusion/targetdiff.py:14-184): protein context is
frozen, generated ligand atoms diffuse in position (CTNVP, x0 "denoise"
parameterization) and type (D3PM TypeVP). The denoiser is the
UniTransformer dual attention stack over the composed pocket graph.

Sampling runs the full T-step reverse process as one ``lax.scan`` under
jit — the whole trajectory stays on device (the reference's per-step
Python loop with CPU offload is the throughput bottleneck it replaces).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import CTNVPScheduler, TypeVPScheduler
from ..nn.embedders import (PLContextEmbedder, aa_onehot,
                            protein_atom_features)
from ..nn.unitransformer import UniTransformer
from ..utils.registry import MODELS
from ._base import sample_time


class TargetDiff(nn.Module):
    num_classes: int = 13
    num_timesteps: int = 1000
    denoise_structure: bool = True
    denoise_atom: bool = True
    time_sampler: str = "symmetric"
    # embedder
    emb_dim: int = 128
    time_kind: Optional[str] = None
    # denoiser
    num_layers: int = 9
    n_heads: int = 16
    k: int = 32
    r_max: float = 10.0
    # schedules
    pos_beta_start: float = 1e-7
    pos_beta_end: float = 2e-3
    pos_schedule: str = "sigmoid"
    atom_schedule: str = "cosine"
    atom_cosine_s: float = 0.01
    # loss
    loss_weight_pos: float = 1.0
    loss_weight_atom: float = 100.0
    # compute precision of the denoiser's edge MLPs / attention
    bf16: bool = False
    # neighbor-gather backend: 'auto' | 'pallas' | 'onehot'
    gather_method: str = "auto"
    # denoiser implementation: 'xla' (differentiable) | 'pallas' (fused
    # forward-only TPU kernels; sampling path)
    impl: str = "xla"

    @classmethod
    def from_config(cls, cfg) -> "TargetDiff":
        gen = cfg["generator"]
        enc = cfg["encoder"]
        emb = cfg.get("embedder", {})
        return cls(
            num_classes=cfg["num_atomtype"],
            num_timesteps=gen["num_diffusion_timesteps"],
            denoise_structure=gen.get("denoise_structure", True),
            denoise_atom=gen.get("denoise_atom", True),
            time_sampler=gen.get("time_sampler", "symmetric"),
            emb_dim=emb.get("emb_dim", 128),
            time_kind=(emb.get("time", {}) or {}).get("type")
            if emb.get("time") else None,
            num_layers=enc.get("num_layers", 9),
            n_heads=enc.get("n_heads", 16),
            k=enc.get("k", 32),
            r_max=enc.get("r_max", 10.0),
            pos_beta_start=gen["pos_schedule"].get("beta_start", 1e-7),
            pos_beta_end=gen["pos_schedule"].get("beta_end", 2e-3),
            pos_schedule=gen["pos_schedule"].get("type", "sigmoid"),
            atom_schedule=gen["atom_schedule"].get("type", "cosine"),
            atom_cosine_s=gen["atom_schedule"].get("cosine_s", 0.01),
            loss_weight_pos=cfg.get("loss_weights", {}).get("pos", 1.0),
            loss_weight_atom=cfg.get("loss_weights", {}).get("atom", 100.0),
            bf16=cfg.get("bf16", False),
            gather_method=cfg.get("gather_method", "auto"),
        )

    def setup(self):
        self.pos_scheduler = CTNVPScheduler.create(
            self.num_timesteps, self.pos_beta_start, self.pos_beta_end,
            self.pos_schedule)
        self.type_scheduler = TypeVPScheduler.create(
            self.num_timesteps, self.num_classes, self.atom_schedule,
            cosine_s=self.atom_cosine_s)
        self.embedder = PLContextEmbedder(
            emb_dim=self.emb_dim, num_atom_classes=self.num_classes,
            time_kind=self.time_kind)
        self.denoiser = UniTransformer(
            num_classes=self.num_classes, num_layers=self.num_layers,
            hidden_dim=self.emb_dim, n_heads=self.n_heads, k=self.k,
            r_max=self.r_max,
            dtype=jnp.bfloat16 if self.bf16 else None,
            gather_method=self.gather_method, impl=self.impl)

    # ------------------------------------------------------------------

    def _denoise(self, x_lig, c_lig, batch, t, knn_cache=None):
        """Embed + compose + run the denoiser; return ligand-slice preds.
        knn_cache: optional receptor-block kNN candidates
        (ops.knn.knn_static_candidates) — samplers precompute them once
        per run since receptor atoms never move."""
        lig, rec = batch.ligand, batch.protein
        nl = lig.capacity
        v_rec = protein_atom_features(rec.element, rec.is_backbone)
        aa = aa_onehot(rec.aa)
        h_lig, h_rec = self.embedder(c_lig, v_rec, aa, lig.mask, rec.mask, t)

        x = jnp.concatenate([x_lig, rec.pos], axis=1)
        h = jnp.concatenate([h_lig, h_rec], axis=1)
        mask = jnp.concatenate([lig.mask, rec.mask], axis=1)
        lig_flag = jnp.concatenate([lig.mask, jnp.zeros_like(rec.mask)], 1)
        gen_flag = jnp.concatenate([lig.gen_flag, jnp.zeros_like(rec.mask)], 1)

        x_out, _, c_out = self.denoiser(x, h, mask, lig_flag, gen_flag, n_lig=nl,
                                    knn_cache=knn_cache)
        return x_out[:, :nl], c_out[:, :nl]

    def get_loss(self, batch, t, rng) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        lig = batch.ligand
        k_pos, k_type = jax.random.split(rng)
        x0, v0, gen = lig.pos, lig.atype, lig.gen_flag & lig.mask

        if self.denoise_structure:
            x_t, _ = self.pos_scheduler.forward_add_noise(k_pos, x0, t, gen)
        else:
            x_t = x0
        if self.denoise_atom:
            c_t, v_t = self.type_scheduler.forward_add_noise(k_type, v0, t, gen)
        else:
            c_t = jax.nn.one_hot(v0, self.num_classes)
            v_t = v0

        x_pred, c_pred = self._denoise(x_t, c_t, batch, t)

        results = {}
        if self.denoise_structure:
            loss_pos, pos_info = self.pos_scheduler.get_loss(
                x_pred, x0, x_t, t, gen, pred_type="denoise")
            results.update(pos_info)
        else:
            loss_pos = jnp.zeros(())
        if self.denoise_atom:
            loss_atom, atom_info = self.type_scheduler.get_loss(
                c_pred, v0, v_t, t, gen)
            results.update(atom_info)
        else:
            loss_atom = jnp.zeros(())

        return {"pos": loss_pos, "atom": loss_atom}, results

    def __call__(self, batch, t, rng):
        """Training forward (used for init + train step)."""
        return self.get_loss(batch, t, rng)

    def weighted_loss(self, loss_dict):
        return (self.loss_weight_pos * loss_dict["pos"]
                + self.loss_weight_atom * loss_dict["atom"])

    def eval_loss(self, batch, rng, eval_interval: int = 10):
        """Validation: average loss over `eval_interval` fixed timesteps
        (reference: targetdiff.py:64-80)."""
        b = batch.ligand.pos.shape[0]
        import numpy as np
        times = np.linspace(0, self.num_timesteps - 1, eval_interval)
        total = {"pos": 0.0, "atom": 0.0}
        last_results = None
        for i, tv in enumerate(times):
            t = jnp.full((b,), int(round(float(tv))), jnp.int32)
            ld, last_results = self.get_loss(batch, t, jax.random.fold_in(rng, i))
            total = {k: total[k] + ld[k] / len(times) for k in total}
        return total, last_results

    def denoise(self, x_lig, c_lig, batch, t, knn_cache=None):
        """Public denoiser step for samplers: apply(params, ..., method='denoise')."""
        return self._denoise(x_lig, c_lig, batch, t, knn_cache=knn_cache)


@functools.partial(jax.jit, static_argnames=("model", "with_traj", "eta",
                                             "unit_stride"))
def _sample_chunk(model: TargetDiff, params, batch, carry, t_arr, s_arr,
                  with_traj: bool = False, eta: float = 1.0,
                  unit_stride: bool = True):
    """Scan reverse-diffusion jumps t_arr[i] -> s_arr[i] (s = -1 means
    decode to clean x0). unit_stride=True uses the precomputed unit-step
    posterior tables (bitwise the full-T DDPM loop; the on-the-fly
    abar_t/abar_s ratio loses ~0.3% to f32 cancellation when the stride
    is a single small-beta step). A strided t_arr is fast sampling
    (strided ancestral at eta=1, DDIM at eta=0) — long jumps are
    well-conditioned, so the closed-form ratio is exact there. One
    compiled program serves every chunk of the same length (t_arr/s_arr
    are traced); the host loop in sample_targetdiff re-dispatches so no
    single device program exceeds the platform's per-execution budget."""
    lig = batch.ligand
    gen = lig.gen_flag & lig.mask
    pos_sched = CTNVPScheduler.create(
        model.num_timesteps, model.pos_beta_start, model.pos_beta_end,
        model.pos_schedule)
    type_sched = TypeVPScheduler.create(
        model.num_timesteps, model.num_classes, model.atom_schedule,
        cosine_s=model.atom_cosine_s)
    # Receptor atoms never move during sampling: hoist their kNN block
    # out of the scan (knn_neighbors_cached merges these candidates with
    # the 64 moving ligand columns each step — exact, measured 0.76 ->
    # ~0.3 ms/step at [16,512]).
    rec = batch.protein
    knn_cache = None
    if rec.capacity > model.k:
        from ..ops.knn import knn_static_candidates
        knn_cache = knn_static_candidates(rec.pos, rec.mask, model.k)

    def step(carry, t_s):
        x, c, key = carry
        t_i, s_i = t_s
        key, k1, k2 = jax.random.split(key, 3)
        b = x.shape[0]
        t = jnp.full((b,), t_i, jnp.int32)
        s = jnp.full((b,), s_i, jnp.int32)
        x_pred, c_pred = model.apply(params, x, c, batch, t,
                                     knn_cache, method="denoise")
        if model.denoise_structure:
            if unit_stride:
                x_next = pos_sched.backward_remove_noise(
                    k1, x_pred, x, t, gen, pred_type="denoise")
            else:
                x_next = pos_sched.backward_strided(k1, x_pred, x, t, s,
                                                    gen, eta=eta)
        else:
            x_next = x
        if model.denoise_atom:
            if unit_stride:
                c_next, _ = type_sched.backward_remove_noise(k2, c_pred, c,
                                                             t, gen)
            else:
                c_next, _ = type_sched.backward_strided(k2, c_pred, c, t, s,
                                                        gen)
        else:
            c_next = c
        return (x_next, c_next, key), (x_next if with_traj else None)

    carry, ys = jax.lax.scan(step, carry, (t_arr, s_arr))
    return (carry, ys) if with_traj else carry



def _resolve_impl(model, impl, n_nodes: int = 0):
    """'auto' -> fused Pallas kernels on TPU backends, XLA elsewhere;
    returns a (possibly cloned) model whose denoiser uses that impl.

    Round-4 measurement (v5e, 50-rep in-program timing, [16,N,32,128],
    BASELINE.md kernel ladder): 'pallas_pre11' — pre5's in-VMEM one-hot
    gather plus ALL narrow per-edge inputs packed into spare lanes of
    the edge-feature tensor (each [B,E,c<128] operand is lane-padded to
    128 by the TPU tiled layout: the pre5 input set cost ~470 MB of DMA
    per call carrying <40 MB of payload; kernel-split probe: a no-op
    kernel with pre5's in_specs costs 0.84 of the 1.06 ms call) — 21.55
    vs pre5's 23.13 at N=512. Documented negatives: pre6 full fusion
    34.7; pre8 grouped gather 27.7; pre9 hand-scheduled tail flat; pre10
    (same pack, built in the wrapper instead of the layer concat) 32.6."""
    if impl == "auto":
        from ..ops.pallas_edge_attn import edge_attn_available
        if edge_attn_available():
            impl = "pallas_pre11"
        else:
            impl = model.impl
    if impl and impl != model.impl:
        model = model.clone(impl=impl)
    return model


def sample_timesteps(total: int, num_steps=None) -> np.ndarray:
    """Decreasing timestep subsequence ending at 0. num_steps None/>=total
    gives the full unit-stride ladder; otherwise ~num_steps evenly spaced
    indices (deduplicated after rounding, so the count can be slightly
    lower)."""
    if num_steps is None or num_steps >= total:
        return np.arange(total - 1, -1, -1, dtype=np.int32)
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps} "
                         "(0 would return the untouched prior)")
    ts = np.round(np.linspace(0, total - 1, int(num_steps)))
    return np.unique(ts.astype(np.int32))[::-1].copy()


def sample_targetdiff(model: TargetDiff, params, batch, rng,
                      chunk_size: int = 250, impl: str = "auto",
                      traj_stride: int = 0, num_steps=None,
                      eta: float = 1.0, sync_chunks: bool = True):
    """Reverse diffusion, host-chunked.

    Starts from the prior already placed in batch.ligand (pos ~ pocket
    prior, atype ~ uniform). Each chunk is one fused lax.scan program
    (reused across same-length chunks); the trajectory stays on device —
    the reference's per-step Python loop with CPU offload
    (targetdiff.py:181) is the throughput bottleneck this replaces.

    num_steps < num_timesteps enables fast sampling over a strided
    timestep subsequence: eta=1 (default) is strided ancestral DDPM,
    eta=0 deterministic DDIM (positions; types always use the strided
    categorical posterior). num_steps=None keeps the reference's full-T
    protocol and reproduces the unit-step loop exactly.

    traj_stride > 0 additionally returns 'traj_pos' [S, B, N, 3]: every
    traj_stride-th intermediate position (the reference's `traj` dict,
    collected on device per chunk instead of offloaded per step)."""
    n_nodes = batch.ligand.capacity + batch.protein.capacity
    model = _resolve_impl(model, impl, n_nodes)
    lig = batch.ligand
    c_in = jax.nn.one_hot(lig.atype, model.num_classes)
    carry = (lig.pos, c_in, rng)
    ts = sample_timesteps(model.num_timesteps, num_steps)
    ss = np.append(ts[1:], np.int32(-1)).astype(np.int32)
    # the exact-table unit-step path never reads eta, so a DDIM request
    # (eta != 1) must use the strided math even on a full-T ladder
    unit_stride = len(ts) == model.num_timesteps and eta == 1.0
    chunk = min(chunk_size, len(ts))
    traj = []
    lo = 0
    step_in_traj = 0
    while lo < len(ts):
        n = min(chunk, len(ts) - lo)
        t_arr = jnp.asarray(ts[lo:lo + n])
        s_arr = jnp.asarray(ss[lo:lo + n])
        if traj_stride > 0:
            carry, ys = _sample_chunk(model, params, batch, carry,
                                      t_arr, s_arr, with_traj=True, eta=eta,
                                      unit_stride=unit_stride)
            # global stride across chunk boundaries
            first = (-step_in_traj) % traj_stride
            traj.append(np.asarray(ys[first::traj_stride]))
            step_in_traj += n
        else:
            carry = _sample_chunk(model, params, batch, carry, t_arr, s_arr,
                                  eta=eta, unit_stride=unit_stride)
        # Synchronize between chunks: keeps each device RPC short (the
        # platform enforces a per-execution wall-clock budget).
        # sync_chunks=False queues the next chunk's dispatch behind the
        # in-flight one instead (each EXECUTION stays one chunk long, so
        # the per-execution budget still holds) — hides the ~250 ms
        # dispatch round trip per boundary on the remote tunnel.
        if sync_chunks:
            jax.block_until_ready(carry[0])
        lo += n
    x_fin, c_fin, _ = carry
    out = {"pos": x_fin, "atype": jnp.argmax(c_fin, -1), "c": c_fin}
    if traj_stride > 0:
        out["traj_pos"] = np.concatenate(traj, 0)
    return out


@MODELS.register("targetdiff")
def _build_targetdiff(cfg):
    return TargetDiff.from_config(cfg)
