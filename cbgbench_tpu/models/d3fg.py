"""D3FG: coarse-grained diffusion over functional-group frames.

TPU-native rebuild of the reference D3FG
(reference: repo/models/diffusion/difffg.py:32-246, v2 at :250-464):
each ligand node is a functional group with (center, SO(3) orientation,
class); protein residues are FG-typed nodes with backbone frames. Three
parallel diffusions: CTNVP on centers (eps target), IGSO(3) RotVP on
orientations (cosine loss on frames), D3PM TypeVP on classes. Denoiser is
the IPATransformer (invariant attention + quaternion frame head).

The two-stage denovo protocol (stage 1 generates FGs, stage 2 runs
TargetDiff linker diffusion around the assembled FG atoms via a context
pool, reference: sample.py:232-241 + init_lig.py:55-122) is implemented in
sampling/d3fg_pool.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..constants.fg import NUM_FG_TYPES
from ..constants.protein import NUM_AA_TYPES
from ..diffusion import CTNVPScheduler, RotVPScheduler, TypeVPScheduler
from ..nn.embedders import FGContextEmbedder
from ..nn.ipatransformer import IPATransformer
from ..utils.geometry import rotation_matrix_cosine_loss
from ..utils.registry import MODELS
from ..utils.so3 import so3vec_to_rotation
from .schedules_util import per_graph_mean


class D3FG(nn.Module):
    num_fg_types: int = NUM_FG_TYPES
    num_timesteps: int = 1000
    denoise_structure: bool = True
    denoise_atom: bool = True
    time_sampler: str = "symmetric"
    emb_dim: int = 128
    num_layers: int = 6
    n_heads: int = 16
    k: int = 32
    r_max: float = 10.0
    pos_beta_start: float = 1e-7
    pos_beta_end: float = 2e-3
    pos_schedule: str = "sigmoid"
    rot_schedule: str = "sigmoid"
    rot_cosine_s: float = 0.008
    fg_schedule: str = "cosine"
    fg_cosine_s: float = 0.01
    pos_loss_type: str = "score"      # v2 uses 'denoise' (difffg.py:367-370)
    loss_weight_pos: float = 1.0
    loss_weight_rot: float = 1.0
    loss_weight_fg: float = 100.0

    @classmethod
    def from_config(cls, cfg) -> "D3FG":
        gen = cfg["generator"]
        enc = cfg["encoder"]
        emb = cfg.get("embedder", {})
        lw = cfg.get("loss_weights", {})
        return cls(
            num_fg_types=cfg.get("num_fgtype", NUM_FG_TYPES),
            num_timesteps=gen["num_diffusion_timesteps"],
            time_sampler=gen.get("time_sampler", "symmetric"),
            emb_dim=emb.get("emb_dim", 128),
            num_layers=enc.get("num_layers", 6),
            n_heads=enc.get("n_heads", 16),
            k=enc.get("k", 32),
            r_max=enc.get("r_max", 10.0),
            pos_beta_start=gen["pos_schedule"].get("beta_start", 1e-7),
            pos_beta_end=gen["pos_schedule"].get("beta_end", 2e-3),
            pos_schedule=gen["pos_schedule"].get("type", "sigmoid"),
            rot_schedule=gen["rot_schedule"].get("type", "sigmoid"),
            rot_cosine_s=gen["rot_schedule"].get("cosine_s", 0.008),
            fg_schedule=gen["fg_schedule"].get("type", "cosine"),
            fg_cosine_s=gen["fg_schedule"].get("cosine_s", 0.01),
            pos_loss_type=gen.get("pos_loss_type", "score"),
            loss_weight_pos=lw.get("pos", 1.0),
            loss_weight_rot=lw.get("rot", 1.0),
            loss_weight_fg=lw.get("fg", 100.0),
        )

    @property
    def num_classes(self) -> int:
        # ligand FG classes + residue classes share one embedding space
        return self.num_fg_types + NUM_AA_TYPES

    def setup(self):
        self.pos_scheduler = CTNVPScheduler.create(
            self.num_timesteps, self.pos_beta_start, self.pos_beta_end,
            self.pos_schedule)
        self.rot_scheduler = RotVPScheduler.create(
            self.num_timesteps, kind=self.rot_schedule,
            cosine_s=self.rot_cosine_s)
        self.type_scheduler = TypeVPScheduler.create(
            self.num_timesteps, self.num_fg_types, self.fg_schedule,
            cosine_s=self.fg_cosine_s)
        self.embedder = FGContextEmbedder(emb_dim=self.emb_dim,
                                          num_classes=self.num_classes)
        self.denoiser = IPATransformer(
            num_classes=self.num_fg_types, num_layers=self.num_layers,
            hidden_dim=self.emb_dim, n_heads=self.n_heads, k=self.k,
            r_max=self.r_max)

    def denoise(self, xc_lig, o_lig, c_lig, batch, t):
        """-> (eps_pos, o_next, R_next, class logits) on the ligand slice."""
        lig, res = batch.ligand, batch.residues
        nf = lig.capacity
        c_rec = jax.nn.one_hot(batch.rec_type, self.num_classes)
        aa = jax.nn.one_hot(res.aa, 20)
        h_lig, h_rec, o_rec = self.embedder(
            c_lig, c_rec, aa, res.pos_heavyatom, lig.mask, res.mask, t)
        xc_rec = res.pos_heavyatom[:, :, 1]     # CA

        x = jnp.concatenate([xc_lig, xc_rec], axis=1)
        o = jnp.concatenate([o_lig, o_rec], axis=1)
        h = jnp.concatenate([h_lig, h_rec], axis=1)
        mask = jnp.concatenate([lig.mask, res.mask], axis=1)
        lig_flag = jnp.concatenate([lig.mask, jnp.zeros_like(res.mask)], 1)
        gen_flag = jnp.concatenate([lig.gen_flag, jnp.zeros_like(res.mask)], 1)

        eps_pos, _, o_next, R_next, c = self.denoiser(
            x, o, h, mask, lig_flag, gen_flag)
        return (eps_pos[:, :nf], o_next[:, :nf], R_next[:, :nf], c[:, :nf])

    def get_loss(self, batch, t, rng):
        lig = batch.ligand
        k_pos, k_rot, k_type = jax.random.split(rng, 3)
        gen = lig.gen_flag & lig.mask
        xc0, o0, v0 = lig.pos, lig.orient, lig.type_fg
        R0 = so3vec_to_rotation(o0)

        if self.denoise_structure:
            xc_t, pos_noise = self.pos_scheduler.forward_add_noise(
                k_pos, xc0, t, gen)
            o_t, _, _ = self.rot_scheduler.forward_add_noise(k_rot, o0, t, gen)
        else:
            xc_t, o_t, pos_noise = xc0, o0, jnp.zeros_like(xc0)
        if self.denoise_atom:
            c_t, v_t = self.type_scheduler.forward_add_noise(k_type, v0, t, gen)
        else:
            c_t, v_t = jax.nn.one_hot(v0, self.num_fg_types), v0
        # pad ligand class one-hot into the merged class space
        c_t_full = jnp.concatenate(
            [c_t, jnp.zeros(c_t.shape[:-1] + (NUM_AA_TYPES,))], axis=-1)

        eps_pos, _, R_pred, c_pred = self.denoise(xc_t, o_t, c_t_full, batch, t)

        losses, results = {}, {}
        if self.denoise_structure:
            if self.pos_loss_type == "score":
                loss_pos, pos_info = self.pos_scheduler.get_score_loss(
                    eps_pos, pos_noise, t, gen)
            else:   # v2: denoise-type pos loss on x0
                loss_pos, pos_info = self.pos_scheduler.get_loss(
                    eps_pos, xc0, xc_t, t, gen, pred_type="denoise")
            cos = rotation_matrix_cosine_loss(R_pred, R0)       # [B, NF]
            loss_rot = per_graph_mean(cos, gen)
            losses["pos"], losses["rot"] = loss_pos, loss_rot
            results.update(pos_info)
            results.update({"R0": R0, "R_pred": R_pred, "mask_gen": gen})
        else:
            losses["pos"] = losses["rot"] = jnp.zeros(())
        if self.denoise_atom:
            loss_fg, fg_info = self.type_scheduler.get_loss(
                c_pred, v0, v_t, t, gen)
            losses["fg"] = loss_fg
            results.update(fg_info)
        else:
            losses["fg"] = jnp.zeros(())
        return losses, results

    def __call__(self, batch, t, rng):
        return self.get_loss(batch, t, rng)

    def weighted_loss(self, loss_dict):
        return (self.loss_weight_pos * loss_dict["pos"]
                + self.loss_weight_rot * loss_dict["rot"]
                + self.loss_weight_fg * loss_dict["fg"])


@functools.partial(jax.jit, static_argnames=("model", "unit_stride"))
def _sample_chunk(model: D3FG, params, batch, carry, t_arr, s_arr,
                  unit_stride: bool = True, type_temp=1.0,
                  type_bias=0.0):
    """Scan reverse jumps t_arr[i] -> s_arr[i] over frames (pos + SO(3)
    orientation + FG type). unit_stride keeps the reference's unit-step
    machinery; strided ladders use the closed-form jump posteriors
    (positions via x0, orientations via the forward marginal at s around
    the predicted clean rotation, types via the composed D3PM kernel)."""
    lig = batch.ligand
    gen = lig.gen_flag & lig.mask
    pos_sched = CTNVPScheduler.create(
        model.num_timesteps, model.pos_beta_start, model.pos_beta_end,
        model.pos_schedule)
    rot_sched = RotVPScheduler.create(
        model.num_timesteps, kind=model.rot_schedule,
        cosine_s=model.rot_cosine_s)
    type_sched = TypeVPScheduler.create(
        model.num_timesteps, model.num_fg_types, model.fg_schedule,
        cosine_s=model.fg_cosine_s)

    def step(carry, t_s):
        xc, o, c, key = carry
        t_i, s_i = t_s
        key, k1, k2, k3 = jax.random.split(key, 4)
        t = jnp.full((xc.shape[0],), t_i, jnp.int32)
        s = jnp.full((xc.shape[0],), s_i, jnp.int32)
        c_full = jnp.concatenate(
            [c, jnp.zeros(c.shape[:-1] + (NUM_AA_TYPES,))], axis=-1)
        eps_pos, o_next, _, c_pred = model.apply(params, xc, o, c_full,
                                                 batch, t, method="denoise")
        # FG-type diversity lever (VERDICT r4 #6): temperature the
        # predicted clean-type LOGITS before the D3PM posterior (denoise
        # returns logits — the scheduler softmaxes internally). T = 1 is
        # bit-exact reference; T > 1 flattens a benzene-collapsed head.
        # Traced scalar: every T shares one compiled program.
        # type_bias (scalar 0 or [num_fg_types]) adds an importance
        # correction alpha*(log p_corpus - log p_model) to the clean-type
        # logits — the FLAG corpus-frequency-prior lever (BASELINE r5)
        # adapted to the D3PM ladder. Unlike temperature (divisive:
        # flattens ALL relative logits, measured to collapse the head at
        # T>=1.03), the additive tilt targets specific over/under-drawn
        # classes and its per-step effect saturates once the posterior
        # agrees with the corpus marginal.
        c_pred = c_pred / type_temp + type_bias
        if unit_stride:
            xc_next = pos_sched.backward_remove_noise(
                k1, eps_pos, xc, t, gen, pred_type=model.pos_loss_type)
            o_next = rot_sched.backward_remove_noise(k2, o_next, o, t, gen)
            c_next, _ = type_sched.backward_remove_noise(k3, c_pred, c,
                                                         t, gen)
        else:
            if model.pos_loss_type == "score":
                a = pos_sched.tables.alphas_cumprod[t][:, None, None]
                x0_hat = (xc - jnp.sqrt(1.0 - a) * eps_pos) / jnp.sqrt(a)
            else:
                x0_hat = eps_pos
            xc_next = pos_sched.backward_strided(k1, x0_hat, xc, t, s, gen)
            o_next = rot_sched.backward_strided(k2, o_next, o, t, s, gen)
            c_next, _ = type_sched.backward_strided(k3, c_pred, c, t, s, gen)
        return (xc_next, o_next, c_next, key), None

    carry, _ = jax.lax.scan(step, carry, (t_arr, s_arr))
    return carry


def sample_d3fg(model: D3FG, params, batch, rng, chunk_size: int = 250,
                num_steps=None, type_temp: float = 1.0, type_bias=None):
    """num_steps < num_timesteps runs a strided fast-sampling ladder.
    type_temp != 1 tempers the FG-type posterior; type_bias adds a
    per-class logit tilt (see _sample_chunk)."""
    from .targetdiff import sample_timesteps
    lig = batch.ligand
    c_in = jax.nn.one_hot(lig.type_fg, model.num_fg_types)
    carry = (lig.pos, lig.orient, c_in, rng)
    ts = sample_timesteps(model.num_timesteps, num_steps)
    ss = np.append(ts[1:], np.int32(-1)).astype(np.int32)
    unit_stride = len(ts) == model.num_timesteps
    chunk = min(chunk_size, len(ts))
    lo = 0
    while lo < len(ts):
        n = min(chunk, len(ts) - lo)
        carry = _sample_chunk(model, params, batch, carry,
                              jnp.asarray(ts[lo:lo + n]),
                              jnp.asarray(ss[lo:lo + n]),
                              unit_stride=unit_stride,
                              type_temp=jnp.float32(type_temp),
                              type_bias=(jnp.float32(0.0) if type_bias is None
                                         else jnp.asarray(type_bias,
                                                          jnp.float32)))
        jax.block_until_ready(carry[0])
        lo += n
    xc, o, c, _ = carry
    return {"pos": xc, "orient": o, "type_fg": jnp.argmax(c, -1), "c": c}


@MODELS.register("difffg")
def _build_d3fg(cfg):
    return D3FG.from_config(cfg)


@MODELS.register("difffg_v2")
def _build_d3fg_v2(cfg):
    cfg = dict(cfg)
    cfg.setdefault("generator", {})
    if "pos_loss_type" not in cfg["generator"]:
        cfg["generator"]["pos_loss_type"] = "denoise"
    return D3FG.from_config(cfg)
