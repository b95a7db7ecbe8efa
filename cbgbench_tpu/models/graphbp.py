"""GraphBP: autoregressive normalizing-flow atom placement.

TPU-native rebuild of the reference GraphBP
(reference: repo/models/autoregression/graphbp.py): SchNet context
encoding, four conditional affine-coupling flows (atom type, distance,
angle, torsion), focus/contact BCE heads, internal-coordinate ->
Cartesian placement (dattoxyz).

Training uses one-step-per-row padded batches (data/graphbp_seq.py) —
the reference's step-expanded PyG batch with offset bookkeeping
(repo/utils/data.py:140-171 GraphBPCollate) becomes plain row indexing.
The distance/angle conditioning embeddings use Gaussian RBF x Fourier
features instead of the reference's sympy-generated spherical Bessel
basis — same dimensionality, MXU-friendly, numerically equivalent role.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.graphbp_seq import GraphBPBatch
from ..nn.common import MLP
from ..nn.schnet import SchNet
from ..ops.knn import gather_neighbors
from ..ops.rbf import GaussianSmearingTable
from ..ops.segment import masked_mean
from ..utils.registry import MODELS
from .pocket2mol import bce_logits


class STNetExp(nn.Module):
    """Affine coupling parameter net (reference: graphbp.py:25-57):
    s = rescale(tanh(.)), t unconstrained; the rescale weight starts at 0
    and the output layer at ~0 so the flow starts near identity."""

    out_dim: int
    hid_dim: int = 64

    @nn.compact
    def __call__(self, feat):
        h = nn.tanh(nn.Dense(self.hid_dim)(feat))
        st = nn.Dense(2 * self.out_dim,
                      kernel_init=nn.initializers.constant(1e-10))(h)
        s, t = st[..., :self.out_dim], st[..., self.out_dim:]
        rescale = self.param("rescale", nn.initializers.zeros, (1,))
        s = jnp.exp(rescale) * jnp.tanh(s)
        return s, t


def flow_forward(layers, x, feat):
    log_jacob = 0.0
    for layer in layers:
        s, t = layer(feat)
        s = jnp.exp(s)
        x = (x + t) * s
        log_jacob = log_jacob + jnp.log(jnp.abs(s) + 1e-20)
    return x, log_jacob


def flow_reverse(layers, latent, feat):
    for layer in reversed(layers):
        s, t = layer(feat)
        latent = latent / jnp.exp(s) - t
    return latent


def dat_to_xyz(f, c1, c2, d, angle, torsion):
    """Internal coords -> Cartesian (reference: graphbp.py:79-94)."""
    c1f = f - c1
    c1c2 = c2 - c1
    c3 = c1f * jnp.sum(c1c2 * c1f, -1, keepdims=True) / (
        jnp.sum(c1f * c1f, -1, keepdims=True) + 1e-12) + c1
    c3c2 = c2 - c3
    nrm = lambda v: jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12  # noqa
    c3c4 = (c3c2 * jnp.cos(torsion[..., None])
            + jnp.cross(c3c2, c1f) / nrm(c1f) * jnp.sin(torsion[..., None]))
    new = (-c1f / nrm(c1f) * d[..., None] * jnp.cos(angle[..., None])
           + c3c4 / nrm(c3c4) * d[..., None] * jnp.sin(angle[..., None]) + f)
    return new


class GraphBP(nn.Module):
    # shared train-step API (t unused by AR losses)
    num_timesteps: int = 1
    time_sampler: str = "uniform"
    num_classes: int = 13
    num_rec_types: int = 6
    emb_dim: int = 128
    num_embed_layers: int = 6
    num_flow_layers: int = 6
    flow_hid_dim: int = 128
    deq_coeff: float = 0.9
    # Train-time Gaussian jitter on the continuous flow targets
    # (dist Å, angle rad, torsion rad). The reference dequantizes only the
    # discrete node one-hot (graphbp.py:120 deq_coeff); on a small corpus
    # the continuous flows memorize the repeated internal coordinates and
    # sharpen without bound (log-likelihood -> +inf, grad norms -> 1e3,
    # then NaN — observed at iter ~12.5k on the 5-pocket fixture corpus).
    # Jitter bounds the achievable sharpness at log(sigma), the exact
    # regularization deq_coeff provides for the discrete flow.
    cont_noise: tuple = (0.05, 0.05, 0.1)
    cutoff: float = 10.0
    k: int = 64
    loss_weights: tuple = ()

    @classmethod
    def from_config(cls, cfg):
        emb = cfg.get("embedder", {})
        enc = cfg.get("encoder", {})
        return cls(num_classes=cfg["num_atomtype"],
                   emb_dim=emb.get("emb_dim", 128),
                   num_embed_layers=emb.get("num_layers", 6),
                   num_flow_layers=enc.get("num_layers", 6),
                   flow_hid_dim=enc.get("node_feat_dim", 128),
                   deq_coeff=cfg.get("deq_coeff", 0.9),
                   cont_noise=tuple(cfg.get("cont_noise", (0.05, 0.05, 0.1))),
                   loss_weights=tuple(sorted(
                       cfg.get("loss_weights", {}).items())))

    def setup(self):
        self.embedder = SchNet(
            num_node_types=self.num_classes + self.num_rec_types,
            hidden=self.emb_dim, num_interactions=self.num_embed_layers,
            cutoff=self.cutoff, k=self.k)
        mk = lambda dim, name: [STNetExp(dim, self.flow_hid_dim,  # noqa
                                         name=f"{name}_{i}")
                                for i in range(self.num_flow_layers)]
        self.node_flow = mk(self.num_classes, "node_flow")
        self.dist_flow = mk(1, "dist_flow")
        self.angle_flow = mk(1, "angle_flow")
        self.torsion_flow = mk(1, "torsion_flow")
        self.focus_mlp = MLP(1, self.emb_dim * 2, name="focus_mlp")
        self.contact_mlp = MLP(1, self.emb_dim * 2, name="contact_mlp")
        self.dist_head = MLP(self.emb_dim, 32, name="dist_head")
        self.angle_head = MLP(self.emb_dim, 32, name="angle_head")
        self.dist_rbf = GaussianSmearingTable(0.0, self.cutoff, 16,
                                              fixed_offset=False)

    def _dist_feat(self, d):
        return self.dist_rbf(d[..., None])

    def _angle_feat(self, d, angle):
        k = jnp.arange(1, 8)
        four = jnp.concatenate([jnp.cos(angle[..., None] * k),
                                jnp.sin(angle[..., None] * k)], -1)
        rbf = self.dist_rbf(d[..., None])
        return (four[..., :, None] * rbf[..., None, :]).reshape(
            d.shape + (7 * 2 * 16,))

    def _conditioning(self, batch: GraphBPBatch, node_feat, new_type, d,
                      angle):
        """Per-row conditioning features for the four flows."""
        take = lambda arr, i: gather_neighbors(  # noqa: E731
            arr, i[:, None, None])[:, 0, 0]
        type_feat = take(node_feat, batch.focus)                # node flow
        type_emb = self.embedder.type_embedding(new_type)       # [B, H]
        node_emb = node_feat * type_emb[:, None]
        dist_feat = take(node_emb, batch.focus)                 # dist flow
        node_emb = node_emb * self.dist_head(self._dist_feat(d))[:, None]
        angle_feat = jnp.concatenate(
            [take(node_emb, batch.focus), take(node_emb, batch.c1)], -1)
        node_emb = node_emb * self.angle_head(
            self._angle_feat(d, angle))[:, None]
        torsion_feat = jnp.concatenate(
            [take(node_emb, batch.focus), take(node_emb, batch.c1),
             take(node_emb, batch.c2)], -1)
        return type_feat, dist_feat, angle_feat, torsion_feat

    def __call__(self, batch: GraphBPBatch, t=None, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        node_feat = self.embedder(batch.z, batch.pos, batch.mask)

        # BCE in logit space (bce_logits): the naive
        # -(c*log(sigmoid+1e-12) + (1-c)*log(1-sigmoid+1e-12)) is NOT
        # TPU-safe — at logit >= 16.7 f32 sigmoid saturates to exactly 1.0
        # and XLA reassociates (1 - fs + 1e-12) into ((1+1e-12) - fs) = 0,
        # so log() emits -inf and masked_mean's inf*0 poisons the whole
        # gradient (the r3 iter-9.9k permanent-NaN incident; forensics in
        # logs/q3_graphbp3/run/nan_forensics)
        focus_logit = self.focus_mlp(node_feat)[..., 0]
        focus_score = nn.sigmoid(focus_logit)
        gen_m = batch.gen_flag & batch.mask
        loss_focus = masked_mean(
            bce_logits(focus_logit, batch.cannot_focus)[..., None],
            gen_m, axis=(1,)).mean()

        # dense contact supervision over ALL context atoms on every row
        # (deviation from the reference's 2-atom/first-step-only BCE —
        # see graphbp_seq.py for the rationale; the head is the same)
        ctx_m = batch.mask & ~batch.gen_flag
        contact_logit = self.contact_mlp(node_feat)[..., 0]
        loss_contact = masked_mean(
            bce_logits(contact_logit, batch.cannot_contact)[..., None],
            ctx_m, axis=(1,)).mean()

        # dequantized one-hot for the node flow
        kz, kd, ka, kt = jax.random.split(rng, 4)
        x_z = jax.nn.one_hot(batch.new_type, self.num_classes)
        x_z = x_z + self.deq_coeff * jax.random.uniform(kz, x_z.shape)

        # continuous-target jitter (see cont_noise field docstring); the
        # conditioning features see the CLEAN coordinates — only the flow
        # inputs are jittered, matching how deq_coeff treats new_type
        sd, sa, st = self.cont_noise
        b = batch.new_dist.shape[0]
        dist_in = batch.new_dist + sd * jax.random.normal(kd, (b,))
        angle_in = batch.new_angle + sa * jax.random.normal(ka, (b,))
        tors_in = batch.new_torsion + st * jax.random.normal(kt, (b,))

        feats = self._conditioning(batch, node_feat, batch.new_type,
                                   batch.new_dist, batch.new_angle)
        node_lat, node_lj = flow_forward(self.node_flow, x_z, feats[0])
        dist_lat, dist_lj = flow_forward(self.dist_flow,
                                         dist_in[:, None], feats[1])
        angle_lat, angle_lj = flow_forward(self.angle_flow,
                                           angle_in[:, None], feats[2])
        tors_lat, tors_lj = flow_forward(self.torsion_flow,
                                         tors_in[:, None], feats[3])

        losses = {
            "node": jnp.mean(0.5 * node_lat ** 2 - node_lj),
            "dist": jnp.mean(0.5 * dist_lat ** 2 - dist_lj),
            "angle": jnp.mean(0.5 * angle_lat ** 2 - angle_lj),
            "torsion": jnp.mean(0.5 * tors_lat ** 2 - tors_lj),
            "focus": loss_focus, "contact": loss_contact,
        }
        results = {"node_latent": node_lat, "focus_score": focus_score,
                   "mask_gen": gen_m}
        return losses, results

    def weighted_loss(self, loss_dict):
        w = dict(self.loss_weights)
        return sum(w.get(k, 1.0) * v for k, v in loss_dict.items())

    # ------------------------------------------------------------------

    def place_atom(self, batch: GraphBPBatch, rng, stds=(0.5, 0.3, 0.4, 0.1)):
        """Reverse the flows at the rows' (focus, c1, c2) to place one atom.
        Returns (new_type [B], new_pos [B,3], focus_ok [B])."""
        node_feat = self.embedder(batch.z, batch.pos, batch.mask)
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        b = batch.z.shape[0]

        # focus viability: any placed gen atom with focus_score(can) OR
        # first. Reference quirk preserved: sampling thresholds the RAW
        # LOGIT at 0.5 (graphbp.py:294 applies no sigmoid, unlike the
        # trained head at :155) == sigmoid < 0.622
        focus_score = nn.sigmoid(self.focus_mlp(node_feat)[..., 0]
                                 - jnp.float32(0.5))
        gen_m = batch.gen_flag & batch.mask
        can_focus = (focus_score < 0.5) & gen_m
        focus_ok = can_focus.any(axis=1) | batch.is_first_step

        lat = jax.random.normal(k1, (b, self.num_classes)) * stds[0]
        take = lambda arr, i: gather_neighbors(  # noqa: E731
            arr, i[:, None, None])[:, 0, 0]
        type_feat = take(node_feat, batch.focus)
        z_pred = flow_reverse(self.node_flow, lat, type_feat)
        new_type = jnp.argmax(z_pred, axis=-1)

        type_emb = self.embedder.type_embedding(new_type)
        node_emb = node_feat * type_emb[:, None]
        dist_feat = take(node_emb, batch.focus)
        d = flow_reverse(self.dist_flow,
                         jax.random.normal(k2, (b, 1)) * stds[1],
                         dist_feat)[:, 0]
        # Numerical guard only — the reference applies no clamp
        # (graphbp.py:336) and the trained flow must be free to emit the
        # ~3 Å first-step contact distance; the old hard clip at 2.2 Å
        # forced every molecule's first atom into vdW overlap with the
        # protein (the round-2 clash_ratio 0.987 pathology).
        d = jnp.clip(jnp.abs(d), 0.5, 8.0)
        d = jnp.where(jnp.isfinite(d), d, 1.5)
        node_emb = node_emb * self.dist_head(self._dist_feat(d))[:, None]
        angle_feat = jnp.concatenate(
            [take(node_emb, batch.focus), take(node_emb, batch.c1)], -1)
        angle = flow_reverse(self.angle_flow,
                             jax.random.normal(k3, (b, 1)) * stds[2],
                             angle_feat)[:, 0]
        node_emb = node_emb * self.angle_head(
            self._angle_feat(d, angle))[:, None]
        torsion_feat = jnp.concatenate(
            [take(node_emb, batch.focus), take(node_emb, batch.c1),
             take(node_emb, batch.c2)], -1)
        torsion = flow_reverse(self.torsion_flow,
                               jax.random.normal(k4, (b, 1)) * stds[3],
                               torsion_feat)[:, 0]

        f = take(batch.pos, batch.focus)
        c1 = take(batch.pos, batch.c1)
        c2 = take(batch.pos, batch.c2)
        new_pos = dat_to_xyz(f, c1, c2, d, angle, torsion)
        return new_type, new_pos, focus_ok, focus_score

    def pick_focus(self, batch: GraphBPBatch, rng):
        """Choose the next focus among placed gen atoms (lowest
        cannot-focus score), plus its two nearest placed/ctx neighbors."""
        node_feat = self.embedder(batch.z, batch.pos, batch.mask)
        focus_score = nn.sigmoid(self.focus_mlp(node_feat)[..., 0])
        gen_m = batch.gen_flag & batch.mask
        score = jnp.where(gen_m, focus_score, 1e9)
        focus = jnp.argmin(score, axis=1).astype(jnp.int32)
        d = jnp.linalg.norm(
            batch.pos - jnp.take_along_axis(batch.pos, focus[:, None, None],
                                            1), axis=-1)
        d = jnp.where(batch.mask, d, 1e9)
        d = d + (jnp.arange(d.shape[1])[None] == focus[:, None]) * 1e9
        near = jnp.argsort(d, axis=1)
        return focus, near[:, 0].astype(jnp.int32), near[:, 1].astype(jnp.int32)

    def pick_focus_sample(self, batch: GraphBPBatch, rng):
        """Reference-semantics focus choice for sampling.

        First step: the trained contact head picks uniformly among context
        atoms with cannot-contact score < 0.5 (reference:
        graphbp.py:281-291 ``torch.multinomial(can_contact)``). Later
        steps: uniformly among placed gen atoms with cannot-focus score
        < 0.5 (reference: graphbp.py:296-316 ``multinomial(can_focus)``) —
        NOT argmin, which degenerately regrows from the same atom.

        Returns (focus, c1, c2, ok, finite):
          ok=False     -> no eligible focus: the molecule is complete
                          (always True on the first step);
          finite=False -> NaN/Inf scores: the molecule must be discarded
                          (reference: graphbp.py:304-310 dirty_mask).
        """
        node_feat = self.embedder(batch.z, batch.pos, batch.mask)
        gen_m = batch.gen_flag & batch.mask
        ctx_m = batch.mask & ~batch.gen_flag
        first = batch.is_first_step

        # reference quirk: sampling thresholds RAW logits at 0.5
        # (graphbp.py:294 focus / :281 contact) == sigmoid < 0.622; the
        # -0.5 shift reproduces that under the score<0.5 comparisons below
        focus_score = nn.sigmoid(self.focus_mlp(node_feat)[..., 0]
                                 - jnp.float32(0.5))
        contact_score = nn.sigmoid(self.contact_mlp(node_feat)[..., 0]
                                   - jnp.float32(0.5))
        score = jnp.where(first[:, None], contact_score, focus_score)
        pool = jnp.where(first[:, None], ctx_m, gen_m)
        finite = jnp.where(pool, jnp.isfinite(score), True).all(axis=1)
        can = (score < 0.5) & pool & jnp.isfinite(score)
        ok = can.any(axis=1) | first

        # uniform choice among eligible atoms (gumbel-argmax == multinomial
        # over a boolean mask); fallback: lowest score in the pool (first
        # step with a confident-"no" contact head still must place)
        g = jax.random.gumbel(rng, score.shape)
        choice = jnp.argmax(jnp.where(can, g, -jnp.inf), axis=1)
        safe = jnp.where(jnp.isfinite(score) & pool, score, jnp.inf)
        fallback = jnp.argmin(safe, axis=1)
        focus = jnp.where(can.any(axis=1), choice, fallback).astype(jnp.int32)

        d = jnp.linalg.norm(
            batch.pos - jnp.take_along_axis(batch.pos, focus[:, None, None],
                                            1), axis=-1)
        d = jnp.where(batch.mask, d, 1e9)
        d = d + (jnp.arange(d.shape[1])[None] == focus[:, None]) * 1e9
        near = jnp.argsort(d, axis=1)
        return (focus, near[:, 0].astype(jnp.int32),
                near[:, 1].astype(jnp.int32), ok, finite)


@MODELS.register("graphbp")
def _build_graphbp(cfg):
    return GraphBP.from_config(cfg)


# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model",))
def _jit_place(model, params, batch, rng):
    return model.apply(params, batch, rng, method="place_atom")


@functools.partial(jax.jit, static_argnames=("model",))
def _jit_focus(model, params, batch, rng):
    return model.apply(params, batch, rng, method="pick_focus")


@functools.partial(jax.jit, static_argnames=("model",))
def _jit_focus_sample(model, params, batch, rng):
    return model.apply(params, batch, rng, method="pick_focus_sample")


@functools.partial(jax.jit, static_argnames=("model", "max_atoms",
                                             "min_atoms", "clash_cand"))
def _jit_sample_scan(model, params, batch, rng, max_atoms, min_atoms,
                     clash_cand=1, clash_min=2.9):
    """The full flow-reverse growth loop ON DEVICE (``lax.scan`` with
    per-graph active switches) — one device execution instead of
    max_atoms x (2 dispatches + 4 fetches) host round-trips. The rng
    split sequence matches the host loop, so both paths place identical
    atoms (pinned by test). The focus computation runs every iteration
    and is select-ignored at it==0 (the host loop skips it there).

    lax.scan, NOT lax.fori_loop: on the remote-TPU platform the same
    body under fori_loop miscompiles (measured 8/32 valid molecules vs
    25/32 for scan/host/unrolled, with the distance flow saturating at
    its 2.2 Å clip — same checkpoint, same keys). scan matches the host
    loop's validity seed-for-seed and is the construct every
    quality-verified diffusion sampler in this package already uses."""
    b = batch.batch_size
    cap = batch.z.shape[1]

    def body(carry, it):
        batch, active, keep, rng = carry
        rng, k1, k2 = jax.random.split(rng, 3)
        focus, c1, c2, ok, finite = model.apply(params, batch, k1,
                                                method="pick_focus_sample")
        batch = batch.replace(focus=focus, c1=c1, c2=c2)
        if clash_cand > 1:
            # protein-clash-avoiding placement (VERDICT r3 #3): draw
            # clash_cand flow samples and keep the FIRST whose distance
            # to every context (non-generated) atom clears clash_min —
            # falling back to the max-clearance candidate. Key order is
            # preserved so clash_cand=1 reproduces the plain sampler.
            keys = jax.random.split(k2, clash_cand)
            c_type, c_pos, _, _ = jax.vmap(
                lambda kk: model.apply(params, batch, kk,
                                       method="place_atom"))(keys)
            # protein atoms only (z offset >= num_classes): decomp-task
            # ligand-context atoms are bonding targets at ~1.5 A and
            # must not repel placements
            ctx = (batch.mask & ~batch.gen_flag
                   & (batch.z >= model.num_classes))       # [B, N]
            d = jnp.linalg.norm(
                c_pos[:, :, None, :] - batch.pos[None], axis=-1)
            dmin = jnp.min(jnp.where(ctx[None], d, jnp.inf), -1)  # [C,B]
            ok_c = dmin >= clash_min
            first_ok = jnp.argmax(ok_c, axis=0)            # [B]
            fallback = jnp.argmax(
                jnp.where(jnp.isfinite(dmin), dmin, -jnp.inf), axis=0)
            choice = jnp.where(ok_c.any(0), first_ok, fallback)
            new_type = jnp.take_along_axis(c_type, choice[None],
                                           axis=0)[0]
            new_pos = jnp.take_along_axis(
                c_pos, choice[None, :, None], axis=0)[0]
        else:
            new_type, new_pos, _, _ = model.apply(params, batch, k2,
                                                  method="place_atom")
        n_placed = jnp.sum(batch.gen_flag & batch.mask, 1)
        slot = jnp.sum(batch.mask, 1)
        # reference termination (graphbp.py:296-313): a molecule with no
        # eligible focus is COMPLETE (kept if big enough, discarded if
        # under min_atoms — never force-grown); NaN/Inf rows are dropped
        complete = active & ~ok
        discard = (complete & (n_placed < min_atoms)) | (active & ~finite)
        keep = keep & ~discard
        live = active & ok & finite & (slot < cap)
        upd = jax.nn.one_hot(slot, cap, dtype=bool) & live[:, None]
        batch = batch.replace(
            z=jnp.where(upd, new_type[:, None], batch.z),
            pos=jnp.where(upd[..., None], new_pos[:, None, :], batch.pos),
            mask=batch.mask | upd, gen_flag=batch.gen_flag | upd,
            is_first_step=batch.is_first_step & ~live)
        return (batch, live, keep, rng), ()

    init = (batch, jnp.ones(b, bool), jnp.ones(b, bool), rng)
    (out, _, keep, _), _ = jax.lax.scan(body, init,
                                        jnp.arange(max_atoms,
                                                   dtype=jnp.int32))
    return {"z": out.z, "pos": out.pos, "mask": out.mask,
            "gen_flag": out.gen_flag & out.mask & keep[:, None]}


def sample_graphbp(model: GraphBP, params, batch: GraphBPBatch, rng,
                   max_atoms: int = 45, min_atoms: int = 12,
                   clash_cand: int = 1, clash_min: float = 2.9):
    """Grow atoms by reverse flows, fully on-device (_jit_sample_scan).

    clash_cand > 1 enables protein-clash-avoiding placement: per step,
    clash_cand flow draws, keep the first with >= clash_min clearance to
    every context atom (else the max-clearance one)."""
    return _jit_sample_scan(model, params, batch, rng, max_atoms,
                            min_atoms, clash_cand=clash_cand,
                            clash_min=clash_min)


def sample_graphbp_host(model: GraphBP, params, batch: GraphBPBatch, rng,
                        max_atoms: int = 45, min_atoms: int = 12):
    """Host growth loop (one device call per step); kept as the semantic
    reference for _jit_sample_scan's equality test. Same rng split
    sequence and the same reference termination rules."""
    import numpy as np

    b = batch.batch_size
    active = np.ones(b, bool)
    keep = np.ones(b, bool)
    for it in range(max_atoms):
        rng, k1, k2 = jax.random.split(rng, 3)
        focus, c1, c2, ok, finite = _jit_focus_sample(model, params, batch,
                                                      k1)
        batch = batch.replace(focus=focus, c1=c1, c2=c2)
        new_type, new_pos, _, _ = _jit_place(model, params, batch, k2)
        new_type = np.asarray(new_type)
        new_pos = np.asarray(new_pos)
        ok = np.asarray(ok)
        finite = np.asarray(finite)
        n_placed = np.asarray(batch.gen_flag & batch.mask).sum(1)
        complete = active & ~ok
        discard = (complete & (n_placed < min_atoms)) | (active & ~finite)
        keep &= ~discard
        z = np.array(batch.z)
        pos = np.array(batch.pos)
        mask = np.array(batch.mask)
        gen = np.array(batch.gen_flag)
        first = np.array(batch.is_first_step)
        cap = z.shape[1]
        for g in range(b):
            if not (active[g] and ok[g] and finite[g]):
                active[g] = False
                continue
            slot = int(mask[g].sum())
            if slot >= cap:
                active[g] = False
                continue
            z[g, slot] = new_type[g]
            pos[g, slot] = new_pos[g]
            mask[g, slot] = True
            gen[g, slot] = True
            first[g] = False
        batch = batch.replace(z=jnp.asarray(z), pos=jnp.asarray(pos),
                              mask=jnp.asarray(mask), gen_flag=jnp.asarray(gen),
                              is_first_step=jnp.asarray(first))
        if not active.any():
            break
    batch = batch.replace(
        gen_flag=batch.gen_flag & jnp.asarray(keep)[:, None])
    return {"z": batch.z, "pos": batch.pos, "mask": batch.mask,
            "gen_flag": batch.gen_flag & batch.mask}
