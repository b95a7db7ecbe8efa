"""Categorical (atom/FG type) diffusion for the padded layout.

TypeVPScheduler: D3PM uniform-transition diffusion in log space
(reference: diffusion_scheduler.py:320-441).
MaskTypeScheduler: absorbing-state masking diffusion
(reference: diffusion_scheduler.py:444-511, used by DiffBP).

v (class indices): [B, N] int32; c (one-hot/logits): [B, N, C];
t: [B] int32; gen_flag: [B, N] bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.categorical import (categorical_kl, index_to_log_onehot,
                                 log_add_exp, log_categorical,
                                 log_sample_categorical)
from .schedules import make_beta_schedule


@struct.dataclass
class TypeVPScheduler:
    num_classes: int = struct.field(pytree_node=False)
    log_alphas: jnp.ndarray                 # [T]
    log_one_minus_alphas: jnp.ndarray       # [T]
    log_alphas_cumprod: jnp.ndarray         # [T]
    log_one_minus_alphas_cumprod: jnp.ndarray  # [T]

    @staticmethod
    def create(num_timesteps: int, num_classes: int, kind: str = "cosine",
               beta_start: float = 1e-7, beta_end: float = 2e-3,
               cosine_s: float = 0.008) -> "TypeVPScheduler":
        betas = make_beta_schedule(kind, num_timesteps, beta_start, beta_end,
                                   cosine_s)
        alphas = 1.0 - betas
        log_alphas = np.log(alphas)
        log_ac = np.cumsum(log_alphas)

        def log_1_min(a):
            return np.log(1 - np.exp(a) + 1e-40)

        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        return TypeVPScheduler(
            num_classes=num_classes,
            log_alphas=f32(log_alphas),
            log_one_minus_alphas=f32(log_1_min(log_alphas)),
            log_alphas_cumprod=f32(log_ac),
            log_one_minus_alphas_cumprod=f32(log_1_min(log_ac)),
        )

    @property
    def num_timesteps(self) -> int:
        return self.log_alphas.shape[0]

    # -- forward kernels (log space) --

    def q_vt_v0(self, log_v0, t):
        """log q(v_t | v_0) under the uniform-transition kernel."""
        la = self.log_alphas_cumprod[t][:, None, None]
        l1a = self.log_one_minus_alphas_cumprod[t][:, None, None]
        return log_add_exp(log_v0 + la, l1a - np.log(self.num_classes))

    def q_vt_vtm1(self, log_vtm1, t):
        """log q(v_t | v_{t-1})."""
        la = self.log_alphas[t][:, None, None]
        l1a = self.log_one_minus_alphas[t][:, None, None]
        return log_add_exp(log_vtm1 + la, l1a - np.log(self.num_classes))

    def q_v_posterior(self, log_v0, log_vt, t):
        """log q(v_{t-1} | v_t, v_0), normalized.

        Keeps the reference's padding trick: if log_vt has one more class
        than log_v0 (absorbing-padded prediction), pad log_v0 with zeros
        (reference: diffusion_scheduler.py:413-415)."""
        t_minus_1 = jnp.maximum(t - 1, 0)
        log_qvt1_v0 = self.q_vt_v0(log_v0, t_minus_1)
        log_qvs1_vt = self.q_vt_vtm1(log_vt, t)
        if log_qvs1_vt.shape[-1] - log_qvt1_v0.shape[-1] == 1:
            pad = jnp.zeros_like(log_qvt1_v0[..., :1])
            log_qvt1_v0 = jnp.concatenate([log_qvt1_v0, pad], axis=-1)
        un = log_qvt1_v0 + log_qvs1_vt
        return un - jax.scipy.special.logsumexp(un, axis=-1, keepdims=True)

    def q_v_posterior_strided(self, log_v0, log_vt, t, s):
        """log q(v_s | v_t, v_0) for any s < t, normalized.

        The uniform-transition kernel composes in closed form: the s->t
        hop keeps a class with probability abar_t/abar_s, so the strided
        posterior is q(v_t|v_s) q(v_s|v_0) with those cumulative ratios.
        At s = t-1 this reduces exactly to q_v_posterior; s = -1 means
        "decode to clean v0" (abar_s = 1): q(v_s|v_0) collapses to the
        predicted v0 distribution itself, mixed only by the t->clean
        kernel. No reference counterpart (full-T sampling only)."""
        s_eff = jnp.maximum(s, 0)
        clean = (s < 0)[:, None, None]
        labar_s = jnp.where(
            clean, 0.0, self.log_alphas_cumprod[s_eff][:, None, None])
        l1abar_s = jnp.where(
            clean, np.log(1e-40),
            self.log_one_minus_alphas_cumprod[s_eff][:, None, None])
        log_qs_v0 = log_add_exp(log_v0 + labar_s,
                                l1abar_s - np.log(self.num_classes))
        la_ts = self.log_alphas_cumprod[t][:, None, None] - labar_s
        l1a_ts = jnp.log(1.0 - jnp.exp(la_ts) + 1e-40)
        log_qt_vs = log_add_exp(log_vt + la_ts,
                                l1a_ts - np.log(self.num_classes))
        if log_qt_vs.shape[-1] - log_qs_v0.shape[-1] == 1:
            pad = jnp.zeros_like(log_qs_v0[..., :1])
            log_qs_v0 = jnp.concatenate([log_qs_v0, pad], axis=-1)
        un = log_qs_v0 + log_qt_vs
        return un - jax.scipy.special.logsumexp(un, axis=-1, keepdims=True)

    # -- public API --

    def forward_add_noise(self, key, v0, t, gen_flag):
        """Sample v_t ~ q(v_t | v_0) on generated atoms.
        Returns (c_t one-hot [B,N,C], v_t indices [B,N])."""
        log_c0 = index_to_log_onehot(v0, self.num_classes)
        v_noisy = log_sample_categorical(key, self.q_vt_v0(log_c0, t))
        v_noisy = jnp.where(gen_flag, v_noisy, v0)
        c_noisy = jax.nn.one_hot(v_noisy, self.num_classes)
        return c_noisy, v_noisy

    def get_loss(self, c_pred, v0, vt, t, gen_flag, pred_logit: bool = True):
        """KL(q(v_{t-1}|v_t,v_0) || p(v_{t-1}|v_t)) + decoder NLL at t=0,
        averaged over generated atoms per graph, then over graphs."""
        log_c0 = index_to_log_onehot(v0, self.num_classes)
        log_ct = index_to_log_onehot(vt, self.num_classes)
        if pred_logit:
            log_c_pred = jax.nn.log_softmax(c_pred, axis=-1)
        else:
            log_c_pred = jnp.log(c_pred + 1e-8)
        log_pred_prob = self.q_v_posterior(log_c_pred, log_ct, t)
        log_true_prob = self.q_v_posterior(log_c0, log_ct, t)
        kl = categorical_kl(log_true_prob, log_pred_prob)          # [B, N]
        nll = -log_categorical(log_c0, log_pred_prob)              # [B, N]
        t0 = (t == 0).astype(kl.dtype)[:, None]
        per_node = t0 * nll + (1.0 - t0) * kl
        g = gen_flag.astype(per_node.dtype)
        per_graph = jnp.sum(per_node * g, axis=1) / jnp.maximum(g.sum(1), 1e-8)
        loss = jnp.mean(per_graph)
        info = {"v0": v0, "vt": vt, "c_pred": jnp.exp(log_c_pred),
                "mask_gen": gen_flag}
        return loss, info

    def backward_remove_noise(self, key, c_pred, ct, t, gen_flag,
                              pred_logit: bool = True):
        """One reverse step: sample v_{t-1} ~ p(v_{t-1} | v_t)."""
        if pred_logit:
            log_c_pred = jax.nn.log_softmax(c_pred, axis=-1)
        else:
            log_c_pred = jnp.log(c_pred + 1e-8)
        log_ct = jnp.log(ct + 1e-8)
        log_vs_prob = self.q_v_posterior(log_c_pred, log_ct, t)
        v_next = log_sample_categorical(key, log_vs_prob)
        v_next = jnp.where(gen_flag, v_next, jnp.argmax(ct, axis=-1))
        c_next = jax.nn.one_hot(v_next, log_vs_prob.shape[-1])
        return c_next, v_next

    def backward_strided(self, key, c_pred, ct, t, s, gen_flag,
                         pred_logit: bool = True):
        """One reverse jump: sample v_s ~ q(v_s | v_t, v0_pred), s < t."""
        if pred_logit:
            log_c_pred = jax.nn.log_softmax(c_pred, axis=-1)
        else:
            log_c_pred = jnp.log(c_pred + 1e-8)
        log_ct = jnp.log(ct + 1e-8)
        log_vs_prob = self.q_v_posterior_strided(log_c_pred, log_ct, t, s)
        v_next = log_sample_categorical(key, log_vs_prob)
        v_next = jnp.where(gen_flag, v_next, jnp.argmax(ct, axis=-1))
        c_next = jax.nn.one_hot(v_next, log_vs_prob.shape[-1])
        return c_next, v_next


@struct.dataclass
class MaskTypeScheduler:
    """Absorbing-state type diffusion: types collapse to an absorbing class
    with probability t/T forward; reverse reveals predictions with
    probability (T-t)/T (reference: diffusion_scheduler.py:444-511)."""

    num_timesteps: int = struct.field(pytree_node=False)
    num_classes: int = struct.field(pytree_node=False)
    absorbing_state: int = struct.field(pytree_node=False, default=0)

    def forward_add_noise(self, key, v0, t, gen_flag, eps=None):
        tt = t[:, None].astype(jnp.float32)
        mask_prob = (jnp.clip(tt, 0.0, None) / self.num_timesteps
                     if eps is None else eps)
        u = jax.random.uniform(key, v0.shape)
        diff_mask = (u < mask_prob) & gen_flag
        v_t = jnp.where(diff_mask, self.absorbing_state, v0)
        c_t = jax.nn.one_hot(v_t, self.num_classes)
        return v_t, c_t, diff_mask

    def backward_remove_noise(self, key, c_pred, ct, t, gen_flag,
                              pred_logit: bool = True, fix_pred: bool = True):
        if pred_logit:
            c_pred = jax.nn.softmax(c_pred, axis=-1)
        vt = jnp.argmax(ct, axis=-1)
        prob = jnp.clip((self.num_timesteps - t[:, None]).astype(jnp.float32)
                        / self.num_timesteps, 0.0, 1.0)
        change = (jax.random.uniform(key, vt.shape) < prob) & gen_flag
        if fix_pred:
            change = change & (vt == self.absorbing_state)
        v_pred = jnp.argmax(c_pred, axis=-1)
        v_next = jnp.where(change, v_pred, vt)
        c_next = jax.nn.one_hot(v_next, self.num_classes)
        return c_next, v_next

    def backward_strided(self, key, c_pred, ct, t, s, gen_flag,
                         pred_logit: bool = True, fix_pred: bool = True):
        """Strided reverse jump t -> s for the absorbing process.

        The forward marginal masks with probability t/T, so the exact
        posterior reveal probability for a t -> s jump is
        P(revealed at s | absorbed at t) = 1 - s/t (s = -1, the clean
        decode, reveals everything). Note the unit-step
        backward_remove_noise keeps the reference's (T-t)/T heuristic
        instead (diffusion_scheduler.py:487) — strided ladders use the
        posterior form."""
        if pred_logit:
            c_pred = jax.nn.softmax(c_pred, axis=-1)
        vt = jnp.argmax(ct, axis=-1)
        tt = jnp.maximum(t[:, None].astype(jnp.float32), 1.0)
        ss = jnp.clip(s[:, None].astype(jnp.float32), 0.0, None)
        prob = jnp.where(s[:, None] >= 0, 1.0 - ss / tt, 1.0)
        change = (jax.random.uniform(key, vt.shape) < prob) & gen_flag
        if fix_pred:
            change = change & (vt == self.absorbing_state)
        v_pred = jnp.argmax(c_pred, axis=-1)
        v_next = jnp.where(change, v_pred, vt)
        c_next = jax.nn.one_hot(v_next, self.num_classes)
        return c_next, v_next

    def get_loss(self, c_pred, v0, vt, t, gen_flag, pred_logit: bool = True):
        """Cross-entropy on generated atoms (reference applies softmax then
        F.cross_entropy — i.e. double softmax; we keep single log_softmax of
        the post-softmax probs to match its argmax/ordering semantics)."""
        if pred_logit:
            probs = jax.nn.softmax(c_pred, axis=-1)
        else:
            probs = c_pred
        # The reference feeds softmaxed probs into F.cross_entropy, which
        # applies log_softmax again — keep that (double-softmax) semantics.
        logp = jax.nn.log_softmax(probs, axis=-1)
        nll = -jnp.take_along_axis(logp, v0[..., None], axis=-1)[..., 0]
        g = gen_flag.astype(nll.dtype)
        per_graph = jnp.sum(nll * g, axis=1) / jnp.maximum(g.sum(1), 1e-8)
        loss = jnp.mean(per_graph)
        info = {"v0": v0, "vt": vt, "c_pred": probs, "mask_gen": gen_flag}
        return loss, info
