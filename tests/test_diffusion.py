"""Scheduler tests: numeric invariants + brute-force posterior checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.diffusion import (CTNVPScheduler, MaskTypeScheduler,
                                    RotVPScheduler, TypeVPScheduler,
                                    VariationalScheduler, make_beta_schedule)

T = 100


@pytest.mark.parametrize("kind", ["quad", "linear", "const", "jsd", "sigmoid",
                                  "cosine"])
def test_beta_schedules_valid(kind):
    betas = make_beta_schedule(kind, T)
    assert betas.shape == (T,)
    assert (betas > 0).all() and (betas <= 1).all()  # jsd ends exactly at 1
    ac = np.cumprod(1 - betas)
    assert (np.diff(ac) <= 0).all()


class TestCTNVP:
    sched = CTNVPScheduler.create(T, kind="sigmoid")

    def test_forward_keeps_context_fixed(self):
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 3)),
                        jnp.float32)
        gen = jnp.asarray(np.array([[1] * 5 + [0] * 5] * 2, bool))
        t = jnp.array([T - 1, T // 2])
        x_t, _ = self.sched.forward_add_noise(key, x, t, gen)
        np.testing.assert_allclose(np.asarray(x_t)[:, 5:], np.asarray(x)[:, 5:])
        assert not np.allclose(np.asarray(x_t)[:, :5], np.asarray(x)[:, :5])

    def test_zero_center_decomposition(self):
        key = jax.random.PRNGKey(1)
        x = jnp.zeros((2, 8, 3))
        gen = jnp.ones((2, 8), bool)
        t = jnp.array([10, 50])
        _, pos_noise, com_noise = self.sched.forward_add_noise(
            key, x, t, gen, zero_center=True)
        total = np.asarray(pos_noise + com_noise)
        # pos_noise has zero mean over valid atoms
        np.testing.assert_allclose(np.asarray(pos_noise).mean(1),
                                   0.0, atol=1e-6)
        # com part is constant per graph
        assert np.allclose(np.asarray(com_noise),
                           np.asarray(com_noise)[:, :1], atol=1e-6)
        assert np.isfinite(total).all()

    def test_denoise_posterior_recovers_x0(self):
        """With a perfect x0 predictor, iterating xs_mean from x_T converges
        to x0 (DDPM posterior correctness)."""
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(1, 6, 3)), jnp.float32)
        gen = jnp.ones((1, 6), bool)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, x0.shape)
        for t_idx in reversed(range(T)):
            t = jnp.array([t_idx])
            x = self.sched.xs_mean(x0, x, t, gen, pred_type="denoise")
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-2)

    def test_score_loss_zero_for_perfect_prediction(self):
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        gen = jnp.ones((2, 6), bool)
        t = jnp.array([20, 70])
        key = jax.random.PRNGKey(3)
        xt, noise = self.sched.forward_add_noise(key, x0, t, gen)
        # score target is (x0 - xt)/sigma = -noise (by construction)
        a = np.asarray(self.sched.tables.alphas_cumprod)[np.asarray(t)]
        sigma = np.sqrt(1 - a)[:, None, None]
        tgt = (np.asarray(x0) - np.asarray(xt)) / sigma
        loss, _ = self.sched.get_loss(jnp.asarray(tgt), x0, xt, t, gen,
                                      pred_type="score")
        assert float(loss) < 1e-10


class TestTypeVP:
    K = 5
    sched = TypeVPScheduler.create(T, K, kind="cosine")

    def test_posterior_matches_bruteforce(self):
        """Compare log-space q(v_{t-1}|v_t,v_0) against explicit Bayes over
        the uniform-transition matrices."""
        alphas = np.exp(np.asarray(self.sched.log_alphas))
        abar = np.exp(np.asarray(self.sched.log_alphas_cumprod))
        K = self.K
        for t_idx in [1, 10, 50, 99]:
            v0, vt = 2, 4
            # brute force: posterior(j) ∝ q(vt | vt-1=j) q(vt-1=j | v0)
            q_step = alphas[t_idx] * np.eye(K) + (1 - alphas[t_idx]) / K
            abar_tm1 = abar[t_idx - 1]
            q_tm1_v0 = abar_tm1 * np.eye(K)[v0] + (1 - abar_tm1) / K
            post = q_step[:, vt] * q_tm1_v0
            post /= post.sum()

            log_v0 = jnp.log(jax.nn.one_hot(jnp.array([[v0]]), K) + 1e-30)
            log_vt = jnp.log(jax.nn.one_hot(jnp.array([[vt]]), K) + 1e-30)
            ours = np.exp(np.asarray(
                self.sched.q_v_posterior(log_v0, log_vt,
                                         jnp.array([t_idx]))))[0, 0]
            np.testing.assert_allclose(ours, post, atol=1e-4)

    def test_forward_keeps_context(self):
        v0 = jnp.asarray(np.random.default_rng(0).integers(0, self.K, (2, 12)))
        gen = jnp.asarray(np.array([[1] * 6 + [0] * 6] * 2, bool))
        t = jnp.array([T - 1, T - 1])
        _, vt = self.sched.forward_add_noise(jax.random.PRNGKey(0), v0, t, gen)
        np.testing.assert_array_equal(np.asarray(vt)[:, 6:],
                                      np.asarray(v0)[:, 6:])

    def test_loss_small_for_perfect_pred_t0(self):
        v0 = jnp.asarray(np.random.default_rng(1).integers(0, self.K, (2, 8)))
        gen = jnp.ones((2, 8), bool)
        t = jnp.zeros((2,), jnp.int32)
        c_pred = jax.nn.one_hot(v0, self.K) * 30.0  # sharp logits
        loss, _ = self.sched.get_loss(c_pred, v0, v0, t, gen)
        assert float(loss) < 1e-4

    def test_reverse_step_valid(self):
        key = jax.random.PRNGKey(2)
        v0 = jnp.asarray(np.random.default_rng(2).integers(0, self.K, (2, 8)))
        gen = jnp.ones((2, 8), bool)
        t = jnp.array([50, 50])
        ct, vt = self.sched.forward_add_noise(key, v0, t, gen)
        c_pred = jax.nn.one_hot(v0, self.K) * 10.0
        c_next, v_next = self.sched.backward_remove_noise(key, c_pred, ct, t,
                                                          gen)
        assert v_next.shape == (2, 8)
        assert (np.asarray(v_next) >= 0).all()
        assert (np.asarray(v_next) < self.K).all()


class TestMaskType:
    sched = MaskTypeScheduler(num_timesteps=T, num_classes=6,
                              absorbing_state=0)

    def test_forward_masks_proportionally(self):
        v0 = jnp.full((2, 200), 3, jnp.int32)
        gen = jnp.ones((2, 200), bool)
        t = jnp.array([T, T // 2])
        v_t, c_t, diff_mask = self.sched.forward_add_noise(
            jax.random.PRNGKey(0), v0, t, gen)
        frac = np.asarray(diff_mask).mean(axis=1)
        assert frac[0] > 0.9           # t = T: everything masked
        assert 0.3 < frac[1] < 0.7     # t = T/2: about half
        assert (np.asarray(v_t)[np.asarray(diff_mask)] == 0).all()

    def test_backward_reveals(self):
        vt = jnp.zeros((1, 50), jnp.int32)          # all absorbed
        ct = jax.nn.one_hot(vt, 6)
        gen = jnp.ones((1, 50), bool)
        c_pred = jax.nn.one_hot(jnp.full((1, 50), 4), 6) * 10.0
        t = jnp.array([1])                          # near the end: reveal most
        _, v_next = self.sched.backward_remove_noise(
            jax.random.PRNGKey(1), c_pred, ct, t, gen)
        assert (np.asarray(v_next) == 4).mean() > 0.9


class TestRotVP:
    sched = RotVPScheduler.create(20, kind="sigmoid")

    def test_forward_small_t_small_perturbation(self):
        from cbgbench_tpu.utils.so3 import so3vec_to_rotation
        rng = np.random.default_rng(0)
        o0 = jnp.asarray(rng.normal(scale=0.5, size=(2, 4, 3)), jnp.float32)
        gen = jnp.ones((2, 4), bool)
        key = jax.random.PRNGKey(0)
        o_t0, _, _ = self.sched.forward_add_noise(key, o0, jnp.array([0, 0]),
                                                  gen)
        o_tT, _, _ = self.sched.forward_add_noise(key, o0,
                                                  jnp.array([19, 19]), gen)
        R0 = np.asarray(so3vec_to_rotation(o0))
        Rt0 = np.asarray(so3vec_to_rotation(o_t0))
        RtT = np.asarray(so3vec_to_rotation(o_tT))
        err0 = np.abs(Rt0 - R0).mean()
        errT = np.abs(RtT - R0).mean()
        assert errT > err0

    def test_backward_shapes(self):
        o = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 3)),
                        jnp.float32)
        gen = jnp.ones((2, 4), bool)
        out = self.sched.backward_remove_noise(jax.random.PRNGKey(1), o, o,
                                               jnp.array([5, 5]), gen)
        assert out.shape == (2, 4, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestVariational:
    sched = VariationalScheduler.create(T, "polynomial_2")

    def test_gamma_monotone(self):
        t = jnp.linspace(0, 1, 50)
        g = np.asarray(self.sched.gamma(t))
        assert (np.diff(g) >= -1e-5).all()

    def test_alpha_sigma_unit(self):
        t = jnp.linspace(0, 1, 50)
        g = self.sched.gamma(t)
        a = np.asarray(self.sched.alpha_of_gamma(g))
        s = np.asarray(self.sched.sigma_of_gamma(g))
        np.testing.assert_allclose(a ** 2 + s ** 2, 1.0, atol=1e-5)

    def test_forward_backward_finite(self):
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 3)),
                        jnp.float32)
        gen = jnp.ones((2, 6), bool)
        t = jnp.array([0.5, 0.9])
        x_t, eps = self.sched.forward_add_noise(key, x, t, gen)
        out = self.sched.backward_remove_noise(key, x_t, eps, t, gen)
        assert np.isfinite(np.asarray(out)).all()

    def test_kl_prior_nonnegative(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6, 3)),
                        jnp.float32)
        gen = jnp.ones((2, 6), bool)
        kl = np.asarray(self.sched.kl_prior(x, gen, dimensions=15))
        assert (kl > -1e-3).all()


class TestStrided:
    """Strided (fast-sampling) reverse jumps: unit-stride equivalence +
    brute-force composition checks."""

    T = 100
    pos = CTNVPScheduler.create(T, kind="sigmoid")
    typ = TypeVPScheduler.create(T, 5, kind="cosine")

    def test_pos_unit_stride_matches_legacy(self):
        """backward_strided at s=t-1 agrees with the table-based unit step
        to f32 conditioning (the abar_t/abar_s ratio loses ~0.3% when the
        stride is one small-beta step — which is why the sampler keeps
        the exact tables for unit_stride and the strided math for jumps)."""
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(3, 8, 3)), jnp.float32)
        xt = jnp.asarray(rng.normal(size=(3, 8, 3)), jnp.float32)
        gen = jnp.asarray(rng.random((3, 8)) < 0.7)
        key = jax.random.PRNGKey(7)
        for t_idx in [1, 17, 50, 99]:
            t = jnp.full((3,), t_idx, jnp.int32)
            legacy = self.pos.backward_remove_noise(
                key, x0, xt, t, gen, pred_type="denoise")
            strided = self.pos.backward_strided(key, x0, xt, t, t - 1, gen)
            np.testing.assert_allclose(np.asarray(strided),
                                       np.asarray(legacy),
                                       rtol=1e-2, atol=1e-2)
        # final decode: t=0, s=-1 equals the legacy noise-free t=0 step
        t0 = jnp.zeros((3,), jnp.int32)
        legacy0 = self.pos.backward_remove_noise(key, x0, xt, t0, gen,
                                                 pred_type="denoise")
        strided0 = self.pos.backward_strided(key, x0, xt, t0,
                                             jnp.full((3,), -1), gen)
        np.testing.assert_allclose(np.asarray(strided0), np.asarray(legacy0),
                                   rtol=1e-4, atol=1e-5)

    def test_pos_strided_matches_gaussian_composition(self):
        """q(x_s|x_t,x0) for a long jump must equal Bayes over the cumulative
        forward kernels: N(x_t; sqrt(a_ts) x_s, 1-a_ts) N(x_s; sqrt(ab_s) x0,
        1-ab_s) — checked via the analytic product-of-Gaussians mean/var on
        scalars."""
        ab = np.asarray(self.pos.tables.alphas_cumprod)
        for (t_idx, s_idx) in [(99, 49), (70, 10), (25, 0)]:
            a_ts = ab[t_idx] / ab[s_idx]
            x0, xt = 0.7, -1.3
            # product of two Gaussian densities in x_s
            m1, v1 = np.sqrt(ab[s_idx]) * x0, 1 - ab[s_idx]
            # N(xt; sqrt(a_ts) xs, 1-a_ts) as a density in xs:
            m2, v2 = xt / np.sqrt(a_ts), (1 - a_ts) / a_ts
            var = 1.0 / (1 / v1 + 1 / v2)
            mean = var * (m1 / v1 + m2 / v2)
            t = jnp.array([t_idx]); s = jnp.array([s_idx])
            x0a = jnp.full((1, 1, 3), x0); xta = jnp.full((1, 1, 3), xt)
            gen = jnp.ones((1, 1), bool)
            # eta=1 mean: strided posterior coefficients
            got_mean = self.pos.backward_strided(
                jax.random.PRNGKey(0), x0a, xta, t, s, gen, eta=1.0)
            # subtract the noise term to recover the mean: use two keys and
            # average? No — recompute deterministically via eta=0 identity
            # is a different mean; instead draw z explicitly:
            z = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 3))
            abar_t, abar_s = ab[t_idx], ab[s_idx]
            sig = np.sqrt((1 - abar_s) / (1 - abar_t) * (1 - a_ts))
            mean_got = np.asarray(got_mean)[0, 0, 0] - sig * np.asarray(z)[0, 0, 0]
            np.testing.assert_allclose(mean_got, mean, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(sig ** 2, var, rtol=1e-4, atol=1e-6)

    def test_pos_ddim_deterministic(self):
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        xt = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
        gen = jnp.ones((2, 6), bool)
        t = jnp.full((2,), 80, jnp.int32)
        s = jnp.full((2,), 40, jnp.int32)
        a = self.pos.backward_strided(jax.random.PRNGKey(0), x0, xt, t, s,
                                      gen, eta=0.0)
        b = self.pos.backward_strided(jax.random.PRNGKey(123), x0, xt, t, s,
                                      gen, eta=0.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_type_unit_stride_matches_legacy(self):
        rng = np.random.default_rng(2)
        log_v0 = jax.nn.log_softmax(
            jnp.asarray(rng.normal(size=(2, 6, 5)), jnp.float32), -1)
        log_vt = jnp.log(jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, (2, 6))), 5) + 1e-8)
        # compare in probability space: tail log-probs of a one-small-beta
        # stride are f32-cancellation-limited (the sampler uses the exact
        # unit-step path for unit strides; strided math serves real jumps)
        for t_idx in [1, 30, 99]:
            t = jnp.full((2,), t_idx, jnp.int32)
            legacy = self.typ.q_v_posterior(log_v0, log_vt, t)
            strided = self.typ.q_v_posterior_strided(log_v0, log_vt, t, t - 1)
            np.testing.assert_allclose(np.exp(np.asarray(strided)),
                                       np.exp(np.asarray(legacy)),
                                       rtol=1e-3, atol=1e-4)
        t0 = jnp.zeros((2,), jnp.int32)
        legacy0 = self.typ.q_v_posterior(log_v0, log_vt, t0)
        strided0 = self.typ.q_v_posterior_strided(log_v0, log_vt, t0,
                                                  jnp.full((2,), -1))
        np.testing.assert_allclose(np.exp(np.asarray(strided0)),
                                   np.exp(np.asarray(legacy0)),
                                   rtol=1e-3, atol=1e-4)

    def test_type_strided_matches_matrix_composition(self):
        """The cumulative-ratio kernel q(v_t|v_s) must equal the product of
        unit uniform-transition matrices from s to t."""
        alphas = np.exp(np.asarray(self.typ.log_alphas))
        abar = np.exp(np.asarray(self.typ.log_alphas_cumprod))
        K = 5
        for (t_idx, s_idx) in [(40, 20), (99, 0), (10, 9)]:
            m = np.eye(K)
            for u in range(s_idx + 1, t_idx + 1):
                m = m @ (alphas[u] * np.eye(K) + (1 - alphas[u]) / K)
            a_ts = abar[t_idx] / abar[s_idx]
            closed = a_ts * np.eye(K) + (1 - a_ts) / K
            np.testing.assert_allclose(closed, m, rtol=1e-4, atol=1e-6)
            # and the strided posterior uses exactly that kernel
            v0, vt = 1, 3
            q_s_v0 = abar[s_idx] * np.eye(K)[v0] + (1 - abar[s_idx]) / K
            post = closed[:, vt] * q_s_v0
            post /= post.sum()
            log_v0 = jnp.log(jax.nn.one_hot(jnp.array([[v0]]), K) + 1e-30)
            log_vt = jnp.log(jax.nn.one_hot(jnp.array([[vt]]), K) + 1e-30)
            ours = np.exp(np.asarray(self.typ.q_v_posterior_strided(
                log_v0, log_vt, jnp.array([t_idx]), jnp.array([s_idx]))))[0, 0]
            np.testing.assert_allclose(ours, post, atol=1e-4)
