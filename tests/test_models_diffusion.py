"""DiffBP / DiffSBDD / D3FG: loss, training step, sampling smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbgbench_tpu.data.batch import synthetic_batch, synthetic_fg_batch
from cbgbench_tpu.models.diffbp import DiffBP, sample_diffbp, interior_loss
from cbgbench_tpu.models.diffsbdd import DiffSBDD, sample_diffsbdd
from cbgbench_tpu.models.d3fg import D3FG, sample_d3fg
from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step

TINY = dict(num_timesteps=20, emb_dim=32, num_layers=2, n_heads=4, k=8)


@pytest.fixture(scope="module")
def atom_batch():
    return synthetic_batch(0, batch_size=2, n_lig=10, n_rec=40,
                           num_atom_types=8, lig_cap=16, rec_cap=48)


class TestDiffBP:
    @pytest.fixture(scope="class")
    def setup(self, atom_batch):
        model = DiffBP(num_classes=8, num_layers_com=1, **TINY)
        rng = jax.random.PRNGKey(0)
        t = jnp.array([5, 10])
        params = jax.jit(model.init)(rng, atom_batch, t, rng)
        return model, params

    def test_loss_structure(self, setup, atom_batch):
        model, params = setup
        losses, _ = model.apply(params, atom_batch, jnp.array([5, 10]),
                                jax.random.PRNGKey(1))
        assert set(losses) == {"pos", "atom", "com", "inter"}
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_grads_finite(self, setup, atom_batch):
        model, params = setup

        def f(p):
            ld, _ = model.apply(p, atom_batch, jnp.array([5, 10]),
                                jax.random.PRNGKey(2))
            return model.weighted_loss(ld)

        grads = jax.grad(f)(params)
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_sampling(self, setup, atom_batch):
        model, params = setup
        # absorbing prior: all generated types start at absorbing state 0
        lig = atom_batch.ligand.replace(atype=jnp.zeros_like(
            atom_batch.ligand.atype))
        out = sample_diffbp(model, params, atom_batch.replace(ligand=lig),
                            jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(out["pos"])).all()
        assert (np.asarray(out["atype"]) < 8).all()

    def test_fast_sampling_strided(self, setup, atom_batch):
        """Strided ladder: explicit num_steps=T equals the default full-T
        run (unit-stride keeps the legacy score-form step); a short ladder
        is finite and leaves no generated atom in the absorbing state."""
        model, params = setup
        lig = atom_batch.ligand.replace(atype=jnp.zeros_like(
            atom_batch.ligand.atype))
        b = atom_batch.replace(ligand=lig)
        rng = jax.random.PRNGKey(4)
        full = sample_diffbp(model, params, b, rng)
        explicit = sample_diffbp(model, params, b, rng,
                                 num_steps=model.num_timesteps)
        np.testing.assert_array_equal(np.asarray(full["pos"]),
                                      np.asarray(explicit["pos"]))
        fast = sample_diffbp(model, params, b, rng, num_steps=4)
        assert np.isfinite(np.asarray(fast["pos"])).all()
        a = np.asarray(fast["atype"])
        assert (a >= 0).all() and (a < model.num_classes).all()
        # short ladder actually moved generated positions off the prior
        gen = np.asarray(b.ligand.gen_flag & b.ligand.mask)
        assert not np.allclose(np.asarray(fast["pos"])[gen],
                               np.asarray(b.ligand.pos)[gen])


def test_interior_loss_behavior():
    """Anti-clash: the softmin squared distance to protein atoms is pushed
    above gamma. Ligand atoms overlapping protein -> positive loss; atoms a
    safe distance away -> 0 (reference: diffbp.py:18-28)."""
    rec = jnp.asarray(np.random.default_rng(0).normal(scale=3.0,
                                                      size=(1, 50, 3)),
                      jnp.float32)
    rec_mask = jnp.ones((1, 50), bool)
    clashing = rec[:, :5] + 0.1
    far = clashing + 100.0
    m = jnp.ones((1, 5), bool)
    l_clash = float(interior_loss(clashing, rec, m, rec_mask))
    l_far = float(interior_loss(far, rec, m, rec_mask))
    assert l_clash > l_far
    assert l_clash > 3.0 and l_far == 0.0


class TestDiffSBDD:
    @pytest.fixture(scope="class")
    def setup(self, atom_batch):
        model = DiffSBDD(num_classes=8, **TINY)
        rng = jax.random.PRNGKey(0)
        t = jnp.array([0.3, 0.8])
        params = jax.jit(model.init)(rng, atom_batch, t, rng)
        return model, params

    def test_loss_finite(self, setup, atom_batch):
        model, params = setup
        for tv in [jnp.array([0.0, 0.0]), jnp.array([0.5, 1.0])]:
            losses, _ = model.apply(params, atom_batch, tv,
                                    jax.random.PRNGKey(1))
            assert np.isfinite(float(losses["pos"]))

    def test_train_step(self, setup, atom_batch):
        model, params = setup
        tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, donate=False)
        for i in range(3):
            state, metrics = step(state, atom_batch, jax.random.PRNGKey(2))
            assert np.isfinite(float(metrics["loss"]))

    def test_sampling(self, setup, atom_batch):
        model, params = setup
        out = sample_diffsbdd(model, params, atom_batch, jax.random.PRNGKey(3))
        pos = np.asarray(out["pos"])
        assert np.isfinite(pos).all()
        # generated atoms should land near the pocket (receptor centroid)
        rec_com = np.asarray(atom_batch.protein.pos).mean(1, keepdims=True)
        gen = np.asarray(atom_batch.ligand.gen_flag & atom_batch.ligand.mask)
        d = np.linalg.norm(pos - rec_com, axis=-1)[gen]
        assert d.mean() < 30.0

    def test_fast_sampling_strided(self, setup, atom_batch):
        """Strided continuous-time ladder: explicit num_steps=T equals the
        default full-T run; a short ladder stays finite and near the
        pocket."""
        model, params = setup
        rng = jax.random.PRNGKey(4)
        full = sample_diffsbdd(model, params, atom_batch, rng)
        explicit = sample_diffsbdd(model, params, atom_batch, rng,
                                   num_steps=model.num_timesteps)
        np.testing.assert_array_equal(np.asarray(full["pos"]),
                                      np.asarray(explicit["pos"]))
        fast = sample_diffsbdd(model, params, atom_batch, rng, num_steps=5)
        pos = np.asarray(fast["pos"])
        assert np.isfinite(pos).all()
        rec_com = np.asarray(atom_batch.protein.pos).mean(1, keepdims=True)
        gen = np.asarray(atom_batch.ligand.gen_flag & atom_batch.ligand.mask)
        assert np.linalg.norm(pos - rec_com, axis=-1)[gen].mean() < 30.0


class TestD3FG:
    @pytest.fixture(scope="class")
    def setup(self):
        batch = synthetic_fg_batch(0, batch_size=2, n_fg=5, n_res=24,
                                   fg_cap=8, res_cap=32)
        model = D3FG(num_fg_types=28, num_timesteps=10, emb_dim=32,
                     num_layers=2, n_heads=4, k=8)
        rng = jax.random.PRNGKey(0)
        t = jnp.array([3, 7])
        params = jax.jit(model.init)(rng, batch, t, rng)
        return model, params, batch

    def test_loss_structure(self, setup):
        model, params, batch = setup
        losses, results = model.apply(params, batch, jnp.array([3, 7]),
                                      jax.random.PRNGKey(1))
        assert set(losses) == {"pos", "rot", "fg"}
        assert all(np.isfinite(float(v)) for v in losses.values())
        assert float(losses["rot"]) >= 0

    def test_train_step(self, setup):
        model, params, batch = setup
        tx = get_optimizer({"type": "adam", "lr": 1e-3}, max_grad_norm=8.0)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, donate=False)
        losses = []
        for i in range(10):
            state, metrics = step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()

    def test_sampling(self, setup):
        model, params, batch = setup
        out = sample_d3fg(model, params, batch, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(out["pos"])).all()
        assert np.isfinite(np.asarray(out["orient"])).all()
        tf = np.asarray(out["type_fg"])
        assert (tf >= 0).all() and (tf < 28).all()

    def test_fast_sampling_strided(self, setup):
        """Strided frame ladder: explicit num_steps=T equals the default
        full-T run; a short ladder stays finite with unit-ish orientation
        vectors decoded from valid rotations."""
        from cbgbench_tpu.utils.so3 import so3vec_to_rotation
        model, params, batch = setup
        rng = jax.random.PRNGKey(4)
        full = sample_d3fg(model, params, batch, rng)
        explicit = sample_d3fg(model, params, batch, rng,
                               num_steps=model.num_timesteps)
        np.testing.assert_array_equal(np.asarray(full["pos"]),
                                      np.asarray(explicit["pos"]))
        fast = sample_d3fg(model, params, batch, rng, num_steps=4)
        assert np.isfinite(np.asarray(fast["pos"])).all()
        R = np.asarray(so3vec_to_rotation(fast["orient"]))
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye,
                                   atol=1e-4)
