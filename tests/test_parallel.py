"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

SURVEY §2.7 / §4(5): the reference has no distributed layer; the rebuild's
dp design must be validated on fake devices. conftest.py provisions 8
virtual CPU devices; these tests actually use them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cbgbench_tpu.data.batch import synthetic_batch
from cbgbench_tpu.models.targetdiff import TargetDiff
from cbgbench_tpu.parallel import make_mesh, shard_batch
from cbgbench_tpu.parallel.mesh import (
    DATA_AXIS, data_parallel_sharding, replicate, shard_params)
from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step


def _model_and_batch(batch_size):
    model = TargetDiff(num_classes=13, num_timesteps=100, emb_dim=32,
                       num_layers=2, n_heads=4, k=8)
    batch = synthetic_batch(0, batch_size=batch_size, n_lig=8, n_rec=24,
                            num_atom_types=13, lig_cap=16, rec_cap=32)
    return model, batch


def _run_one_step(model, batch, mesh=None):
    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((batch.ligand.pos.shape[0],), jnp.int32)
    params = jax.jit(model.init)(rng, batch, t, rng)
    tx = get_optimizer({"type": "adam", "lr": 1e-4}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    if mesh is not None:
        batch = shard_batch(batch, mesh)
        state = jax.tree.map(
            lambda x: jax.device_put(x, replicate(mesh)), state)
    step = make_train_step(model, tx, donate=False)
    state, metrics = step(state, batch, rng)
    return state, {k: float(v) for k, v in metrics.items()}


def test_sharded_step_matches_single_device():
    """The dp-sharded train step must produce the same loss/grad-norm (and
    updated params) as the unsharded one — XLA's psum over the data axis is
    numerically the same mean as the single-device batch reduction."""
    model, batch = _model_and_batch(batch_size=8)
    mesh = make_mesh(jax.devices()[:8])

    state_1, m_1 = _run_one_step(model, batch)
    state_8, m_8 = _run_one_step(model, batch, mesh=mesh)

    assert np.isfinite(m_1["loss"])
    np.testing.assert_allclose(m_8["loss"], m_1["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_8["grad_norm"], m_1["grad_norm"], rtol=1e-4)
    # updated params agree leaf-by-leaf
    flat_1 = jax.tree.leaves(state_1.params)
    flat_8 = jax.tree.leaves(state_8.params)
    # Adam normalizes by sqrt(v), so elements whose grads are at float-eps
    # noise get updates that differ in direction between reduction orders;
    # compare with an absolute tolerance well under the lr=1e-4 update scale.
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-5)


def test_batch_and_params_shardings_committed():
    mesh = make_mesh(jax.devices()[:8])
    _, batch = _model_and_batch(batch_size=8)
    sharded = shard_batch(batch, mesh)
    want_batch = data_parallel_sharding(mesh)
    for leaf in jax.tree.leaves(sharded):
        assert leaf.sharding.is_equivalent_to(want_batch, leaf.ndim), (
            leaf.shape, leaf.sharding)
        # each device holds exactly B/8 of the leading dim
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert all(s[0] == leaf.shape[0] // 8 for s in shard_shapes)

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    rep = shard_params(params, mesh)
    for leaf in jax.tree.leaves(rep):
        assert leaf.sharding.is_equivalent_to(
            NamedSharding(mesh, P()), leaf.ndim)
        assert len(leaf.addressable_shards) == 8  # replicated on all


def test_uneven_batch_raises():
    mesh = make_mesh(jax.devices()[:8])
    _, batch = _model_and_batch(batch_size=6)  # 6 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(batch, mesh)


def test_two_device_mesh():
    """Smaller mesh (2 of 8 devices) also works and matches."""
    model, batch = _model_and_batch(batch_size=4)
    mesh = make_mesh(jax.devices()[:2])
    _, m_1 = _run_one_step(model, batch)
    _, m_2 = _run_one_step(model, batch, mesh=mesh)
    np.testing.assert_allclose(m_2["loss"], m_1["loss"], rtol=1e-5)


def test_dryrun_multichip_inline():
    """The graft entry's dryrun runs inline when devices are already
    provisioned (conftest gives us 8)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("_graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # raises on failure


def test_sample_cli_mesh(tmp_path):
    """sample_cli --mesh 2: sharded diffusion sampling through the real CLI
    produces valid SDFs (pockets/samples are dp over the batch axis)."""
    import glob
    import os
    from cbgbench_tpu.cli.train_cli import main as train_main
    from cbgbench_tpu.cli.sample_cli import main as sample_main

    cfg = str(tmp_path / "tiny.yml")
    with open(cfg, "w") as f:
        f.write("""
model:
  type: targetdiff
  encoder: {type: unitransformer, node_feat_dim: 16, n_heads: 2, num_layers: 1}
  generator:
    pos_schedule: {type: sigmoid, beta_start: 1.e-7, beta_end: 2.e-3}
    atom_schedule: {type: cosine, cosine_s: 0.01}
    num_diffusion_timesteps: 6
    time_sampler: symmetric
  embedder: {emb_dim: 16}
  mode: add_aromatic
data:
  train:
    name: pl_fa
    raw_path: assets/examples
    pocket_radius: 10.0
    transform: [{type: featurize_protein_fa}, {type: featurize_ligand_fa}]
  test:
    name: pl_fa
    raw_path: assets/examples
    pocket_radius: 10.0
    transform:
      - {type: remove_ligand}
      - {type: assign_molsize}
      - {type: assign_atomtype}
      - {type: assign_molpos}
      - {type: center_pos, center_flag: protein}
train:
  loss_weights: {pos: 1.0, atom: 100.0}
  max_iters: 1
  report_freq: 1
  batch_size: 2
  seed: 0
  optimizer: {type: adam, lr: 5.e-4}
sampling: {num_samples: 2, seed: 3}
""")
    train_main(["--config", cfg, "--logdir", str(tmp_path), "--tag", "t",
                "--no_tensorboard"])
    out = str(tmp_path / "res")
    sample_main(["--config", cfg,
                 "--checkpoint", str(tmp_path / "t" / "checkpoints"),
                 "--out_root", out, "--num_samples", "2",
                 "--batch_size", "2", "--index", "0", "--mesh", "2"])
    assert os.path.exists(os.path.join(out, "summary.json"))


def test_tensor_parallel_step_matches_single_device():
    """dp x tp (4x2) mesh with megatron-style Dense-output sharding
    (tensor_parallel_shardings): the train step must reproduce the
    single-device loss — GSPMD layout changes only reduction orders."""
    from cbgbench_tpu.parallel.mesh import (MODEL_AXIS, shard_params_tp,
                                            tensor_parallel_shardings)
    model, batch = _model_and_batch(batch_size=8)
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)

    state_1, m_1 = _run_one_step(model, batch)

    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((batch.ligand.pos.shape[0],), jnp.int32)
    params = jax.jit(model.init)(rng, batch, t, rng)
    tx = get_optimizer({"type": "adam", "lr": 1e-4}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    sb = shard_batch(batch, mesh)
    state = shard_params_tp(state, mesh)
    # at least one 2-D kernel leaf must actually be split over 'model'
    shardings = tensor_parallel_shardings(params, mesh)
    split = [s for s in jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec and s.spec[-1] == MODEL_AXIS]
    assert split, "no leaf sharded over the model axis"

    step = make_train_step(model, tx, donate=False)
    state_tp, metrics = step(state, sb, rng)
    np.testing.assert_allclose(float(metrics["loss"]), m_1["loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               m_1["grad_norm"], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_1.params),
                    jax.tree.leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-5)


def test_tensor_parallel_reduces_per_device_param_memory():
    """r3 verdict: TP was correctness-tested only; pin that the megatron
    layout actually SHARDS memory — per-device parameter bytes under
    dp4xtp2 must be well below the replicated footprint (most kernels
    are [*, D] with D % 2 == 0 and split their output dim)."""
    import jax
    import numpy as np
    from cbgbench_tpu.parallel.mesh import (make_mesh, shard_params,
                                            shard_params_tp)
    from cbgbench_tpu.models.targetdiff import TargetDiff
    from cbgbench_tpu.data.batch import synthetic_batch
    import jax.numpy as jnp

    model = TargetDiff(num_classes=8, num_timesteps=10, emb_dim=32,
                       num_layers=2, n_heads=4, k=4)
    batch = synthetic_batch(0, batch_size=4, n_lig=6, n_rec=20,
                            num_atom_types=8, lig_cap=8, rec_cap=24)
    rng = jax.random.PRNGKey(0)
    t0 = jnp.zeros((4,), jnp.int32)
    params = jax.jit(model.init)(rng, batch, t0, rng)

    def per_device_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            total += max(s.data.nbytes for s in leaf.addressable_shards)
        return total

    mesh = make_mesh(data=4, model=2)
    total = sum(l.nbytes for l in jax.tree.leaves(params))
    rep = per_device_bytes(shard_params(params, mesh))
    tp = per_device_bytes(shard_params_tp(params, mesh))
    assert rep == total, (rep, total)
    assert tp < 0.72 * total, (tp, total, tp / total)
