"""Two-process DCN feeding test (SURVEY §2.7 multi-host mandate).

Spawns two real OS processes, each with 2 virtual CPU devices, joined via
``jax.distributed`` on a localhost coordinator. Each process holds only its
own per-host batch shard; ``global_batch_from_host`` must assemble the
global [8, ...] jax.Array over the 4-device mesh without gathering through
host 0, and one dp train step must produce the same loss as the
single-process run (the reference has no counterpart — this validates the
rebuild's own DCN layer, parallel/mesh.py:67-93).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]

from cbgbench_tpu.parallel.mesh import (
    init_multihost, make_mesh, global_batch_from_host,
    data_parallel_sharding, replicate)
nproc = init_multihost(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert nproc == 2, nproc
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

from cbgbench_tpu.data.batch import synthetic_batch
from cbgbench_tpu.models.targetdiff import TargetDiff
from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step

model = TargetDiff(num_classes=13, num_timesteps=100, emb_dim=32,
                   num_layers=2, n_heads=4, k=8)
# the SAME deterministic global batch on every host; each host keeps only
# its contiguous quarter-pair (rows [4*pid : 4*pid+4])
gbatch = synthetic_batch(0, batch_size=8, n_lig=8, n_rec=24,
                         num_atom_types=13, lig_cap=16, rec_cap=32)
local = jax.tree.map(lambda x: np.asarray(x)[4 * pid:4 * pid + 4], gbatch)

mesh = make_mesh(jax.devices())
batch = global_batch_from_host(local, mesh)
want = data_parallel_sharding(mesh)
for leaf in jax.tree.leaves(batch):
    assert leaf.shape[0] == 8, leaf.shape          # global leading dim
    assert leaf.sharding.is_equivalent_to(want, leaf.ndim), leaf.sharding
    # each host addresses only its 2 local shards of 2 rows each
    assert len(leaf.addressable_shards) == 2

rng = jax.random.PRNGKey(0)
t = jnp.zeros((8,), jnp.int32)
params = jax.jit(model.init)(rng, batch, t, rng)
tx = get_optimizer({"type": "adam", "lr": 1e-4}, max_grad_norm=8.0)
state = TrainState.create(params, tx)
state = jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), state)
step = make_train_step(model, tx, donate=False)
state, metrics = step(state, batch, rng)
loss = float(metrics["loss"])
if pid == 0:
    with open(out, "w") as f:
        json.dump({"loss": loss,
                   "grad_norm": float(metrics["grad_norm"])}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_feed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    out = tmp_path / "metrics.json"
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port, str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    multi = json.loads(out.read_text())

    # single-process reference on this process's (8-virtual-device) mesh
    import jax.numpy as jnp
    from cbgbench_tpu.data.batch import synthetic_batch
    from cbgbench_tpu.models.targetdiff import TargetDiff
    from cbgbench_tpu.train import TrainState, get_optimizer, make_train_step

    model = TargetDiff(num_classes=13, num_timesteps=100, emb_dim=32,
                       num_layers=2, n_heads=4, k=8)
    batch = synthetic_batch(0, batch_size=8, n_lig=8, n_rec=24,
                            num_atom_types=13, lig_cap=16, rec_cap=32)
    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((8,), jnp.int32)
    params = jax.jit(model.init)(rng, batch, t, rng)
    tx = get_optimizer({"type": "adam", "lr": 1e-4}, max_grad_norm=8.0)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, donate=False)
    _, metrics = step(state, batch, rng)

    np.testing.assert_allclose(multi["loss"], float(metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(multi["grad_norm"],
                               float(metrics["grad_norm"]), rtol=1e-4)
