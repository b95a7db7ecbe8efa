"""Persistent TPU experiment worker.

Keeps one warm JAX/TPU session and executes job files sequentially:
watch /tmp/tpu_jobs/NNN.py, exec in-process (shared globals `G`), write
stdout+errors to /tmp/tpu_jobs/NNN.out and create NNN.done.

Drive it with: echo '<python>' > /tmp/tpu_jobs/001.py ; wait for 001.done.
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# warm up the device once
jnp.zeros(()).block_until_ready()
with open(os.path.join(JOBS, "READY"), "w") as f:
    f.write(str(jax.devices()))
print("worker ready", jax.devices(), flush=True)

G = {"jax": jax, "jnp": jnp}

while True:
    jobs = sorted(f for f in os.listdir(JOBS)
                  if f.endswith(".py") and not os.path.exists(
                      os.path.join(JOBS, f[:-3] + ".done")))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    out_path = os.path.join(JOBS, name[:-3] + ".out")
    done_path = os.path.join(JOBS, name[:-3] + ".done")
    out_f = open(out_path, "a", buffering=1)   # append: restarts keep history
    old = sys.stdout
    sys.stdout = out_f
    fatal = False
    # fresh project code each job (the repo is edited between jobs)
    for mod in [m for m in list(sys.modules) if m.startswith("cbgbench_tpu")]:
        del sys.modules[mod]
    try:
        code = open(path).read()
        exec(compile(code, name, "exec"), G)
    except BaseException as e:
        traceback.print_exc(file=out_f)
        if "UNAVAILABLE" in str(e) or "FAILED_PRECONDITION" in str(e):
            fatal = True
    finally:
        sys.stdout = old
        out_f.close()
    with open(done_path, "w") as f:
        f.write("")
    print(f"job {name} done", flush=True)
    if not fatal:
        # health check: a wedged device fails even trivial ops
        try:
            jnp.zeros(()).block_until_ready()
            float(jnp.ones(()) + 1)
        except BaseException:
            fatal = True
    if fatal:
        # device wedged for this process: exec a fresh interpreter
        print("device error -> restarting worker", flush=True)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
