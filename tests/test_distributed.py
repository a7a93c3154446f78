"""Multi-PROCESS data parallelism over a localhost jax.distributed cluster.

The virtual 8-device mesh used everywhere else runs in one process; this
test spawns two real worker processes (4 virtual CPU devices each) that
form one jax.distributed cluster over a localhost Gloo coordinator — the
same code path (initialize / global_mesh / process-local ingestion /
cross-host psums) a real multi-host TPU pod uses, per SURVEY §2's
"distributed comm backend" row.

Asserts:
  * both workers finish and produce IDENTICAL final iterates (the state
    is replicated; any cross-process divergence means broken collectives),
  * the distributed trajectory matches a single-process run of the same
    global problem (data parallelism is semantically invisible).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same global problem on this process's devices (no cluster)."""
    import jax
    import jax.numpy as jnp

    from stochqn_tpu.core.config import SQNConfig
    from stochqn_tpu.fused import FusedTrainer

    B, BS, N, L = 8, 8, 12, 4
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.standard_normal((B, BS, N)), jnp.float32)
    a = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, N)), jnp.float32)

    def grad_fn(x, batch):
        return a @ (x - jnp.mean(batch, axis=0))

    trainer = FusedTrainer("SQN",
                           SQNConfig.create(mem_size=3, bfgs_upd_freq=L),
                           grad_fn)
    state = trainer.init(jnp.zeros(N, jnp.float32))
    epoch = jax.jit(trainer.epoch, static_argnames=("aligned",))
    for _ in range(2):
        state, _ = epoch(state, centers, jnp.float32(0.1), aligned=True)
    return np.asarray(state.x)


def test_two_process_data_parallel_epoch(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"w{i}.txt" for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(outs[i])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=360)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    xs = [np.array([float(v) for v in out.read_text().split()])
          for out in outs]
    # replicated state: every process must hold the identical iterate
    np.testing.assert_array_equal(xs[0], xs[1])
    # ...and data parallelism must be semantically invisible
    ref = _single_process_reference()
    np.testing.assert_allclose(xs[0], ref, rtol=2e-5, atol=1e-6)
