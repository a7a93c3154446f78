"""Worker process for tests/test_distributed.py.

Each worker owns 4 virtual CPU devices; two workers form one 8-device
jax.distributed cluster over a localhost Gloo coordinator.  The worker
loads ONLY its process_local_batch_slice of the global dataset, assembles
global sharded batches with parallel.distributed.global_batches, runs a
data-parallel fused SQN epoch, and writes the (replicated) final-iterate
checksum for the parent test to compare across workers and against the
single-process trajectory.

Usage: python tests/dist_worker.py <pid> <nproc> <port> <outfile>
"""
import os
import sys

pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_cpu_max_isa=AVX2")

import jax

jax.config.update("jax_platforms", "cpu")

# distributed.initialize must run before ANYTHING touches the XLA backend
# — importing the package initializes it (device queries in module
# scope), so the cluster is brought up first.
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

from stochqn_tpu.parallel import distributed

assert jax.process_count() == nproc

import numpy as np
import jax.numpy as jnp

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.fused import FusedTrainer

B, BS_GLOBAL, N, L = 8, 8, 12, 4

# Full global dataset, deterministic on every process; each worker keeps
# only its slice of the example axis.
rng = np.random.default_rng(0)
centers = rng.standard_normal((B, BS_GLOBAL, N)).astype(np.float32)
a = np.diag(rng.uniform(0.5, 2.0, N)).astype(np.float32)
x0 = np.zeros(N, np.float32)
rows = distributed.process_local_batch_slice(BS_GLOBAL)
local = centers[:, rows, :]

aj = jnp.asarray(a)


def grad_fn(x, batch):
    return aj @ (x - jnp.mean(batch, axis=0))


trainer = FusedTrainer("SQN", SQNConfig.create(mem_size=3, bfgs_upd_freq=L),
                       grad_fn)
mesh = distributed.global_mesh()
state = distributed.replicate_global(trainer.init(jnp.asarray(x0)), mesh)
data = distributed.global_batches(local, mesh)

epoch = jax.jit(trainer.epoch, static_argnames=("aligned",))
for _ in range(2):
    state, _ = epoch(state, data, jnp.float32(0.1), aligned=True)

x = np.asarray(jax.device_get(state.x))
with open(outfile, "w") as f:
    f.write(" ".join(f"{v:.8e}" for v in x))
print(f"[worker {pid}] done, niter={int(state.niter)}", flush=True)
