"""Worker process for tests/test_distributed.py.

Each worker owns 4 virtual CPU devices; two workers form one 8-device
jax.distributed cluster over a localhost Gloo coordinator.  The worker
builds the shared global problem (``tests/dist_common.py``) for the
requested optimizer and topology, loads ONLY its
process_local_batch_slice of the dataset, runs NEPOCHS data-parallel
fused epochs, and writes the final iterate for the parent test to compare
across workers and against the single-process trajectory.

Topologies:
  * ``dp``    — data-only mesh (8 x 1): state replicated, batches sharded
    8-way with the example axis spanning both processes.
  * ``param`` — (data x param) mesh (2 x 4): batch example axis sharded
    across the two processes, every [*, n] state array sharded 4-way over
    each process's local devices (the large-n layout, SURVEY §5).

Usage: python tests/dist_worker.py <pid> <nproc> <port> <outfile>
                                   <optimizer> <topology>
"""
import os
import sys

pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
optimizer = sys.argv[5] if len(sys.argv) > 5 else "SQN"
topology = sys.argv[6] if len(sys.argv) > 6 else "dp"
# local virtual devices per process (4-proc cells use 2 each -> 8 global)
ndev = int(os.environ.get("DIST_TEST_LOCAL_DEVICES", "4"))
os.environ["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={ndev} "
                           "--xla_cpu_max_isa=AVX2")

import jax

jax.config.update("jax_platforms", "cpu")

# distributed.initialize must run before ANYTHING touches the XLA backend
# — importing the package initializes it (device queries in module
# scope), so the cluster is brought up first.
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

from stochqn_tpu.parallel import distributed
from stochqn_tpu.parallel.mesh import make_mesh

assert jax.process_count() == nproc

import numpy as np
import jax.numpy as jnp

import dist_common as dc

centers, a, x0 = dc.make_data()
trainer = dc.make_trainer(optimizer, a)

# per-process ingestion: keep only this process's slice of the example axis
rows = distributed.process_local_batch_slice(dc.BS_GLOBAL)
local = centers[:, rows, :]

if topology == "dp":
    mesh = distributed.global_mesh()             # (8 data x 1 param)
    state = distributed.replicate_global(trainer.init(jnp.asarray(x0)),
                                         mesh)
else:
    # example axis split across the two processes; param axis within each
    mesh = make_mesh(n_data=nproc, n_param=len(jax.devices()) // nproc)
    state = distributed.shard_state_global(trainer.init(jnp.asarray(x0)),
                                           mesh)
data = distributed.global_batches(local, mesh)

epoch = trainer.jit_epoch()
for _ in range(dc.NEPOCHS):
    state, _ = epoch(state, data, jnp.float32(dc.STEP), aligned=True)

# every process reassembles the global iterate; a param-sharded x must be
# resharded to replicated first (an all-gather) to become host-readable
x_arr = state.x
if topology != "dp":
    from stochqn_tpu.parallel.mesh import replicated
    x_arr = jax.jit(lambda v: v, out_shardings=replicated(mesh))(state.x)
x = np.asarray(jax.device_get(x_arr))
with open(outfile, "w") as f:
    f.write(" ".join(f"{v:.8e}" for v in x))
print(f"[worker {pid}] {optimizer}/{topology} done, "
      f"niter={int(state.niter)}", flush=True)
