"""Weak-scaling harness for data-parallel SQN.

Fixed per-device batch; devices 1..N.  On this box only a single TPU chip
is reachable, so the harness runs on a virtual CPU mesh by default — it
validates the scaling *mechanism* (sharded batches, psum-reduced gradients,
replicated state) and reports efficiency numbers that are meaningful on
real multi-chip hardware where each mesh slot is a chip.

    python benchmarks/scaling.py            # virtual CPU mesh (8 devices)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
# Default to the virtual CPU mesh; set SCALING_ON_TPU=1 on a real slice.
if not os.environ.get("SCALING_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # CPU runs must not share the TPU-tunnel compile cache (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.models import losses
from stochqn_tpu.parallel import make_mesh, shard_batches, shard_state

N_FEATURES = 512
N_CLASSES = 32
PER_DEVICE_BATCH = 64
NUM_BATCHES = 32
EPOCHS = 3


def run(n_devices: int) -> float:
    rng = np.random.default_rng(0)
    bs = PER_DEVICE_BATCH * n_devices
    X = jnp.asarray(rng.standard_normal((NUM_BATCHES, bs, N_FEATURES)),
                    jnp.float32)
    labels = rng.integers(0, N_CLASSES, (NUM_BATCHES, bs))
    Y = jnp.asarray(np.eye(N_CLASSES)[labels], jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((N_FEATURES + 1) * N_CLASSES),
                     jnp.float32)

    def grad_fn(x, batch):
        Xb, Yb = batch
        return losses.multinomial_logistic_grad(x, Xb, Yb, None, 1e-2)

    trainer = FusedTrainer(
        "SQN", SQNConfig.create(mem_size=10, bfgs_upd_freq=8), grad_fn)
    state = trainer.init(x0)

    mesh = make_mesh(n_data=n_devices, n_param=1,
                     devices=jax.devices()[:n_devices])
    state = shard_state(state, mesh)
    data = shard_batches((X, Y), mesh)

    epoch = jax.jit(trainer.epoch)
    state, _ = epoch(state, data, jnp.float32(1e-2))      # warmup/compile
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        state, _ = epoch(state, data, jnp.float32(1e-2))
    jax.block_until_ready(state.x)
    return EPOCHS * NUM_BATCHES / (time.perf_counter() - t0)


def main():
    ndev = len(jax.devices())
    results = {}
    base = None
    for d in [1, 2, 4, 8]:
        if d > ndev:
            break
        ips = run(d)
        if base is None:
            base = ips
        results[str(d)] = {
            "iters_per_s": round(ips, 2),
            "weak_scaling_efficiency": round(ips / base, 3),
        }
        print(f"{d} device(s): {ips:8.1f} iters/s  "
              f"(efficiency {ips / base:.2f})")
    print(json.dumps({"weak_scaling": results}))


if __name__ == "__main__":
    main()
