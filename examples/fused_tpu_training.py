"""Fused on-device training: multinomial logistic regression at BibTeX scale.

The whole training epoch — minibatch gradients, two-loop directions, big-
batch jvp Hessian-vector products, pair updates — runs as one jitted
``lax.scan`` on the accelerator.  This is the configuration behind the
repo's headline benchmark (bench.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.models import losses

N_FEATURES, N_CLASSES, BATCH, NUM_BATCHES = 1836, 159, 50, 120


def main():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((NUM_BATCHES, BATCH, N_FEATURES)),
                    jnp.float32)
    labels = rng.integers(0, N_CLASSES, (NUM_BATCHES, BATCH))
    Y = jnp.asarray(np.eye(N_CLASSES)[labels], jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((N_FEATURES + 1) * N_CLASSES),
                     jnp.float32)

    def grad_fn(x, batch):
        Xb, Yb = batch
        return losses.multinomial_logistic_grad(x, Xb, Yb, None, 1e-1)

    def full_loss(x):
        return float(losses.multinomial_logistic_loss(
            x, X.reshape(-1, N_FEATURES), Y.reshape(-1, N_CLASSES),
            None, 1e-1))

    trainer = FusedTrainer(
        "SQN", SQNConfig.create(mem_size=10, bfgs_upd_freq=20), grad_fn)
    state = trainer.init(x0)
    epoch = jax.jit(trainer.epoch)

    print(f"devices: {jax.devices()}  initial loss: {full_loss(state.x):.1f}")
    for e in range(5):
        t0 = time.perf_counter()
        state, infos = epoch(state, (X, Y), jnp.float32(1e-2))
        jax.block_until_ready(state.x)
        dt = time.perf_counter() - t0
        print(f"epoch {e}: loss {full_loss(state.x):12.1f}   "
              f"{NUM_BATCHES/dt:8.0f} iters/s "
              "(incl. the full-data loss eval; see bench.py for pure "
              "optimizer throughput)")

    # Whole-RUN single dispatch: N more epochs as ONE device program
    # (one host round trip total — the recommended shape for synchronous
    # callers; guided fit(engine="fused") does this automatically).  A
    # [nepochs] step array rides the scan as a per-epoch decay schedule.
    steps = jnp.asarray([1e-2 / np.sqrt(e + 1) for e in range(10)],
                        jnp.float32)
    t0 = time.perf_counter()
    state, infos = trainer.jit_epochs()(state, (X, Y), steps, nepochs=10)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(f"10 more epochs in one program: loss {full_loss(state.x):12.1f}"
          f"   {10 * NUM_BATCHES / dt:8.0f} iters/s   "
          f"infos shape {infos.shape}")


if __name__ == "__main__":
    main()
