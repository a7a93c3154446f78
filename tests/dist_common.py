"""Shared problem definition for the multi-process distributed tests.

Imported both by the pytest module (single-process reference trajectory)
and by the spawned workers (``tests/dist_worker.py``), so the two sides
are guaranteed to run the identical global problem.

The problem is a batched quadratic whose gradient is a *sample mean* over
the example axis — the exact structure every reference request has
(SURVEY §2: "every external request is a sample mean over a batch") —
so data parallelism must be semantically invisible.
"""
import numpy as np

# global shapes: 8 batches x 8 global rows x 12 params, upd_freq 4
B, BS_GLOBAL, N, L = 8, 8, 12, 4
NEPOCHS = 2
STEP = 0.1

OPTIMIZERS = ("SQN", "adaQN", "oLBFGS")
TOPOLOGIES = ("dp", "param")


def make_data():
    """Deterministic global dataset + curvature, identical everywhere."""
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((B, BS_GLOBAL, N)).astype(np.float32)
    a = np.diag(rng.uniform(0.5, 2.0, N)).astype(np.float32)
    x0 = np.zeros(N, np.float32)
    return centers, a, x0


def make_trainer(optimizer, a):
    """FusedTrainer for one of the three optimizers on the quadratic."""
    import jax.numpy as jnp

    from stochqn_tpu.core.config import (AdaQNConfig, OLBFGSConfig,
                                         SQNConfig)
    from stochqn_tpu.fused import FusedTrainer

    aj = jnp.asarray(a)

    def grad_fn(x, batch):
        return aj @ (x - jnp.mean(batch, axis=0))

    def obj_fn(x, batch):
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * r @ (aj @ r)

    if optimizer == "SQN":
        return FusedTrainer(
            "SQN", SQNConfig.create(mem_size=3, bfgs_upd_freq=L), grad_fn)
    if optimizer == "adaQN":
        return FusedTrainer(
            "adaQN",
            AdaQNConfig.create(mem_size=3, fisher_size=6, bfgs_upd_freq=L,
                               max_incr=1.01, rmsprop_weight=0.9),
            grad_fn, obj_fn=obj_fn)
    if optimizer == "oLBFGS":
        return FusedTrainer("oLBFGS", OLBFGSConfig.create(mem_size=3),
                            grad_fn)
    raise ValueError(optimizer)


def run_single_process(optimizer):
    """The global problem on this process's devices (no cluster) — the
    trajectory every distributed cell must reproduce."""
    import jax
    import jax.numpy as jnp

    centers, a, x0 = make_data()
    trainer = make_trainer(optimizer, a)
    state = trainer.init(jnp.asarray(x0))
    epoch = trainer.jit_epoch()
    for _ in range(NEPOCHS):
        state, _ = epoch(state, jnp.asarray(centers), jnp.float32(STEP),
                         aligned=True)
    return np.asarray(jax.device_get(state.x))
