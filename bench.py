"""Benchmark: fused SQN on the BibTeX-shaped multinomial logistic workload.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The workload mirrors the reference's README benchmark setup
(``example/example_stochqn.ipynb``: BibTeX 6,655 train x 1,836 features x
159 classes, batch_size=50, reg_param=1e-1) with synthetic data of the same
shape.  The metric is optimizer iterations per second END-TO-END — each
iteration includes its minibatch gradient evaluation, and every
``bfgs_upd_freq`` iterations the big-batch ``jvp`` Hessian-vector product
and correction-pair update, exactly like the reference's accounting.

``vs_baseline`` compares against the reference C core measured on this
machine (``benchmarks/reference_baseline.py`` writes
``BASELINE_MEASURED.json``); 1.0 when no measurement exists.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.models import losses

# BibTeX shapes (example/example_stochqn.ipynb cell-1 output)
N_FEATURES = 1836
N_CLASSES = 159
BATCH_SIZE = 50
NUM_BATCHES = 120          # 6000 of the 6655 train rows (aligned to upd_freq)
UPD_FREQ = 20
REG = 1e-1
STEP = 1e-2
DTYPE = jnp.float32


def build():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal(
        (NUM_BATCHES, BATCH_SIZE, N_FEATURES)), DTYPE)
    labels = rng.integers(0, N_CLASSES, (NUM_BATCHES, BATCH_SIZE))
    Y = jnp.asarray(np.eye(N_CLASSES)[labels], DTYPE)
    x0 = jnp.asarray(rng.standard_normal((N_FEATURES + 1) * N_CLASSES), DTYPE)

    def grad_fn(x, batch):
        Xb, Yb = batch
        return losses.multinomial_logistic_grad(x, Xb, Yb, None, REG)

    trainer = FusedTrainer(
        "SQN", SQNConfig.create(mem_size=10, bfgs_upd_freq=UPD_FREQ),
        grad_fn)
    return trainer, trainer.init(x0), (X, Y)


def main():
    trainer, state, data = build()
    epoch_fn = jax.jit(trainer.epoch)
    eta = jnp.asarray(STEP, DTYPE)

    # warmup / compile
    state, _ = epoch_fn(state, data, eta)
    jax.block_until_ready(state.x)

    n_epochs = 5
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, infos = epoch_fn(state, data, eta)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0

    iters = n_epochs * NUM_BATCHES
    iters_per_s = iters / dt

    vs_baseline = 1.0
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        # like-for-like: this bench runs float32, so compare against the
        # reference's own float32 (-DUSE_FLOAT) build when measured
        ref_ips = (ref.get("reference_sqn_bibtex_iters_per_s_f32")
                   or ref.get("reference_sqn_bibtex_iters_per_s"))
        if ref_ips:
            vs_baseline = iters_per_s / ref_ips

    print(json.dumps({
        "metric": "sqn_bibtex_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
