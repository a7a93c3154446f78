"""float64 on the real TPU (VERDICT r4 weak #6 / item 5).

The reference's dual precision (``USE_DOUBLE`` builds,
``/root/reference/setup.py:51-58``) is fully replicated on CPU
(tests/test_parity_fuzz.py runs f64 lockstep against the reference's
double build), but every TPU artifact so far is f32/bf16.  This probe
answers the open question: does XLA:TPU run the fused engine in f64 at
all, and at what cost?

Method: the flagship SQN workload at two dtypes, identical shapes and
trip counts, interleaved reps, differenced program sizes (8 vs 28
epochs = 2400 steps) to cancel the tunnel's fixed dispatch cost.  If
f64 compilation or execution fails, the exact exception is recorded —
a reproducible "XLA:TPU rejects X" is the honest artifact then.

Writes benchmarks/out/f64_tpu.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.models import losses

N_FEATURES, N_CLASSES, BATCH_SIZE = 1836, 159, 50
NUM_BATCHES, UPD_FREQ, MEM_SIZE = 120, 20, 10
REG, STEP = 1e-1, 1e-2
EPOCHS_SMALL, EPOCHS_BIG = 8, 28
N_ROUNDS = 3


def build(dtype):
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal(
        (NUM_BATCHES, BATCH_SIZE, N_FEATURES)), dtype)
    labels = rng.integers(0, N_CLASSES, (NUM_BATCHES, BATCH_SIZE))
    Y = jnp.asarray(np.eye(N_CLASSES)[labels], dtype)
    x0 = jnp.asarray(rng.standard_normal((N_FEATURES + 1) * N_CLASSES),
                     dtype)

    def grad_fn(x, batch):
        Xb, Yb = batch
        return losses.multinomial_logistic_grad(x, Xb, Yb, None, REG)

    trainer = FusedTrainer(
        "SQN", SQNConfig.create(mem_size=MEM_SIZE, bfgs_upd_freq=UPD_FREQ),
        grad_fn)
    return trainer, trainer.init(x0), (X, Y)


def measure(dtype):
    trainer, state, data = build(dtype)
    eta = jnp.asarray(STEP, dtype)
    fn = trainer.jit_epochs()
    # compile + warm both sizes
    st, _ = fn(state, data, eta, nepochs=EPOCHS_SMALL, aligned=True)
    float(jnp.sum(st.x))
    st, _ = fn(state, data, eta, nepochs=EPOCHS_BIG, aligned=True)
    float(jnp.sum(st.x))

    diffs = []
    for _ in range(N_ROUNDS):
        ts = {}
        for ne in (EPOCHS_SMALL, EPOCHS_BIG):
            t0 = time.perf_counter()
            st, _ = fn(state, data, eta, nepochs=ne, aligned=True)
            chk = float(jnp.sum(st.x))
            ts[ne] = time.perf_counter() - t0
            if chk != chk:
                raise RuntimeError("NaN iterate")
        diffs.append((ts[EPOCHS_BIG] - ts[EPOCHS_SMALL])
                     / ((EPOCHS_BIG - EPOCHS_SMALL) * NUM_BATCHES) * 1e6)
    med = statistics.median(diffs)
    return {"us_per_step_median": round(med, 2),
            "iters_per_s": round(1e6 / med, 1),
            "rounds_us": [round(v, 2) for v in diffs]}


def main():
    out = {"device": jax.devices()[0].device_kind,
           "note": ("fused SQN flagship shape, differenced 2400-step "
                    "program sizes; f64 vs f32 on the same chip")}
    for name, dtype in (("f32", jnp.float32), ("f64", jnp.float64)):
        try:
            out[name] = measure(dtype)
            print(name, out[name], flush=True)
        except Exception as e:  # noqa: BLE001 — the failure IS the result
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:2000]}"}
            print(name, "FAILED:", out[name]["error"][:200], flush=True)
    if "iters_per_s" in out.get("f32", {}) and \
            "iters_per_s" in out.get("f64", {}):
        out["f64_slowdown_x"] = round(
            out["f32"]["iters_per_s"] / out["f64"]["iters_per_s"], 2)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "out", "f64_tpu.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
