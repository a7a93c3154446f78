"""Micro-benchmark: two-loop step variants on the real TPU chip.

Compares, at BibTeX scale and at large-n scale:
  * XLA compact two-loop, Gram recomputed per step,
  * XLA compact two-loop with the cached Gram,
  * Pallas fused projection variants,
for both the scalar-H0 (SQN/oLBFGS) and diagonal-H0 (adaQN) paths.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from stochqn_tpu.ops.two_loop import two_loop


def timeit(fn, g0, *args, iters=50):
    """Chained timing: each iteration's gradient input depends on the
    previous output (the backend memoizes identical executions, so static
    repeats lie — see CLAUDE.md)."""
    g = g0
    out = fn(g, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = g0 + 1e-3 * fn(g, *args)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def bench(n, m=10):
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    y = s + 0.3 * jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32)
    d = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)
    w = jnp.concatenate([s, y], axis=0)
    gram = jnp.matmul(w, w.T)
    head, count = m - 1, m

    variants = {
        "scalar/xla/recompute": jax.jit(
            lambda g, s, y: two_loop(g, s, y, head, count)),
        "scalar/xla/gram": jax.jit(
            lambda g, s, y, gr: two_loop(g, s, y, head, count, gram=gr)),
        "scalar/pallas/recompute": jax.jit(
            lambda g, s, y: two_loop(g, s, y, head, count, use_pallas=True)),
        "diag/xla/gram": jax.jit(
            lambda g, s, y, gr, d: two_loop(g, s, y, head, count, diag=d,
                                            gram=gr)),
        "diag/pallas/gram": jax.jit(
            lambda g, s, y, gr, d: two_loop(g, s, y, head, count, diag=d,
                                            gram=gr, use_pallas=True)),
    }
    print(f"--- n = {n:,} (pair memory {2*m*n*4/1e6:.1f} MB) ---")
    for name, fn in variants.items():
        if "diag" in name:
            us = timeit(fn, g, s, y, gram, d)
        elif "gram" in name:
            us = timeit(fn, g, s, y, gram)
        else:
            us = timeit(fn, g, s, y)
        bw = (2 if "gram" in name or "pallas" in name else 3)
        print(f"{name:26s} {us:9.1f} us   (~{2*m*n*4*bw/us/1e3:.0f} GB/s "
              f"effective over {bw} W-passes)")


if __name__ == "__main__":
    for n in (292_083, 4_000_000, 16_000_000):
        bench(n)
