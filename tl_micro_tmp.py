"""Per-step cost breakdown of the fused SQN base step on TPU.

Chained evolving-state loops (tunnel memoizes identical executions).
Variants:
  grad   : gradient computation only
  tl_now : current two_loop_cached (concat projection + 3 small matvecs)
  tl_C   : d = gamma*g + W^T(C (W g)) with C a [2m,2m] constant,
           projection as two stacked matvecs (no concat)
  full   : grad + tl_now (approximates the fused base step)
"""
import os, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from stochqn_tpu.core.state import BFGSMemory
from stochqn_tpu.ops.pairs import commit_pair
from stochqn_tpu.ops.two_loop import two_loop_cached, PRECISION

N_FEAT, N_CLS, BS = 1836, 159, 50
N = (N_FEAT + 1) * N_CLS
M = 10
STEPS = 2000

rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((BS, N_FEAT)), jnp.float32)
Y = jnp.asarray(np.eye(N_CLS, dtype=np.float32)[rng.integers(0, N_CLS, BS)])

from stochqn_tpu.models.losses import multinomial_logistic_grad

mem = BFGSMemory.create(M, N, jnp.float32)
key = jax.random.PRNGKey(0)
for i in range(M):
    key, k1, k2 = jax.random.split(key, 3)
    s = jax.random.normal(k1, (N,), jnp.float32) * 0.01
    mem = mem.replace(s_pending=s)
    y = s * 2.0 + jax.random.normal(k2, (N,), jnp.float32) * 0.001
    mem, _ = commit_pair(mem, y, 0.0, 0.0)

C = jnp.asarray(rng.standard_normal((2 * M, 2 * M)), jnp.float32) * 0.01


def grad_only(x, _):
    g = multinomial_logistic_grad(x, X, Y, reg_param=0.1)
    return x - 1e-4 * g, None


def tl_now(x, _):
    d = two_loop_cached(x, mem, h0=0.0)
    return x - 1e-4 * d, None


def tl_C(x, _):
    wg_s = jnp.matmul(mem.s, x, preferred_element_type=jnp.float32,
                      precision=PRECISION)
    wg_y = jnp.matmul(mem.y, x, preferred_element_type=jnp.float32,
                      precision=PRECISION)
    wg = jnp.concatenate([wg_s, wg_y])
    u = jnp.matmul(C, wg, precision=PRECISION)
    d = mem.gamma.astype(jnp.float32) * x \
        + jnp.matmul(u[:M], mem.s, precision=PRECISION) \
        + jnp.matmul(u[M:], mem.y, precision=PRECISION)
    return x - 1e-4 * d, None


def full(x, _):
    g = multinomial_logistic_grad(x, X, Y, reg_param=0.1)
    d = two_loop_cached(g, mem, h0=0.0)
    return x - 1e-4 * d, None


def full_C(x, _):
    g = multinomial_logistic_grad(x, X, Y, reg_param=0.1)
    wg_s = jnp.matmul(mem.s, g, preferred_element_type=jnp.float32,
                      precision=PRECISION)
    wg_y = jnp.matmul(mem.y, g, preferred_element_type=jnp.float32,
                      precision=PRECISION)
    wg = jnp.concatenate([wg_s, wg_y])
    u = jnp.matmul(C, wg, precision=PRECISION)
    d = mem.gamma.astype(jnp.float32) * g \
        + jnp.matmul(u[:M], mem.s, precision=PRECISION) \
        + jnp.matmul(u[M:], mem.y, precision=PRECISION)
    return x - 1e-4 * d, None


def bench(name, body):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    run(x0).block_until_ready()           # compile
    t0 = time.perf_counter()
    x = run(x0)
    x = run(x * 1.000001)                 # chained: state evolves
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / (2 * STEPS)
    print(f"{name:8s}: {dt*1e6:8.2f} us/step")
    return dt


bench("grad", grad_only)
bench("tl_now", tl_now)
bench("tl_C", tl_C)
bench("full", full)
bench("full_C", full_C)
