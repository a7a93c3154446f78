import os, time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from stochqn_tpu.core.state import BFGSMemory
from stochqn_tpu.ops.pairs import commit_pair
from stochqn_tpu.ops.two_loop import two_loop_cached
from stochqn_tpu.ops.pallas import two_loop_kernel as tlk
from stochqn_tpu.models.losses import multinomial_logistic_grad

N_FEAT, N_CLS, BS, M = 1836, 159, 50, 10
N = (N_FEAT + 1) * N_CLS
STEPS = 2000
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((BS, N_FEAT)), jnp.float32)
Y = jnp.asarray(np.eye(N_CLS, dtype=np.float32)[rng.integers(0, N_CLS, BS)])

mem = BFGSMemory.create(M, N, jnp.float32)
key = jax.random.PRNGKey(0)
for i in range(M):
    key, k1, k2 = jax.random.split(key, 3)
    s = jax.random.normal(k1, (N,), jnp.float32) * 0.01
    mem = mem.replace(s_pending=s)
    y = s * 2.0 + jax.random.normal(k2, (N,), jnp.float32) * 0.001
    mem, _ = commit_pair(mem, y, 0.0, 0.0, direction_cache=True)

gamma = jnp.where(mem.count > 0, mem.gamma, 1.0).astype(jnp.float32)
C = (mem.c0 + gamma * mem.cg).astype(jnp.float32)

def bench(name, body):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    x = run(x0); x = run(x * 1.000001); x.block_until_ready()
    print(f"{name:14s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step")

def tl_now(x, _):
    return x - 1e-4 * two_loop_cached(x, mem, h0=0.0), None

def tl_fused(x, _):
    d = tlk.direction(mem.s, mem.y, x, C, gamma)
    return x - 1e-4 * d, None

def tl_fused_t512(x, _):
    d = tlk.direction(mem.s, mem.y, x, C, gamma, tile_n=512)
    return x - 1e-4 * d, None

def tl_fused_t2048(x, _):
    d = tlk.direction(mem.s, mem.y, x, C, gamma, tile_n=2048)
    return x - 1e-4 * d, None

def full_now(x, _):
    g = multinomial_logistic_grad(x, X, Y, reg_param=0.1)
    return x - 1e-4 * two_loop_cached(g, mem, h0=0.0), None

def full_fused(x, _):
    g = multinomial_logistic_grad(x, X, Y, reg_param=0.1)
    d = tlk.direction(mem.s, mem.y, g, C, gamma)
    return x - 1e-4 * d, None

bench("tl_now", tl_now)
bench("tl_fused 1024", tl_fused)
bench("tl_fused 512", tl_fused_t512)
bench("tl_fused 2048", tl_fused_t2048)
bench("full_now", full_now)
bench("full_fused", full_fused)
