import os, time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from stochqn_tpu.core.state import BFGSMemory
from stochqn_tpu.ops.pairs import commit_pair
from stochqn_tpu.ops.pallas import two_loop_kernel as tlk

N, M = 1837 * 159, 10
STEPS = 2000
rng = np.random.default_rng(0)
mem = BFGSMemory.create(M, N, jnp.float32)
key = jax.random.PRNGKey(0)
for i in range(M):
    key, k1, k2 = jax.random.split(key, 3)
    s = jax.random.normal(k1, (N,), jnp.float32) * 0.01
    mem = mem.replace(s_pending=s)
    mem, _ = commit_pair(mem, s * 2.0 + jax.random.normal(k2, (N,), jnp.float32) * 1e-3,
                         0.0, 0.0, direction_cache=True)
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
    print(f"{name:16s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step", flush=True)

for tn in (4096, 8192, 16384, 32768):
    def body(x, _, tn=tn):
        d = tlk.direction(mem.s, mem.y, x, C, gamma, tile_n=tn)
        return x - 1e-4 * d, None
    bench(f"tl_fused {tn}", body)
