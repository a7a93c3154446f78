import os, time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
rng = np.random.default_rng(0)
STEPS = 2000
DE = jax.lax.Precision.DEFAULT

def bench(name, body, n):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    x = run(x0); x = run(x * 1.000001); x.block_until_ready()
    print(f"{name:24s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step", flush=True)

NFULL = 1837 * 159
for frac in (1, 2, 4, 8, 16):
    n = NFULL // frac
    W = jnp.asarray(rng.standard_normal((20, n)), jnp.float32)
    def proj(x, _, W=W):
        v = jnp.matmul(W, x, preferred_element_type=jnp.float32, precision=DE)
        return x + 1e-9 * jnp.sum(v), None
    bench(f"matvec n={n}", proj, n)

# and rows: does it scale with m?
for rows in (20, 40, 80):
    n = NFULL
    W = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    def proj(x, _, W=W):
        v = jnp.matmul(W, x, preferred_element_type=jnp.float32, precision=DE)
        return x + 1e-9 * jnp.sum(v), None
    bench(f"matvec rows={rows}", proj, n)
