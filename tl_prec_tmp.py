import os, time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N, M = 1837 * 159, 10
STEPS = 2000
rng = np.random.default_rng(0)
S = jnp.asarray(rng.standard_normal((M, N)), jnp.float32) * 0.01
Y = jnp.asarray(rng.standard_normal((M, N)), jnp.float32) * 0.01
C = jnp.asarray(rng.standard_normal((2*M, 2*M)), jnp.float32) * 0.01
S16, Y16 = S.astype(jnp.bfloat16), Y.astype(jnp.bfloat16)
HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT

def bench(name, body):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    x = run(x0); x = run(x * 1.000001); x.block_until_ready()
    print(f"{name:20s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step", flush=True)

def proj_hi(x, _):
    w = jnp.concatenate([S, Y], axis=0)
    v = jnp.matmul(w, x, preferred_element_type=jnp.float32, precision=HI)
    return x + 1e-9 * jnp.sum(v), None

def proj_de(x, _):
    w = jnp.concatenate([S, Y], axis=0)
    v = jnp.matmul(w, x, preferred_element_type=jnp.float32, precision=DE)
    return x + 1e-9 * jnp.sum(v), None

def c2_hi(x, _):
    w = jnp.concatenate([S, Y], axis=0)
    wg = jnp.matmul(w, x, preferred_element_type=jnp.float32, precision=HI)
    u = jnp.matmul(C, wg, precision=HI)
    d = 0.9 * x + jnp.matmul(u, w, precision=HI)
    return x - 1e-4 * d, None

def c2_de(x, _):
    w = jnp.concatenate([S, Y], axis=0)
    wg = jnp.matmul(w, x, preferred_element_type=jnp.float32, precision=DE)
    u = jnp.matmul(C, wg, precision=DE)
    d = 0.9 * x + jnp.matmul(u, w, precision=DE)
    return x - 1e-4 * d, None

def c2_bf16(x, _):
    w = jnp.concatenate([S16, Y16], axis=0)
    wg = jnp.matmul(w, x.astype(jnp.bfloat16), preferred_element_type=jnp.float32, precision=DE)
    u = jnp.matmul(C, wg, precision=HI)
    d = 0.9 * x + jnp.matmul(u.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32, precision=DE)
    return x - 1e-4 * d, None

bench("proj HIGHEST", proj_hi)
bench("proj DEFAULT", proj_de)
bench("C2 f32 HIGHEST", c2_hi)
bench("C2 f32 DEFAULT", c2_de)
bench("C2 bf16 W", c2_bf16)
