"""Raw matvec layout cost on TPU: projection/expansion variants."""
import os, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 1837 * 159
M2 = 20
STEPS = 2000
P = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
W = jnp.asarray(rng.standard_normal((M2, N)), jnp.float32)
WT = jnp.asarray(np.ascontiguousarray(np.asarray(W).T))
u0 = jnp.asarray(rng.standard_normal(M2), jnp.float32) * 0.01


def bench(name, body):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    x = run(x0)
    x = run(x * 1.000001)
    x.block_until_ready()
    print(f"{name:22s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step")


# projection variants: produce [M2] from x [N]
def proj_rowmajor(x, _):       # W [2m,n] @ x
    v = jnp.matmul(W, x, precision=P)
    return x + 1e-9 * jnp.sum(v), None

def proj_colmajor(x, _):       # x @ WT [n,2m]
    v = jnp.matmul(x, WT, precision=P)
    return x + 1e-9 * jnp.sum(v), None

# expansion variants: produce [N] from u [M2]
def exp_rowmajor(x, _):        # u @ W [2m,n]
    d = jnp.matmul(u0, W, precision=P)
    return x + 1e-9 * d, None

def exp_colmajor(x, _):        # WT [n,2m] @ u
    d = jnp.matmul(WT, u0, precision=P)
    return x + 1e-9 * d, None

# both passes, best-guess pairing
def both_row(x, _):
    v = jnp.matmul(W, x, precision=P)
    d = jnp.matmul(v, W, precision=P)
    return x + 1e-9 * d, None

def both_col(x, _):
    v = jnp.matmul(x, WT, precision=P)
    d = jnp.matmul(WT, v, precision=P)
    return x + 1e-9 * d, None

def both_mixed(x, _):          # row-major projection, col-major expansion
    v = jnp.matmul(W, x, precision=P)
    d = jnp.matmul(WT, v, precision=P)
    return x + 1e-9 * d, None

def both_mixed2(x, _):         # col-major projection, row-major expansion
    v = jnp.matmul(x, WT, precision=P)
    d = jnp.matmul(v, W, precision=P)
    return x + 1e-9 * d, None

# 2-D trick: keep the vector as [1, n] / [n, 1] matrices (MXU-shaped)
x2cache = None
def both_row_2d(x, _):
    v = jnp.matmul(W, x[:, None], precision=P)        # [2m, 1]
    d = jnp.matmul(v.T, W, precision=P)[0]            # [n]
    return x + 1e-9 * d, None

bench("proj W@x   (row)", proj_rowmajor)
bench("proj x@WT  (col)", proj_colmajor)
bench("exp  u@W   (row)", exp_rowmajor)
bench("exp  WT@u  (col)", exp_colmajor)
bench("both row", both_row)
bench("both col", both_col)
bench("both mixed r/c", both_mixed)
bench("both mixed c/r", both_mixed2)
bench("both row 2d", both_row_2d)
