"""Isolate the fused-direction kernel's bottleneck: DMA vs compute.

Variants (all tile_n=32768, grid=(n_tiles,) single phase):
  stream : DMA tiles in, write one f32 out (pure streaming floor)
  projA  : dot_general contraction (current lowering)
  projB  : reshape [2m, TN/128, 128] -> elementwise FMA accumulate on lanes,
           single cross-lane reduce at the end
  expA   : d = u @ W via dot_general
  expB   : d = sum_j u_j * W[j]  explicit broadcast-FMA
"""
import os, time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 1837 * 159
M2 = 20            # 2m rows
TN = 32768
STEPS = 2000
rng = np.random.default_rng(0)
NPAD = ((N + TN - 1) // TN) * TN
W = jnp.asarray(rng.standard_normal((M2, NPAD)), jnp.float32)
U = jnp.asarray(rng.standard_normal((M2, 1)), jnp.float32) * 0.01
CP = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                          vmem_limit_bytes=100 * 1024 * 1024)


def bench(name, step):
    @jax.jit
    def run(x0):
        x, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return x
    x0 = jnp.asarray(rng.standard_normal(NPAD), jnp.float32)
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    x = run(x0); x = run(x * 1.000001); x.block_until_ready()
    print(f"{name:8s}: {(time.perf_counter()-t0)/(2*STEPS)*1e6:8.2f} us/step", flush=True)


# --- stream: just read W tiles + g tiles, accumulate trivial sum
def _stream_k(w_ref, g_ref, o_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)
    o_ref[:, :] += w_ref[0:1, 0:1] + g_ref[0:1, 0:1]

def stream(x):
    return pl.pallas_call(
        _stream_k, grid=(NPAD // TN,),
        in_specs=[pl.BlockSpec((M2, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=CP)(W, x.reshape(1, NPAD))

# --- projA: dot_general
def _projA_k(w_ref, g_ref, o_ref):
    i = pl.program_id(0)
    part = jax.lax.dot_general(w_ref[:, :], g_ref[:, :], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    @pl.when(i == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)
    o_ref[:, :] += part

def projA(x):
    return pl.pallas_call(
        _projA_k, grid=(NPAD // TN,),
        in_specs=[pl.BlockSpec((M2, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M2, 1), jnp.float32),
        compiler_params=CP)(W, x.reshape(1, NPAD))

# --- projB: lane-resident accumulate
def _projB_k(w_ref, g_ref, o_ref):
    i = pl.program_id(0)
    w = w_ref[:, :].reshape(M2, TN // 128, 128)
    g = g_ref[:, :].reshape(1, TN // 128, 128)
    part = jnp.sum(w * g, axis=1)              # [M2, 128] lane-resident
    @pl.when(i == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)
    o_ref[:, :] += part

def projB(x):
    part = pl.pallas_call(
        _projB_k, grid=(NPAD // TN,),
        in_specs=[pl.BlockSpec((M2, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M2, 128), jnp.float32),
        compiler_params=CP)(W, x.reshape(1, NPAD))
    return jnp.sum(part, axis=1)

# --- expA: u @ W dot_general
def _expA_k(w_ref, u_ref, o_ref):
    o_ref[:, :] = jax.lax.dot_general(
        u_ref[:, :], w_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

def expA(x):
    return pl.pallas_call(
        _expA_k, grid=(NPAD // TN,),
        in_specs=[pl.BlockSpec((M2, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((M2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NPAD), jnp.float32),
        compiler_params=CP)(W, U + 1e-9 * x[0])

# --- expB: broadcast-FMA over rows
def _expB_k(w_ref, u_ref, o_ref):
    w = w_ref[:, :]
    u = u_ref[:, :]
    o_ref[:, :] = jnp.sum(u * w, axis=0, keepdims=True)

def expB(x):
    return pl.pallas_call(
        _expB_k, grid=(NPAD // TN,),
        in_specs=[pl.BlockSpec((M2, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((M2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NPAD), jnp.float32),
        compiler_params=CP)(W, U + 1e-9 * x[0])


bench("stream", lambda x, _: (x + 1e-12 * stream(x)[0, 0], None))
bench("projA", lambda x, _: (x + 1e-12 * jnp.sum(projA(x)), None))
bench("projB", lambda x, _: (x + 1e-12 * jnp.sum(projB(x)), None))
bench("expA", lambda x, _: (x + 1e-9 * expA(x)[0], None))
bench("expB", lambda x, _: (x + 1e-9 * expB(x)[0], None))
