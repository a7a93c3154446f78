"""Pallas TPU kernels for the two-loop projection phase.

The compact two-loop (see :mod:`stochqn_tpu.ops.two_loop`) spends its O(n)
work in streaming passes over the ``[2m, n]`` pair memory ``W = [S; Y]``:

  project:  ``W g``          (+ ``W W^T`` when the Gram isn't cached,
                              + ``(Y*D) g`` and ``(Y*D) Y^T`` for adaQN's
                              per-step diagonal H0)
  expand:   ``W^T u``

XLA evaluates each matmul as its own pass over ``W``/``Y`` and materializes
the ``Y*D`` intermediate in HBM.  These kernels fuse every projection-phase
quantity into ONE streaming pass per operand tile — all products computed
while the tile is resident in VMEM — with float32 accumulation on the MXU:

  * :func:`project` — ``W g`` and ``W W^T`` in one pass (for the
    recompute-Gram path).
  * :func:`project_adaqn` — ``W g``, ``(Y*D) g``, ``(Y*D) Y^T`` in one pass
    (the adaQN hot path; the SY Gram comes from the incremental cache).

Accumulation across the tile grid uses the standard revisited-output
pattern (output block fixed, initialized at grid step 0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 1024


def _pad_to(arr, multiple, axis):
    size = arr.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return jnp.pad(arr, pad)


# ---------------------------------------------------------------------------
# W g + W W^T fused
# ---------------------------------------------------------------------------
def _project_kernel(s_ref, y_ref, g_ref, wg_ref, gram_ref):
    i = pl.program_id(0)

    w = jnp.concatenate([s_ref[:, :], y_ref[:, :]], axis=0)   # [2m, TN]
    g = g_ref[:, :]                                           # [1, TN]

    wg_part = jax.lax.dot_general(
        w, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [2m, 1]
    gram_part = jax.lax.dot_general(
        w, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [2m, 2m]

    @pl.when(i == 0)
    def _():
        wg_ref[:, :] = jnp.zeros_like(wg_ref)
        gram_ref[:, :] = jnp.zeros_like(gram_ref)

    wg_ref[:, :] += wg_part
    gram_ref[:, :] += gram_part


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def project(s_mem, y_mem, grad, *, tile_n: int = _TILE_N,
            interpret: bool = False):
    """Single-pass ``(W g, W W^T)`` with ``W = [s_mem; y_mem]``.

    Returns ``(wg [2m], gram [2m, 2m])`` in float32.
    """
    m, n = s_mem.shape
    s_p = _pad_to(s_mem, tile_n, 1)
    y_p = _pad_to(y_mem, tile_n, 1)
    g_p = _pad_to(grad.reshape(1, n), tile_n, 1)
    n_pad = s_p.shape[1]
    grid = (n_pad // tile_n,)

    wg, gram = pl.pallas_call(
        _project_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * m, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m, 2 * m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * m, 1), jnp.float32),
            jax.ShapeDtypeStruct((2 * m, 2 * m), jnp.float32),
        ],
        interpret=interpret,
    )(s_p, y_p, g_p)
    return wg[:, 0], gram


# ---------------------------------------------------------------------------
# adaQN projection: W g, (Y*D) g, (Y*D) Y^T fused
# ---------------------------------------------------------------------------
def _project_adaqn_kernel(s_ref, y_ref, d_ref, g_ref,
                          wg_ref, ydg_ref, ydy_ref):
    i = pl.program_id(0)

    s = s_ref[:, :]
    y = y_ref[:, :]
    d = d_ref[:, :]                                         # [1, TN]
    g = g_ref[:, :]

    w = jnp.concatenate([s, y], axis=0)                     # [2m, TN]
    yd = y * d                                              # [m, TN]

    wg_part = jax.lax.dot_general(
        w, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [2m, 1]
    ydg_part = jax.lax.dot_general(
        yd, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [m, 1]
    ydy_part = jax.lax.dot_general(
        yd, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [m, m]

    @pl.when(i == 0)
    def _():
        wg_ref[:, :] = jnp.zeros_like(wg_ref)
        ydg_ref[:, :] = jnp.zeros_like(ydg_ref)
        ydy_ref[:, :] = jnp.zeros_like(ydy_ref)

    wg_ref[:, :] += wg_part
    ydg_ref[:, :] += ydg_part
    ydy_ref[:, :] += ydy_part


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def project_adaqn(s_mem, y_mem, diag, grad, *, tile_n: int = _TILE_N,
                  interpret: bool = False):
    """Single-pass adaQN projection.

    Returns ``(wg [2m], ydg [m], ydy [m, m])`` in float32, where
    ``yd = y_mem * diag`` never touches HBM.
    """
    m, n = s_mem.shape
    s_p = _pad_to(s_mem, tile_n, 1)
    y_p = _pad_to(y_mem, tile_n, 1)
    d_p = _pad_to(diag.reshape(1, n), tile_n, 1)
    g_p = _pad_to(grad.reshape(1, n), tile_n, 1)
    n_pad = s_p.shape[1]
    grid = (n_pad // tile_n,)

    wg, ydg, ydy = pl.pallas_call(
        _project_adaqn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * m, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
        interpret=interpret,
    )(s_p, y_p, d_p, g_p)
    return wg[:, 0], ydg[:, 0], ydy
