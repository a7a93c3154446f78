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
# Whole-direction kernel: d = gamma*g + W^T (C (W g)) with ONE HBM read of W
# ---------------------------------------------------------------------------
def _direction_kernel(s_ref, y_ref, g_ref, c_ref, gamma_ref, d_ref,
                      s_scr, y_scr, g_scr, wg_scr, u_scr):
    """Two-phase grid ``(2, n_tiles)``.

    Phase 0 streams the pair memory tiles in (HBM -> VMEM), parks them in
    VMEM scratch, and accumulates ``wg = W g``.  Phase 1 computes
    ``u = C wg`` once, then produces ``d`` tiles from the *scratch* copies
    — the ``[2m, n]`` buffers are read from HBM exactly once per step,
    halving the two-loop's HBM traffic (its entire cost at large n)
    versus separate project/expand passes.
    """
    p = pl.program_id(0)
    i = pl.program_id(1)
    tn = s_ref.shape[1]

    @pl.when(p == 0)
    def _():
        s = s_ref[:, :]
        y = y_ref[:, :]
        g = g_ref[:, :]
        s_scr[:, pl.ds(i * tn, tn)] = s
        y_scr[:, pl.ds(i * tn, tn)] = y
        g_scr[:, pl.ds(i * tn, tn)] = g
        w = jnp.concatenate([s, y], axis=0)                   # [2m, TN]
        wg_part = jax.lax.dot_general(
            w, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [2m, 1]

        @pl.when(i == 0)
        def _():
            wg_scr[:, :] = jnp.zeros_like(wg_scr)
        wg_scr[:, :] += wg_part

    @pl.when(p == 1)
    def _():
        @pl.when(i == 0)
        def _():
            u_scr[:, :] = jax.lax.dot_general(
                c_ref[:, :], wg_scr[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [2m, 1]

        m = s_scr.shape[0]
        s_t = s_scr[:, pl.ds(i * tn, tn)]
        y_t = y_scr[:, pl.ds(i * tn, tn)]
        g_t = g_scr[:, pl.ds(i * tn, tn)]
        u = u_scr[:, :]                                       # [2m, 1]
        us = u[:m, :]                                         # [m, 1]
        uy = u[m:, :]
        d = gamma_ref[0, 0] * g_t
        d += jax.lax.dot_general(us, s_t, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[0]
        d += jax.lax.dot_general(uy, y_t, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[0]
        d_ref[:, :] = d


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def direction(s_mem, y_mem, grad, c, gamma, *, tile_n: int = _TILE_N,
              interpret: bool = False):
    """Fused quasi-Newton direction ``gamma*g + W^T (C (W g))``.

    ``c`` is the collapsed small-math matrix ``[2m, 2m]`` from the commit
    cache (``pairs._small_cache(direction_cache=True)``:
    ``C = c0 + gamma*cg``); ``gamma`` a scalar.  Returns ``d [n]`` float32.

    VMEM use is ~``(2m + 1) * n * 4`` bytes (the scratch copies) — callers
    gate on that fitting the chip's VMEM and fall back to the two-pass XLA
    path otherwise.
    """
    m, n = s_mem.shape
    s_p = _pad_to(s_mem, tile_n, 1)
    y_p = _pad_to(y_mem, tile_n, 1)
    g_p = _pad_to(grad.reshape(1, n), tile_n, 1)
    n_pad = s_p.shape[1]
    grid = (2, n_pad // tile_n)
    c2 = c.reshape(2 * m, 2 * m).astype(jnp.float32)
    gam = jnp.asarray(gamma, jnp.float32).reshape(1, 1)

    # scratch holds the full padded pair memory: (2m + 1) rows of n floats
    # plus tile buffers — well past the default 16MB scoped-vmem budget
    scratch_bytes = (2 * m + 1) * n_pad * 4
    vmem_limit = min(2 * scratch_bytes + (8 << 20), 110 * 1024 * 1024)
    d = pl.pallas_call(
        _direction_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit)),
        in_specs=[
            # phase 0 streams tile i; phase 1 pins block 0 (reads scratch)
            pl.BlockSpec((m, tile_n), lambda p, i: (0, i * (1 - p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_n), lambda p, i: (0, i * (1 - p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda p, i: (0, i * (1 - p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m, 2 * m), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda p, i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((m, n_pad), jnp.float32),
            pltpu.VMEM((1, n_pad), jnp.float32),
            pltpu.VMEM((2 * m, 1), jnp.float32),
            pltpu.VMEM((2 * m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(s_p, y_p, g_p, c2, gam)
    return d[0, :n]


# ---------------------------------------------------------------------------
# Streamed direction kernel: two HBM passes, no VMEM parking, bf16-capable
# ---------------------------------------------------------------------------
def _direction_streamed_kernel(s_ref, y_ref, g_ref, c_ref, gamma_ref, d_ref,
                               wg_scr, u_scr):
    """Two-phase grid ``(2, n_tiles)`` that RE-READS the pair-memory tiles
    from HBM in phase 1 instead of parking them in scratch (contrast
    :func:`direction`): two streaming passes over ``W`` — the
    information-theoretic floor once W exceeds VMEM — with no size cap.

    The payoff is dtype control: tiles are upcast to float32 *in VMEM*, so
    with bfloat16 pair storage the f32 copy never exists in HBM (the XLA
    bf16 path loses ~half its bandwidth advantage to exactly that
    materialization — BENCH_NOTES.md kernel study), and the gradient stays
    exact f32 in both passes (the XLA bf16 path rounds ``g`` to bf16).
    """
    p = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        s = s_ref[:, :].astype(jnp.float32)
        y = y_ref[:, :].astype(jnp.float32)
        g = g_ref[:, :]                                       # [1, TN] f32
        wg_s = jax.lax.dot_general(
            s, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [m, 1]
        wg_y = jax.lax.dot_general(
            y, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            wg_scr[:, :] = jnp.zeros_like(wg_scr)
        m = s_ref.shape[0]
        wg_scr[:m, :] += wg_s
        wg_scr[m:, :] += wg_y
        d_ref[:, :] = jnp.zeros_like(d_ref)   # defined output; overwritten

    @pl.when(p == 1)
    def _():
        @pl.when(i == 0)
        def _():
            u_scr[:, :] = jax.lax.dot_general(
                c_ref[:, :], wg_scr[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [2m, 1]

        m = s_ref.shape[0]
        s = s_ref[:, :].astype(jnp.float32)
        y = y_ref[:, :].astype(jnp.float32)
        g = g_ref[:, :]
        u = u_scr[:, :]
        d = gamma_ref[0, 0] * g
        d += jax.lax.dot_general(u[:m, :], s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d += jax.lax.dot_general(u[m:, :], y, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        d_ref[:, :] = d


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def direction_streamed(s_mem, y_mem, grad, c, gamma, *, tile_n: int = 8192,
                       interpret: bool = False):
    """Fused collapsed-form direction ``gamma*g + W^T (C (W g))`` as two
    streamed HBM passes over the pair memory.

    Accepts float32 OR bfloat16 ``s_mem``/``y_mem`` (upcast per-tile in
    VMEM; accumulation and output are float32).  ``grad`` must be float32.
    No VMEM size gate — scratch is ``O(m)``.
    """
    m, n = s_mem.shape
    s_p = _pad_to(s_mem, tile_n, 1)
    y_p = _pad_to(y_mem, tile_n, 1)
    g_p = _pad_to(grad.reshape(1, n).astype(jnp.float32), tile_n, 1)
    n_pad = s_p.shape[1]
    grid = (2, n_pad // tile_n)
    c2 = c.reshape(2 * m, 2 * m).astype(jnp.float32)
    gam = jnp.asarray(gamma, jnp.float32).reshape(1, 1)

    d = pl.pallas_call(
        _direction_streamed_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        in_specs=[
            pl.BlockSpec((m, tile_n), lambda p, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tile_n), lambda p, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda p, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m, 2 * m), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda p, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda p, i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * m, 1), jnp.float32),
            pltpu.VMEM((2 * m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(s_p, y_p, g_p, c2, gam)
    return d[0, :n]


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
