"""Correction-pair construction, validity checks, and ring-buffer commits.

Functional equivalents of ``take_step``'s NaN/magnitude guard
(``src/stochqn.c:825-835``), ``update_s_vector`` / ``check_min_curvature``
(``src/stochqn.c:861-900``) and the ``update_y_*`` family
(``src/stochqn.c:915-966``).  Rollback is free here: a rejected pair is simply
never written, so no backup buffers exist (see note in
:mod:`stochqn_tpu.core.state`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stochqn_tpu.core.state import BFGSMemory, FisherMemory
from stochqn_tpu.core.enums import Info


def direction_is_bad(direction: jax.Array) -> jax.Array:
    """Reference guard: non-finite direction, or ``||d||_2 > 1e3 * n``
    (``src/stochqn.c:827-829``)."""
    n = direction.shape[0]
    finite = jnp.all(jnp.isfinite(direction))
    acc_t = jnp.promote_types(direction.dtype, jnp.float32)
    norm = jnp.linalg.norm(direction.astype(acc_t))
    return jnp.logical_not(finite) | (norm > jnp.asarray(1e3 * n, acc_t))


def commit_pair(mem: BFGSMemory, y_cand: jax.Array, min_curvature: float,
                y_reg: float) -> Tuple[BFGSMemory, jax.Array]:
    """Try to commit ``(mem.s_pending, y_cand [+ y_reg * s])`` into the ring.

    Implements ``update_y_grad_diff``-style regularization plus
    ``check_min_curvature`` (``src/stochqn.c:883-926``): accept iff
    ``s.y / s.s > min_curvature`` (always accept when ``min_curvature <= 0``).

    Returns ``(new_mem, accepted)``; on rejection the memory is unchanged.

    Edge-case deviation from the C code: a 0/0 curvature ratio (``s == 0``)
    produces NaN, which the C comparison ``curv <= min_curvature`` treats as
    an accept; here NaN rejects (the safer choice).
    """
    s = mem.s_pending
    if y_reg > 0:
        y_cand = y_cand + jnp.asarray(y_reg, y_cand.dtype) * s

    if min_curvature > 0:
        acc_t = jnp.promote_types(s.dtype, jnp.float32)
        sy = jnp.vdot(s.astype(acc_t), y_cand.astype(acc_t))
        ss = jnp.vdot(s.astype(acc_t), s.astype(acc_t))
        curv = sy / ss
        accepted = curv > jnp.asarray(min_curvature, acc_t)
    else:
        accepted = jnp.ones((), dtype=bool)

    size = mem.mem_size
    new_s = jax.lax.dynamic_update_index_in_dim(mem.s, s, mem.head, axis=0)
    new_y = jax.lax.dynamic_update_index_in_dim(mem.y, y_cand, mem.head, axis=0)

    # Incremental Gram update: one [2m, n] @ [n, 2] pass refreshes the row
    # and column of W W^T touched by the new pair.
    gram_t = mem.gram.dtype
    w_new = jnp.concatenate([new_s, new_y], axis=0)          # [2m, n]
    p = jnp.matmul(w_new, jnp.stack([s, y_cand], axis=1),
                   preferred_element_type=gram_t)            # [2m, 2]
    gram = mem.gram
    gram = jax.lax.dynamic_update_index_in_dim(
        gram, p[:, 0].astype(gram_t), mem.head, axis=1)
    gram = jax.lax.dynamic_update_index_in_dim(
        gram, p[:, 1].astype(gram_t), size + mem.head, axis=1)
    gram = jax.lax.dynamic_update_index_in_dim(
        gram, p[:, 0].astype(gram_t), mem.head, axis=0)
    gram = jax.lax.dynamic_update_index_in_dim(
        gram, p[:, 1].astype(gram_t), size + mem.head, axis=0)

    committed = mem.replace(
        s=new_s,
        y=new_y,
        gram=gram,
        head=(mem.head + 1) % size,
        count=jnp.minimum(mem.count + 1, size),
    )
    new_mem = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accepted, a, b), committed, mem)
    return new_mem, accepted


def fisher_y(fisher: FisherMemory, s: jax.Array) -> jax.Array:
    """Empirical-Fisher y vector: ``y = F^T (F s) / count``
    (``update_y_fisher``, ``src/stochqn.c:936-952``).

    Two ``[k, n]`` matvecs; under a sharded ``n`` axis the inner ``F s``
    product is one ``psum`` of a length-``k`` vector over ICI.
    """
    acc_t = jnp.promote_types(s.dtype, jnp.float32)
    fs = jnp.matmul(fisher.f, s, preferred_element_type=acc_t)   # [k]
    k = jnp.arange(fisher.f.shape[0], dtype=jnp.int32)
    fs = jnp.where(k < fisher.count, fs, jnp.zeros_like(fs))
    y = jnp.matmul(fs, fisher.f.astype(acc_t),
                   preferred_element_type=acc_t)                  # [n]
    denom = jnp.maximum(fisher.count, 1).astype(acc_t)
    return (y / denom).astype(s.dtype)
