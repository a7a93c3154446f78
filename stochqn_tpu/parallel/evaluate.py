"""Explicit data-parallel evaluation building blocks (shard_map + psum).

The jit/GSPMD path (:func:`stochqn_tpu.parallel.mesh.shard_batches` + a
jitted trainer) is the primary mode — XLA inserts the collectives.  These
helpers are for users who want the reductions spelled out, and for tests
asserting collective placement.  They mirror the reference's evaluation
contract: gradients and function values are *sums* over examples (weighted),
so the cross-device reduction is a single ``psum`` over the ``data`` axis.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from stochqn_tpu.parallel.mesh import DATA_AXIS


def _shard_map(fn, mesh, in_specs, out_specs):
    # jax>=0.7 exposes shard_map at top level
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def data_parallel_grad(grad_fn: Callable, mesh: Mesh,
                       reduction: str = "sum") -> Callable:
    """Wrap ``grad_fn(x, batch) -> [n]`` so the batch is consumed sharded
    over the ``data`` mesh axis and the result is psum-reduced.

    ``reduction="sum"``: the loss is a (weighted) sum over examples —
    gradients add across shards.  ``reduction="mean"``: the loss is a mean
    over examples — shard means are averaged (requires equal shard sizes).
    """
    if reduction not in ("sum", "mean"):
        raise ValueError("reduction must be 'sum' or 'mean'")
    ndata = mesh.shape[DATA_AXIS]

    def local(x, batch):
        g = grad_fn(x, batch)
        g = jax.lax.psum(g, DATA_AXIS)
        if reduction == "mean":
            g = g / ndata
        return g

    batch_spec = P(DATA_AXIS)
    return _shard_map(local, mesh,
                      in_specs=(P(), batch_spec),
                      out_specs=P())


def data_parallel_value(obj_fn: Callable, mesh: Mesh,
                        reduction: str = "sum") -> Callable:
    """Same for scalar objectives (adaQN's ``calc_fun_val_batch``)."""
    ndata = mesh.shape[DATA_AXIS]

    def local(x, batch):
        v = obj_fn(x, batch)
        v = jax.lax.psum(v, DATA_AXIS)
        if reduction == "mean":
            v = v / ndata
        return v

    return _shard_map(local, mesh, in_specs=(P(), P(DATA_AXIS)),
                      out_specs=P())


def data_parallel_hvp(grad_fn: Callable, mesh: Mesh,
                      reduction: str = "sum") -> Callable:
    """Hessian-vector product over a sharded big batch.

    ``jvp`` is taken of the *local* gradient and psum-reduced once —
    differentiating through a psum would double-reduce (SURVEY.md section 7
    "hard parts"), so the reduction stays outside the jvp.
    """
    ndata = mesh.shape[DATA_AXIS]

    def local(x, v, batch):
        hv = jax.jvp(lambda xx: grad_fn(xx, batch), (x,), (v,))[1]
        hv = jax.lax.psum(hv, DATA_AXIS)
        if reduction == "mean":
            hv = hv / ndata
        return hv

    return _shard_map(local, mesh, in_specs=(P(), P(), P(DATA_AXIS)),
                      out_specs=P())
