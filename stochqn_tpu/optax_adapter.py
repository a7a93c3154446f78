"""Ecosystem adapters: optax transformation + pytree-parameter training.

The reference shipped a TensorFlow-v1 ``ExternalOptimizerInterface`` adapter
(``stochqn/tf.py:18-83``) so its optimizers could drive a framework's
training loop.  The modern JAX equivalents live here:

* :func:`olbfgs` — a genuine ``optax.GradientTransformation``: drop the
  optimizer into any optax/flax training loop.  Because optax delivers one
  gradient per step, correction pairs are built from *consecutive-batch*
  gradient differences (``y_t = g_t - g_{t-1}``, ``s_t`` = the previous
  applied update) instead of the protocol's same-batch re-evaluation — the
  original online-BFGS formulation of Schraudolph et al. (2007) §3 before
  the variance-reduction trick.  For exact same-batch pairs use
  :class:`PytreeTrainer` or :mod:`stochqn_tpu.fused`.
* :class:`PytreeTrainer` — full-fidelity fused training (oLBFGS / SQN /
  adaQN, same-batch pairs, jvp Hessian-vectors, function-value guard) over
  arbitrary *pytree* parameters (e.g. flax model params): the pytree is
  ravelled to the flat vector the state machines operate on.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from stochqn_tpu.core.config import OLBFGSConfig
from stochqn_tpu.core.state import BFGSMemory
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.ops.pairs import (commit_pair, conditional_flush,
                                   direction_is_bad)
from stochqn_tpu.ops.two_loop import two_loop_cached

ScalarOrSchedule = Union[float, Callable[[jax.Array], jax.Array]]


class OLBFGSOptaxState(NamedTuple):
    mem: BFGSMemory
    grad_prev: jax.Array   # [n] flat gradient from the previous step
    upd_prev: jax.Array    # [n] flat update applied at the previous step
    count: jax.Array       # int32 step counter


def olbfgs(learning_rate: ScalarOrSchedule, mem_size: int = 10,
           hess_init: Optional[float] = None, min_curvature: float = 1e-4,
           y_reg: Optional[float] = None, check_nan: bool = True):
    """oLBFGS as an optax ``GradientTransformation`` (init_fn, update_fn).

    Works with any pytree of parameters.  Returns updates ``-lr * H^{-1}g``
    with the inverse-Hessian approximation built from consecutive-step
    (s, y) pairs (see module docstring for the one deviation from the
    request protocol).
    """
    import optax  # local import: optax is optional at runtime

    cfg = OLBFGSConfig.create(mem_size=mem_size, hess_init=hess_init,
                              min_curvature=min_curvature, y_reg=y_reg,
                              check_nan=check_nan)

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate)

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        n = flat.shape[0]
        return OLBFGSOptaxState(
            mem=BFGSMemory.create(cfg.mem_size, n, flat.dtype),
            grad_prev=jnp.zeros((n,), flat.dtype),
            upd_prev=jnp.zeros((n,), flat.dtype),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        g, unravel = ravel_pytree(updates)

        # Commit the pair formed by the previous step's movement and the
        # gradient change it produced (vetoed on the very first step).
        mem_c = state.mem.replace(s_pending=state.upd_prev)
        y_cand = g - state.grad_prev
        mem, _ = commit_pair(mem_c, y_cand, cfg.min_curvature, cfg.y_reg,
                             enabled=state.count > 0)

        d = two_loop_cached(g, mem, h0=cfg.hess_init)
        if cfg.check_nan:
            bad = direction_is_bad(d)
            mem = conditional_flush(mem, bad)
            d = jnp.where(bad, jnp.zeros_like(d), d)

        upd = -lr_at(state.count) * d
        new_state = OLBFGSOptaxState(
            mem=mem, grad_prev=g, upd_prev=upd, count=state.count + 1)
        return unravel(upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)


class PytreeTrainer:
    """Fused stochQN training over pytree parameters.

    Wraps :class:`stochqn_tpu.fused.FusedTrainer` with a ravel/unravel
    layer so flax/haiku-style parameter pytrees can be trained with the
    full-fidelity optimizers (same-batch oLBFGS pairs, SQN jvp
    Hessian-vector products, adaQN's function-value guard).

    Args:
      optimizer: "oLBFGS" | "SQN" | "adaQN".
      cfg: matching config dataclass.
      loss_fn: ``loss_fn(params_pytree, batch) -> scalar`` (JAX-traceable).
      val_data: optional device-resident batch for adaQN's guard.
      donate: forward of ``FusedTrainer(donate=...)`` — off by default
        (non-consuming ``run_epochs``).  Pass ``True`` for the large-n
        capacity path: the state passed into ``run_epochs`` is then
        CONSUMED (its buffers donated to the first epoch dispatch and
        unreadable afterwards; keep using the returned state).
    """

    def __init__(self, optimizer: str, cfg: Any, loss_fn: Callable,
                 params_template: Any, val_data: Any = None,
                 donate: bool = False):
        flat0, unravel = ravel_pytree(params_template)
        self._unravel = unravel
        self.loss_fn = loss_fn

        def flat_loss(xflat, batch):
            return loss_fn(unravel(xflat), batch)

        def grad_fn(xflat, batch):
            return jax.grad(flat_loss)(xflat, batch)

        self.trainer = FusedTrainer(optimizer, cfg, grad_fn,
                                    obj_fn=flat_loss, val_data=val_data,
                                    donate=donate)
        self._flat0 = flat0

    def init(self, params=None):
        flat = self._flat0 if params is None else ravel_pytree(params)[0]
        return self.trainer.init(flat)

    def epoch(self, state, data, step_size, aligned=None):
        return self.trainer.epoch(state, data, step_size, aligned=aligned)

    def run_epochs(self, state, data, nepochs, step_size, **kw):
        """Host loop over fused epochs.  With ``donate=True`` (opt-in)
        the passed-in ``state`` is consumed (see the class docstring)."""
        return self.trainer.run_epochs(state, data, nepochs, step_size, **kw)

    @property
    def cfg(self):
        return self.trainer.cfg

    def params(self, state):
        """Current parameters as the original pytree structure."""
        return self._unravel(state.x)
