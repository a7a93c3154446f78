"""AdaGrad / RMSProp squared-gradient accumulator and diagonal rescaling.

Functional equivalents of ``update_sum_sq`` (``src/stochqn.c:720-747``) and
``diag_rescal`` (``src/stochqn.c:762-783``).  Pure elementwise VPU work; XLA
fuses these into the surrounding step so no custom kernel is needed.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def update_sum_sq(grad: jax.Array, grad_sum_sq: jax.Array,
                  rmsprop_weight: float) -> jax.Array:
    """RMSProp EMA when ``0 < rmsprop_weight < 1``, else AdaGrad sum."""
    if 0.0 < rmsprop_weight < 1.0:
        return rmsprop_weight * grad_sum_sq + (1.0 - rmsprop_weight) * (grad * grad)
    return grad_sum_sq + grad * grad


def diag_rescal(grad: jax.Array, grad_sum_sq: jax.Array, scal_reg: float,
                rmsprop_weight: float) -> Tuple[jax.Array, jax.Array]:
    """Update the accumulator, then rescale the gradient by it.

    Returns ``(rescaled, new_grad_sum_sq)`` where
    ``rescaled = grad / sqrt(new_acc + scal_reg)``.  The reference updates the
    accumulator *inside* the rescale call on every step — including steps
    whose direction is later rejected by the NaN check
    (``src/stochqn.c:765,811,818``).
    """
    acc = update_sum_sq(grad, grad_sum_sq, rmsprop_weight)
    rescaled = grad * jax.lax.rsqrt(acc + jnp.asarray(scal_reg, acc.dtype))
    return rescaled, acc
