"""oLBFGS transition function (Schraudolph et al., 2007).

Pure-functional re-design of ``run_oLBFGS`` (``src/stochqn.c:978-1036``).
The C coroutine's three sections become branches of a ``lax.switch`` on the
``section`` leaf; every call consumes at most one external gradient and
returns the next request.

Protocol (identical to the reference):

    section 0 -> request ``calc_grad`` at x                        -> 1
    section 1 -> save grad_prev; step ``x -= eta * twoloop(g)``;
                 stash candidate ``s = -eta * d``;
                 request ``calc_grad_same_batch`` at the new x     -> 2
                 (on a bad direction: flush memory, keep x, re-request
                 ``calc_grad``                                     -> 1)
    section 2 -> ``y = g_same_batch - grad_prev (+ y_reg * s)``;
                 curvature-gated pair commit; request ``calc_grad`` -> 1

One correction pair per iteration (``upd_freq = 1``,
``src/stochqn.c:467``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stochqn_tpu.core.config import OLBFGSConfig
from stochqn_tpu.core.enums import Info, Task
from stochqn_tpu.core.protocol import AdvanceResult, result, select
from stochqn_tpu.core.state import OLBFGSState
from stochqn_tpu.ops.pairs import commit_pair, direction_is_bad
from stochqn_tpu.ops.two_loop import two_loop_cached


def init(x0: jax.Array, cfg: OLBFGSConfig) -> OLBFGSState:
    return OLBFGSState.create(x0, cfg.mem_size, pairs_bf16=cfg.pairs_bf16,
                              pairs_interleaved=cfg.pairs_interleaved)


def advance(cfg: OLBFGSConfig, state: OLBFGSState, grad: jax.Array,
            step_size: jax.Array) -> Tuple[OLBFGSState, AdvanceResult]:
    """One protocol round.  ``grad`` is whatever the previous request asked
    for (ignored on the very first call)."""
    step_size = jnp.asarray(step_size, state.x.dtype)

    def sec0(st: OLBFGSState):
        return (st.replace(section=jnp.int32(1)),
                result(Task.CALC_GRAD, Info.NO_PROBLEMS_ENCOUNTERED, False))

    def sec1(st: OLBFGSState):
        d = two_loop_cached(grad, st.mem, h0=cfg.hess_init)
        if cfg.check_nan:
            bad = direction_is_bad(d)
        else:
            bad = jnp.zeros((), bool)

        s_cand = -step_size * d
        mem_good = st.mem.replace(s_pending=s_cand)
        mem = select(bad, mem_good.flush(), mem_good)
        new_x = jnp.where(bad, st.x, st.x + s_cand)

        st = st.replace(
            x=new_x,
            mem=mem,
            grad_prev=grad,
            niter=st.niter + 1,
            section=jnp.where(bad, jnp.int32(1), jnp.int32(2)),
        )
        res = result(
            jnp.where(bad, jnp.int32(Task.CALC_GRAD),
                      jnp.int32(Task.CALC_GRAD_SAME_BATCH)),
            jnp.where(bad, jnp.int32(Info.SEARCH_DIRECTION_WAS_NAN),
                      jnp.int32(Info.NO_PROBLEMS_ENCOUNTERED)),
            jnp.logical_not(bad))
        return st, res

    def sec2(st: OLBFGSState):
        y_cand = grad - st.grad_prev
        mem, accepted = commit_pair(st.mem, y_cand, cfg.min_curvature, cfg.y_reg)
        st = st.replace(mem=mem, section=jnp.int32(1))
        res = result(
            Task.CALC_GRAD,
            jnp.where(accepted, jnp.int32(Info.NO_PROBLEMS_ENCOUNTERED),
                      jnp.int32(Info.CURVATURE_TOO_SMALL)),
            False)
        return st, res

    return jax.lax.switch(state.section, [sec0, sec1, sec2], state)
