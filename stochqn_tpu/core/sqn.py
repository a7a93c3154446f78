"""SQN transition function (Byrd et al., 2016).

Pure-functional re-design of ``run_SQN`` (``src/stochqn.c:1038-1153``).

Protocol (identical to the reference):

    section 0 -> request ``calc_grad`` at x                            -> 1
    section 1 -> step ``x -= eta * twoloop(g)``; ``x_sum += x``;
                 every L = upd_freq iterations:
                   first time: archive averages; with use_grad_diff also
                     request ``calc_grad_big_batch`` at x_avg_prev     -> 2
                   later: ``s = x_avg - x_avg_prev``; request either
                     ``calc_grad_big_batch`` at x_avg                  -> 3
                     or ``calc_hess_vec`` at (x_avg, s)                -> 4
                 otherwise request ``calc_grad``                       -> 1
    section 2 -> store big-batch gradient as grad_prev                 -> 1
    section 3 -> ``y = g_big - grad_prev``; commit pair; on accept also
                 refresh grad_prev / x_avg_prev; zero x_sum            -> 1
    section 4 -> archive averages; ``y = hess_vec``; commit pair       -> 1

``x_sum`` accumulates even on rejected steps and is divided by exactly L
(``src/stochqn.c:1063-1067``); after division it *is* ``x_avg`` (the
reference aliases the two arrays, ``src/stochqn.c:134``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stochqn_tpu.core.config import SQNConfig
from stochqn_tpu.core.enums import Info, Task
from stochqn_tpu.core.protocol import AdvanceResult, result, select
from stochqn_tpu.core.state import SQNState
from stochqn_tpu.ops.pairs import commit_pair, direction_is_bad
from stochqn_tpu.ops.two_loop import two_loop_cached


def init(x0: jax.Array, cfg: SQNConfig) -> SQNState:
    return SQNState.create(x0, cfg.mem_size, pairs_bf16=cfg.pairs_bf16,
                           pairs_interleaved=cfg.pairs_interleaved)


def _resume(st: SQNState, info, x_changed) -> Tuple[SQNState, AdvanceResult]:
    """``resume_main_loop`` (``src/stochqn.c:1148-1152``)."""
    return (st.replace(section=jnp.int32(1)),
            result(Task.CALC_GRAD, info, x_changed))


def advance(cfg: SQNConfig, state: SQNState, grad: jax.Array,
            hess_vec: jax.Array, step_size: jax.Array
            ) -> Tuple[SQNState, AdvanceResult]:
    step_size = jnp.asarray(step_size, state.x.dtype)
    L = cfg.upd_freq
    inv_l = jnp.asarray(1.0 / L, state.x.dtype)

    def sec0(st: SQNState):
        return _resume(st, Info.NO_PROBLEMS_ENCOUNTERED, False)

    def sec1(st: SQNState):
        d = two_loop_cached(grad, st.mem, collapsed=True)
        if cfg.check_nan:
            bad = direction_is_bad(d)
        else:
            bad = jnp.zeros((), bool)

        new_x = jnp.where(bad, st.x, st.x - step_size * d)
        mem = select(bad, st.mem.flush(), st.mem)
        info = jnp.where(bad, jnp.int32(Info.SEARCH_DIRECTION_WAS_NAN),
                         jnp.int32(Info.NO_PROBLEMS_ENCOUNTERED))
        changed = jnp.logical_not(bad)

        niter = st.niter + 1
        st = st.replace(x=new_x, mem=mem, niter=niter,
                        x_sum=st.x_sum + new_x)

        def update_time(st: SQNState):
            x_avg = st.x_sum * inv_l

            def first(st: SQNState):
                # Archive the first averages (src/stochqn.c:1078-1094).
                st = st.replace(x_avg_prev=x_avg,
                                x_sum=jnp.zeros_like(st.x_sum))
                if cfg.use_grad_diff:
                    return (st.replace(section=jnp.int32(2)),
                            result(Task.CALC_GRAD_BIG_BATCH, info, changed))
                return _resume(st, info, changed)

            def later(st: SQNState):
                # Build s; keep x_avg in x_sum for the follow-up request
                # (src/stochqn.c:1097-1113).
                s_cand = x_avg - st.x_avg_prev
                st = st.replace(x_sum=x_avg,
                                mem=st.mem.replace(s_pending=s_cand))
                if cfg.use_grad_diff:
                    return (st.replace(section=jnp.int32(3)),
                            result(Task.CALC_GRAD_BIG_BATCH, info, changed))
                return (st.replace(section=jnp.int32(4)),
                        result(Task.CALC_HESS_VEC, info, changed))

            return jax.lax.cond(niter == L, first, later, st)

        return jax.lax.cond(jnp.mod(niter, L) == 0,
                            update_time,
                            lambda st: _resume(st, info, changed),
                            st)

    def sec2(st: SQNState):
        return _resume(st.replace(grad_prev=grad),
                       Info.NO_PROBLEMS_ENCOUNTERED, False)

    def sec3(st: SQNState):
        y_cand = grad - st.grad_prev
        mem, accepted = commit_pair(st.mem, y_cand, cfg.min_curvature,
                                    cfg.y_reg, direction_cache=True)
        st = st.replace(
            mem=mem,
            grad_prev=jnp.where(accepted, grad, st.grad_prev),
            x_avg_prev=jnp.where(accepted, st.x_sum, st.x_avg_prev),
            x_sum=jnp.zeros_like(st.x_sum),
        )
        info = jnp.where(accepted, jnp.int32(Info.NO_PROBLEMS_ENCOUNTERED),
                         jnp.int32(Info.CURVATURE_TOO_SMALL))
        return _resume(st, info, False)

    def sec4(st: SQNState):
        # archive_x_avg happens whether or not the pair is accepted
        # (src/stochqn.c:1136-1141).
        mem, accepted = commit_pair(st.mem, hess_vec, cfg.min_curvature,
                                    y_reg=0.0, direction_cache=True)
        st = st.replace(mem=mem, x_avg_prev=st.x_sum,
                        x_sum=jnp.zeros_like(st.x_sum))
        info = jnp.where(accepted, jnp.int32(Info.NO_PROBLEMS_ENCOUNTERED),
                         jnp.int32(Info.CURVATURE_TOO_SMALL))
        return _resume(st, info, False)

    return jax.lax.switch(state.section, [sec0, sec1, sec2, sec3, sec4], state)
