"""Pure-NumPy oracle implementations of oLBFGS / SQN / adaQN.

An independent, readable re-derivation of the reference protocol semantics
(``/root/reference/src/stochqn.c``) used to golden-test the JAX state
machines.  Pairs are kept as chronological Python lists (deque-style) instead
of ring buffers — behaviorally identical.

Where the framework intentionally deviates from the reference C code, the
oracle matches the framework (see deviations documented in
``stochqn_tpu/core/*``): rejected pairs leave memory untouched, and a NaN
curvature ratio rejects.
"""
from __future__ import annotations

import numpy as np

CALC_GRAD = "calc_grad"
CALC_GRAD_SAME_BATCH = "calc_grad_same_batch"
CALC_GRAD_BIG_BATCH = "calc_grad_big_batch"
CALC_HESS_VEC = "calc_hess_vec"
CALC_FUN_VAL_BATCH = "calc_fun_val_batch"

OK = "no_problems_encountered"
FUNC_INCREASED = "func_increased"
CURV_SMALL = "curvature_too_small"
DIR_NAN = "search_direction_was_nan"


def two_loop_np(g, pairs, h0=0.0, diag=None):
    """Sequential two-loop over chronological (s, y) pairs."""
    if not pairs:
        return g.copy() if diag is None else diag * g
    q = g.copy()
    alphas = []
    rhos = []
    for s, y in reversed(pairs):
        rho = 1.0 / np.dot(y, s)
        alpha = rho * np.dot(q, s)
        q -= alpha * y
        alphas.append(alpha)
        rhos.append(rho)
    alphas.reverse()
    rhos.reverse()
    if diag is not None:
        r = diag * q
    elif h0 > 0:
        r = h0 * q
    else:
        s_l, y_l = pairs[-1]
        r = (np.dot(s_l, y_l) / np.dot(y_l, y_l)) * q
    for (s, y), alpha, rho in zip(pairs, alphas, rhos):
        beta = rho * np.dot(y, r)
        r += (alpha - beta) * s
    return r


class _PairMemory:
    def __init__(self, mem_size, min_curvature):
        self.mem_size = mem_size
        self.min_curvature = min_curvature
        self.pairs = []
        self.s_pending = None

    def flush(self):
        self.pairs = []

    def try_commit(self, y, y_reg=0.0):
        s = self.s_pending
        if y_reg > 0:
            y = y + y_reg * s
        if self.min_curvature > 0:
            curv = np.dot(s, y) / np.dot(s, s)
            if not (curv > self.min_curvature):
                return False
        self.pairs.append((s.copy(), y.copy()))
        if len(self.pairs) > self.mem_size:
            self.pairs.pop(0)
        return True


def _dir_is_bad(d):
    n = d.shape[0]
    return (not np.all(np.isfinite(d))) or np.linalg.norm(d) > 1e3 * n


class OLBFGSOracle:
    def __init__(self, mem_size=10, hess_init=0.0, min_curvature=1e-4,
                 y_reg=0.0, check_nan=True):
        self.mem = _PairMemory(mem_size, min_curvature)
        self.hess_init = hess_init
        self.y_reg = y_reg
        self.check_nan = check_nan
        self.grad_prev = None
        self.niter = 0
        self.section = 0

    def run(self, x, step_size, grad=None):
        """Returns (task, info, x_changed); mutates x in place."""
        if self.section == 0:
            self.section = 1
            return CALC_GRAD, OK, False
        if self.section == 1:
            self.grad_prev = grad.copy()
            d = two_loop_np(grad, self.mem.pairs, h0=self.hess_init)
            self.niter += 1
            if self.check_nan and _dir_is_bad(d):
                self.mem.flush()
                self.section = 1
                return CALC_GRAD, DIR_NAN, False
            self.mem.s_pending = -step_size * d
            x += self.mem.s_pending
            self.section = 2
            return CALC_GRAD_SAME_BATCH, OK, True
        # section 2
        accepted = self.mem.try_commit(grad - self.grad_prev, self.y_reg)
        self.section = 1
        return CALC_GRAD, OK if accepted else CURV_SMALL, False


class SQNOracle:
    def __init__(self, mem_size=10, upd_freq=20, min_curvature=1e-4,
                 y_reg=0.0, use_grad_diff=False, check_nan=True):
        self.mem = _PairMemory(mem_size, min_curvature)
        self.upd_freq = upd_freq
        self.y_reg = y_reg
        self.use_grad_diff = use_grad_diff
        self.check_nan = check_nan
        self.grad_prev = None
        self.x_sum = None
        self.x_avg_prev = None
        self.niter = 0
        self.section = 0

    def _resume(self, info, changed):
        self.section = 1
        return CALC_GRAD, info, changed

    def run(self, x, step_size, grad=None, hess_vec=None):
        L = self.upd_freq
        if self.x_sum is None:
            self.x_sum = np.zeros_like(x)
        if self.section == 0:
            return self._resume(OK, False)
        if self.section == 1:
            d = two_loop_np(grad, self.mem.pairs)
            info, changed = OK, True
            if self.check_nan and _dir_is_bad(d):
                self.mem.flush()
                info, changed = DIR_NAN, False
            else:
                x -= step_size * d
            self.niter += 1
            self.x_sum += x
            if self.niter % L != 0:
                return self._resume(info, changed)
            x_avg = self.x_sum / L
            if self.niter == L:
                self.x_avg_prev = x_avg.copy()
                self.x_sum = np.zeros_like(x)
                if self.use_grad_diff:
                    self.section = 2
                    return CALC_GRAD_BIG_BATCH, info, changed
                return self._resume(info, changed)
            self.x_sum = x_avg
            self.mem.s_pending = x_avg - self.x_avg_prev
            if self.use_grad_diff:
                self.section = 3
                return CALC_GRAD_BIG_BATCH, info, changed
            self.section = 4
            return CALC_HESS_VEC, info, changed
        if self.section == 2:
            self.grad_prev = grad.copy()
            return self._resume(OK, False)
        if self.section == 3:
            accepted = self.mem.try_commit(grad - self.grad_prev, self.y_reg)
            if accepted:
                self.grad_prev = grad.copy()
                self.x_avg_prev = self.x_sum.copy()
            self.x_sum = np.zeros_like(x)
            return self._resume(OK if accepted else CURV_SMALL, False)
        # section 4 (hess-vec)
        accepted = self.mem.try_commit(hess_vec.copy())
        self.x_avg_prev = self.x_sum.copy()
        self.x_sum = np.zeros_like(x)
        return self._resume(OK if accepted else CURV_SMALL, False)


class AdaQNOracle:
    def __init__(self, mem_size=10, fisher_size=100, upd_freq=20,
                 max_incr=1.01, min_curvature=1e-4, scal_reg=1e-4,
                 rmsprop_weight=0.0, y_reg=0.0, use_grad_diff=False,
                 check_nan=True, h0_exact_reference=True):
        self.mem = _PairMemory(mem_size, min_curvature)
        self.fisher_size = fisher_size
        self.fisher = []
        self.upd_freq = upd_freq
        self.max_incr = max_incr
        self.scal_reg = scal_reg
        self.rmsprop_weight = rmsprop_weight
        self.y_reg = y_reg
        self.use_grad_diff = use_grad_diff
        self.check_nan = check_nan
        self.h0_exact_reference = h0_exact_reference
        self.grad_prev = None
        self.grad_sum_sq = None
        self.x_sum = None
        self.x_avg_prev = None
        self.f_prev = 0.0
        self.niter = 0
        self.section = 0

    def _resume(self, info, changed):
        self.section = 1
        return CALC_GRAD, info, changed

    def _fisher_y(self, s):
        if not self.fisher:
            return np.zeros_like(s)
        F = np.stack(self.fisher)
        return F.T @ (F @ s) / F.shape[0]

    def _commit_fisher(self, x_avg, info, changed):
        accepted = self.mem.try_commit(self._fisher_y(self.mem.s_pending))
        if accepted:
            self.x_avg_prev = x_avg.copy()
        self.x_sum = np.zeros_like(x_avg)
        return self._resume(info if accepted else CURV_SMALL, changed)

    def run(self, x, step_size, grad=None, f=None):
        L = self.upd_freq
        if self.x_sum is None:
            self.x_sum = np.zeros_like(x)
            self.grad_sum_sq = np.zeros_like(x)
        if self.section == 0:
            return self._resume(OK, False)
        if self.section == 1:
            if not self.use_grad_diff:
                self.fisher.append(grad.copy())
                if len(self.fisher) > self.fisher_size:
                    self.fisher.pop(0)
            # accumulator + rescale
            if 0 < self.rmsprop_weight < 1:
                self.grad_sum_sq = (self.rmsprop_weight * self.grad_sum_sq
                                    + (1 - self.rmsprop_weight) * grad**2)
            else:
                self.grad_sum_sq = self.grad_sum_sq + grad**2
            rescaled = grad / np.sqrt(self.grad_sum_sq + self.scal_reg)
            if not self.mem.pairs:
                d = rescaled
            else:
                diag = (rescaled if self.h0_exact_reference
                        else 1.0 / np.sqrt(self.grad_sum_sq + self.scal_reg))
                d = two_loop_np(grad, self.mem.pairs, diag=diag)
            info, changed = OK, True
            if self.check_nan and _dir_is_bad(d):
                self.mem.flush()
                info, changed = DIR_NAN, False
            else:
                x -= step_size * d
            self.niter += 1
            self.x_sum += x
            if self.niter % L != 0:
                return self._resume(info, changed)
            x_avg = self.x_sum / L
            if self.niter == L:
                self.x_avg_prev = x_avg.copy()
                self.x_sum = np.zeros_like(x)
                if self.use_grad_diff:
                    self.section = 2
                    return CALC_GRAD_BIG_BATCH, info, changed
                if self.max_incr > 0:
                    self.section = 3
                    return CALC_FUN_VAL_BATCH, info, changed
                return self._resume(info, changed)
            if self.max_incr > 0:
                self.x_sum = x_avg
                self.section = 5
                return CALC_FUN_VAL_BATCH, info, changed
            self.x_sum = x_avg
            self.mem.s_pending = x_avg - self.x_avg_prev
            if self.use_grad_diff:
                self.section = 4
                return CALC_GRAD_BIG_BATCH, info, changed
            return self._commit_fisher(x_avg, info, changed)
        if self.section == 2:
            self.grad_prev = grad.copy()
            if self.max_incr > 0:
                self.section = 3
                return CALC_FUN_VAL_BATCH, OK, False
            return self._resume(OK, False)
        if self.section == 3:
            self.f_prev = float(f)
            return self._resume(OK, False)
        if self.section == 4:
            accepted = self.mem.try_commit(grad - self.grad_prev, self.y_reg)
            if accepted:
                self.grad_prev = grad.copy()
            # NOTE: x_avg_prev deliberately NOT refreshed (reference quirk,
            # src/stochqn.c:1265-1270).
            self.x_sum = np.zeros_like(x)
            return self._resume(OK if accepted else CURV_SMALL, False)
        # section 5: accept/reject on function value
        x_avg = self.x_sum
        if (f > self.max_incr * self.f_prev) or not np.isfinite(f):
            self.mem.flush()
            self.fisher = []
            x[:] = self.x_avg_prev
            # x_sum deliberately not reset (reference quirk).
            return self._resume(FUNC_INCREASED, True)
        self.f_prev = float(f)
        self.mem.s_pending = x_avg - self.x_avg_prev
        if self.use_grad_diff:
            self.section = 4
            return CALC_GRAD_BIG_BATCH, OK, False
        return self._commit_fisher(x_avg, OK, False)
