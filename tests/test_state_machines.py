"""Golden trajectory tests: JAX state machines vs the NumPy oracle.

Each optimizer is driven through the free-mode protocol on a stochastic
quadratic problem; tasks, infos and full x-trajectories must match the
oracle (which independently re-derives the reference semantics)."""
import numpy as np
import pytest

from stochqn_tpu.free import SQN_free, adaQN_free, oLBFGS_free
from oracle_numpy import (AdaQNOracle, OLBFGSOracle, SQNOracle,
                          CALC_FUN_VAL_BATCH, CALC_GRAD, CALC_GRAD_BIG_BATCH,
                          CALC_GRAD_SAME_BATCH, CALC_HESS_VEC)


class QuadProblem:
    """f_b(x) = 0.5 (x - c_b)^T A (x - c_b) for per-batch centers c_b."""

    def __init__(self, rng, n, nbatches=16, seed_scale=1.0):
        q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        self.a = q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T
        self.centers = rng.standard_normal((nbatches, n)) * seed_scale
        self.nbatches = nbatches

    def grad(self, x, b):
        return self.a @ (x - self.centers[b % self.nbatches])

    def big_grad(self, x, b):
        c = self.centers.mean(axis=0)
        return self.a @ (x - c)

    def hess_vec(self, x, v, b):
        return self.a @ v

    def fval(self, x, b):
        c = self.centers.mean(axis=0)
        return 0.5 * (x - c) @ self.a @ (x - c)


def _drive(opt, oracle, problem, x0, nsteps, step_size=0.05,
           extra_updates=None):
    """Run both implementations side by side, asserting lockstep."""
    x_j = x0.copy()
    x_o = x0.copy()
    req = opt.run_optimizer(x_j, step_size)
    task_o, info_o, changed_o = oracle.run(x_o, step_size)
    b = 0
    infos = []
    for it in range(nsteps):
        assert req["task"] == task_o, f"step {it}: task mismatch"
        assert req["info"]["iteration_info"] == info_o, f"step {it}"
        infos.append(info_o)
        np.testing.assert_allclose(x_j, x_o, rtol=5e-6, atol=5e-7,
                                   err_msg=f"step {it}: x diverged")

        task = req["task"]
        kwargs_o = {}
        if task in (CALC_GRAD, CALC_GRAD_SAME_BATCH):
            if task == CALC_GRAD:
                b += 1
            g_j = problem.grad(np.asarray(req["requested_on"]), b)
            g_o = problem.grad(x_o, b)  # oracle's plain-grad request point is x
            opt.update_gradient(g_j)
            kwargs_o["grad"] = g_o
        elif task == CALC_GRAD_BIG_BATCH:
            g_j = problem.big_grad(np.asarray(req["requested_on"]), b)
            g_o = problem.big_grad(_oracle_req(oracle, task), b)
            opt.update_gradient(g_j)
            kwargs_o["grad"] = g_o
        elif task == CALC_HESS_VEC:
            xr, vr = req["requested_on"]
            hv_j = problem.hess_vec(np.asarray(xr), np.asarray(vr), b)
            hv_o = problem.hess_vec(oracle.x_sum, oracle.mem.s_pending, b)
            opt.update_hess_vec(hv_j)
            kwargs_o["hess_vec"] = hv_o
        elif task == CALC_FUN_VAL_BATCH:
            f_j = problem.fval(np.asarray(req["requested_on"]), b)
            f_o = problem.fval(_oracle_req(oracle, task), b)
            opt.update_function(f_j)
            kwargs_o["f"] = f_o
        req = opt.run_optimizer(x_j, step_size)
        task_o, info_o, changed_o = oracle.run(x_o, step_size, **kwargs_o)
        assert req["info"]["x_changed_in_run"] == changed_o, f"step {it}"
    return x_j, x_o, infos


def _oracle_req(oracle, task):
    """Which array the oracle's pending big-batch/f request refers to.

    SQN: big-batch at section 2 -> x_avg_prev, section 3 -> x_avg (x_sum).
    adaQN: sections 2/3 -> x_avg_prev, sections 4/5 -> x_avg (x_sum)."""
    sec = oracle.section
    if task not in (CALC_GRAD_BIG_BATCH, CALC_FUN_VAL_BATCH):
        raise AssertionError(task)
    if isinstance(oracle, SQNOracle):
        return oracle.x_avg_prev if sec == 2 else oracle.x_sum
    return oracle.x_avg_prev if sec in (2, 3) else oracle.x_sum


def test_olbfgs_matches_oracle(rng):
    n = 12
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = oLBFGS_free(mem_size=5, min_curvature=1e-4)
    oracle = OLBFGSOracle(mem_size=5, min_curvature=1e-4)
    _drive(opt, oracle, problem, x0, nsteps=120)


def test_olbfgs_hess_init_and_yreg(rng):
    n = 9
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = oLBFGS_free(mem_size=4, hess_init=0.5, y_reg=0.1,
                      min_curvature=None)
    oracle = OLBFGSOracle(mem_size=4, hess_init=0.5, y_reg=0.1,
                          min_curvature=0.0)
    _drive(opt, oracle, problem, x0, nsteps=80)


def test_sqn_hessvec_matches_oracle(rng):
    n = 10
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = SQN_free(mem_size=4, bfgs_upd_freq=5)
    oracle = SQNOracle(mem_size=4, upd_freq=5)
    _drive(opt, oracle, problem, x0, nsteps=150)


def test_sqn_grad_diff_matches_oracle(rng):
    n = 10
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = SQN_free(mem_size=4, bfgs_upd_freq=5, use_grad_diff=True)
    oracle = SQNOracle(mem_size=4, upd_freq=5, use_grad_diff=True)
    _drive(opt, oracle, problem, x0, nsteps=150)


def test_adaqn_fisher_matches_oracle(rng):
    n = 10
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = adaQN_free(mem_size=4, fisher_size=12, bfgs_upd_freq=5,
                     max_incr=1.01)
    oracle = AdaQNOracle(mem_size=4, fisher_size=12, upd_freq=5,
                         max_incr=1.01)
    _drive(opt, oracle, problem, x0, nsteps=160, step_size=0.05)


def test_adaqn_grad_diff_rmsprop_matches_oracle(rng):
    n = 10
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = adaQN_free(mem_size=4, fisher_size=None, bfgs_upd_freq=5,
                     max_incr=1.01, rmsprop_weight=0.9, use_grad_diff=True)
    oracle = AdaQNOracle(mem_size=4, upd_freq=5, max_incr=1.01,
                         rmsprop_weight=0.9, use_grad_diff=True)
    _drive(opt, oracle, problem, x0, nsteps=160, step_size=0.05)


def test_adaqn_no_max_incr(rng):
    n = 8
    problem = QuadProblem(rng, n)
    x0 = rng.standard_normal(n)
    opt = adaQN_free(mem_size=3, fisher_size=10, bfgs_upd_freq=4,
                     max_incr=None)
    oracle = AdaQNOracle(mem_size=3, fisher_size=10, upd_freq=4,
                         max_incr=0.0)
    _drive(opt, oracle, problem, x0, nsteps=100)


def test_adaqn_func_increase_reverts(rng):
    """Force a func_increased rejection and check the revert semantics."""
    n = 6
    problem = QuadProblem(rng, n)

    class SpikeProblem(QuadProblem):
        def __init__(self, base):
            self.a = base.a
            self.centers = base.centers
            self.nbatches = base.nbatches
            self.calls = 0

        def fval(self, x, b):
            self.calls += 1
            if self.calls == 2:   # second f request -> huge value
                return 1e30
            return super().fval(x, b)

    sp = SpikeProblem(problem)
    x0 = rng.standard_normal(n)
    opt = adaQN_free(mem_size=3, fisher_size=10, bfgs_upd_freq=4,
                     max_incr=1.01)
    oracle = AdaQNOracle(mem_size=3, fisher_size=10, upd_freq=4,
                         max_incr=1.01)
    # shared call counter across the two drivers would double-count; use two
    sp2 = SpikeProblem(problem)

    x_j = x0.copy()
    x_o = x0.copy()
    req = opt.run_optimizer(x_j, 0.05)
    task_o, info_o, _ = oracle.run(x_o, 0.05)
    saw_revert = False
    for it in range(60):
        assert req["task"] == task_o
        assert req["info"]["iteration_info"] == info_o
        if info_o == "func_increased":
            saw_revert = True
        np.testing.assert_allclose(x_j, x_o, rtol=5e-6, atol=5e-7)
        kwargs_o = {}
        if task_o in (CALC_GRAD, CALC_GRAD_SAME_BATCH):
            opt.update_gradient(problem.grad(np.asarray(req["requested_on"]), it))
            kwargs_o["grad"] = problem.grad(x_o, it)
        elif task_o == CALC_FUN_VAL_BATCH:
            opt.update_function(sp.fval(np.asarray(req["requested_on"]), it))
            kwargs_o["f"] = sp2.fval(_oracle_req(oracle, task_o), it)
        req = opt.run_optimizer(x_j, 0.05)
        task_o, info_o, _ = oracle.run(x_o, 0.05, **kwargs_o)
    assert saw_revert


class IndefiniteProblem(QuadProblem):
    """Indefinite curvature: some batches produce negative s.y pairs,
    exercising the curvature-rejection branches."""

    def __init__(self, rng, n, nbatches=16):
        q = np.linalg.qr(rng.standard_normal((n, n)))[0]
        eigs = rng.uniform(0.5, 2.0, n)
        eigs[: n // 3] *= -1.0            # indefinite directions
        self.a = q @ np.diag(eigs) @ q.T
        self.centers = rng.standard_normal((nbatches, n)) * 0.2
        self.nbatches = nbatches


def test_olbfgs_curvature_rejections_match_oracle(rng):
    """Rejected pairs (curvature_too_small) must leave memory untouched and
    trajectories in lockstep with the oracle."""
    n = 10
    problem = IndefiniteProblem(rng, n)
    x0 = rng.standard_normal(n) * 0.1
    opt = oLBFGS_free(mem_size=4, min_curvature=1e-4, check_nan=True)
    oracle = OLBFGSOracle(mem_size=4, min_curvature=1e-4, check_nan=True)
    # small step to keep the indefinite dynamics bounded for 120 calls
    _, _, infos = _drive(opt, oracle, problem, x0, nsteps=120,
                         step_size=0.01)
    # the indefinite directions must actually have triggered rejections
    assert "curvature_too_small" in infos


def test_nan_gradient_rejection_matches_oracle(rng):
    """A NaN gradient triggers search_direction_was_nan (memory flush, x
    unchanged) identically in framework and oracle."""
    n = 8
    problem = QuadProblem(rng, n)

    class NaNProblem(QuadProblem):
        def __init__(self, base):
            self.a = base.a
            self.centers = base.centers
            self.nbatches = base.nbatches
            self.calls = 0

        def grad(self, x, b):
            self.calls += 1
            if self.calls in (9, 10):   # poison two calls
                return np.full(x.shape, np.nan)
            return super().grad(x, b)

    x0 = rng.standard_normal(n)
    opt = oLBFGS_free(mem_size=4)
    oracle = OLBFGSOracle(mem_size=4)
    p1, p2 = NaNProblem(problem), NaNProblem(problem)

    x_j, x_o = x0.copy(), x0.copy()
    req = opt.run_optimizer(x_j, 0.05)
    t_o, i_o, _ = oracle.run(x_o, 0.05)
    saw_nan = False
    for it in range(60):
        assert req["task"] == t_o, f"step {it}"
        assert req["info"]["iteration_info"] == i_o, f"step {it}"
        if i_o == "search_direction_was_nan":
            saw_nan = True
        np.testing.assert_allclose(x_j, x_o, rtol=5e-6, atol=5e-7)
        opt.update_gradient(p1.grad(np.asarray(req["requested_on"]), it))
        g_o = p2.grad(x_o, it)
        req = opt.run_optimizer(x_j, 0.05)
        t_o, i_o, _ = oracle.run(x_o, 0.05, grad=g_o)
    assert saw_nan


def test_fisher_append_block_matches_successive_appends(rng):
    """``FisherMemory.append_block(g[k])`` == k successive ``append``s,
    including ring wrap-around (k > fisher_size) and partial fills."""
    import jax.numpy as jnp
    from stochqn_tpu.core.state import FisherMemory

    n, size = 7, 4
    for k, pre in ((2, 0), (4, 3), (6, 1), (9, 2)):
        grads = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
        pre_grads = jnp.asarray(rng.standard_normal((pre, n)), jnp.float32)
        seq = blk = FisherMemory.create(size, n, jnp.float32)
        for g in pre_grads:
            seq = seq.append(g)
            blk = blk.append(g)
        for g in grads:
            seq = seq.append(g)
        blk = blk.append_block(grads)
        np.testing.assert_array_equal(np.asarray(seq.f), np.asarray(blk.f))
        assert int(seq.head) == int(blk.head)
        assert int(seq.count) == int(blk.count)


def test_fisher_shift_and_dus_modes_agree(rng):
    """The static `shift` append mode (auto for small buffers) and the
    DUS ring mode hold the same multiset of rows at every step — only
    storage order differs — so `fisher_y` products agree to reduction
    order, and `append_block` == successive appends holds in BOTH modes
    (the auto default would otherwise leave the DUS branch untested at
    unit scale)."""
    import jax.numpy as jnp
    from stochqn_tpu.core.state import FisherMemory
    from stochqn_tpu.ops.pairs import fisher_y

    n, size = 7, 4
    s = jnp.asarray(rng.standard_normal(n), jnp.float32)
    for mode_kw in (dict(shift=True), dict(shift=False)):
        seq = blk = FisherMemory.create(size, n, jnp.float32, **mode_kw)
        assert seq.shift is mode_kw["shift"]
        grads = jnp.asarray(rng.standard_normal((6, n)), jnp.float32)
        for g in grads:
            seq = seq.append(g)
        blk = blk.append_block(grads)
        np.testing.assert_array_equal(np.asarray(seq.f), np.asarray(blk.f))
        assert int(seq.head) == int(blk.head)
        assert int(seq.count) == int(blk.count)

    sh = FisherMemory.create(size, n, jnp.float32, shift=True)
    du = FisherMemory.create(size, n, jnp.float32, shift=False)
    for i in range(7):   # cross partial fill AND wrap-around
        g = jnp.asarray(rng.standard_normal(n), jnp.float32)
        sh, du = sh.append(g), du.append(g)
        rows_sh = np.sort(np.asarray(sh.f), axis=0)
        rows_du = np.sort(np.asarray(du.f), axis=0)
        if i >= size - 1:      # identical multiset once both are full
            np.testing.assert_array_equal(rows_sh, rows_du)
        np.testing.assert_allclose(np.asarray(fisher_y(sh, s)),
                                   np.asarray(fisher_y(du, s)),
                                   rtol=1e-5, atol=1e-7)
    # auto threshold: tiny -> shift, huge -> DUS ring
    assert FisherMemory.create(4, 100, jnp.float32).shift is True
    assert FisherMemory.create(100, 3_000_000, jnp.float32).shift is False
