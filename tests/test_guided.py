"""Guided (fit / partial_fit) layer: convergence and driver semantics."""
import numpy as np
import pytest

from stochqn_tpu.guided import SQN, adaQN, oLBFGS


def _linreg_problem(rng, n_samples=400, n_features=8, noise=0.01):
    X = rng.standard_normal((n_samples, n_features))
    w_true = rng.standard_normal(n_features)
    y = X @ w_true + noise * rng.standard_normal(n_samples)
    return X, y, w_true


def _lsq_funs():
    def obj(w, X, y, sample_weight=None, **kw):
        r = X @ w - y
        return 0.5 * np.mean(r ** 2)

    def grad(w, X, y, sample_weight=None, **kw):
        r = X @ w - y
        return X.T @ r / X.shape[0]

    def hessvec(w, v, X, y, sample_weight=None, **kw):
        return X.T @ (X @ v) / X.shape[0]

    def pred(w, X, **kw):
        return X @ w
    return obj, grad, hessvec, pred


@pytest.mark.parametrize("make,tol", [
    (lambda x0, g, o, h, p: oLBFGS(x0, g, obj_fun=o, pred_fun=p,
                                   step_size=0.1, batches_per_epoch=10,
                                   nepochs=12, verbose=False), 1e-2),
    (lambda x0, g, o, h, p: SQN(x0, g, obj_fun=o, hess_vec_fun=h, pred_fun=p,
                                step_size=0.1, batches_per_epoch=10,
                                bfgs_upd_freq=5, nepochs=12, verbose=False),
     1e-2),
    # grad-diff pairs need consistent big-batch windows: make the window the
    # whole (unshuffled) epoch, like the reference benchmark setups do
    (lambda x0, g, o, h, p: SQN(x0, g, obj_fun=o, pred_fun=p,
                                use_grad_diff=True, step_size=0.1,
                                batches_per_epoch=5, bfgs_upd_freq=5,
                                shuffle_data=False, nepochs=15,
                                verbose=False), 5e-2),
    (lambda x0, g, o, h, p: adaQN(x0, g, obj_fun=o, pred_fun=p,
                                  step_size=0.5, batches_per_epoch=10,
                                  bfgs_upd_freq=5, nepochs=15,
                                  verbose=False), 5e-2),
], ids=["oLBFGS", "SQN-hv", "SQN-gd", "adaQN"])
def test_fit_converges_linreg(rng, make, tol):
    X, y, w_true = _linreg_problem(rng)
    obj, grad, hessvec, pred = _lsq_funs()
    x0 = np.zeros(X.shape[1])
    opt = make(x0, grad, obj, hessvec, pred)
    opt.fit(X, y)
    final = obj(opt.x, X, y)
    assert final < tol, f"loss {final}"
    # predict goes through pred_fun
    assert opt.predict(X[:5]).shape == (5,)


def test_partial_fit_stream(rng):
    X, y, w_true = _linreg_problem(rng)
    obj, grad, hessvec, _ = _lsq_funs()
    opt = SQN(np.zeros(X.shape[1]), grad, obj_fun=obj, hess_vec_fun=hessvec,
              step_size=0.05, decr_step_size=None, bfgs_upd_freq=4,
              verbose=False)
    loss0 = obj(opt.x, X, y)
    for epoch in range(6):
        for i in range(0, 400, 40):
            opt.partial_fit(X[i:i + 40], y[i:i + 40])
    assert obj(opt.x, X, y) < loss0 * 0.1
    assert opt.niter == 6 * 10


def test_partial_fit_adaqn_guard_plus_grad_diff(rng):
    """adaQN with use_grad_diff AND max_incr issues two big-batch requests
    at one protocol boundary (function-value guard, then the gradient-
    difference y); the stored-batch container must serve both from the
    same assembled batch.  The reference crashes here (its container is
    reset by the first request) — a reference bug deliberately not
    reproduced."""
    X, y, _ = _linreg_problem(rng)
    obj, grad, _, _ = _lsq_funs()
    opt = adaQN(np.zeros(X.shape[1]), grad, obj_fun=obj,
                use_grad_diff=True, max_incr=1.01, bfgs_upd_freq=4,
                step_size=0.05, decr_step_size=None, verbose=False)
    loss0 = obj(opt.x, X, y)
    for epoch in range(4):
        for i in range(0, 400, 40):
            opt.partial_fit(X[i:i + 40], y[i:i + 40])   # crossed boundaries
    assert opt.niter == 4 * 10
    assert obj(opt.x, X, y) < loss0


def test_valset_early_stopping(rng):
    X, y, _ = _linreg_problem(rng, n_samples=500)
    obj, grad, hessvec, _ = _lsq_funs()
    calls = []
    opt = oLBFGS(np.zeros(X.shape[1]), grad, obj_fun=obj, step_size=0.1,
                 batches_per_epoch=10, nepochs=50, valset_frac=0.2, tol=1e-3,
                 verbose=False, callback_epoch=lambda x: calls.append(1))
    opt.fit(X, y)
    assert len(calls) < 50  # stopped early


def test_callbacks_and_schedule(rng):
    X, y, _ = _linreg_problem(rng, n_samples=100)
    obj, grad, _, _ = _lsq_funs()
    iters = []
    steps = []

    def sched(s0, k):
        steps.append(k)
        return s0 / (k + 1)

    opt = oLBFGS(np.zeros(X.shape[1]), grad, step_size=0.1,
                 decr_step_size=sched, batches_per_epoch=5, nepochs=2,
                 verbose=False, callback_iter=lambda x: iters.append(1))
    opt.fit(X, y)
    assert len(iters) == 10      # one per completed iteration
    assert set(steps) == {0, 1}  # keyed on epoch in fit mode
