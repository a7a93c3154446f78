"""Lockstep tests of the guided driver loop against the reference's Python
driver semantics (``/root/reference/stochqn/_optimizers.py:199-382``).

The request *protocol* (which tasks fire when) is already parity-locked
against the compiled reference C core (test_reference_parity / fuzz); these
tests lock the *driver* layer on top of it: which rows of (X, y) each
callable sees (shuffle order, batch slicing, long-batch windows at every
alignment), which step size each iteration gets (epoch-keyed in ``fit``,
niter-keyed in ``partial_fit``), the validation-set routing, and the exact
early-stopping condition (``_optimizers.py:275-281``).

Rows are made identifiable by storing the row index in column 0, so a
recorded call reveals precisely which sample rows it was handed.
"""
import warnings

import numpy as np
import pytest

from stochqn_tpu.guided import SQN, adaQN, oLBFGS


def _tagged_problem(n_samples, n_features=4, seed=3):
    """X whose column 0 is the original row index (identifiable rows)."""
    rng = np.random.default_rng(seed)
    X = 0.1 * rng.standard_normal((n_samples, n_features))
    X[:, 0] = np.arange(n_samples)
    w = rng.standard_normal(n_features) * 0.01
    y = X @ w + 0.01 * rng.standard_normal(n_samples)
    return X, y


class Recorder:
    """Least-squares callables that record the row ids of every call."""

    def __init__(self):
        self.calls = []  # (kind, row_ids ndarray)

    def _note(self, kind, X):
        self.calls.append((kind, np.asarray(X[:, 0]).copy()))

    def grad(self, x, X, y, sample_weight=None, **kw):
        self._note("grad", X)
        r = X @ x - y
        return X.T @ r / X.shape[0]

    def obj(self, x, X, y, sample_weight=None, **kw):
        self._note("obj", X)
        r = X @ x - y
        return 0.5 * float(np.mean(r ** 2))

    def hess_vec(self, x, v, X, y, sample_weight=None, **kw):
        self._note("hess_vec", X)
        return X.T @ (X @ v) / X.shape[0]

    def of_kind(self, kind):
        return [rows for k, rows in self.calls if k == kind]


def reference_shuffle_orders(n, random_state, nepochs):
    """Cumulative epoch shuffles, exactly as the reference does them
    (``_optimizers.py:251-256``): global seed ``random_state + epoch``,
    ``argsort(random(n))``, applied to the *already shuffled* array."""
    ids = np.arange(n)
    out = []
    for epoch in range(nepochs):
        np.random.seed(random_state + epoch)
        order = np.argsort(np.random.random(size=n))
        ids = ids[order]
        out.append(ids.copy())
    return out


def reference_long_window(n, batch_size, upd_freq, batch):
    """Row positions of the long batch (``_optimizers.py:55-79``)."""
    diff = (batch + 1) % upd_freq
    want = upd_freq - diff
    if (batch + 1) >= want:
        st = (batch + 1 - want) * batch_size
        end = min(n, (batch + 1) * batch_size)
    else:
        st = 0
        end = min(n, want * batch_size)
    return np.arange(st, end)


# --------------------------------------------------------------------------
# shuffle order + small-batch slicing
# --------------------------------------------------------------------------
def test_fit_shuffle_and_batch_slicing_lockstep():
    n, bpe, nepochs, rs = 21, 4, 3, 7
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = oLBFGS(np.zeros(X.shape[1]), rec.grad, step_size=1e-3,
                 shuffle_data=True, random_state=rs, nepochs=nepochs,
                 batches_per_epoch=bpe, verbose=False)
    opt.fit(X, y)

    batch_size = int(np.ceil(n / bpe))       # 6, last batch is 3 rows
    orders = reference_shuffle_orders(n, rs, nepochs)
    expected = []
    for epoch_ids in orders:
        for b in range(bpe):
            expected.append(epoch_ids[b * batch_size:
                                      min(n, (b + 1) * batch_size)])

    # oLBFGS requests calc_grad then calc_grad_same_batch per iteration —
    # both on the same small batch.
    grads = rec.of_kind("grad")
    assert len(grads) == 2 * len(expected)
    for i, exp in enumerate(expected):
        np.testing.assert_array_equal(grads[2 * i], exp)
        np.testing.assert_array_equal(grads[2 * i + 1], exp)


# --------------------------------------------------------------------------
# long-batch windows at misaligned upd_freq (grad-diff and hess-vec paths)
# --------------------------------------------------------------------------
def _check_long_windows(rec, big_kind, n, batch_size, bpe, upd_freq):
    """Replay the recorded call stream; each big-batch call must see the
    reference window for the batch index in scope at that moment."""
    small_seen = 0
    checked = 0
    for kind, rows in rec.calls:
        if kind == "grad" and len(rows) <= batch_size:
            small_seen += 1
        elif kind == big_kind or (kind == "grad" and len(rows) > batch_size):
            batch = (small_seen - 1) % bpe
            exp = reference_long_window(n, batch_size, upd_freq, batch)
            np.testing.assert_array_equal(
                np.sort(rows), exp,
                err_msg=f"window mismatch at batch={batch}")
            checked += 1
    return checked


def test_fit_long_batch_windows_grad_diff_misaligned():
    # bpe=7, upd_freq=5: boundaries land at batch indices 4, 2, 0, 5 across
    # epochs — including the (batch+1) < upd_freq-diff "slice from epoch
    # start" path and the stored-batch merge (diff > 0).
    n, bpe, upd_freq, nepochs = 28, 7, 5, 3
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = SQN(np.zeros(X.shape[1]), rec.grad, use_grad_diff=True,
              step_size=1e-3, shuffle_data=False, nepochs=nepochs,
              batches_per_epoch=bpe, bfgs_upd_freq=upd_freq, verbose=False)
    opt.fit(X, y)
    batch_size = int(np.ceil(n / bpe))  # 4
    checked = _check_long_windows(rec, "grad_big", n, batch_size, bpe,
                                  upd_freq)
    assert checked >= 3   # several boundaries actually fired


def test_fit_long_batch_windows_hess_vec_misaligned():
    n, bpe, upd_freq, nepochs = 28, 7, 3, 2
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = SQN(np.zeros(X.shape[1]), rec.grad, hess_vec_fun=rec.hess_vec,
              step_size=1e-3, shuffle_data=False, nepochs=nepochs,
              batches_per_epoch=bpe, bfgs_upd_freq=upd_freq, verbose=False)
    opt.fit(X, y)
    batch_size = int(np.ceil(n / bpe))
    checked = _check_long_windows(rec, "hess_vec", n, batch_size, bpe,
                                  upd_freq)
    assert checked >= 3
    assert len(rec.of_kind("hess_vec")) == checked


def test_fit_shuffled_long_windows_use_epoch_order():
    """Long windows slice the *shuffled* epoch array — positions, not
    original row ids."""
    n, bpe, upd_freq, nepochs, rs = 24, 6, 3, 2, 11
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = SQN(np.zeros(X.shape[1]), rec.grad, use_grad_diff=True,
              step_size=1e-3, shuffle_data=True, random_state=rs,
              nepochs=nepochs, batches_per_epoch=bpe,
              bfgs_upd_freq=upd_freq, verbose=False)
    opt.fit(X, y)
    batch_size = int(np.ceil(n / bpe))
    orders = reference_shuffle_orders(n, rs, nepochs)

    small_seen = 0
    checked = 0
    for kind, rows in rec.calls:
        if kind != "grad":
            continue
        if len(rows) <= batch_size:
            small_seen += 1
            continue
        epoch = (small_seen - 1) // bpe
        batch = (small_seen - 1) % bpe
        pos = reference_long_window(n, batch_size, upd_freq, batch)
        np.testing.assert_array_equal(rows, orders[epoch][pos])
        checked += 1
    assert checked >= 2


# --------------------------------------------------------------------------
# step-size schedule keying
# --------------------------------------------------------------------------
def test_partial_fit_schedule_keyed_on_niter():
    X, y = _tagged_problem(40)
    rec = Recorder()
    ks = []

    def sched(s0, k):
        ks.append(int(k))
        return s0

    opt = oLBFGS(np.zeros(X.shape[1]), rec.grad, step_size=1e-3,
                 decr_step_size=sched, verbose=False)
    for i in range(5):
        opt.partial_fit(X[8 * i:8 * (i + 1)], y[8 * i:8 * (i + 1)])
    # one sched call per run_optimizer, passing the niter in effect at that
    # moment (keyed on iterations, not epochs): oLBFGS runs twice per
    # iteration (grad, then same-batch grad after x moved, by which point
    # niter has already advanced) — exactly the reference's key sequence.
    assert opt.niter == 5
    assert ks == [0, 1, 1, 2, 2, 3, 3, 4, 4, 5]


# --------------------------------------------------------------------------
# validation set routing + exact early-stop condition
# --------------------------------------------------------------------------
def test_valset_rows_routed_to_obj():
    """adaQN's calc_fun_val_batch must be evaluated on the validation set
    when one is supplied (``_optimizers.py:346-348``)."""
    X, y = _tagged_problem(30)
    Xv, yv = _tagged_problem(5, seed=9)
    Xv[:, 0] += 1000          # distinguishable val rows
    rec = Recorder()
    opt = adaQN(np.zeros(X.shape[1]), rec.grad, obj_fun=rec.obj,
                step_size=1e-2, nepochs=3, batches_per_epoch=5,
                bfgs_upd_freq=2, max_incr=1.01, shuffle_data=False,
                tol=0.0, verbose=False)
    opt.fit(X, y, valset=(Xv, yv, None))
    objs = rec.of_kind("obj")
    assert len(objs) > 0
    for rows in objs:
        assert np.all(rows >= 1000), "obj evaluated on train rows"


def test_early_stop_exact_condition():
    """Stop iff (prev - obj) < tol AND obj <= prev — an *increase* must not
    stop even though its decrease is below tol (``_optimizers.py:275-281``)."""
    X, y = _tagged_problem(20)
    scripted = iter([10.0, 10.5, 10.45, 10.44, 10.43])
    epochs_run = []

    def obj(x, Xv, yv, sample_weight=None, **kw):
        return next(scripted)

    def grad(x, Xv, yv, sample_weight=None, **kw):
        r = Xv @ x - yv
        return Xv.T @ r / Xv.shape[0]

    opt = oLBFGS(np.zeros(X.shape[1]), grad, obj_fun=obj, step_size=1e-3,
                 nepochs=5, batches_per_epoch=4, tol=0.2, verbose=False,
                 callback_epoch=lambda x: epochs_run.append(1))
    opt.fit(X, y, valset=(X[:4], y[:4], None))
    # epoch 0: obj=10.0 -> prev=10.0
    # epoch 1: obj=10.5  increase -> MUST continue (obj > prev)
    # epoch 2: obj=10.45 decrease 0.05 < 0.2 and obj <= prev -> stop
    assert len(epochs_run) == 3


def test_valset_frac_split_matches_sklearn():
    from sklearn.model_selection import train_test_split
    n, rs = 40, 13
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = oLBFGS(np.zeros(X.shape[1]), rec.grad, obj_fun=rec.obj,
                 step_size=1e-3, nepochs=1, batches_per_epoch=2,
                 valset_frac=0.25, tol=-np.inf, random_state=rs,
                 shuffle_data=False, verbose=False)
    opt.fit(X, y)
    _, X_val_exp, _, _ = train_test_split(X, y, test_size=0.25,
                                          random_state=rs)
    objs = rec.of_kind("obj")
    assert len(objs) == 1     # epoch-end evaluation only (oLBFGS)
    np.testing.assert_array_equal(objs[0], X_val_exp[:, 0])


# --------------------------------------------------------------------------
# partial_fit stored-batch container
# --------------------------------------------------------------------------
def test_partial_fit_big_batch_is_vstack_of_stored():
    """Big-batch requests in partial_fit see exactly the vstack of every
    batch since the last big-batch pop (``_optimizers.py:288-337``)."""
    n, upd_freq = 60, 3
    X, y = _tagged_problem(n)
    rec = Recorder()
    opt = SQN(np.zeros(X.shape[1]), rec.grad, use_grad_diff=True,
              step_size=1e-3, decr_step_size=None,
              bfgs_upd_freq=upd_freq, verbose=False)
    bs = 6
    for i in range(n // bs):
        opt.partial_fit(X[bs * i:bs * (i + 1)], y[bs * i:bs * (i + 1)])

    pending = []
    for kind, rows in rec.calls:
        if kind != "grad":
            continue
        if len(rows) == bs:
            pending.append(rows)
        else:
            np.testing.assert_array_equal(rows, np.concatenate(pending))
            pending = []
    assert opt.niter == n // bs


def test_partial_fit_mixed_weights_warns_and_fills_ones():
    X, y = _tagged_problem(24)
    rec = Recorder()
    weights_seen = []

    def grad(x, Xb, yb, sample_weight=None, **kw):
        weights_seen.append(None if sample_weight is None
                            else np.asarray(sample_weight).copy())
        return rec.grad(x, Xb, yb)

    opt = SQN(np.zeros(X.shape[1]), grad, use_grad_diff=True,
              step_size=1e-3, bfgs_upd_freq=2, verbose=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        opt.partial_fit(X[:6], y[:6], sample_weight=np.full(6, 2.0))
        opt.partial_fit(X[6:12], y[6:12])  # no weights
        assert any("weights" in str(x.message) for x in w)
    big = [w_ for w_ in weights_seen if w_ is not None and len(w_) == 12]
    assert big and np.allclose(big[0], np.r_[np.full(6, 2.0), np.ones(6)])


# --------------------------------------------------------------------------
# sparse CSR inputs take the same trajectory as dense
# --------------------------------------------------------------------------
def test_fit_csr_matches_dense_trajectory():
    sp = pytest.importorskip("scipy.sparse")
    n = 24
    X, y = _tagged_problem(n)

    def make(grad):
        return SQN(np.zeros(X.shape[1]), grad, use_grad_diff=True,
                   step_size=1e-3, shuffle_data=True, random_state=5,
                   nepochs=2, batches_per_epoch=4, bfgs_upd_freq=2,
                   verbose=False)

    def grad_dense(x, Xb, yb, sample_weight=None, **kw):
        r = Xb @ x - yb
        return Xb.T @ r / Xb.shape[0]

    def grad_sparse(x, Xb, yb, sample_weight=None, **kw):
        r = Xb @ x - np.asarray(yb)
        return np.asarray(Xb.T @ r).ravel() / Xb.shape[0]

    d = make(grad_dense).fit(X, y)
    s = make(grad_sparse).fit(sp.csr_matrix(X), y)
    np.testing.assert_allclose(s.x, d.x, rtol=1e-10)
