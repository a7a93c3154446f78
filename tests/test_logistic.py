"""Logistic-regression model: loss/grad/Hv correctness vs sklearn internals
and end-to-end convergence on sklearn digits (BASELINE config 1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from stochqn_tpu.models import losses
from stochqn_tpu.models.logistic import StochasticLogisticRegression


def test_binary_loss_grad_hv_match_sklearn(rng):
    from sklearn.linear_model._linear_loss import LinearModelLoss
    from sklearn._loss import HalfBinomialLoss

    n, d = 40, 7
    X = rng.standard_normal((n, d))
    y01 = (rng.random(n) > 0.5).astype(np.float64)
    w = rng.standard_normal(d + 1)
    sw = rng.uniform(0.5, 1.5, n)
    reg = 0.3

    # sklearn: average-loss formulation differs; use LinearModelLoss with
    # explicit sample weights and l2_reg on coef only.
    lml = LinearModelLoss(base_loss=HalfBinomialLoss(), fit_intercept=True)
    skl_loss, skl_grad = lml.loss_gradient(
        w, X, y01, sample_weight=sw, l2_reg_strength=reg / sw.sum())
    # LinearModelLoss normalizes by sum of weights; ours is a raw weighted sum
    scale = sw.sum()

    ours_loss = float(losses.binary_logistic_loss(
        jnp.asarray(w), jnp.asarray(X), jnp.asarray(2 * y01 - 1),
        jnp.asarray(sw), reg))
    ours_grad = np.asarray(losses.binary_logistic_grad(
        jnp.asarray(w), jnp.asarray(X), jnp.asarray(2 * y01 - 1),
        jnp.asarray(sw), reg))
    np.testing.assert_allclose(ours_loss, skl_loss * scale, rtol=1e-9)
    np.testing.assert_allclose(ours_grad, skl_grad * scale, rtol=1e-8)

    # Hessian-vector product vs finite differences of the gradient
    v = rng.standard_normal(d + 1)
    eps = 1e-6
    gp = np.asarray(losses.binary_logistic_grad(
        jnp.asarray(w + eps * v), jnp.asarray(X), jnp.asarray(2 * y01 - 1),
        jnp.asarray(sw), reg))
    gm = np.asarray(losses.binary_logistic_grad(
        jnp.asarray(w - eps * v), jnp.asarray(X), jnp.asarray(2 * y01 - 1),
        jnp.asarray(sw), reg))
    hv_fd = (gp - gm) / (2 * eps)
    hv = np.asarray(losses.binary_logistic_hessvec(
        jnp.asarray(w), jnp.asarray(v), jnp.asarray(X),
        jnp.asarray(2 * y01 - 1), jnp.asarray(sw), reg))
    np.testing.assert_allclose(hv, hv_fd, rtol=1e-4, atol=1e-6)


def test_multinomial_grad_matches_autodiff(rng):
    import jax
    n, d, k = 30, 5, 4
    X = rng.standard_normal((n, d))
    labels = rng.integers(0, k, n)
    Y = np.eye(k)[labels]
    w = rng.standard_normal(k * (d + 1))
    sw = rng.uniform(0.5, 1.5, n)
    reg = 0.2

    args = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(sw), reg)
    g_auto = np.asarray(jax.grad(losses.multinomial_logistic_loss)(
        jnp.asarray(w), *args))
    g_ours = np.asarray(losses.multinomial_logistic_grad(jnp.asarray(w),
                                                         *args))
    np.testing.assert_allclose(g_ours, g_auto, rtol=1e-8, atol=1e-10)

    v = jnp.asarray(rng.standard_normal(k * (d + 1)))
    hv_auto = np.asarray(jax.jvp(
        lambda ww: losses.multinomial_logistic_grad(ww, *args),
        (jnp.asarray(w),), (v,))[1])
    hv_ours = np.asarray(losses.multinomial_logistic_hessvec(
        jnp.asarray(w), v, *args))
    np.testing.assert_allclose(hv_ours, hv_auto, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("optimizer", ["oLBFGS", "SQN", "adaQN"])
def test_digits_binary_convergence(optimizer):
    """BASELINE.json config 1: binary logistic regression on sklearn digits.

    Note the digits>=5 split is genuinely hard for a linear model: the
    l2-regularized optimum reaches only 90.7% train accuracy / 0.299 loss
    (verified with scipy L-BFGS), so the bar here is approach, not
    perfection."""
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = digits.data / 16.0
    y = (digits.target >= 5).astype(np.float64)

    clf = StochasticLogisticRegression(
        reg_param=1e-3, optimizer=optimizer, step_size=1.0,
        valset_frac=None, verbose=False, nepochs=10, batches_per_epoch=20,
        random_state=1, dtype=np.float64)
    clf.fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.84, f"{optimizer} digits accuracy {acc}"
    proba = clf.predict_proba(X[:7])
    assert proba.shape == (7, 2)
    assert np.all(proba >= 0) and np.all(proba <= 1)


def test_digits_multinomial_partial_fit():
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = digits.data / 16.0
    Y = np.eye(10)[digits.target]

    clf = StochasticLogisticRegression(
        reg_param=1e-3, optimizer="SQN", step_size=1e-1, valset_frac=None,
        verbose=False, bfgs_upd_freq=5, dtype=np.float64)
    for epoch in range(8):
        for i in range(0, X.shape[0] - 100, 100):
            clf.partial_fit(X[i:i + 100], Y[i:i + 100])
    acc = (clf.predict(X) == digits.target).mean()
    assert acc > 0.85, f"multinomial digits accuracy {acc}"
    assert clf.coef_.shape == (10, 64)
    assert clf.intercept_.shape == (10,)


@pytest.mark.parametrize("optimizer", ["oLBFGS", "SQN", "adaQN"])
def test_digits_fused_engine(optimizer):
    """engine='fused': on-device training of the model class reaches the
    same quality as the protocol engine."""
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = digits.data / 16.0
    y = (digits.target >= 5).astype(np.float64)

    clf = StochasticLogisticRegression(
        reg_param=1e-3, optimizer=optimizer, step_size=1.0,
        valset_frac=0.15, tol=1e-4, verbose=False, nepochs=15,
        batches_per_epoch=20, random_state=1, dtype=np.float64,
        engine="fused",
        **({"bfgs_upd_freq": 10} if optimizer != "oLBFGS" else {}))
    clf.fit(X, y)
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.84, f"{optimizer} fused digits accuracy {acc}"
    assert clf.coef_.shape == (64,)
    proba = clf.predict_proba(X[:5])
    assert proba.shape == (5, 2)


def test_digits_fused_multinomial():
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = digits.data / 16.0
    Y = np.eye(10)[digits.target]

    clf = StochasticLogisticRegression(
        reg_param=1e-3, optimizer="SQN", step_size=1.0, valset_frac=None,
        verbose=False, nepochs=10, batches_per_epoch=20, bfgs_upd_freq=5,
        dtype=np.float64, engine="fused")
    clf.fit(X, Y)
    acc = (clf.predict(X) == digits.target).mean()
    assert acc > 0.85, f"fused multinomial digits accuracy {acc}"
    assert clf.coef_.shape == (10, 64)


def test_fused_then_partial_fit_continues_same_model():
    """partial_fit after a fused fit hands the fused weights to the
    protocol optimizer (no silent model fork)."""
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = digits.data / 16.0
    y = (digits.target >= 5).astype(np.float64)

    clf = StochasticLogisticRegression(
        reg_param=1e-3, optimizer="oLBFGS", step_size=1.0, valset_frac=None,
        verbose=False, nepochs=5, batches_per_epoch=20, dtype=np.float64,
        engine="fused")
    clf.fit(X, y)
    x_after_fit = np.asarray(clf.x_).copy()
    clf.partial_fit(X[:100], y[:100])
    # the protocol optimizer took over, starting from the fused weights
    assert clf._x_fused is None
    x_now = np.asarray(clf.x_)
    assert not np.allclose(x_now, x_after_fit)        # it moved
    assert np.linalg.norm(x_now - x_after_fit) < 1.0  # ...from the warm start


def test_fused_logistic_on_mesh_matches_unsharded():
    """StochasticLogisticRegression(engine='fused', mesh=...) must match
    the unsharded fused fit (digits multinomial, (4 data x 2 param))."""
    import jax
    from sklearn.datasets import load_digits
    from stochqn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    digits = load_digits()
    X = digits.data[:1600] / 16.0
    Y = np.eye(10)[digits.target[:1600]]

    kw = dict(reg_param=1e-3, optimizer="SQN", use_grad_diff=True,
              step_size=1.0, valset_frac=None, nepochs=12,
              batches_per_epoch=16, random_state=1, dtype=np.float64,
              engine="fused")
    plain = StochasticLogisticRegression(**kw)
    plain.fit(X, Y)
    mesh = make_mesh(n_data=4, n_param=2)
    sharded = StochasticLogisticRegression(mesh=mesh, **kw)
    sharded.fit(X, Y)

    np.testing.assert_allclose(np.asarray(sharded.x_), np.asarray(plain.x_),
                               rtol=1e-8, atol=1e-10)
    acc = (sharded.predict(X) == digits.target[:1600]).mean()
    assert acc > 0.85
