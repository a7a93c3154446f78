"""Ecosystem adapters: optax transformation, PytreeTrainer, MLP model,
checkpointing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stochqn_tpu.core.config import AdaQNConfig, SQNConfig
from stochqn_tpu.fused import FusedTrainer, batchify
from stochqn_tpu.optax_adapter import PytreeTrainer, olbfgs
from stochqn_tpu.utils.checkpoint import load_state, save_state


def test_optax_olbfgs_minimizes_quadratic(rng):
    import optax
    n = 12
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = jnp.asarray(q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T)
    target = jnp.asarray(rng.standard_normal(n))

    params = {"w": jnp.zeros(n // 2), "b": jnp.zeros(n - n // 2)}

    def loss(p):
        x = jnp.concatenate([p["w"], p["b"]])
        r = x - target
        return 0.5 * r @ a @ r

    opt = olbfgs(learning_rate=0.2, mem_size=6)
    state = opt.init(params)
    step = jax.jit(lambda p, s: _apply(opt, loss, p, s))
    for _ in range(60):
        params, state = step(params, state)
    x = np.concatenate([np.asarray(params["w"]), np.asarray(params["b"])])
    assert float(loss(params)) < 1e-6
    np.testing.assert_allclose(x, np.asarray(target), atol=1e-3)


def _apply(opt, loss, params, state):
    import optax
    grads = jax.grad(loss)(params)
    updates, state = opt.update(grads, state, params)
    return optax.apply_updates(params, updates), state


def test_optax_olbfgs_schedule_and_nan_guard(rng):
    import optax
    opt = olbfgs(learning_rate=lambda c: 0.1 / jnp.sqrt(c + 1.0),
                 mem_size=4)
    params = jnp.ones(5)
    state = opt.init(params)
    g = jnp.asarray(rng.standard_normal(5))
    updates, state = opt.update(g, state)
    assert int(state.count) == 1
    # NaN gradient: direction zeroed, memory flushed, no crash
    updates, state = opt.update(jnp.full(5, jnp.nan), state)
    assert np.all(np.asarray(updates) == 0) or np.all(
        np.isfinite(np.asarray(updates)))
    assert int(state.mem.count) == 0


def test_pytree_trainer_matches_flat(rng):
    """Training pytree params must equal training the raveled flat vector."""
    n1, n2, B, bs = 3, 4, 8, 4
    a = jnp.asarray(rng.standard_normal((n1 + n2, n1 + n2)))
    a = a @ a.T + 0.5 * jnp.eye(n1 + n2)
    data = jnp.asarray(rng.standard_normal((B, bs, n1 + n2)))

    def loss_tree(p, batch):
        x = jnp.concatenate([p["u"], p["v"]])
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * r @ a @ r

    def grad_flat(x, batch):
        return a @ (x - jnp.mean(batch, axis=0))

    cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=4)
    tmpl = {"u": jnp.zeros(n1), "v": jnp.zeros(n2)}
    pt = PytreeTrainer("SQN", cfg, loss_tree, tmpl)
    st_t = pt.init()
    st_t, _ = jax.jit(pt.epoch)(st_t, data, 0.05)

    ft = FusedTrainer("SQN", cfg, grad_flat)
    st_f = ft.init(jnp.zeros(n1 + n2))
    st_f, _ = jax.jit(ft.epoch)(st_f, data, 0.05)

    flat_from_tree = np.concatenate(
        [np.asarray(pt.params(st_t)["u"]), np.asarray(pt.params(st_t)["v"])])
    np.testing.assert_allclose(flat_from_tree, np.asarray(st_f.x),
                               rtol=1e-6, atol=1e-9)


def test_mlp_learns_xorish(rng):
    from stochqn_tpu.models.mlp import MLPClassifier
    # two interleaved half-moons-ish clusters
    n = 400
    theta = rng.uniform(0, 2 * np.pi, n)
    labels = (theta > np.pi).astype(int)
    X = np.stack([np.cos(theta), np.sin(2 * theta)], axis=1)
    X += 0.05 * rng.standard_normal(X.shape)

    clf = MLPClassifier(hidden=(16,), optimizer="adaQN", step_size=0.2,
                        batch_size=50, nepochs=30, bfgs_upd_freq=4,
                        fisher_size=20, random_state=0)
    clf.fit(X, labels)
    assert clf.score(X, labels) > 0.95


def test_mlp_digits_adaqn(rng):
    """BASELINE config 4 proxy (MNIST-class problem, offline-available):
    adaQN with empirical Fisher + max_incr guard + RMSProp H0 on a
    non-convex MLP classifier over sklearn digits."""
    from sklearn.datasets import load_digits
    from stochqn_tpu.models.mlp import MLPClassifier

    digits = load_digits()
    X = digits.data / 16.0
    y = digits.target

    clf = MLPClassifier(hidden=(48,), optimizer="adaQN", step_size=0.05,
                        batch_size=128, nepochs=30, bfgs_upd_freq=4,
                        fisher_size=32, max_incr=1.01, random_state=0)
    clf.fit(X, y)
    acc = clf.score(X, y)
    assert acc > 0.9, f"MLP digits accuracy {acc}"


def test_checkpoint_roundtrip_mid_protocol(rng, tmp_path):
    """Save mid-run, restore into a fresh template, continue: identical."""
    from stochqn_tpu.core.config import AdaQNConfig
    from stochqn_tpu.core import adaqn

    n = 8
    cfg = AdaQNConfig.create(mem_size=3, fisher_size=6, bfgs_upd_freq=4)
    adv = jax.jit(adaqn.advance, static_argnums=0)
    state = adaqn.init(jnp.asarray(rng.standard_normal(n)), cfg)
    g = jnp.asarray(rng.standard_normal(n))
    f = jnp.asarray(1.0)
    for _ in range(6):
        state, res = adv(cfg, state, g, f, 0.05)

    path = str(tmp_path / "ck.npz")
    save_state(path, state)
    template = adaqn.init(jnp.zeros(n), cfg)
    restored = load_state(path, template)

    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s1, r1 = adv(cfg, state, g, f, 0.05)
    s2, r2 = adv(cfg, restored, g, f, 0.05)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
    assert int(r1.task) == int(r2.task)


def test_checkpoint_structure_mismatch(rng, tmp_path):
    from stochqn_tpu.core import olbfgs, sqn
    from stochqn_tpu.core.config import OLBFGSConfig, SQNConfig
    st = olbfgs.init(jnp.zeros(5), OLBFGSConfig.create())
    path = str(tmp_path / "ck.npz")
    save_state(path, st)
    wrong = sqn.init(jnp.zeros(5), SQNConfig.create())
    with pytest.raises(ValueError):
        load_state(path, wrong)
