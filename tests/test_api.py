"""Top-level minimize() API + metrics utilities."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stochqn_tpu import minimize
from stochqn_tpu.utils.metrics import (LossHistory, problem_iterations,
                                       summarize_infos)
from stochqn_tpu.core.enums import Info


def _quad_loss(rng, n):
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = jnp.asarray(q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T)

    def loss(x, batch):
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * r @ a @ r
    return loss


def test_minimize_flat_sqn(rng):
    n = 10
    loss = _quad_loss(rng, n)
    data = jnp.asarray(rng.standard_normal((200, n)) * 0.1)
    res = minimize(loss, jnp.ones(n) * 3.0, data, optimizer="SQN",
                   step_size=0.3, batch_size=20, nepochs=20, tol=1e-8,
                   mem_size=4, bfgs_upd_freq=5)
    assert res.losses[-1] <= res.losses[0]
    assert res.losses[-1] < 1e-3
    assert res.nepochs_run <= 20
    assert "no_problems_encountered" in res.info_counts


def test_minimize_pytree_adaqn(rng):
    n = 8
    loss_flat = _quad_loss(rng, n)

    def loss(p, batch):
        return loss_flat(jnp.concatenate([p["a"], p["b"]]), batch)

    data = jnp.asarray(rng.standard_normal((120, n)) * 0.1)
    x0 = {"a": jnp.ones(3) * 2, "b": jnp.ones(n - 3) * 2}
    res = minimize(loss, x0, data, optimizer="adaQN", step_size=0.3,
                   batch_size=20, nepochs=15, tol=1e-9, mem_size=4,
                   bfgs_upd_freq=3, fisher_size=12)
    assert set(res.x.keys()) == {"a", "b"}
    assert res.losses[-1] < res.losses[0] * 0.1


def test_minimize_with_mesh(rng):
    pytest.importorskip("jax")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from stochqn_tpu.parallel import make_mesh
    n = 8
    loss = _quad_loss(rng, n)
    data = jnp.asarray(rng.standard_normal((160, n)) * 0.1)
    mesh = make_mesh(n_data=8, n_param=1)
    res = minimize(loss, jnp.ones(n), data, optimizer="SQN", step_size=0.3,
                   batch_size=16, nepochs=5, tol=1e-9, mem_size=3,
                   bfgs_upd_freq=4, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(res.state.x)))


def test_metrics_helpers():
    infos = jnp.asarray([[200, 200, 202], [203, 200, 200]], jnp.int32)
    counts = summarize_infos(infos)
    assert counts == {"no_problems_encountered": 4,
                      "curvature_too_small": 1,
                      "search_direction_was_nan": 1}
    bad = problem_iterations(infos)
    np.testing.assert_array_equal(bad, [2, 3])

    h = LossHistory(tol=0.5)
    assert not h.update(10.0)
    assert not h.update(8.0)    # big decrease
    assert h.update(7.9)        # small decrease -> stop


def test_free_mode_rejects_wrong_length_inputs(rng):
    """Input validation parity: the reference's update_gradient checks
    shape (stochqn/_optimizers.py:917-927)."""
    import pytest
    from stochqn_tpu.free import SQN_free

    opt = SQN_free(mem_size=3, bfgs_upd_freq=4)
    x = rng.standard_normal(8)
    opt.run_optimizer(x, 0.05)
    with pytest.raises(ValueError, match="gradient has 5"):
        opt.update_gradient(np.zeros(5))
    opt.update_gradient(np.zeros(8))   # correct length still accepted
    with pytest.raises(ValueError, match="hess_vec has 3"):
        opt.update_hess_vec(np.zeros(3))
