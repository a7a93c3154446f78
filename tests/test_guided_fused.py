"""Guided ``fit(engine="fused")``: epochs as single device programs.

The fused engine must reproduce the protocol driver's trajectory on an
aligned configuration (same shuffle order, schedule, early stopping, final
optimizer state) — the on-device analogue of the loop the reference drives
per-request (``stochqn/_optimizers.py:199-286``).  Big batches are the same
rows in a merged order, so equality is to float tolerance (f64 here), not
bitwise — docs/protocol.md.
"""
import numpy as np
import pytest

from stochqn_tpu.guided import SQN, adaQN, oLBFGS


def _linreg(rng, n_samples=200, n_features=8, noise=0.05):
    X = rng.standard_normal((n_samples, n_features))
    w_true = rng.standard_normal(n_features)
    y = X @ w_true + noise * rng.standard_normal(n_samples)
    return X, y


def _lsq_funs():
    def obj(w, X, y, sample_weight=None, **kw):
        r = X @ w - y
        if sample_weight is not None:
            return 0.5 * (sample_weight * r ** 2).sum() / X.shape[0]
        return 0.5 * np.mean(r ** 2)

    def grad(w, X, y, sample_weight=None, **kw):
        r = X @ w - y
        if sample_weight is not None:
            r = r * sample_weight
        return X.T @ r / X.shape[0]

    def hessvec(w, v, X, y, sample_weight=None, **kw):
        return X.T @ (X @ v) / X.shape[0]
    return obj, grad, hessvec


def _makers():
    obj, grad, hessvec = _lsq_funs()
    return {
        "oLBFGS": lambda x0: oLBFGS(
            x0, grad, obj_fun=obj, step_size=0.1, batches_per_epoch=10,
            nepochs=4, verbose=False),
        "SQN-hv": lambda x0: SQN(
            x0, grad, obj_fun=obj, hess_vec_fun=hessvec, step_size=0.1,
            batches_per_epoch=10, bfgs_upd_freq=5, nepochs=4,
            verbose=False),
        "SQN-gd": lambda x0: SQN(
            x0, grad, obj_fun=obj, use_grad_diff=True, step_size=0.1,
            batches_per_epoch=10, bfgs_upd_freq=5, nepochs=4,
            verbose=False),
        "adaQN": lambda x0: adaQN(
            x0, grad, obj_fun=obj, step_size=0.5, batches_per_epoch=10,
            bfgs_upd_freq=5, fisher_size=20, nepochs=4, verbose=False),
        "adaQN-gd": lambda x0: adaQN(
            x0, grad, obj_fun=obj, use_grad_diff=True, step_size=0.5,
            batches_per_epoch=10, bfgs_upd_freq=5, nepochs=4,
            verbose=False),
    }


@pytest.mark.parametrize("kind", list(_makers()))
def test_fused_fit_matches_protocol(rng, kind):
    """Aligned config (divisible rows, B % upd_freq == 0, fresh state,
    shuffle ON): protocol and fused fits produce the same trajectory,
    iteration count and protocol position."""
    X, y = _linreg(rng)
    make = _makers()[kind]
    x0 = np.zeros(X.shape[1])

    p = make(x0)
    p.fit(X, y, engine="protocol")
    f = make(x0)
    f.fit(X, y, engine="fused")

    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)
    assert f.niter == p.niter == 40
    assert f.req["task"] == p.req["task"] == "calc_grad"
    assert (f.req["info"]["iteration_number"]
            == p.req["info"]["iteration_number"])


def test_fused_fit_with_sample_weights_matches_protocol(rng):
    X, y = _linreg(rng)
    w = rng.uniform(0.5, 1.5, X.shape[0])
    make = _makers()["SQN-gd"]
    p, f = make(np.zeros(X.shape[1])), make(np.zeros(X.shape[1]))
    p.fit(X, y, sample_weight=w, engine="protocol")
    f.fit(X, y, sample_weight=w, engine="fused")
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)


def test_fused_then_partial_fit_resumes_protocol(rng):
    """The state handed back by the fused fit is a valid protocol resume
    point: partial_fit afterwards matches an all-protocol run."""
    X, y = _linreg(rng)
    make = _makers()["SQN-hv"]

    p = make(np.zeros(X.shape[1]))
    p.fit(X, y, engine="protocol")
    f = make(np.zeros(X.shape[1]))
    f.fit(X, y, engine="fused")

    for opt in (p, f):
        for i in range(0, 200, 20):
            opt.partial_fit(X[i:i + 20], y[i:i + 20])
    assert f.niter == p.niter == 50
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)


def test_fused_valset_early_stop_matches_protocol(rng):
    """Validation early stopping fires at the same epoch in both engines
    (host-side objective either way)."""
    X, y = _linreg(rng, n_samples=200)
    obj, grad, _ = _lsq_funs()
    Xv, yv = _linreg(rng, n_samples=50)

    def run(engine):
        calls = []
        opt = oLBFGS(np.zeros(X.shape[1]), grad, obj_fun=obj,
                     step_size=0.1, batches_per_epoch=10, nepochs=50,
                     tol=1e-3, verbose=False,
                     callback_epoch=lambda x: calls.append(1))
        opt.fit(X, y, valset=(Xv, yv, None), engine=engine)
        return opt, len(calls)

    p, ep = run("protocol")
    f, ef = run("fused")
    assert ef == ep < 50
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)


def test_fused_adaqn_guard_on_valset_matches_protocol(rng):
    """adaQN's in-program function-value guard evaluates on the validation
    set when one exists (protocol: the valset branch of _fit_batch)."""
    X, y = _linreg(rng)
    obj, grad, _ = _lsq_funs()
    Xv, yv = _linreg(rng, n_samples=40)

    def run(engine):
        opt = adaQN(np.zeros(X.shape[1]), grad, obj_fun=obj, step_size=0.5,
                    batches_per_epoch=10, bfgs_upd_freq=5, fisher_size=20,
                    nepochs=4, tol=0.0, verbose=False)
        opt.fit(X, y, valset=(Xv, yv, None), engine=engine)
        return opt

    p, f = run("protocol"), run("fused")
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------- #
# Fallbacks
# ---------------------------------------------------------------------- #
def _expect_fallback(rng, opt_kwargs=None, fit_kwargs=None, n_samples=200,
                     match="falling back"):
    X, y = _linreg(rng, n_samples=n_samples)
    obj, grad, _ = _lsq_funs()
    kw = dict(step_size=0.1, batches_per_epoch=10, nepochs=2, verbose=False)
    kw.update(opt_kwargs or {})
    opt = oLBFGS(np.zeros(X.shape[1]), grad, obj_fun=obj, **kw)
    ref = oLBFGS(np.zeros(X.shape[1]), grad, obj_fun=obj, **kw)
    with pytest.warns(UserWarning, match=match):
        opt.fit(X, y, engine="fused", **(fit_kwargs or {}))
    ref.fit(X, y, engine="protocol", **(fit_kwargs or {}))
    # the fallback IS the protocol loop: bitwise-equal trajectory
    np.testing.assert_array_equal(opt.x, ref.x)


def test_fallback_on_nontraceable_callable(rng):
    X, y = _linreg(rng)
    obj, grad, _ = _lsq_funs()

    def numpy_only_grad(w, Xb, yb, sample_weight=None, **kw):
        w = np.asarray(w)            # forces a concrete array: untraceable
        return Xb.T @ (Xb @ w - yb) / Xb.shape[0]

    opt = oLBFGS(np.zeros(X.shape[1]), numpy_only_grad, step_size=0.1,
                 batches_per_epoch=10, nepochs=2, verbose=False)
    ref = oLBFGS(np.zeros(X.shape[1]), grad, step_size=0.1,
                 batches_per_epoch=10, nepochs=2, verbose=False)
    with pytest.warns(UserWarning, match="not JAX-traceable"):
        opt.fit(X, y, engine="fused")
    ref.fit(X, y, engine="protocol")
    np.testing.assert_allclose(opt.x, ref.x, rtol=1e-12)


def test_fallback_on_ragged_rows(rng):
    _expect_fallback(rng, n_samples=205, match="not divisible")


def test_fallback_on_callback_iter(rng):
    _expect_fallback(rng, opt_kwargs=dict(callback_iter=lambda x: None),
                     match="callback_iter")


def test_fallback_on_native_backend(rng):
    _expect_fallback(rng, opt_kwargs=dict(backend="native", use_float=False),
                     match="native")


def test_fallback_on_mid_iteration_state(rng):
    """A SQN optimizer parked mid-iteration (awaiting hess_vec) cannot
    enter the fused epoch; fit falls back and still completes."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    opt = SQN(np.zeros(X.shape[1]), grad, obj_fun=obj,
              hess_vec_fun=hessvec, step_size=0.1, batches_per_epoch=10,
              bfgs_upd_freq=5, nepochs=2, verbose=False)
    # advance the raw protocol until it parks mid-iteration (the first
    # upd_freq boundary only archives averages; the second requests the
    # Hessian-vector product)
    for k in range(10):
        opt.optimizer.update_gradient(grad(opt.x, X[:20], y[:20]))
        opt.req = opt.optimizer.run_optimizer(opt.x, 0.1)
        if opt.req["task"] != "calc_grad":
            break
    assert opt.req["task"] == "calc_hess_vec"
    with pytest.warns(UserWarning, match="mid-iteration"):
        opt.fit(X, y, engine="fused")


def test_engine_arg_validated(rng):
    X, y = _linreg(rng)
    _, grad, _ = _lsq_funs()
    opt = oLBFGS(np.zeros(X.shape[1]), grad, step_size=0.1,
                 batches_per_epoch=10, nepochs=1, verbose=False)
    with pytest.raises(ValueError, match="engine"):
        opt.fit(X, y, engine="warp")


@pytest.mark.parametrize("kind", ["oLBFGS", "SQN-hv", "adaQN"])
def test_single_dispatch_matches_per_epoch_and_protocol(rng, kind):
    """Epoch-invariant schedules (shuffle off, constant step, no callback,
    no valset) collapse the whole fused fit into ONE device program
    (``FusedTrainer.jit_epochs``).  All three drivers — protocol,
    per-epoch fused (forced via a no-op callback), and single-dispatch
    fused — must produce the same trajectory."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    x0 = np.zeros(X.shape[1])

    def make(callback=None):
        common = dict(step_size=0.05, batches_per_epoch=10, nepochs=4,
                      shuffle_data=False, decr_step_size=None,
                      callback_epoch=callback, verbose=False)
        if kind == "oLBFGS":
            return oLBFGS(x0, grad, obj_fun=obj, **common)
        if kind == "SQN-hv":
            return SQN(x0, grad, obj_fun=obj, hess_vec_fun=hessvec,
                       bfgs_upd_freq=5, **common)
        return adaQN(x0, grad, obj_fun=obj, bfgs_upd_freq=5,
                     fisher_size=20, **common)

    p = make()
    p.fit(X, y, engine="protocol")

    f1 = make(callback=lambda x: None)        # forces the per-epoch loop
    f1.fit(X, y, engine="fused")
    assert f1._fused_single_dispatch is False

    f2 = make()
    f2.fit(X, y, engine="fused")
    assert f2._fused_single_dispatch is True

    np.testing.assert_allclose(f2.x, f1.x, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(f2.x, p.x, rtol=1e-8, atol=1e-10)
    assert f2.niter == f1.niter == p.niter == 40
    assert f2.req["task"] == "calc_grad"


def test_single_dispatch_misaligned_upd_freq(rng):
    """B %% upd_freq != 0 forces the generic (misaligned) epoch layout in
    the single-dispatch program; trajectory must still match the
    per-epoch fused driver."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    x0 = np.zeros(X.shape[1])

    def make(callback=None):
        return SQN(x0, grad, obj_fun=obj, hess_vec_fun=hessvec,
                   bfgs_upd_freq=4, step_size=0.05, batches_per_epoch=10,
                   nepochs=3, shuffle_data=False, decr_step_size=None,
                   callback_epoch=callback, verbose=False)

    f1 = make(callback=lambda x: None)
    f1.fit(X, y, engine="fused")
    f2 = make()
    f2.fit(X, y, engine="fused")
    assert f2._fused_single_dispatch is True
    np.testing.assert_allclose(f2.x, f1.x, rtol=1e-9, atol=1e-12)
    assert f2.niter == f1.niter == 30


@pytest.mark.parametrize("kind", list(_makers()))
def test_default_config_takes_scheduled_single_dispatch(rng, kind):
    """The DEFAULT guided config (shuffle on, 'auto'/None schedule, no
    callbacks, no valset) must run as one device program via the
    precomputed-schedule path — the makers' configs in
    ``test_fused_fit_matches_protocol`` already lock its trajectory
    against the protocol engine; this locks that the fast path is the
    one actually taken."""
    X, y = _linreg(rng)
    f = _makers()[kind](np.zeros(X.shape[1]))
    f.fit(X, y, engine="fused")
    assert f._fused_single_dispatch is True
    assert f._fused_dispatch_mode == "scheduled"


def test_scheduled_matches_per_epoch_shuffle_and_decay(rng):
    """Shuffle + sqrt decay: the scheduled single-dispatch program must
    reproduce the per-epoch fused driver (forced via a no-op callback)
    exactly — same composed row orders, same per-epoch step sizes."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    x0 = np.zeros(X.shape[1])

    def make(callback=None):
        return SQN(x0, grad, obj_fun=obj, hess_vec_fun=hessvec,
                   bfgs_upd_freq=5, step_size=0.05, batches_per_epoch=10,
                   nepochs=4, shuffle_data=True, decr_step_size="auto",
                   callback_epoch=callback, verbose=False)

    f1 = make(callback=lambda x: None)
    f1.fit(X, y, engine="fused")
    assert f1._fused_dispatch_mode == "loop"
    f2 = make()
    f2.fit(X, y, engine="fused")
    assert f2._fused_dispatch_mode == "scheduled"
    np.testing.assert_allclose(f2.x, f1.x, rtol=1e-9, atol=1e-12)
    assert f2.niter == f1.niter == 40


def test_decay_without_shuffle_uses_steps_array(rng):
    """shuffle_data=False + a decaying schedule takes the gather-free
    'decay' program (steps array riding the scan) and matches the
    per-epoch fused driver."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    x0 = np.zeros(X.shape[1])

    def make(callback=None):
        return SQN(x0, grad, obj_fun=obj, hess_vec_fun=hessvec,
                   bfgs_upd_freq=5, step_size=0.05, batches_per_epoch=10,
                   nepochs=4, shuffle_data=False, decr_step_size="auto",
                   callback_epoch=callback, verbose=False)

    f1 = make(callback=lambda x: None)
    f1.fit(X, y, engine="fused")
    assert f1._fused_dispatch_mode == "loop"
    f2 = make()
    f2.fit(X, y, engine="fused")
    assert f2._fused_dispatch_mode == "decay"
    np.testing.assert_allclose(f2.x, f1.x, rtol=1e-9, atol=1e-12)


def test_dispatch_mode_resets_on_protocol_fallback(rng):
    """A fused fit that falls back to the protocol loop (or a plain
    protocol fit) must not report a stale dispatch mode from an earlier
    fused fit."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()
    opt = SQN(np.zeros(X.shape[1]), grad, obj_fun=obj,
              hess_vec_fun=hessvec, bfgs_upd_freq=5, step_size=0.05,
              batches_per_epoch=10, nepochs=2, verbose=False)
    opt.fit(X, y, engine="fused")
    assert opt._fused_dispatch_mode == "scheduled"
    opt.fit(X, y, engine="protocol")
    assert opt._fused_dispatch_mode == "protocol"
    assert opt._fused_single_dispatch is False


# ===========================================================================
# mesh= : sharded guided fused fits (round 5)
# ===========================================================================
@pytest.mark.parametrize("shuffle", [True, False])
def test_fused_fit_on_mesh_matches_unsharded(rng, shuffle):
    """fit(engine='fused', mesh=...) on a (4 data x 2 param) mesh must
    match the unsharded fused fit (shuffle=True takes the scheduled
    whole-fit dispatch with the batch constraint; False the invariant
    jit_epochs path)."""
    import jax
    from stochqn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    X, y = _linreg(rng, n_samples=200, n_features=8)
    obj, grad, _ = _lsq_funs()
    x0 = np.zeros(X.shape[1])

    def make():
        return SQN(x0, grad, obj_fun=obj, use_grad_diff=True,
                   step_size=0.1, batches_per_epoch=10, bfgs_upd_freq=5,
                   nepochs=4, shuffle_data=shuffle, verbose=False)

    f_plain = make()
    f_plain.fit(X, y, engine="fused")
    mesh = make_mesh(n_data=4, n_param=2)
    f_mesh = make()
    f_mesh.fit(X, y, engine="fused", mesh=mesh)

    expect = ("scheduled",) if shuffle else ("invariant", "decay")
    assert f_mesh._fused_dispatch_mode in expect
    np.testing.assert_allclose(f_mesh.x, f_plain.x, rtol=1e-8, atol=1e-10)
    assert f_mesh.niter == f_plain.niter == 40


def test_fused_fit_on_mesh_loop_path_and_errors(rng):
    """The per-epoch loop path (callback_epoch forces host control) also
    accepts a mesh; mesh with the protocol engine raises; a param axis
    that does not divide n raises with a clear message."""
    import jax
    from stochqn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    X, y = _linreg(rng, n_samples=200, n_features=8)
    obj, grad, _ = _lsq_funs()
    x0 = np.zeros(X.shape[1])
    mesh = make_mesh(n_data=4, n_param=2)

    calls = []

    def make(**kw):
        return SQN(x0, grad, obj_fun=obj, use_grad_diff=True,
                   step_size=0.1, batches_per_epoch=10, bfgs_upd_freq=5,
                   nepochs=3, verbose=False, **kw)

    f_plain = make(callback_epoch=lambda x: None)
    f_plain.fit(X, y, engine="fused")
    f_mesh = make(callback_epoch=lambda x: calls.append(1))
    f_mesh.fit(X, y, engine="fused", mesh=mesh)
    assert len(calls) == 3
    np.testing.assert_allclose(f_mesh.x, f_plain.x, rtol=1e-8, atol=1e-10)

    with pytest.raises(ValueError, match="mesh.*requires engine='fused'"
                       if False else "requires engine='fused'"):
        make().fit(X, y, engine="protocol", mesh=mesh)

    mesh3 = make_mesh(n_data=2, n_param=4,
                      devices=jax.devices()[:8])
    x0_odd = np.zeros(7)   # 7 % 4 != 0

    def grad7(w, Xb, yb, sample_weight=None, **kw):
        return grad(w, Xb[:, :7], yb, sample_weight=sample_weight)

    f_bad = SQN(x0_odd, grad7, obj_fun=None, use_grad_diff=True,
                step_size=0.1, batches_per_epoch=10, bfgs_upd_freq=5,
                nepochs=2, verbose=False)
    with pytest.raises(ValueError, match="must divide the parameter"):
        f_bad.fit(X, y, engine="fused", mesh=mesh3)


@pytest.mark.parametrize("kind", ["oLBFGS", "adaQN"])
def test_fused_fit_on_mesh_other_optimizers(rng, kind):
    """Mesh-sharded guided fits for the per-iteration-commit (oLBFGS)
    and Fisher/guard (adaQN) engines too."""
    import jax
    from stochqn_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    X, y = _linreg(rng)
    make = _makers()[kind]
    x0 = np.zeros(X.shape[1])

    f_plain = make(x0)
    f_plain.fit(X, y, engine="fused")
    f_mesh = make(x0)
    f_mesh.fit(X, y, engine="fused", mesh=make_mesh(n_data=4, n_param=2))
    np.testing.assert_allclose(f_mesh.x, f_plain.x, rtol=1e-8, atol=1e-10)
    assert f_mesh.niter == f_plain.niter == 40


def test_fused_traces_user_hess_vec_fun(rng):
    """The fused engine must drive SQN's pair construction through the
    USER's ``hess_vec_fun`` (as the protocol loop and the reference do,
    ``src/stochqn.c:1105-1111``) — not through jvp of ``grad_fun`` — when
    the callable traces.  Detectable with a hess_vec_fun that is NOT the
    true Hessian (a scaled Gauss-Newton product): protocol and fused must
    then still agree, which only happens if both evaluate the same
    callable."""
    X, y = _linreg(rng)
    obj, grad, _ = _lsq_funs()

    def scaled_hessvec(w, v, Xb, yb, sample_weight=None, **kw):
        return 1.7 * (Xb.T @ (Xb @ v)) / Xb.shape[0]

    kw = dict(obj_fun=obj, hess_vec_fun=scaled_hessvec, step_size=0.1,
              batches_per_epoch=10, bfgs_upd_freq=5, nepochs=4,
              verbose=False)
    p = SQN(np.zeros(X.shape[1]), grad, **kw)
    p.fit(X, y, engine="protocol")
    f = SQN(np.zeros(X.shape[1]), grad, **kw)
    f.fit(X, y, engine="fused")
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)
    # and the scaling really alters the trajectory (the probe has teeth)
    _, _, hessvec = _lsq_funs()
    g = SQN(np.zeros(X.shape[1]), grad,
            **{**kw, "hess_vec_fun": hessvec})
    g.fit(X, y, engine="fused")
    assert not np.allclose(g.x, f.x, rtol=1e-8, atol=1e-10)


def test_nontraceable_hess_vec_fun_falls_back_to_jvp(rng):
    """A numpy-only ``hess_vec_fun`` must not break the fused engine: the
    engine silently substitutes jvp-of-grad (the protocol loop still gets
    the user callable) and the fit completes as a fused dispatch with the
    exact jvp trajectory."""
    X, y = _linreg(rng)
    obj, grad, hessvec = _lsq_funs()

    def numpy_only_hessvec(w, v, Xb, yb, sample_weight=None, **kw):
        v = np.asarray(v)            # forces a concrete array: untraceable
        return Xb.T @ (Xb @ v) / Xb.shape[0]

    kw = dict(obj_fun=obj, step_size=0.1, batches_per_epoch=10,
              bfgs_upd_freq=5, nepochs=4, verbose=False)
    f = SQN(np.zeros(X.shape[1]), grad, hess_vec_fun=numpy_only_hessvec,
            **kw)
    f.fit(X, y, engine="fused")          # must not raise or warn
    assert f._fused_single_dispatch      # stayed on the fused engine
    # for least squares jvp-of-grad == the user's X^T X v / B product, so
    # the jvp-fallback trajectory matches the protocol run (which always
    # calls the numpy callable) to float order
    p = SQN(np.zeros(X.shape[1]), grad, hess_vec_fun=numpy_only_hessvec,
            **kw)
    p.fit(X, y, engine="protocol")
    np.testing.assert_allclose(f.x, p.x, rtol=1e-8, atol=1e-10)
