"""Fused on-device engine vs the free-mode protocol: same trajectories.

The fused engine must track the protocol state machines when fed the same
batch sequence (big batches = cyclic window of the last upd_freq
minibatches, which the driver here replicates for the protocol side).
Bitwise equality is not expected — the two paths compile to different XLA
programs with different fusion/reduction orders — so tolerances allow for
float-noise amplification over a couple of epochs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stochqn_tpu.core.config import AdaQNConfig, OLBFGSConfig, SQNConfig
from stochqn_tpu.free import SQN_free, adaQN_free, oLBFGS_free
from stochqn_tpu.fused import FusedTrainer, batchify

RTOL, ATOL = 1e-6, 1e-9
NEPOCHS = 2


def _quad_problem(rng, n):
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T
    return jnp.asarray(a)


def _make_funs(a):
    def grad_fn(x, batch):
        # batch: centers [bs, n]; empirical gradient = A (x - mean(c))
        return a @ (x - jnp.mean(batch, axis=0))

    def obj_fn(x, batch):
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * r @ a @ r
    return grad_fn, obj_fn


def _protocol_run(opt, grad_fn, obj_fn, centers, upd_freq, target_iters,
                  step_size):
    """Drive the free-mode API with the fused engine's batch semantics,
    evaluating requests with the same JAX functions the fused engine uses.
    Runs until exactly ``target_iters`` optimizer iterations completed."""
    n = centers.shape[-1]
    x = np.zeros(n)
    num_batches = centers.shape[0]
    w = min(upd_freq, num_batches)
    req = opt.run_optimizer(x, step_size)
    b = -1
    while True:
        task = req["task"]
        if task == "calc_grad" and opt.niter >= target_iters:
            break
        if task in ("calc_grad", "calc_grad_same_batch"):
            if task == "calc_grad":
                b += 1
            batch = jnp.asarray(centers[b % num_batches])
            opt.update_gradient(
                grad_fn(jnp.asarray(req["requested_on"]), batch))
        else:
            i = b % num_batches
            idx = (i + 1 - w + np.arange(w)) % num_batches
            big = jnp.asarray(centers[idx].reshape(-1, n))
            if task == "calc_grad_big_batch":
                opt.update_gradient(
                    grad_fn(jnp.asarray(req["requested_on"]), big))
            elif task == "calc_hess_vec":
                xr, vr = req["requested_on"]
                hv = jax.jvp(lambda xx: grad_fn(xx, big),
                             (jnp.asarray(xr),), (jnp.asarray(vr),))[1]
                opt.update_hess_vec(hv)
            elif task == "calc_fun_val_batch":
                opt.update_function(
                    obj_fn(jnp.asarray(req["requested_on"]), big))
        req = opt.run_optimizer(x, step_size)
    return x


def _fused_run(trainer, centers_batched, nepochs, step_size):
    state = trainer.init(jnp.zeros(centers_batched.shape[-1]))
    epoch_fn = jax.jit(trainer.epoch)
    for _ in range(nepochs):
        state, _ = epoch_fn(state, centers_batched, step_size)
    return np.asarray(state.x)


@pytest.mark.parametrize("bs", [1, 3])
def test_fused_olbfgs_matches_protocol(rng, bs):
    n, B = 10, 12
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, obj_fn = _make_funs(a)

    trainer = FusedTrainer("oLBFGS", OLBFGSConfig.create(mem_size=4),
                           grad_fn)
    x_fused = _fused_run(trainer, jnp.asarray(centers), NEPOCHS, 0.05)

    opt = oLBFGS_free(mem_size=4)
    # protocol: each oLBFGS iteration = 2 calls (grad + same-batch grad)
    x_proto = _protocol_run(opt, grad_fn, obj_fn, centers, 1,
                            target_iters=NEPOCHS * B, step_size=0.05)
    np.testing.assert_allclose(x_fused, x_proto, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("use_grad_diff", [False, True])
def test_fused_sqn_matches_protocol(rng, use_grad_diff):
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, obj_fn = _make_funs(a)

    cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L,
                           use_grad_diff=use_grad_diff)
    trainer = FusedTrainer("SQN", cfg, grad_fn)
    x_fused = _fused_run(trainer, jnp.asarray(centers), NEPOCHS, 0.05)

    opt = SQN_free(mem_size=3, bfgs_upd_freq=L, use_grad_diff=use_grad_diff)
    x_proto = _protocol_run(opt, grad_fn, obj_fn, centers, L,
                            target_iters=NEPOCHS * B, step_size=0.05)
    np.testing.assert_allclose(x_fused, x_proto, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("use_grad_diff,max_incr", [
    (False, 1.01), (False, None), (True, 1.01),
])
def test_fused_adaqn_matches_protocol(rng, use_grad_diff, max_incr):
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, obj_fn = _make_funs(a)

    cfg = AdaQNConfig.create(
        mem_size=3, fisher_size=10, bfgs_upd_freq=L, max_incr=max_incr,
        use_grad_diff=use_grad_diff)
    trainer = FusedTrainer("adaQN", cfg, grad_fn, obj_fn=obj_fn)
    x_fused = _fused_run(trainer, jnp.asarray(centers), NEPOCHS, 0.05)

    opt = adaQN_free(mem_size=3, fisher_size=10, bfgs_upd_freq=L,
                     max_incr=max_incr, use_grad_diff=use_grad_diff)
    x_proto = _protocol_run(opt, grad_fn, obj_fn, centers, L,
                            target_iters=NEPOCHS * B, step_size=0.05)
    np.testing.assert_allclose(x_fused, x_proto, rtol=RTOL, atol=ATOL)


FUZZ_SWEEP = [
    # (kind, config kwargs) — knobs not covered by the tests above:
    # scalar H0, y_reg, min_curvature, RMSProp weight, scal_reg, mem_size=1
    ("oLBFGS", dict(mem_size=4, hess_init=0.5)),
    ("oLBFGS", dict(mem_size=4, y_reg=1e-2, min_curvature=1e-4)),
    ("oLBFGS", dict(mem_size=1)),
    ("SQN", dict(mem_size=3, bfgs_upd_freq=4, use_grad_diff=True,
                 y_reg=1e-2)),
    ("SQN", dict(mem_size=3, bfgs_upd_freq=4, min_curvature=1e-3)),
    ("SQN", dict(mem_size=1, bfgs_upd_freq=2)),
    ("adaQN", dict(mem_size=3, fisher_size=10, bfgs_upd_freq=4,
                   max_incr=1.01, rmsprop_weight=0.9)),
    ("adaQN", dict(mem_size=3, fisher_size=10, bfgs_upd_freq=4,
                   max_incr=None, use_grad_diff=True, y_reg=1e-2)),
    ("adaQN", dict(mem_size=2, fisher_size=4, bfgs_upd_freq=4,
                   max_incr=1.01, scal_reg=1e-2)),
]

_CFG_CLS = {"oLBFGS": OLBFGSConfig, "SQN": SQNConfig, "adaQN": AdaQNConfig}
_FREE_CLS = {"oLBFGS": oLBFGS_free, "SQN": SQN_free, "adaQN": adaQN_free}


@pytest.mark.parametrize("kind,kw", FUZZ_SWEEP, ids=lambda v: None)
def test_fused_config_sweep_matches_protocol(rng, kind, kw):
    """Config sweep over the knobs the targeted tests above leave at
    defaults — the fused engine must track the protocol tier on all of
    them (the native-tier sweep caught a real y_reg bug this way)."""
    n, B, bs = 8, 12, 2
    L = kw.get("bfgs_upd_freq", 1)
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, obj_fn = _make_funs(a)

    cfg = _CFG_CLS[kind].create(**kw)
    trainer = FusedTrainer(kind, cfg, grad_fn,
                           **({"obj_fn": obj_fn} if kind == "adaQN" else {}))
    x_fused = _fused_run(trainer, jnp.asarray(centers), NEPOCHS, 0.05)

    opt = _FREE_CLS[kind](**kw)
    x_proto = _protocol_run(opt, grad_fn, obj_fn, centers, L,
                            target_iters=NEPOCHS * B, step_size=0.05)
    np.testing.assert_allclose(x_fused, x_proto, rtol=RTOL, atol=ATOL)


def test_fused_adaqn_requires_obj_fn_at_construction(rng):
    """adaQN with the max_incr guard but no obj_fn must fail loudly at
    FusedTrainer construction — not with an opaque TypeError deep inside
    whichever of the three epoch layouts runs first."""
    grad_fn = lambda x, b: x
    with pytest.raises(ValueError, match="objective function"):
        FusedTrainer("adaQN", AdaQNConfig.create(max_incr=1.01), grad_fn)
    # disabling the guard makes obj_fn genuinely optional
    FusedTrainer("adaQN", AdaQNConfig.create(max_incr=None), grad_fn)


def test_fused_adaqn_func_increase_matches_protocol(rng):
    """An objective that spikes once training crosses a threshold triggers
    adaQN's func_increased revert identically in fused and protocol modes."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n)) * 0.1
    grad_fn, obj_base = _make_funs(a)

    # calibrate: find the guard-eval f values of an unspiked run, then set
    # the spike threshold between the 1st and 2nd boundary evaluations so
    # the rejection fires exactly once training crosses it
    cal = FusedTrainer("adaQN",
                       AdaQNConfig.create(mem_size=3, fisher_size=10,
                                          bfgs_upd_freq=L, max_incr=1e6),
                       grad_fn, obj_fn=obj_base)
    st_cal = cal.init(jnp.zeros(n) + 2.0)
    fvals = []
    ep_cal = jax.jit(cal.epoch)
    for _ in range(2):
        st_cal, _ = ep_cal(st_cal, jnp.asarray(centers), 0.1)
        fvals.append(float(st_cal.f_prev))
    assert fvals[1] < fvals[0], "calibration run did not descend"
    thresh = 0.5 * (fvals[0] + fvals[1])

    def obj_fn(x, batch):
        base = obj_base(x, batch)
        # once the loss drops below the threshold, report a huge value
        return jnp.where(base < thresh, 1e30, base)

    cfg = AdaQNConfig.create(mem_size=3, fisher_size=10, bfgs_upd_freq=L,
                             max_incr=1.01)
    trainer = FusedTrainer("adaQN", cfg, grad_fn, obj_fn=obj_fn)
    state = trainer.init(jnp.zeros(n) + 2.0)
    epoch_fn = jax.jit(trainer.epoch)
    nep = 2 * NEPOCHS
    infos = []
    for _ in range(nep):
        state, info = epoch_fn(state, jnp.asarray(centers), 0.1)
        infos.append(np.asarray(info))
    x_fused = np.asarray(state.x)
    assert (np.concatenate(infos) == 201).any(), "no func_increased seen"

    opt = adaQN_free(mem_size=3, fisher_size=10, bfgs_upd_freq=L,
                     max_incr=1.01)
    x = np.zeros(n) + 2.0
    req = opt.run_optimizer(x, 0.1)
    b = -1
    w = min(L, B)
    while True:
        task = req["task"]
        if task == "calc_grad" and opt.niter >= nep * B:
            break
        if task == "calc_grad":
            b += 1
            batch = jnp.asarray(centers[b % B])
            opt.update_gradient(grad_fn(jnp.asarray(req["requested_on"]),
                                        batch))
        elif task == "calc_fun_val_batch":
            i = b % B
            idx = (i + 1 - w + np.arange(w)) % B
            big = jnp.asarray(centers[idx].reshape(-1, n))
            opt.update_function(obj_fn(jnp.asarray(req["requested_on"]),
                                       big))
        req = opt.run_optimizer(x, 0.1)
    np.testing.assert_allclose(x_fused, x, rtol=1e-6, atol=1e-9)


def test_fused_scan_counts_iterations(rng):
    n, B, bs = 6, 8, 2
    a = _quad_problem(rng, n)
    grad_fn, _ = _make_funs(a)
    trainer = FusedTrainer("oLBFGS", OLBFGSConfig.create(), grad_fn)
    data = jnp.asarray(rng.standard_normal((B, bs, n)))
    state = trainer.init(jnp.zeros(n))
    state, infos = jax.jit(trainer.epoch)(state, data, 0.05)
    assert int(state.niter) == B
    assert infos.shape == (B,)


@pytest.mark.parametrize("kind", ["oLBFGS", "SQN", "adaQN"])
def test_unroll_is_trajectory_identical(rng, kind):
    """``FusedTrainer(unroll=k)`` is a pure scheduling knob: the unrolled
    scan must produce the same trajectory (identical program semantics,
    only loop bookkeeping amortized)."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    grad_fn, obj_fn = _make_funs(a)
    if kind == "oLBFGS":
        cfg = OLBFGSConfig.create(mem_size=3)
    elif kind == "SQN":
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    else:
        cfg = AdaQNConfig.create(mem_size=3, bfgs_upd_freq=L, max_incr=1.01)
    obj = obj_fn if kind == "adaQN" else None
    base = _fused_run(FusedTrainer(kind, cfg, grad_fn, obj_fn=obj),
                      centers, NEPOCHS, 0.05)
    unrolled = _fused_run(
        FusedTrainer(kind, cfg, grad_fn, obj_fn=obj, unroll=2),
        centers, NEPOCHS, 0.05)
    np.testing.assert_allclose(unrolled, base, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("kind", ["oLBFGS", "SQN", "adaQN"])
@pytest.mark.parametrize("donate", [False, True])
def test_jit_epochs_matches_epoch_loop(rng, kind, donate):
    """``FusedTrainer.jit_epochs`` (N epochs in one device program) must
    produce the same trajectory and infos as N sequential ``jit_epoch``
    dispatches — it exists purely to amortize per-dispatch cost."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    grad_fn, obj_fn = _make_funs(a)
    if kind == "oLBFGS":
        cfg = OLBFGSConfig.create(mem_size=3)
    elif kind == "SQN":
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    else:
        cfg = AdaQNConfig.create(mem_size=3, bfgs_upd_freq=L, max_incr=1.01)
    obj = obj_fn if kind == "adaQN" else None

    loop = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj)
    st_l = loop.init(jnp.zeros(n))
    st_l, infos_l = loop.run_epochs(st_l, centers, 3, 0.05)

    one = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj, donate=donate)
    st_o = one.init(jnp.zeros(n))
    st_o, infos_o = one.jit_epochs()(st_o, centers, jnp.float32(0.05),
                                     nepochs=3, aligned=True)

    np.testing.assert_allclose(np.asarray(st_o.x), np.asarray(st_l.x),
                               rtol=1e-6, atol=1e-9)
    assert infos_o.shape == infos_l.shape == (3, B)
    np.testing.assert_array_equal(np.asarray(infos_o),
                                  np.asarray(infos_l))
    assert int(st_o.niter) == int(st_l.niter)


@pytest.mark.parametrize("kind", ["oLBFGS", "SQN", "adaQN"])
def test_donated_epoch_trajectory_identical(rng, kind):
    """``FusedTrainer.jit_epoch`` donates the state carry (opt-in) so XLA
    reuses the pair-memory buffers in place.  Donation is a pure memory
    optimization: the trajectory must be bitwise identical to the
    undonated dispatch, and the donated-in state must actually be consumed
    (its buffers invalidated) — which also proves the state holds no
    buffer aliased by anything the caller still needs."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    grad_fn, obj_fn = _make_funs(a)
    if kind == "oLBFGS":
        cfg = OLBFGSConfig.create(mem_size=3)
    elif kind == "SQN":
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    else:
        cfg = AdaQNConfig.create(mem_size=3, bfgs_upd_freq=L, max_incr=1.01)
    obj = obj_fn if kind == "adaQN" else None

    plain = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj, donate=False)
    st_p = plain.init(jnp.zeros(n))
    st_p, infos_p = plain.run_epochs(st_p, centers, NEPOCHS, 0.05)

    don = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj, donate=True)
    st0 = don.init(jnp.zeros(n))
    st_d, infos_d = don.run_epochs(st0, centers, NEPOCHS, 0.05)

    np.testing.assert_array_equal(np.asarray(st_d.x), np.asarray(st_p.x))
    np.testing.assert_array_equal(np.asarray(st_d.mem.s),
                                  np.asarray(st_p.mem.s))
    np.testing.assert_array_equal(np.asarray(infos_d), np.asarray(infos_p))
    # the donated-in state was consumed by the first epoch dispatch
    assert st0.x.is_deleted()


def test_default_run_epochs_nonconsuming(rng):
    """By default (``donate=False``) ``run_epochs`` must NOT consume the
    passed-in state: callers that diff against the pre-epoch iterate or
    re-run from the same state keep working (advisor r3).  Donation is the
    opt-in capacity path tested above."""
    n, B, bs = 6, 4, 2
    grad_fn, _ = _make_funs(_quad_problem(rng, n))
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    trainer = FusedTrainer("SQN", SQNConfig.create(mem_size=2,
                                                   bfgs_upd_freq=2), grad_fn)
    st0 = trainer.init(jnp.zeros(n))
    st1, _ = trainer.run_epochs(st0, centers, 1, 0.05)
    # pre-epoch state is still readable...
    assert not st0.x.is_deleted()
    delta = float(jnp.linalg.norm(st1.x - st0.x))
    assert np.isfinite(delta) and delta > 0
    # ...and re-running from it reproduces the same trajectory
    st1b, _ = trainer.run_epochs(st0, centers, 1, 0.05)
    np.testing.assert_array_equal(np.asarray(st1b.x), np.asarray(st1.x))


def test_init_copies_x0(rng):
    """``trainer.init`` must own its buffers: the caller's ``x0`` array
    stays readable after donated epochs, and repeated ``init(x0)`` works."""
    n, B, bs = 6, 4, 2
    grad_fn, _ = _make_funs(_quad_problem(rng, n))
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    trainer = FusedTrainer("SQN", SQNConfig.create(mem_size=2,
                                                   bfgs_upd_freq=2), grad_fn,
                           donate=True)
    x0 = jnp.asarray(rng.standard_normal(n))
    st = trainer.init(x0)
    st, _ = trainer.run_epochs(st, centers, 1, 0.05)
    assert np.all(np.isfinite(np.asarray(x0)))       # not invalidated
    st2 = trainer.init(x0)                           # reusable
    st2, _ = trainer.run_epochs(st2, centers, 1, 0.05)
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))


@pytest.mark.parametrize("kw", [
    dict(mem_size=4, min_curvature=1e-4, y_reg=1e-3),
    dict(mem_size=1, hess_init=0.5),
    dict(mem_size=4, min_curvature=0.5),   # forces curvature rejections
])
def test_olbfgs_paired_matches_sequential(rng, kw):
    """The paired-gradient pipelined oLBFGS epoch is a pure scheduling
    transformation: identical trajectory, memory contents, and info codes
    as the sequential two-gradient step."""
    n, B, bs = 10, 12, 3
    a = _quad_problem(rng, n)
    centers = jnp.asarray(rng.standard_normal((B, bs, n)))
    grad_fn, _ = _make_funs(a)
    cfg = OLBFGSConfig.create(**kw)

    runs = {}
    for paired in (True, False):
        trainer = FusedTrainer("oLBFGS", cfg, grad_fn, paired_grads=paired)
        state = trainer.init(jnp.zeros(n))
        epoch_fn = jax.jit(trainer.epoch)
        infos = []
        for _ in range(NEPOCHS):
            state, info = epoch_fn(state, centers, 0.05)
            infos.append(np.asarray(info))
        runs[paired] = (state, np.concatenate(infos))

    sp, ip = runs[True]
    ss, is_ = runs[False]
    np.testing.assert_allclose(sp.x, ss.x, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(sp.grad_prev, ss.grad_prev, rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(sp.mem.s, ss.mem.s, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(sp.mem.y, ss.mem.y, rtol=RTOL, atol=ATOL)
    assert int(sp.mem.head) == int(ss.mem.head)
    assert int(sp.mem.count) == int(ss.mem.count)
    assert int(sp.niter) == int(ss.niter)
    np.testing.assert_array_equal(ip, is_)


def test_batchify_drops_tail(rng):
    data = {"x": jnp.zeros((10, 3)), "y": jnp.zeros((10,))}
    out = batchify(data, 4)
    assert out["x"].shape == (2, 4, 3)
    assert out["y"].shape == (2, 4)


def test_fused_sqn_pairs_bf16_converges(rng):
    """bf16 pair storage (f32 math) still converges close to the f32 run."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n).astype(jnp.float32)
    centers = rng.standard_normal((B, bs, n)) * 0.1
    grad_fn, obj_fn = _make_funs(a)

    outs = {}
    for bf16 in (False, True):
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L,
                               pairs_bf16=bf16)
        trainer = FusedTrainer("SQN", cfg, grad_fn)
        state = trainer.init(jnp.ones(n, jnp.float32))
        ep = jax.jit(trainer.epoch)
        for _ in range(4):
            state, _ = ep(state, jnp.asarray(centers, jnp.float32), 0.1)
        outs[bf16] = np.asarray(state.x, np.float64)
        if bf16:
            assert state.mem.s.dtype == jnp.bfloat16
    flat = jnp.asarray(centers.reshape(-1, n), jnp.float32)
    l32 = float(obj_fn(jnp.asarray(outs[False], jnp.float32), flat))
    lbf = float(obj_fn(jnp.asarray(outs[True], jnp.float32), flat))
    # both should be near the optimum; bf16 within 10% extra loss
    assert lbf < max(1.1 * l32, l32 + 1e-3), (l32, lbf)


def test_fused_adaqn_fisher_bf16(rng):
    """bf16 Fisher storage (f32 products) trains close to the f32 run."""
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n).astype(jnp.float32)
    centers = rng.standard_normal((B, bs, n)) * 0.1
    grad_fn, obj_fn = _make_funs(a)
    outs = {}
    for fb in (False, True):
        cfg = AdaQNConfig.create(mem_size=3, fisher_size=10, bfgs_upd_freq=L,
                                 max_incr=1.01, fisher_bf16=fb)
        tr = FusedTrainer("adaQN", cfg, grad_fn, obj_fn=obj_fn)
        st = tr.init(jnp.ones(n, jnp.float32))
        ep = jax.jit(tr.epoch)
        for _ in range(4):
            st, _ = ep(st, jnp.asarray(centers, jnp.float32), 0.1)
        if fb:
            assert st.fisher.f.dtype == jnp.bfloat16
        outs[fb] = np.asarray(st.x, np.float64)
    flat = jnp.asarray(centers.reshape(-1, n), jnp.float32)
    l32 = float(obj_fn(jnp.asarray(outs[False], jnp.float32), flat))
    lbf = float(obj_fn(jnp.asarray(outs[True], jnp.float32), flat))
    assert lbf < max(1.15 * l32, l32 + 1e-3), (l32, lbf)


class TestMisalignedResume:
    """The chunked-epoch alignment contract (``fused.py`` module docstring):
    a state resumed mid-round (``niter % upd_freq != 0``) must never be run
    through the round-chunked layout — boundaries would land at the wrong
    iterations silently.  Both the jitted auto dispatch and ``run_epochs``
    must route such states through the generic path and produce trajectories
    identical to the forced-generic reference."""

    def _setup(self, rng, L=4, B=8, bs=2, n=6):
        a = _quad_problem(rng, n).astype(jnp.float32)
        centers = jnp.asarray(rng.standard_normal((B, bs, n)), jnp.float32)
        grad_fn, obj_fn = _make_funs(a)
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
        trainer = FusedTrainer("SQN", cfg, grad_fn)
        return trainer, centers, L

    def _misaligned_state(self, trainer, centers, L):
        # run 2 batches (< L) through the generic path -> niter = 2
        state = trainer.init(jnp.zeros(centers.shape[-1], jnp.float32))
        state, _ = trainer.epoch(state, jax.tree_util.tree_map(
            lambda c: c[:2], centers), 0.05)
        assert int(state.niter) % L != 0
        return state

    def test_jitted_auto_dispatch_is_protocol_correct(self, rng):
        trainer, centers, L = self._setup(rng)
        state0 = self._misaligned_state(trainer, centers, L)

        # reference: forced generic layout (correct for any niter)
        st_gen, info_gen = trainer.epoch(state0, centers, 0.05,
                                         aligned=False)
        # jitted auto dispatch with a traced niter must match exactly
        st_auto, info_auto = jax.jit(trainer.epoch)(state0, centers, 0.05)
        np.testing.assert_array_equal(np.asarray(info_auto),
                                      np.asarray(info_gen))
        np.testing.assert_allclose(np.asarray(st_auto.x),
                                   np.asarray(st_gen.x), rtol=1e-6)
        assert int(st_auto.mem.count) == int(st_gen.mem.count)
        assert int(st_auto.niter) == int(st_gen.niter)

        # ...and must differ from what the (invalid-here) chunked layout
        # would have produced, proving the dispatch actually matters.
        st_chk, _ = trainer.epoch(state0, centers, 0.05, aligned=True)
        assert not np.allclose(np.asarray(st_chk.x), np.asarray(st_gen.x),
                               rtol=1e-6)

    def test_run_epochs_resumes_misaligned_state(self, rng):
        trainer, centers, L = self._setup(rng)
        state0 = self._misaligned_state(trainer, centers, L)

        st_gen, info_gen = trainer.epoch(state0, centers, 0.05,
                                         aligned=False)
        st_re, infos = trainer.run_epochs(state0, centers, 1, 0.05)
        np.testing.assert_array_equal(np.asarray(infos[0]),
                                      np.asarray(info_gen))
        np.testing.assert_allclose(np.asarray(st_re.x),
                                   np.asarray(st_gen.x), rtol=1e-6)

    def test_aligned_fresh_state_still_chunked(self, rng):
        """Sanity: fresh aligned states keep producing the chunked-layout
        trajectory through the auto dispatch (no behavior change)."""
        trainer, centers, L = self._setup(rng)
        state = trainer.init(jnp.zeros(centers.shape[-1], jnp.float32))
        st_a, info_a = jax.jit(trainer.epoch)(state, centers, 0.05)
        st_c, info_c = trainer.epoch(state, centers, 0.05, aligned=True)
        np.testing.assert_array_equal(np.asarray(info_a),
                                      np.asarray(info_c))
        np.testing.assert_allclose(np.asarray(st_a.x), np.asarray(st_c.x),
                                   rtol=1e-6)


@pytest.mark.parametrize("kind", ["oLBFGS", "SQN", "adaQN"])
def test_jit_epochs_scheduled_matches_manual_gather(rng, kind):
    """``jit_epochs_scheduled`` (precomputed row orders + step sizes in
    one program) must equal a host loop that gathers the same rows and
    dispatches ``jit_epoch`` with the same per-epoch step."""
    n, B, bs, L, E = 8, 12, 2, 4, 3
    a = _quad_problem(rng, n)
    rows = jnp.asarray(rng.standard_normal((B * bs, n)))
    grad_fn, obj_fn = _make_funs(a)
    if kind == "oLBFGS":
        cfg = OLBFGSConfig.create(mem_size=3)
    elif kind == "SQN":
        cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    else:
        cfg = AdaQNConfig.create(mem_size=3, bfgs_upd_freq=L, max_incr=1.01)
    obj = obj_fn if kind == "adaQN" else None

    orders = np.stack([np.random.RandomState(7 + e).permutation(B * bs)
                       for e in range(E)]).astype(np.int32)
    steps = np.asarray([0.05 / np.sqrt(e + 1) for e in range(E)])

    ref = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj)
    st_r = ref.init(jnp.zeros(n))
    ep = ref.jit_epoch()
    infos_r = []
    for e in range(E):
        d = rows[orders[e]].reshape(B, bs, n)
        st_r, info = ep(st_r, d, jnp.asarray(steps[e], jnp.float32),
                        aligned=True)
        infos_r.append(np.asarray(info))

    sched = FusedTrainer(kind, cfg, grad_fn, obj_fn=obj)
    st_s = sched.init(jnp.zeros(n))
    st_s, infos_s = sched.jit_epochs_scheduled()(
        st_s, rows, jnp.asarray(steps, jnp.float32),
        jnp.asarray(orders), batch_size=bs, aligned=True)

    np.testing.assert_allclose(np.asarray(st_s.x), np.asarray(st_r.x),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(infos_s), np.stack(infos_r))
    assert int(st_s.niter) == int(st_r.niter) == E * B


def test_unrolled_rounds_trajectory_identical(rng):
    """The unrolled-rounds chunked epoch (the auto default at <= 8
    rounds, taken for the ring-buffer in-place commit win — see the
    FusedTrainer.unroll_rounds field) must be bit-compatible with the
    round-scan layout for every optimizer."""
    import dataclasses
    from stochqn_tpu.core.config import (AdaQNConfig, OLBFGSConfig,
                                         SQNConfig)

    n, B, bs, L = 12, 8, 4, 4
    a = jnp.asarray(rng.uniform(0.5, 2.0, n))

    def grad_fn(x, batch):
        return a * (x - jnp.mean(batch, axis=0))

    def obj_fn(x, batch):
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * jnp.vdot(r, a * r)

    data = jnp.asarray(rng.standard_normal((B, bs, n)))
    for optimizer, cfg, kw in [
        ("SQN", SQNConfig.create(mem_size=3, bfgs_upd_freq=L), {}),
        ("adaQN", AdaQNConfig.create(mem_size=3, bfgs_upd_freq=L,
                                     fisher_size=4, max_incr=1.01),
         {"obj_fn": obj_fn}),
    ]:
        tr_scan = FusedTrainer(optimizer, cfg, grad_fn,
                               unroll_rounds=False, **kw)
        tr_unroll = dataclasses.replace(tr_scan, unroll_rounds=True)
        st_s, info_s = jax.jit(tr_scan.epoch)(
            tr_scan.init(jnp.zeros(n)), data, 0.05)
        st_u, info_u = jax.jit(tr_unroll.epoch)(
            tr_unroll.init(jnp.zeros(n)), data, 0.05)
        np.testing.assert_allclose(np.asarray(st_u.x), np.asarray(st_s.x),
                                   rtol=1e-12, atol=1e-14,
                                   err_msg=optimizer)
        assert np.array_equal(np.asarray(info_u), np.asarray(info_s))
        assert int(st_u.niter) == int(st_s.niter) == B


@pytest.mark.parametrize("B", [12, 10])   # 10: non-divisible -> generic path
def test_fused_sqn_hess_vec_fn_matches_jvp(rng, B):
    """``FusedTrainer(hess_vec_fn=...)`` — the fused analogue of the
    reference's user ``hess_vec_fun`` callback (``src/stochqn.c:1105``) —
    must reproduce the default jvp trajectory when the callable computes
    the same Hessian-vector product.  For a quadratic both are exactly
    ``A @ v``, so the trajectories agree to float-order noise; covered on
    both the round-chunked (B=12) and generic lax.cond (B=10) layouts."""
    import dataclasses
    n, bs, L = 8, 2, 4
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, obj_fn = _make_funs(a)

    def hess_vec_fn(x, v, big):
        return a @ v

    cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    tr_jvp = FusedTrainer("SQN", cfg, grad_fn)
    tr_hv = dataclasses.replace(tr_jvp, hess_vec_fn=hess_vec_fn)
    x_jvp = _fused_run(tr_jvp, jnp.asarray(centers), NEPOCHS, 0.05)
    x_hv = _fused_run(tr_hv, jnp.asarray(centers), NEPOCHS, 0.05)
    np.testing.assert_allclose(x_hv, x_jvp, rtol=1e-6, atol=1e-9)


def test_fused_sqn_hess_vec_fn_is_used(rng):
    """The supplied ``hess_vec_fn`` is really what builds the y vectors:
    a deliberately WRONG callable must change the trajectory."""
    import dataclasses
    n, B, bs, L = 8, 12, 2, 4
    a = _quad_problem(rng, n)
    centers = rng.standard_normal((B, bs, n))
    grad_fn, _ = _make_funs(a)

    cfg = SQNConfig.create(mem_size=3, bfgs_upd_freq=L)
    tr_jvp = FusedTrainer("SQN", cfg, grad_fn)
    tr_wrong = dataclasses.replace(
        tr_jvp, hess_vec_fn=lambda x, v, big: 2.0 * (a @ v))
    x_jvp = _fused_run(tr_jvp, jnp.asarray(centers), NEPOCHS, 0.05)
    x_wrong = _fused_run(tr_wrong, jnp.asarray(centers), NEPOCHS, 0.05)
    assert not np.allclose(x_wrong, x_jvp, rtol=1e-6, atol=1e-9)
