"""Streaming ingestion: stream_rounds == fused epoch == protocol."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from stochqn_tpu.core.config import AdaQNConfig, OLBFGSConfig, SQNConfig
from stochqn_tpu.fused import FusedTrainer
from stochqn_tpu.utils.data import prefetch_to_device, rounds_of, stream_rounds


def _quad(rng, n):
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    return jnp.asarray(q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T)


def test_prefetch_preserves_order(rng):
    batches = [{"a": np.full((2,), i)} for i in range(7)]
    out = list(prefetch_to_device(batches, size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["a"]), [i, i])


def test_rounds_of_drops_tail(rng):
    batches = [np.full((2,), i) for i in range(10)]
    rounds = list(rounds_of(batches, 4))
    assert len(rounds) == 2
    assert rounds[0].shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(rounds[1][:, 0]), [4, 5, 6, 7])


def test_stream_matches_epoch_sqn(rng):
    n, B, bs, L = 8, 12, 2, 4
    a = _quad(rng, n)
    centers = rng.standard_normal((B, bs, n))

    def grad_fn(x, batch):
        return a @ (x - jnp.mean(batch, axis=0))

    trainer = FusedTrainer("SQN", SQNConfig.create(mem_size=3,
                                                   bfgs_upd_freq=L), grad_fn)
    st_epoch = trainer.init(jnp.zeros(n))
    st_epoch, infos_e = jax.jit(trainer.epoch)(
        st_epoch, jnp.asarray(centers), 0.05)

    st_stream = trainer.init(jnp.zeros(n))
    st_stream, infos_s = stream_rounds(
        trainer, st_stream, (jnp.asarray(centers[i]) for i in range(B)),
        0.05)
    np.testing.assert_allclose(np.asarray(st_stream.x),
                               np.asarray(st_epoch.x), rtol=1e-7, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(infos_s), np.asarray(infos_e))
    assert int(st_stream.niter) == B


def test_stream_olbfgs_and_adaqn(rng):
    n, B, bs = 6, 8, 2
    a = _quad(rng, n)
    centers = rng.standard_normal((B, bs, n))

    def grad_fn(x, batch):
        return a @ (x - jnp.mean(batch, axis=0))

    def obj_fn(x, batch):
        r = x - jnp.mean(batch, axis=0)
        return 0.5 * r @ a @ r

    t1 = FusedTrainer("oLBFGS", OLBFGSConfig.create(mem_size=3), grad_fn)
    st = t1.init(jnp.zeros(n))
    st, infos = stream_rounds(t1, st, iter(jnp.asarray(centers)), 0.05)
    assert int(st.niter) == B

    t2 = FusedTrainer("adaQN",
                      AdaQNConfig.create(mem_size=3, fisher_size=6,
                                         bfgs_upd_freq=4), grad_fn,
                      obj_fn=obj_fn)
    st2 = t2.init(jnp.zeros(n))
    st2, infos2 = stream_rounds(
        t2, st2, (jnp.asarray(centers[i]) for i in range(B)),
        lambda r: 0.05 / (r + 1))
    assert int(st2.niter) == B
    assert np.all(np.isfinite(np.asarray(st2.x)))


def test_parse_extreme_classification(tmp_path):
    from stochqn_tpu.utils.data import parse_extreme_classification
    p = tmp_path / "toy_xc.txt"
    p.write_text(
        "4 6 3\n"
        "0,2 1:0.5 4:1\n"
        "5:2.5\n"              # no labels: line starts with idx:val
        "1 0:1 2:3 3:0.25\n"
        "2,1,0 1:7\n")
    X, Y = parse_extreme_classification(p)
    assert X.shape == (4, 6) and Y.shape == (4, 3)
    dense = np.zeros((4, 6))
    dense[0, 1], dense[0, 4] = 0.5, 1.0
    dense[1, 5] = 2.5
    dense[2, 0], dense[2, 2], dense[2, 3] = 1.0, 3.0, 0.25
    dense[3, 1] = 7.0
    np.testing.assert_array_equal(X.toarray(), dense)
    np.testing.assert_array_equal(
        Y, [[1, 0, 1], [0, 0, 0], [0, 1, 0], [1, 1, 1]])


def test_xc_loader_to_optimizer_second_shape(tmp_path):
    """End-to-end: an Extreme-Classification file at a NON-BibTeX shape
    (23 features, 5 labels) through the parser into the multinomial
    pipeline the BibTeX benchmark uses (`benchmarks/bibtex_convergence.py
    --data`), so the real-data path stays exercised at more than one
    shape while the true dataset is unreachable (zero egress)."""
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from benchmarks.bibtex_convergence import grad_fun, obj_fun
    from stochqn_tpu.guided import adaQN
    from stochqn_tpu.utils.data import parse_extreme_classification

    rng = np.random.default_rng(5)
    n, d, labels = 60, 23, 5
    lines = [f"{n} {d} {labels}"]
    for i in range(n):
        labs = ",".join(str(v) for v in sorted(
            rng.choice(labels, size=rng.integers(1, 3), replace=False)))
        feats = sorted(rng.choice(d, size=rng.integers(3, 8),
                                  replace=False))
        toks = " ".join(f"{f}:{rng.integers(1, 3)}" for f in feats)
        lines.append(f"{labs} {toks}")
    p = tmp_path / "second_shape.txt"
    p.write_text("\n".join(lines) + "\n")

    X, Y = parse_extreme_classification(p)
    assert X.shape == (n, d) and Y.shape == (n, labels)
    Xd = np.asarray(X.todense(), np.float64)
    Yd = np.asarray(Y, np.float64)

    w0 = np.random.default_rng(1).normal(size=(d + 1) * labels)
    opt = adaQN(x0=w0.copy(), grad_fun=grad_fun, obj_fun=obj_fun,
                step_size=1e-1, decr_step_size=None, rmsprop_weight=0.9,
                verbose=False)
    kw = {"reg_param": 1e-1}
    f0 = obj_fun(w0, Xd, Yd, **kw)
    for epoch in range(6):
        for i in range(0, n, 20):
            opt.partial_fit(Xd[i:i + 20], Yd[i:i + 20],
                            additional_kwargs=kw)
    f1 = obj_fun(opt.x, Xd, Yd, **kw)
    assert f1 < f0, (f0, f1)


def test_parse_extreme_classification_headerless(tmp_path):
    """A file without the ``n d L`` header line must not lose sample 0."""
    from stochqn_tpu.utils.data import parse_extreme_classification
    p = tmp_path / "toy_noheader.txt"
    p.write_text(
        "0,2 1:0.5 4:1\n"      # would be swallowed by a blind header read
        "1 0:1 2:3\n")
    X, Y = parse_extreme_classification(p)
    assert X.shape[0] == 2
    assert X[0, 1] == 0.5 and X[0, 4] == 1.0
    np.testing.assert_array_equal(Y, [[1, 0, 1], [0, 1, 0]])
