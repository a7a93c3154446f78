"""Two-loop recursion: compact (matmul) form vs sequential form vs NumPy
oracle vs dense-matrix reconstruction."""
import numpy as np
import jax.numpy as jnp
import pytest

from stochqn_tpu.ops.two_loop import two_loop, two_loop_sequential
from oracle_numpy import two_loop_np


def _random_pairs(rng, n, k, spd=True):
    """Generate k (s, y) pairs with positive curvature (if spd)."""
    pairs = []
    for _ in range(k):
        s = rng.standard_normal(n)
        y = rng.standard_normal(n)
        if spd:
            y = y + (1.0 + abs(np.dot(s, y))) / np.dot(s, s) * s  # force s.y > 0
        pairs.append((s, y))
    return pairs


def _fill_ring(pairs, mem_size, n, head_offset=0):
    """Place chronological pairs into a ring.  A full ring may start at any
    offset (head == oldest row); a not-full ring always starts at row 0
    with head == count (the C invariant)."""
    s_mem = np.zeros((mem_size, n))
    y_mem = np.zeros((mem_size, n))
    count = len(pairs)
    start = head_offset % mem_size if count == mem_size else 0
    for c, (s, y) in enumerate(pairs):
        row = (start + c) % mem_size
        s_mem[row] = s
        y_mem[row] = y
    head = start if count == mem_size else count
    return s_mem, y_mem, head, count


@pytest.mark.parametrize("n", [7, 130])
@pytest.mark.parametrize("count,mem_size,head_offset", [
    (0, 5, 0), (1, 5, 0), (3, 5, 0), (5, 5, 0), (5, 5, 2), (5, 5, 4),
    (10, 10, 7),
])
@pytest.mark.parametrize("h0", [0.0, 0.37])
def test_compact_matches_oracle_scalar_h0(rng, n, count, mem_size,
                                          head_offset, h0):
    pairs = _random_pairs(rng, n, count)
    s_mem, y_mem, head, cnt = _fill_ring(pairs, mem_size, n, head_offset)
    g = rng.standard_normal(n)

    want = two_loop_np(g, pairs, h0=h0)
    got = np.asarray(two_loop(jnp.asarray(g), jnp.asarray(s_mem),
                              jnp.asarray(y_mem), head, cnt, h0=h0))
    got_seq = np.asarray(two_loop_sequential(
        jnp.asarray(g), jnp.asarray(s_mem), jnp.asarray(y_mem), head, cnt,
        h0=h0))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(got_seq, want, rtol=1e-10, atol=1e-12)


def test_compact_matches_oracle_diag(rng):
    n, mem_size, count = 50, 6, 6
    pairs = _random_pairs(rng, n, count)
    s_mem, y_mem, head, cnt = _fill_ring(pairs, mem_size, n, head_offset=3)
    g = rng.standard_normal(n)
    diag = rng.uniform(0.1, 2.0, size=n)

    want = two_loop_np(g, pairs, diag=diag)
    got = np.asarray(two_loop(jnp.asarray(g), jnp.asarray(s_mem),
                              jnp.asarray(y_mem), head, cnt,
                              diag=jnp.asarray(diag)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_empty_memory_returns_gradient(rng):
    n = 11
    g = rng.standard_normal(n)
    s_mem = y_mem = jnp.zeros((4, n))
    out = np.asarray(two_loop(jnp.asarray(g), s_mem, y_mem, 0, 0, h0=5.0))
    np.testing.assert_allclose(out, g)  # h0 NOT applied when empty
    diag = rng.uniform(0.5, 1.5, size=n)
    out2 = np.asarray(two_loop(jnp.asarray(g), s_mem, y_mem, 0, 0,
                               diag=jnp.asarray(diag)))
    np.testing.assert_allclose(out2, diag * g)


def test_secant_condition(rng):
    """BFGS invariant: H_k y_last = s_last, so two_loop(y_last) == s_last."""
    n, k = 12, 5
    pairs = _random_pairs(rng, n, k)
    s_mem, y_mem, head, cnt = _fill_ring(pairs, k, n, head_offset=2)
    s_last, y_last = pairs[-1]
    got = np.asarray(two_loop(jnp.asarray(y_last), jnp.asarray(s_mem),
                              jnp.asarray(y_mem), head, cnt))
    np.testing.assert_allclose(got, s_last, rtol=1e-8, atol=1e-10)


def test_two_loop_equals_dense_inverse_hessian(rng):
    """With A-conjugate directions and exact y = A s, BFGS satisfies the
    hereditary secant property and after n pairs equals A^{-1} exactly."""
    n = 8
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(rng.uniform(1.0, 3.0, n)) @ q.T
    # build A-conjugate directions by Gram-Schmidt in the A-inner product
    dirs = []
    for _ in range(n):
        s = rng.standard_normal(n)
        for p in dirs:
            s = s - (p @ a @ s) / (p @ a @ p) * p
        dirs.append(s)
    s_mem = np.stack(dirs)
    y_mem = s_mem @ a
    g = rng.standard_normal(n)
    got = np.asarray(two_loop(jnp.asarray(g), jnp.asarray(s_mem),
                              jnp.asarray(y_mem), 0, n))
    want = np.linalg.solve(a, g)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_cached_gram_matches_recompute(rng):
    """two_loop with a supplied Gram must equal the recompute path, and
    commit_pair must maintain the Gram consistently through ring wrap."""
    import jax.numpy as jnp
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair

    n, m = 24, 4
    mem = BFGSMemory.create(m, n, jnp.float64)
    for k in range(7):   # wraps the ring
        s = jnp.asarray(rng.standard_normal(n))
        y = s + 0.25 * jnp.asarray(rng.standard_normal(n))
        mem = mem.replace(s_pending=s)
        mem, acc = commit_pair(mem, y, min_curvature=1e-8, y_reg=0.0)
        assert bool(acc)
    w = jnp.concatenate([mem.s, mem.y], axis=0)
    np.testing.assert_allclose(np.asarray(mem.gram), np.asarray(w @ w.T),
                               rtol=1e-12)
    g = jnp.asarray(rng.standard_normal(n))
    with_gram = two_loop(g, mem.s, mem.y, mem.head, mem.count,
                         gram=mem.gram)
    without = two_loop(g, mem.s, mem.y, mem.head, mem.count)
    np.testing.assert_allclose(np.asarray(with_gram), np.asarray(without),
                               rtol=1e-12)


def test_stale_rows_are_masked(rng):
    """Rows beyond `count` may hold stale (nonzero) data after a flush and
    must not affect the result."""
    n, mem_size, count = 20, 5, 2
    pairs = _random_pairs(rng, n, count)
    s_mem, y_mem, head, cnt = _fill_ring(pairs, mem_size, n)
    s_stale = s_mem.copy()
    y_stale = y_mem.copy()
    s_stale[3:] = rng.standard_normal((2, n)) * 100
    y_stale[3:] = rng.standard_normal((2, n)) * 100
    g = rng.standard_normal(n)
    clean = np.asarray(two_loop(jnp.asarray(g), jnp.asarray(s_mem),
                                jnp.asarray(y_mem), head, cnt))
    stale = np.asarray(two_loop(jnp.asarray(g), jnp.asarray(s_stale),
                                jnp.asarray(y_stale), head, cnt))
    np.testing.assert_allclose(stale, clean, rtol=1e-10)


def test_cached_fast_path_matches_two_loop(rng):
    """two_loop_cached (commit-time small-math cache) == two_loop."""
    import jax.numpy as jnp
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair
    from stochqn_tpu.ops.two_loop import two_loop_cached

    n, m = 30, 4
    mem = BFGSMemory.create(m, n, jnp.float64)
    for k in range(6):  # wraps the ring
        s = jnp.asarray(rng.standard_normal(n))
        y = s + 0.25 * jnp.asarray(rng.standard_normal(n))
        mem = mem.replace(s_pending=s)
        mem, acc = commit_pair(mem, y, min_curvature=1e-8, y_reg=0.0)
        assert bool(acc)
        g = jnp.asarray(rng.standard_normal(n))
        for h0 in (0.0, 0.7):
            ref = two_loop(g, mem.s, mem.y, mem.head, mem.count, h0=h0)
            got = two_loop_cached(g, mem, h0=h0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-10, atol=1e-12)
        diag = jnp.asarray(rng.uniform(0.1, 2.0, n))
        ref = two_loop(g, mem.s, mem.y, mem.head, mem.count, diag=diag)
        got = two_loop_cached(g, mem, diag=diag)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)
        # the gram coupling (single fused psum under param sharding) must
        # compute the same direction as the default matvec coupling
        got_gram = two_loop_cached(g, mem, diag=diag, coupling="gram")
        np.testing.assert_allclose(np.asarray(got_gram), np.asarray(ref),
                                   rtol=1e-10, atol=1e-12)


def test_cached_fast_path_empty_memory(rng):
    import jax.numpy as jnp
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.two_loop import two_loop_cached

    n = 9
    mem = BFGSMemory.create(3, n, jnp.float64)
    g = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(two_loop_cached(g, mem, h0=2.0)),
                               np.asarray(g))


def test_collapsed_direction_matches_classic(rng):
    """The collapsed form d = gamma*g + W^T((c0 + gamma*cg)(W g)) must
    equal the classic cached two-loop for every ring state and H0 mode."""
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair
    from stochqn_tpu.ops.two_loop import two_loop_cached

    m, n = 4, 33
    for ncommit in (0, 1, 3, 4, 7):
        mem = BFGSMemory.create(m, n, jnp.float64)
        for i in range(ncommit):
            s = jnp.asarray(rng.standard_normal(n))
            y = s * (1.5 + 0.2 * i) + 0.01 * jnp.asarray(
                rng.standard_normal(n))
            mem = mem.replace(s_pending=s)
            mem, _ = commit_pair(mem, y, 0.0, 0.0, direction_cache=True)
        g = jnp.asarray(rng.standard_normal(n))
        for h0 in (0.0, 0.7):
            d_classic = two_loop_cached(g, mem, h0=h0)
            d_fast = two_loop_cached(g, mem, h0=h0, collapsed=True)
            np.testing.assert_allclose(np.asarray(d_fast),
                                       np.asarray(d_classic),
                                       rtol=1e-12, atol=1e-13)
        # flushed memory: stale (c0, cg) must be masked -> d == g
        flushed = mem.flush()
        d_flush = two_loop_cached(g, flushed, collapsed=True)
        np.testing.assert_allclose(np.asarray(d_flush), np.asarray(g),
                                   rtol=0, atol=0)


@pytest.mark.parametrize("m", [1, 2, 3, 5, 10, 16, 17])
def test_log_depth_neumann_inverts_triangular_systems(rng, m):
    """`ops/pairs._small_cache`'s (I + N)^{-1} pair now uses the
    log-depth factorization (I - N)(I + N^2)(I + N^4)... — exact for
    nilpotent strictly-triangular N whenever the exponent sweep covers
    m.  Lock it against a dense inverse at every memory-size shape,
    including the degenerate m=1/2 (empty product loop) and the first
    sizes past each power of two."""
    import jax
    from stochqn_tpu.ops import pairs as pairs_mod

    gram = np.zeros((2 * m, 2 * m))
    # realistic curvature-positive blocks so rho is finite
    spairs = _random_pairs(rng, max(2 * m, 8), m)
    s_rows = np.stack([s for s, _ in spairs])
    y_rows = np.stack([y for _, y in spairs])
    w = np.concatenate([s_rows, y_rows], axis=0)
    gram = w @ w.T

    out = pairs_mod._small_cache(jnp.asarray(gram), jnp.int32(0),
                                 jnp.int32(m), m)
    perm = np.asarray(out["perm"])
    rho = np.asarray(out["rho"])
    sy = gram[:m, m:][perm][:, perm]
    ru = np.triu(rho[:, None] * sy, k=1)
    rl = np.tril(rho[:, None] * sy.T, k=-1)
    eye = np.eye(m)
    # f64 accumulation noise grows with the chain length (m=17 shows
    # ~1e-8 absolute on near-zero entries); the check is absolute-scale
    np.testing.assert_allclose(np.asarray(out["bwd_inv"]),
                               np.linalg.inv(eye + ru),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["fwd_inv"]),
                               np.linalg.inv(eye + rl),
                               rtol=1e-7, atol=1e-7)
