"""Pallas projection kernels (interpreter mode on CPU) vs XLA reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from stochqn_tpu.ops.pallas.two_loop_kernel import project, project_adaqn
from stochqn_tpu.ops.two_loop import two_loop


def _mem(rng, m, n):
    s = rng.standard_normal((m, n)).astype(np.float32)
    y = (s + 0.3 * rng.standard_normal((m, n))).astype(np.float32)
    return jnp.asarray(s), jnp.asarray(y)


@pytest.mark.parametrize("n", [1000, 2048])  # non-multiple + multiple of tile
def test_project_matches_xla(rng, n):
    m = 5
    s, y = _mem(rng, m, n)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    wg, gram = project(s, y, g, tile_n=512, interpret=True)
    w = jnp.concatenate([s, y], axis=0)
    np.testing.assert_allclose(np.asarray(wg), np.asarray(w @ g),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(w @ w.T),
                               rtol=2e-5, atol=1e-4)


def test_project_adaqn_matches_xla(rng):
    m, n = 4, 1500
    s, y = _mem(rng, m, n)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.1, 2.0, n).astype(np.float32))
    wg, ydg, ydy = project_adaqn(s, y, d, g, tile_n=512, interpret=True)
    w = jnp.concatenate([s, y], axis=0)
    yd = y * d
    np.testing.assert_allclose(np.asarray(wg), np.asarray(w @ g),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ydg), np.asarray(yd @ g),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ydy), np.asarray(yd @ y.T),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("with_diag", [False, True])
def test_two_loop_pallas_path_matches_xla(rng, with_diag):
    m, n, count = 4, 700, 4
    s, y = _mem(rng, m, n)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    diag = (jnp.asarray(rng.uniform(0.1, 2.0, n).astype(np.float32))
            if with_diag else None)
    ref = two_loop(g, s, y, 2, count, diag=diag)
    got = two_loop(g, s, y, 2, count, diag=diag, use_pallas=True,
                   pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_bf16_pairs_with_pallas_falls_back(rng):
    """pairs_bf16 + use_pallas must silently use the XLA path (the Mosaic
    kernel is float32-only)."""
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair
    from stochqn_tpu.ops.two_loop import two_loop_cached

    n, m = 64, 3
    mem = BFGSMemory.create(m, n, jnp.float32, storage_dtype=jnp.bfloat16)
    for _ in range(3):
        s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y = s + 0.3 * jnp.asarray(rng.standard_normal(n).astype(np.float32))
        mem = mem.replace(s_pending=s)
        mem, acc = commit_pair(mem, y, 1e-8, 0.0)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    out_pallas_flag = two_loop_cached(g, mem, diag=d, use_pallas=True)
    out_plain = two_loop_cached(g, mem, diag=d)
    np.testing.assert_allclose(np.asarray(out_pallas_flag),
                               np.asarray(out_plain), rtol=1e-6)


@pytest.mark.parametrize("storage", [jnp.float32, jnp.bfloat16])
def test_direction_streamed_matches_collapsed_xla(rng, storage):
    """The two-pass streamed direction kernel == the collapsed XLA form,
    for f32 and bf16 pair storage (bf16: exact-f32 gradient, pairs rounded
    at storage — tighter than the XLA bf16 path, which also rounds g)."""
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair
    from stochqn_tpu.ops.pallas.two_loop_kernel import direction_streamed

    n, m = 900, 4
    mem = BFGSMemory.create(m, n, jnp.float32, storage_dtype=storage)
    for _ in range(6):
        s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y = s + 0.3 * jnp.asarray(rng.standard_normal(n).astype(np.float32))
        mem = mem.replace(s_pending=s)
        mem, _ = commit_pair(mem, y, 1e-8, 0.0, direction_cache=True)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    c = mem.c0 + mem.gamma * mem.cg
    got = direction_streamed(mem.s, mem.y, g, c, mem.gamma, tile_n=256,
                             interpret=True)
    # reference: same math in plain XLA on the SAME stored (possibly
    # rounded) pairs with f32 accumulation
    w = jnp.concatenate([mem.s, mem.y], axis=0).astype(jnp.float32)
    u = jnp.asarray(c, jnp.float32) @ (w @ g)
    ref = mem.gamma * g + u @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_direction_kernel_matches_collapsed_xla(rng):
    """The one-HBM-pass direction kernel == the collapsed XLA form
    d = gamma*g + W^T((c0 + gamma*cg)(W g)) on a real commit cache."""
    from stochqn_tpu.core.state import BFGSMemory
    from stochqn_tpu.ops.pairs import commit_pair
    from stochqn_tpu.ops.two_loop import two_loop_cached
    from stochqn_tpu.ops.pallas.two_loop_kernel import direction

    n, m = 900, 4
    mem = BFGSMemory.create(m, n, jnp.float32)
    for _ in range(6):   # overfill the ring so perm/wrap is exercised
        s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        y = s + 0.3 * jnp.asarray(rng.standard_normal(n).astype(np.float32))
        mem = mem.replace(s_pending=s)
        mem, _ = commit_pair(mem, y, 1e-8, 0.0, direction_cache=True)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    ref = two_loop_cached(g, mem, collapsed=True)
    c = mem.c0 + mem.gamma * mem.cg
    got = direction(mem.s, mem.y, g, c, mem.gamma, tile_n=256,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)
