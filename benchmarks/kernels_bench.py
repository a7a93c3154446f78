"""Two-loop direction-step variants on the real TPU chip, with HBM
bandwidth-utilization accounting.

Per optimizer step the collapsed two-loop must stream the ``[2m, n]`` pair
memory twice (project ``W g``; expand ``gamma g + W^T u`` — the expansion
needs the full projection, so two HBM passes is the information-theoretic
floor once W exceeds VMEM).  "util" below = useful-bytes / time / peak-BW,
where useful bytes = the two W passes + one read of g + one write of d;
any extra traffic a variant causes (e.g. materializing ``concat(s, y)``)
shows up as LOW utilization, not as extra credited bytes.

Variants (m = 10):
  * xla/concat  — d = gamma*g + (C (W g)) W with W = concat(s, y) per call
                  (the naive form of the collapsed path)
  * xla/split   — same math, s/y kept separate: no [2m, n] concat buffer
  * pallas/dir  — ops/pallas/two_loop_kernel.direction: ONE HBM pass, pair
                  memory parked in VMEM scratch (fits n <~ 1.3M at m=10)
  * bf16/split  — split form with bf16 pair storage (f32 accumulation)
  * adaqn XLA vs pallas/project_adaqn — the diagonal-H0 projection phase

Run:  python benchmarks/kernels_bench.py [--quick]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

M = 10
PEAK_BW = 819e9            # TPU v5e HBM, bytes/s
PREC = jax.lax.Precision.HIGHEST


def chain_iters(n):
    """Steps per chain: the tunnel costs ~40-45 ms per dispatch regardless
    of payload, so size the chain to run ~2 s (overhead < 2.5%).  Estimated
    step: two [2m, n] f32 passes at ~40% of peak BW."""
    est_step = max(n * 5e-10, 20e-6)          # seconds
    return int(min(5000, max(150, 0.5 / est_step)))


def timeit(fn, g0, ops, iters=300, reps=3):
    """Marginal per-step time of ``fn`` inside a lax.scan chain.

    Measurement rules learned the hard way on this backend (each violated
    rule produced plausible-looking garbage):
      * every step's output must feed BOTH the next step's input and a
        returned accumulator — otherwise the tunnel backend elides/replays
        chains wholesale ("0.0 us" steps at 400,000% of peak HBM);
      * operands must be jit ARGUMENTS — closures embed them as literal
        constants, bloating the remote-compile payload past its 413 limit
        and disabling XLA's loop-invariant handling of the pair memory;
      * the tunnel charges a large fixed cost per dispatch, so the
        marginal cost comes from the difference of two chain lengths
        (iters and 4*iters), not from a single chain.
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("length",))
    def chain(g, g0, o, length):
        def body(carry, t):
            g, acc = carry
            g2 = g0 + 1e-5 * fn(g, o) + t * 1e-8
            return (g2, acc + jnp.sum(g2[:8])), None
        (g, acc), _ = jax.lax.scan(
            body, (g, jnp.float32(0)),
            jnp.arange(length, dtype=jnp.float32))
        return g + acc * 1e-12, acc

    def run(length, g):
        best = float("inf")
        for rep in range(reps):
            g = g + jnp.float32(1e-7 * (rep + 1))
            t0 = time.perf_counter()
            g, acc = chain(g, g0, ops, length)
            # MATERIALIZE (scalar D2H) inside the timed region:
            # block_until_ready through the tunnel can return before the
            # remote execution has actually run (observed mid-session);
            # only a data read is a trustworthy completion barrier.
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return best, g

    g, a = chain(g0, g0, ops, iters)           # compile short
    g, a = chain(g, g0, ops, 4 * iters)        # compile long
    float(a)
    t_short, g = run(iters, g)
    t_long, g = run(4 * iters, g)
    if os.environ.get("KB_DEBUG"):
        print(f"    [debug] iters={iters} t_short={t_short*1e3:.1f}ms "
              f"t_long={t_long*1e3:.1f}ms dev={list(g.devices())[0]} "
              f"gsum={float(jnp.sum(g)):.4f}")
    if t_long <= t_short:
        # a host-load spike inverted the chain timings; a clamped
        # near-zero would masquerade as an impossibly fast kernel and get
        # merged into KERNELS.json as if valid
        raise RuntimeError(
            f"timing inversion (t_short={t_short*1e3:.1f}ms >= "
            f"t_long={t_long*1e3:.1f}ms) — rerun this size")
    return (t_long - t_short) / (3 * iters) * 1e6   # us/step


def useful_bytes(n, st_bytes):
    """Two W passes + read g + write d (f32)."""
    return 2 * (2 * M * n * st_bytes) + 2 * n * 4


def bench(n, include_pallas, include_concat):
    # generate operands ON DEVICE (jax.random): host->device transfer of
    # multi-GB arrays through the tunnel takes tens of minutes at 64M
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    s = jax.random.normal(keys[0], (M, n), jnp.float32)
    y = s + 0.3 * jax.random.normal(keys[1], (M, n), jnp.float32)
    ops = {
        "s": s, "y": y,
        "s16": s.astype(jnp.bfloat16), "y16": y.astype(jnp.bfloat16),
        "diag": jax.random.uniform(keys[2], (n,), jnp.float32, 0.1, 2.0),
        "c": jnp.asarray(
            np.random.default_rng(0).standard_normal((2 * M, 2 * M)) * 0.01,
            jnp.float32),
        "gamma": jnp.float32(0.7),
    }
    if include_concat:   # single [2m, n] pair buffer; skipped at 64M (HBM)
        ops["w"] = jnp.concatenate([s, y], axis=0)
    g0 = jax.random.normal(keys[3], (n,), jnp.float32)
    del s, y

    def mm(a, b):
        return jnp.matmul(a, b, precision=PREC,
                          preferred_element_type=jnp.float32)

    def xla_concat(g, o):
        w = jnp.concatenate([o["s"], o["y"]], axis=0)
        u = mm(o["c"], mm(w, g))
        return o["gamma"] * g + mm(u, w)

    def xla_wbuf(g, o):
        u = mm(o["c"], mm(o["w"], g))
        return o["gamma"] * g + mm(u, o["w"])

    def xla_fast(g, o):
        # default precision (bf16 inputs, f32 accumulation) — quantifies
        # what the production path's Precision.HIGHEST costs
        w = jnp.concatenate([o["s"], o["y"]], axis=0)
        wg = jnp.matmul(w, g, preferred_element_type=jnp.float32)
        u = jnp.matmul(o["c"], wg)
        return o["gamma"] * g + jnp.matmul(u, w,
                                           preferred_element_type=jnp.float32)

    def xla_split(g, o):
        wg = jnp.concatenate([mm(o["s"], g), mm(o["y"], g)])
        u = mm(o["c"], wg)
        return o["gamma"] * g + mm(u[:M], o["s"]) + mm(u[M:], o["y"])

    def bf16_split(g, o):
        g16 = g.astype(jnp.bfloat16)
        wg = jnp.concatenate([mm(o["s16"], g16), mm(o["y16"], g16)])
        u = mm(o["c"], wg)
        return (o["gamma"] * g
                + mm(u[:M].astype(jnp.bfloat16), o["s16"])
                + mm(u[M:].astype(jnp.bfloat16), o["y16"]))

    def adaqn_xla(g, o):
        # projection phase of the adaQN diag path as two_loop_cached runs it
        w = jnp.concatenate([o["s"], o["y"]], axis=0)
        yd = o["y"] * o["diag"][None, :]
        parts = (jnp.sum(mm(w, g)) + jnp.sum(mm(yd, g))
                 + jnp.sum(mm(yd, o["y"].T)))
        # fold everything into an n-vector so chaining works
        return g + 1e-6 * parts

    from stochqn_tpu.ops.pallas import two_loop_kernel as tlk

    def pallas_dir(g, o):
        return tlk.direction(o["s"], o["y"], g, o["c"], o["gamma"])

    def pallas_stream(g, o):
        return tlk.direction_streamed(o["s"], o["y"], g, o["c"], o["gamma"])

    def pallas_stream16(g, o):
        return tlk.direction_streamed(o["s16"], o["y16"], g, o["c"],
                                      o["gamma"])

    def adaqn_pallas(g, o):
        wg, ydg, ydy = tlk.project_adaqn(o["s"], o["y"], o["diag"], g)
        return g + 1e-6 * (jnp.sum(wg) + jnp.sum(ydg) + jnp.sum(ydy))

    def adaqn_mv(g, o):
        # matvec coupling form as production two_loop_cached runs it:
        # wg = W g; t = Y^T alpha; u2 = D (g - t); y_r0 = Y u2;
        # d = u2 + S^T coeff — 5m row-passes, no [m, n] intermediate
        w = jnp.concatenate([o["s"], o["y"]], axis=0)
        wg = mm(w, g)
        a = 1e-3 * wg[M:]
        t = mm(a, o["y"])
        u2 = o["diag"] * (g - t)
        yr0 = mm(o["y"], u2)
        coeff = a - 1e-3 * yr0
        return u2 + mm(coeff, o["s"])

    variants = [("xla/fast", xla_fast, 4), ("xla/split", xla_split, 4),
                ("bf16/split", bf16_split, 2),
                ("pallas/stream", pallas_stream, 4),
                ("pallas/stream16", pallas_stream16, 2)]
    if include_concat:
        variants.insert(0, ("xla/wbuf", xla_wbuf, 4))
        variants.insert(0, ("xla/concat", xla_concat, 4))
    if include_pallas:
        variants.append(("pallas/dir", pallas_dir, 4))

    # adaQN projection comparison (one W pass + yd products); the adaQN
    # kernel streams tiles without scratch — no size gate.
    adaqn = [("adaqn/xla", adaqn_xla), ("adaqn/pallas", adaqn_pallas),
             ("adaqn/mv", adaqn_mv)]

    def ideal_bytes(name):
        if name == "adaqn/mv":
            # whole direction: 5m row-passes + g read + d write
            return 5 * M * n * 4 + 2 * n * 4
        if name.startswith("adaqn"):
            # one W pass + one y pass (yd never materialized) + g read
            return 2 * M * n * 4 + 2 * M * n * 4 + n * 4
        st = dict((nm, s_) for nm, _, s_ in variants).get(name, 4)
        return useful_bytes(n, st)

    print(f"--- n = {n:,}  (pair memory {2*M*n*4/1e6:,.0f} MB f32) ---")
    out = {}
    for name, fn in [(nm, f) for nm, f, _ in variants] + adaqn:
        try:
            us = timeit(fn, g0, ops, iters=chain_iters(n))
        except Exception as e:  # VMEM OOM etc — record, keep going
            msg = str(e).split("\n")[0][:180]
            out[name] = {"error": f"{type(e).__name__}: {msg}"}
            print(f"  {name:12s}   FAILED {type(e).__name__}: {msg}")
            continue
        util = ideal_bytes(name) / (us * 1e-6) / PEAK_BW * 100
        out[name] = {"us": round(us, 1), "hbm_util_pct": round(util, 1)}
        print(f"  {name:12s} {us:10.1f} us   {util:5.1f}% of peak HBM BW")
    return out


def main():
    quick = "--quick" in sys.argv
    only = [int(a) for a in sys.argv[1:] if a.isdigit()]
    results = {"m": M, "device": jax.devices()[0].device_kind,
               "peak_bw_gb_s": PEAK_BW / 1e9, "sizes": {}}
    # 64M is omitted: the ensemble (f32 pairs + bf16 copies + XLA's hoisted
    # concat temp) exceeds the 16 GB HBM; production at that scale uses
    # bf16 pair storage and/or param sharding (benchmarks/large_n.py,
    # parallel/mesh.py).
    sizes = [292_083, 655_360, 1_000_000, 4_000_000, 16_000_000]
    if quick:
        sizes = [1_000_000, 16_000_000]
    if only:
        sizes = only
    for n in sizes:
        # pallas/dir parks the pair memory in VMEM scratch; measured total
        # stack need is ~(3m + 2) * n * 4 bytes (scratch + staging), must
        # fit the ~110MB scoped-vmem ceiling.  project_adaqn streams tiles
        # (no scratch) and has no size gate.
        include_pallas = (3 * M + 2) * n * 4 < 100e6
        include_concat = n <= 16_000_000               # 64M concat OOMs HBM
        results["sizes"][str(n)] = bench(n, include_pallas, include_concat)
    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "KERNELS.json")
    # merge into the existing record (partial runs update their sizes
    # in place instead of wiping the rest of the table)
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f)
        merged_sizes = prev.get("sizes", {})
        for k, v in results["sizes"].items():
            merged_sizes.setdefault(k, {}).update(v)
        results["sizes"] = dict(sorted(merged_sizes.items(),
                                       key=lambda kv: int(kv[0])))
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
