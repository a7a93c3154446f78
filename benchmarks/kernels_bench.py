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
    return int(min(20000, max(150, 2.0 / est_step)))


def timeit(fn, g0, ops, iters=300, reps=3):
    """Chained timing inside ONE lax.scan: each step's input depends on the
    previous step's output (the backend memoizes identical executions —
    CLAUDE.md) and the per-dispatch tunnel round-trip (~40-45 ms) is paid
    once per chain, amortized to noise via ``chain_iters``-length chains.
    Operands are jit ARGUMENTS, not closures — closed-over arrays embed as
    literal constants in the compile payload, which the remote compiler
    rejects (HTTP 413) beyond ~100 MB."""
    @jax.jit
    def chain(g, g0, o):
        def body(g, _):
            return g0 + 1e-3 * fn(g, o), None
        return jax.lax.scan(body, g, None, length=iters)[0]

    g = chain(g0, g0, ops)           # compile + settle caches
    jax.block_until_ready(g)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        g = chain(g, g0, ops)
        jax.block_until_ready(g)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e6        # us


def useful_bytes(n, st_bytes):
    """Two W passes + read g + write d (f32)."""
    return 2 * (2 * M * n * st_bytes) + 2 * n * 4


def bench(n, include_pallas, include_concat):
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((M, n)), jnp.float32)
    y = s + 0.3 * jnp.asarray(rng.standard_normal((M, n)), jnp.float32)
    ops = {
        "s": s, "y": y,
        "s16": s.astype(jnp.bfloat16), "y16": y.astype(jnp.bfloat16),
        "diag": jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32),
        "c": jnp.asarray(rng.standard_normal((2 * M, 2 * M)) * 0.01,
                         jnp.float32),
        "gamma": jnp.float32(0.7),
    }
    if include_concat:   # single [2m, n] pair buffer; skipped at 64M (HBM)
        ops["w"] = jnp.concatenate([s, y], axis=0)
    g0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
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

    def adaqn_pallas(g, o):
        wg, ydg, ydy = tlk.project_adaqn(o["s"], o["y"], o["diag"], g)
        return g + 1e-6 * (jnp.sum(wg) + jnp.sum(ydg) + jnp.sum(ydy))

    variants = [("xla/split", xla_split, 4), ("bf16/split", bf16_split, 2)]
    if include_concat:
        variants.insert(0, ("xla/wbuf", xla_wbuf, 4))
        variants.insert(0, ("xla/concat", xla_concat, 4))
    if include_pallas:
        variants.append(("pallas/dir", pallas_dir, 4))

    # adaQN projection comparison (one W pass + yd products); the adaQN
    # kernel streams tiles without scratch — no size gate.
    adaqn = [("adaqn/xla", adaqn_xla), ("adaqn/pallas", adaqn_pallas)]

    def ideal_bytes(name):
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
    results = {"m": M, "device": jax.devices()[0].device_kind,
               "peak_bw_gb_s": PEAK_BW / 1e9, "sizes": {}}
    sizes = [292_083, 655_360, 1_000_000, 4_000_000, 16_000_000, 64_000_000]
    if quick:
        sizes = [1_000_000, 16_000_000]
    for n in sizes:
        # pallas/dir parks the pair memory in VMEM scratch; measured total
        # stack need is ~(3m + 2) * n * 4 bytes (scratch + staging), must
        # fit the ~110MB scoped-vmem ceiling.  project_adaqn streams tiles
        # (no scratch) and has no size gate.
        include_pallas = (3 * M + 2) * n * 4 < 100e6
        include_concat = n <= 16_000_000               # 64M concat OOMs HBM
        results["sizes"][str(n)] = bench(n, include_pallas, include_concat)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
