"""ICI roofline: where the >=90% weak-scaling target holds on real TPU.

BASELINE.json's scaling target (">=90% weak-scaling efficiency for
data-parallel SQN at 2+ hosts") cannot be measured directly here (one
tunneled chip), so this benchmark QUANTIFIES it instead of hand-waving:

  phase A (``--bytes``, CPU virtual mesh): compile loop-free per-step /
    per-boundary programs at the flagship BibTeX shape under the three
    dryrun topologies and extract the per-device collective payload bytes
    from the compiled HLO (``stochqn_tpu.parallel.hlo_stats``) — the same
    accounting the test suite locks (tests/test_parallel.py byte budgets).

  phase B (``--measure``, real TPU): measure single-chip per-step time of
    the flagship fused SQN at several per-device batch sizes (the
    weak-scaling per-device workload knob), chained-state methodology.

  phase C (``--model``, default: also runs after A/B): combine A and B
    with the public v5e interconnect constants into an UNOVERLAPPED
    efficiency model

        eff(bs) = t_step(bs) / (t_step(bs) + T_ici)
        T_ici(all-reduce of B bytes, ring of g) =
            2 * B * (g-1)/g / W_axis  +  2*(g-1) * hop_latency

    (reduce-scatter + all-gather phases; v5e per-axis bidirectional ICI
    bandwidth W_axis = 9e10 B/s, hop latency ~1 us — jax-ml.github.io/
    scaling-book "Sharded Matrices and How to Multiply Them" / "TPUs"
    chapters).  No overlap is assumed, so the modeled efficiency is a
    FLOOR: XLA overlaps the gradient all-reduce with independent compute
    when the schedule allows.

Writes SCALING.json["ici_roofline"].  Run ``--bytes`` under
JAX_PLATFORMS-forced CPU (the script forces it), ``--measure`` alone on
the TPU (single-tenant!), then ``--model``; with no flags the script
runs bytes+model using any stored measurements.
"""
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# flagship BibTeX shape (bench.py)
N_FEATURES, N_CLASSES = 1836, 159
N = (N_FEATURES + 1) * N_CLASSES          # 292,083
MEM, L = 10, 20
BS_SWEEP = (50, 100, 200, 400, 800)

# v5e interconnect model constants (public scaling-book numbers)
W_AXIS = 9e10          # bidirectional ICI bandwidth per torus axis, B/s
HOP_LATENCY = 1e-6     # per-hop ICI latency, s
GROUP = 8              # modeled ring size (one v5e tray axis)

SCALING_PATH = os.path.join(REPO, "SCALING.json")


def _allreduce_time(payload_bytes, group=GROUP, n_dependent=1):
    """Unoverlapped ring all-reduce time for one collective, times the
    number of *dependent* (serialized) collectives per step."""
    bw = 2 * payload_bytes * (group - 1) / group / W_AXIS
    lat = 2 * (group - 1) * HOP_LATENCY
    return n_dependent * (bw + lat)


def _load():
    with open(SCALING_PATH) as f:
        return json.load(f)


def _store(key, value):
    scaling = _load()
    scaling[key] = value
    with open(SCALING_PATH, "w") as f:
        json.dump(scaling, f, indent=1)


# --------------------------------------------------------------------------
def phase_bytes():
    """Per-device collective payload bytes per step, flagship shape."""
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stochqn_tpu.core.config import SQNConfig
    from stochqn_tpu.fused import FusedTrainer, _sqn_base, _sqn_boundary
    from stochqn_tpu.models import losses
    from stochqn_tpu.parallel import (collective_ops, make_mesh,
                                      shard_state)

    rng = np.random.default_rng(0)
    bs = 64     # divisible by the 8-way data axis; the collective payloads
    # ([n]-gradient / O(m^2) smalls) are independent of bs

    def build(mesh, p):
        # param-sharding needs n divisible by p: round the class count up
        # to 160 on the mixed mesh (n=293,920); payloads scale as n
        classes = N_CLASSES if p == 1 else 160
        n = (N_FEATURES + 1) * classes

        def grad_fn(x, batch):
            X, Y = batch
            return losses.multinomial_logistic_grad(x, X, Y, None, 1e-1)

        cfg = SQNConfig.create(mem_size=MEM, bfgs_upd_freq=L)
        tr = FusedTrainer("SQN", cfg, grad_fn)
        state = tr.init(jnp.asarray(
            rng.standard_normal(n).astype(np.float32)))
        # one committed round so the direction path compiles
        X = jnp.asarray(rng.standard_normal(
            (L, bs, N_FEATURES)).astype(np.float32))
        Y = jnp.asarray(np.eye(classes)[rng.integers(
            0, classes, (L, bs))].astype(np.float32))
        state, _ = tr.epoch(state, (X, Y), 0.01)
        state = shard_state(state, mesh)
        spec = jax.sharding.PartitionSpec("data", None)
        Xb = jax.device_put(X[0], jax.NamedSharding(mesh, spec))
        Yb = jax.device_put(Y[0], jax.NamedSharding(mesh, spec))
        return tr, state, (Xb, Yb)

    out = {}
    for name, (nd, np_) in (("dp_8x1", (8, 1)), ("mixed_4x2", (4, 2))):
        mesh = make_mesh(n_data=nd, n_param=np_)
        tr, state, batch = build(mesh, np_)
        fn = jax.jit(functools.partial(_sqn_base, tr.cfg, tr.grad_fn))
        hlo = fn.lower(state, batch, jnp.float32(0.01)).compile().as_text()
        step_ops = collective_ops(hlo)
        big = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a] * L, axis=0), batch)
        bfn = jax.jit(functools.partial(_sqn_boundary, tr.cfg, tr.grad_fn))
        bhlo = bfn.lower(state, big,
                         jnp.zeros((), bool)).compile().as_text()
        bops = collective_ops(bhlo)
        out[name] = {
            "per_step_bytes": sum(o.payload_bytes for o in step_ops),
            "per_step_ops": len(step_ops),
            "boundary_bytes": sum(o.payload_bytes for o in bops),
            "boundary_ops": len(bops),
        }
        print(name, out[name], flush=True)

    scaling = _load()
    roof = scaling.get("ici_roofline", {})
    roof["collective_bytes_flagship"] = {
        "note": ("per-DEVICE payload bytes parsed from compiled HLO "
                 "(shard shapes) at the flagship BibTeX shape, n=292,083, "
                 "m=10, L=20, bs=50/device; boundary amortizes over L"),
        **out,
    }
    _store("ici_roofline", roof)
    return out


# --------------------------------------------------------------------------
def phase_measure():
    """Single-chip per-step time vs per-device batch size (real TPU)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from stochqn_tpu.core.config import SQNConfig
    from stochqn_tpu.fused import FusedTrainer
    from stochqn_tpu.models import losses

    def grad_fn(x, batch):
        X, Y = batch
        return losses.multinomial_logistic_grad(x, X, Y, None, 1e-1)

    rng = np.random.default_rng(1)
    times = {}
    for bs in BS_SWEEP:
        B = 2 * L                       # 2 rounds per epoch
        X = jnp.asarray(rng.standard_normal(
            (B, bs, N_FEATURES)).astype(np.float32))
        Y = jnp.asarray(np.eye(N_CLASSES)[rng.integers(
            0, N_CLASSES, (B, bs))].astype(np.float32))
        x0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        tr = FusedTrainer("SQN",
                          SQNConfig.create(mem_size=MEM, bfgs_upd_freq=L),
                          grad_fn, donate=True)
        state = tr.init(x0)
        ep = tr.jit_epoch()
        state, _ = ep(state, (X, Y), jnp.float32(0.01), aligned=True)
        float(jnp.sum(state.x))          # D2H barrier

        # marginal per-step cost from DIFFERENCING two chain lengths
        # (BENCH_NOTES methodology rule 3): the tunnel charges a fixed
        # ~10-40 ms per rep that would otherwise swamp the step cost
        def timed(nep):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(nep):
                state, _ = ep(state, (X, Y), jnp.float32(0.01),
                              aligned=True)
            float(jnp.sum(state.x))
            return time.perf_counter() - t0

        e1, e2 = 3, 12
        reps = [(timed(e1), timed(e2)) for _ in range(5)]
        med1 = sorted(r[0] for r in reps)[2]
        med2 = sorted(r[1] for r in reps)[2]
        us = (med2 - med1) / ((e2 - e1) * B) * 1e6
        times[str(bs)] = round(us, 1)
        print(f"bs={bs:4d}: {us:8.1f} us/step (marginal)", flush=True)

    scaling = _load()
    roof = scaling.get("ici_roofline", {})
    roof["measured_step_time_us"] = {
        "note": ("single-chip fused SQN per-step time at the flagship "
                 "shape vs per-device batch size (median of 5 chained "
                 "reps, D2H barrier) — the weak-scaling per-device "
                 "workload axis"),
        "device": jax.devices()[0].device_kind,
        **times,
    }
    _store("ici_roofline", roof)
    return times


# --------------------------------------------------------------------------
def phase_model():
    """Combine bytes + measured times into the efficiency table."""
    scaling = _load()
    roof = scaling.get("ici_roofline", {})
    bytes_rec = roof.get("collective_bytes_flagship")
    times = roof.get("measured_step_time_us")
    if not bytes_rec or not times:
        print("need --bytes and --measure first", file=sys.stderr)
        return

    # DP: one gradient all-reduce per step (payload == measured bytes),
    # plus the boundary's jvp reduction amortized over L.
    dp = bytes_rec["dp_8x1"]
    t_ici = (_allreduce_time(dp["per_step_bytes"])
             + _allreduce_time(dp["boundary_bytes"], n_dependent=1) / L)

    # Measured overlap evidence (benchmarks/overlap_ablation.py): the
    # 2-process cluster-vs-ablated differencing gives the fraction of the
    # raw collective cost that stays EXPOSED after the runtime overlaps /
    # pipelines it.  On that harness the raw localhost all-reduce is
    # ~20 ms core-pinned while the exposed cost at depth 36 is ~58 ms/step
    # across an L=4 window with 2 collectives... the transferable number
    # is the efficiency itself, not the absolute cost; the model below
    # therefore reports BOTH bounds and lets the measured cells locate
    # reality between them.
    overlap = scaling.get("overlap_ablation", {})
    measured_eff = {
        k: v.get("weak_scaling_eff_median")
        for k, v in overlap.items() if isinstance(v, dict) and "pairs" in v
    } or None

    table = {}
    for bs, us in times.items():
        if bs == "note" or bs == "device":
            continue
        t = float(us) * 1e-6
        eff = t / (t + t_ici)                 # unoverlapped floor
        eff_ceil = t / max(t, t_ici)          # perfect-overlap ceiling
        table[bs] = {"step_us": float(us),
                     "modeled_ici_us": round(t_ici * 1e6, 1),
                     "modeled_weak_scaling_eff": round(eff, 3),
                     "overlapped_ceiling_eff": round(eff_ceil, 3)}
    holds = [bs for bs, r in table.items()
             if r["modeled_weak_scaling_eff"] >= 0.9]
    # The >=0.9 target is a statement about workloads whose per-step
    # compute dominates the [n]-gradient reduction.  The flagship BibTeX
    # shape is an adversarial case (292k-param reduction vs a tiny
    # 1836x159 gradient matmul); the adaQN-MLP workload (BASELINE
    # config 4, measured 3.9 s / 30 epochs / 128 batches on this chip =
    # ~1,016 us/step at n=203,530) is the representative compute-bound
    # case.
    mlp_bytes = 203_530 * 4
    mlp_ici = _allreduce_time(mlp_bytes)
    mlp_t = 3.9 / (30 * 128)
    table_mlp = {"step_us": round(mlp_t * 1e6, 1),
                 "modeled_ici_us": round(mlp_ici * 1e6, 1),
                 "modeled_weak_scaling_eff": round(
                     mlp_t / (mlp_t + mlp_ici), 3)}
    roof["dp_efficiency_model"] = {
        "note": ("Bracketed model: modeled_weak_scaling_eff is the "
                 "UNOVERLAPPED floor eff = t_step/(t_step + T_ici); "
                 "overlapped_ceiling_eff = t_step/max(t_step, T_ici) is "
                 "the perfect-overlap bound.  T_ici = ring all-reduce of "
                 "the per-step collective payload on a v5e axis (W=9e10 "
                 "B/s bidi, 1 us/hop, ring of 8) + boundary/L.  Where "
                 "reality falls between the bounds is MEASURED on the "
                 "2-process cluster (SCALING.json['overlap_ablation']: "
                 "exposed_collective_us from same-runtime collective "
                 "ablation; the compute-dominated cell measures >=0.9)."),
        "per_device_batch": table,
        "target_0.9_holds_at_bs": holds,
        "adaqn_mlp_workload": table_mlp,
        "measured_overlap_eff_2proc": measured_eff,
    }

    # param-sharded: latency-bound small psums; per-device n sweep from
    # the measured large-n per-step times (linear in n — BENCH_NOTES).
    # 2 dependent small psums/step (projection -> expansion coupling).
    t_small = _allreduce_time(2048, n_dependent=2)
    # per-step time ~ linear fit through flagship (292k -> ~82 us) and
    # 16M (-> 7,145 us f32, measured round 3)
    per_n = (7144.5 - 82.0) / (16_000_000 - 292_083)
    n_sweep = {}
    for v in (250_000, 500_000, 1_000_000, 2_000_000, 4_000_000):
        t = (82.0 + per_n * (v - 292_083)) * 1e-6
        n_sweep[str(v)] = {
            "step_us": round(t * 1e6, 1),
            "modeled_ici_us": round(t_small * 1e6, 1),
            "modeled_weak_scaling_eff": round(t / (t + t_small), 3)}
    roof["param_sharded_efficiency_model"] = {
        "note": ("per-DEVICE parameter count sweep; T_ici = 2 dependent "
                 "O(m^2)-byte psums (latency-bound: 14 us/psum on a ring "
                 "of 8 at 1 us/hop); per-step time interpolated from "
                 "measured single-chip times (linear in n)"),
        "per_device_n": n_sweep,
    }
    _store("ici_roofline", roof)
    print(json.dumps(roof["dp_efficiency_model"], indent=1))
    print(json.dumps(roof["param_sharded_efficiency_model"], indent=1))


if __name__ == "__main__":
    if "--measure" in sys.argv:
        phase_measure()
    elif "--bytes" in sys.argv:
        phase_bytes()
    elif "--model" in sys.argv:
        phase_model()
    else:
        phase_bytes()
        phase_model()
