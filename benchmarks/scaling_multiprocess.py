"""Weak scaling across real PROCESSES (localhost jax.distributed cluster).

BASELINE.json's scaling target is stated for N >= 2 HOSTS.  Real multiple
hosts are not reachable here, so this harness runs N real *processes* on
one host (4 virtual CPU devices each, Gloo collectives over localhost) —
unlike the single-process virtual mesh (benchmarks/scaling.py), this
exercises the genuine multi-process path: per-process ingestion,
cross-process psums, global arrays.

Weak scaling: per-process batch rows fixed, global batch grows with N.
All N processes share one host's cores, so ideal iters/s is ~1/N of the
1-process number; compute-normalized efficiency N*ips(N)/ips(1) isolates
the distributed-runtime overhead (the quantity that transfers to real
multi-host hardware).

Run: python benchmarks/scaling_multiprocess.py
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B, BS_PER_PROC, N, L = 16, 16, 4096, 4
EPOCHS = 30


def worker(pid, nproc, port):
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                               "--xla_cpu_max_isa=AVX2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    from stochqn_tpu.core.config import SQNConfig
    from stochqn_tpu.fused import FusedTrainer
    from stochqn_tpu.parallel import distributed

    rng = np.random.default_rng(100 + pid)
    local = rng.standard_normal((B, BS_PER_PROC, N)).astype(np.float32)
    diag = jnp.asarray(np.random.default_rng(7).uniform(0.5, 2.0, N),
                       jnp.float32)

    def grad_fn(x, batch):
        return diag * (x - jnp.mean(batch, axis=0))

    trainer = FusedTrainer("SQN",
                           SQNConfig.create(mem_size=5, bfgs_upd_freq=L),
                           grad_fn)
    mesh = distributed.global_mesh()
    state = distributed.replicate_global(
        trainer.init(jnp.zeros(N, jnp.float32)), mesh)
    data = distributed.global_batches(local, mesh)

    epoch = jax.jit(trainer.epoch, static_argnames=("aligned",))
    state, _ = epoch(state, data, jnp.float32(0.05), aligned=True)
    float(jnp.sum(state.x))  # D2H barrier
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        state, _ = epoch(state, data, jnp.float32(0.05), aligned=True)
    float(jnp.sum(state.x))  # D2H barrier
    dt = time.perf_counter() - t0
    if pid == 0:
        print(json.dumps({"nproc": nproc,
                          "iters_per_s": round(EPOCHS * B / dt, 2)}),
              flush=True)


def run_config(nproc):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--worker", str(i), str(nproc), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(nproc)]
    out = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, out):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-2000:]}")
    line = [ln for ln in out[0].splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["iters_per_s"]


def main():
    results = {}
    ips1 = run_config(1)
    results["1"] = {"iters_per_s": ips1, "compute_normalized_efficiency": 1.0}
    print(f"1 process : {ips1:9.1f} iters/s", flush=True)
    for nproc in (2, 4):
        ips = run_config(nproc)
        eff = nproc * ips / ips1
        results[str(nproc)] = {"iters_per_s": ips,
                               "compute_normalized_efficiency": round(eff, 3)}
        print(f"{nproc} processes: {ips:9.1f} iters/s  "
              f"(normalized eff. {eff:.2f})", flush=True)
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as f:
        scaling = json.load(f)
    scaling["multiprocess_weak_scaling"] = {
        "note": ("N real processes (4 virtual CPU devices each, Gloo over "
                 "localhost) sharing ONE host's cores; ideal weak-scaling "
                 "iters/s ~ 1/N, normalized efficiency isolates the "
                 "distributed-runtime overhead"),
        **results,
    }
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
