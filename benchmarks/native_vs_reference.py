"""Head-to-head CPU benchmark: our C++ native tier vs the reference C core.

Isolates optimizer-core cost by making the external evaluation trivial
(a precomputed gradient vector) at large n, and measures protocol calls/s
for oLBFGS (one pair commit + two-loop per iteration — the heaviest
per-call path).  Both engines run float64 through their C ABIs.

    python benchmarks/native_vs_reference.py
"""
import ctypes
import importlib.util
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 500_000
MEM = 10
CALLS = 400            # protocol calls (= 200 oLBFGS iterations)
STEP = 1e-4


def bench_reference():
    from benchmarks._util import load_reference_baseline
    mod = load_reference_baseline()
    lib = mod.bind_reference(ctypes.CDLL(mod.compile_reference(
        tempfile.mkdtemp(prefix="nvr_"))))
    dp = ctypes.POINTER(ctypes.c_double)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(N)
    grads = rng.standard_normal((8, N))  # rotate a few precomputed grads
    grad = np.zeros(N)
    # min_curvature=0: the curvature gate must stay off — random
    # gradients trigger rejections, where the reference corrupts its
    # memory with uninitialized data (nondeterministic work)
    ws = lib.initialize_oLBFGS(N, MEM, 0.0, 0.0, 0.0, 1, 4)
    req, task, info = dp(), ctypes.c_int(0), ctypes.c_int(0)

    def run():
        lib.run_oLBFGS(STEP, x.ctypes.data_as(dp), grad.ctypes.data_as(dp),
                       ctypes.byref(req), ctypes.byref(task), ws,
                       ctypes.byref(info))

    run()
    t0 = time.perf_counter()
    for i in range(CALLS):
        grad[:] = grads[i % 8]
        run()
    return CALLS / (time.perf_counter() - t0)


def bench_native():
    from stochqn_tpu.native_backend import NativeOLBFGS
    rng = np.random.default_rng(0)
    opt = NativeOLBFGS(mem_size=MEM, min_curvature=0.0, dtype=np.float64)
    opt.start(rng.standard_normal(N))
    grads = rng.standard_normal((8, N))
    opt.run(STEP)
    t0 = time.perf_counter()
    for i in range(CALLS):
        opt.gradient[:] = grads[i % 8]
        opt.run(STEP)
    return CALLS / (time.perf_counter() - t0)


def main():
    ref = bench_reference()
    ours = bench_native()
    print(json.dumps({
        "n": N, "mem_size": MEM,
        "reference_c_calls_per_s": round(ref, 1),
        "stochqn_tpu_native_cpp_calls_per_s": round(ours, 1),
        "ratio": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
