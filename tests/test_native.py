"""Native C++ backend: trajectory parity with the NumPy oracle / JAX path."""
import shutil

import numpy as np
import pytest

from stochqn_tpu.free import SQN_free, adaQN_free, oLBFGS_free

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ compiler")

from stochqn_tpu.native_backend import native_available  # noqa: E402

if not native_available():  # pragma: no cover
    pytestmark = pytest.mark.skip(reason="native library failed to build")


def _quad(rng, n, nb=16):
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T
    centers = rng.standard_normal((nb, n))
    return a, centers


def _drive_pair(opt_a, opt_b, a, centers, x0, nsteps, step=0.05):
    """Run two free-mode optimizers in lockstep on the same problem."""
    xa, xb = x0.copy(), x0.copy()
    ra = opt_a.run_optimizer(xa, step)
    rb = opt_b.run_optimizer(xb, step)
    b = 0
    cmean = centers.mean(axis=0)
    for it in range(nsteps):
        assert ra["task"] == rb["task"], f"step {it}"
        assert (ra["info"]["iteration_info"]
                == rb["info"]["iteration_info"]), f"step {it}"
        np.testing.assert_allclose(xa, xb, rtol=1e-8, atol=1e-10,
                                   err_msg=f"step {it}")
        task = ra["task"]
        for opt, r in ((opt_a, ra), (opt_b, rb)):
            if task in ("calc_grad", "calc_grad_same_batch"):
                opt.update_gradient(
                    a @ (np.asarray(r["requested_on"]) - centers[b % 16]))
            elif task == "calc_grad_big_batch":
                opt.update_gradient(
                    a @ (np.asarray(r["requested_on"]) - cmean))
            elif task == "calc_hess_vec":
                opt.update_hess_vec(a @ np.asarray(r["requested_on"][1]))
            elif task == "calc_fun_val_batch":
                d = np.asarray(r["requested_on"]) - cmean
                opt.update_function(0.5 * d @ a @ d)
        if task == "calc_grad":
            b += 1
        ra = opt_a.run_optimizer(xa, step)
        rb = opt_b.run_optimizer(xb, step)


def test_native_olbfgs_matches_jax(rng):
    n = 10
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)
    _drive_pair(oLBFGS_free(mem_size=5, backend="native"),
                oLBFGS_free(mem_size=5),
                a, centers, x0, nsteps=120)


def test_native_sqn_matches_jax(rng):
    n = 10
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)
    _drive_pair(SQN_free(mem_size=4, bfgs_upd_freq=5, backend="native"),
                SQN_free(mem_size=4, bfgs_upd_freq=5),
                a, centers, x0, nsteps=140)


def test_native_sqn_grad_diff_matches_jax(rng):
    n = 9
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)
    _drive_pair(
        SQN_free(mem_size=4, bfgs_upd_freq=5, use_grad_diff=True,
                 backend="native"),
        SQN_free(mem_size=4, bfgs_upd_freq=5, use_grad_diff=True),
        a, centers, x0, nsteps=140)


def test_native_adaqn_matches_jax(rng):
    n = 10
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)
    _drive_pair(
        adaQN_free(mem_size=4, fisher_size=12, bfgs_upd_freq=5,
                   max_incr=1.01, backend="native"),
        adaQN_free(mem_size=4, fisher_size=12, bfgs_upd_freq=5,
                   max_incr=1.01),
        a, centers, x0, nsteps=150)


FUZZ_CONFIGS = [
    # mirrors tests/test_parity_fuzz.py sweeps (same n=6 shapes so the JAX
    # side's jit executables are shared via the persistent compile cache)
    (oLBFGS_free, dict(mem_size=1, min_curvature=None)),
    (oLBFGS_free, dict(mem_size=3, min_curvature=1e-4)),
    (oLBFGS_free, dict(mem_size=7, hess_init=0.5, min_curvature=None)),
    (oLBFGS_free, dict(mem_size=3, hess_init=1.5, min_curvature=1e-4,
                       y_reg=1e-2)),
    (SQN_free, dict(mem_size=2, bfgs_upd_freq=2, min_curvature=None)),
    (SQN_free, dict(mem_size=5, bfgs_upd_freq=3, min_curvature=1e-4)),
    (SQN_free, dict(mem_size=3, bfgs_upd_freq=7, min_curvature=None,
                    y_reg=1e-2)),
    (SQN_free, dict(mem_size=4, bfgs_upd_freq=3, use_grad_diff=True,
                    min_curvature=1e-4, y_reg=1e-2)),
    (SQN_free, dict(mem_size=6, bfgs_upd_freq=10, use_grad_diff=True,
                    min_curvature=None)),
    (adaQN_free, dict(mem_size=2, fisher_size=3, bfgs_upd_freq=3,
                      max_incr=None, min_curvature=None)),
    (adaQN_free, dict(mem_size=3, fisher_size=5, bfgs_upd_freq=3,
                      max_incr=1.01, rmsprop_weight=0.9,
                      min_curvature=None)),
    (adaQN_free, dict(mem_size=4, fisher_size=8, bfgs_upd_freq=5,
                      max_incr=None, rmsprop_weight=0.9, use_grad_diff=True,
                      y_reg=1e-2, min_curvature=None)),
    (adaQN_free, dict(mem_size=2, fisher_size=3, bfgs_upd_freq=2,
                      max_incr=1.01, min_curvature=1e-4)),
    # y_reg must be a no-op on the Fisher y path (reference applies it
    # to grad-diff y's only)
    (adaQN_free, dict(mem_size=3, fisher_size=5, bfgs_upd_freq=3,
                      max_incr=1.01, min_curvature=None, y_reg=1e-2)),
]


@pytest.mark.parametrize("cls,kw", FUZZ_CONFIGS,
                         ids=lambda v: getattr(v, "__name__", None))
def test_native_fuzz_matches_jax(rng, cls, kw):
    """Config-sweep lockstep: native C++ tier vs the JAX tier.

    Unlike the reference-C fuzz (test_parity_fuzz.py), curvature
    rejections are safe to drive through here: both tiers implement the
    gate without the reference's uninitialized backup/rollback, so the
    full trajectory must agree."""
    n = 6
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)
    _drive_pair(cls(backend="native", **kw), cls(**kw),
                a, centers, x0, nsteps=70)


def test_native_backend_validates_input_lengths(rng):
    """The native path must reject wrong-length evaluation inputs exactly
    like the JAX path (numpy would otherwise silently broadcast a
    size-1 gradient over all n entries)."""
    n = 6
    opt = oLBFGS_free(mem_size=3, backend="native")
    x = rng.standard_normal(n)
    opt.run_optimizer(x, 0.05)
    with pytest.raises(ValueError, match="expected 6"):
        opt.update_gradient([0.5])
    from stochqn_tpu.free import SQN_free
    opt2 = SQN_free(mem_size=3, bfgs_upd_freq=2, backend="native")
    opt2.run_optimizer(rng.standard_normal(n), 0.05)
    with pytest.raises(ValueError, match="expected 6"):
        opt2.update_hess_vec(np.zeros(3))


def test_native_adaqn_rejects_zero_fisher(rng):
    """fisher_size=0 without use_grad_diff must fail loudly (the C-side
    guard), not silently degrade to a 1-slot Fisher memory."""
    from stochqn_tpu.native_backend import NativeAdaQN
    opt = NativeAdaQN(fisher_size=0, use_grad_diff=False)
    with pytest.raises(ValueError):
        opt.start(np.zeros(4))
    # grad-diff mode never touches the Fisher memory: fisher_size=0 is fine
    opt2 = NativeAdaQN(fisher_size=0, use_grad_diff=True, max_incr=0.0)
    opt2.start(np.zeros(4))


def test_native_float32(rng):
    n = 8
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n).astype(np.float32)
    opt = oLBFGS_free(mem_size=4, use_float=True, backend="native")
    x = x0.copy()
    req = opt.run_optimizer(x, 0.05)
    for _ in range(40):
        opt.update_gradient(
            (a @ (np.asarray(req["requested_on"]) - centers[0])).astype(
                np.float32))
        req = opt.run_optimizer(x, 0.05)
    assert opt.niter == 20
    assert np.all(np.isfinite(x))


def test_native_cpp_example_builds_and_converges(tmp_path):
    """Compile and run the C++ Rosenbrock example (native/examples)."""
    import os
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = tmp_path / "rosen"
    subprocess.run(
        ["g++", "-O2", "-std=c++17",
         f"-I{repo}/native/include",
         f"{repo}/native/examples/rosen.cpp", "-o", str(exe)],
        check=True, capture_output=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "CONVERGED" in out.stdout


def test_native_c_example_builds_and_converges(tmp_path):
    """Compile the pure-C ABI consumer (native/examples/c_rosen.c, the
    counterpart of the reference's example/c_rosen.c) with a C compiler
    against the shared library the ctypes backend loads, and run it."""
    import os
    import subprocess

    from stochqn_tpu import native_backend

    lib = native_backend.library_path()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exe = tmp_path / "c_rosen"
    subprocess.run(
        ["cc", "-O2", "-std=c99",
         f"-I{repo}/native/include",
         f"{repo}/native/examples/c_rosen.c", str(lib), "-lm",
         "-o", str(exe)],
        check=True, capture_output=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "iterations" in out.stdout


def test_native_cmake_install_uninstall_and_pkgconfig(tmp_path):
    """The CMake last-mile (counterpart of the reference's
    CMakeLists.txt:89-107): configure + build + ctest (both examples),
    install to a prefix with a pkg-config file, uninstall removes
    everything."""
    import os
    import shutil
    import subprocess

    if shutil.which("cmake") is None:
        pytest.skip("no cmake")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build = tmp_path / "build"
    prefix = tmp_path / "prefix"
    run = lambda *cmd: subprocess.run(
        list(cmd), check=True, capture_output=True, text=True, cwd=repo)
    run("cmake", "-S", "native", "-B", str(build),
        f"-DCMAKE_INSTALL_PREFIX={prefix}")
    run("cmake", "--build", str(build), "--parallel", "2")
    subprocess.run(["ctest", "--output-on-failure"], check=True,
                   capture_output=True, cwd=build)
    run("cmake", "--build", str(build), "--target", "install")
    pc = prefix / "lib" / "pkgconfig" / "stochqn_native.pc"
    assert pc.exists()
    assert "-lstochqn_native" in pc.read_text()
    assert (prefix / "include" / "stochqn_native.h").exists()
    run("cmake", "--build", str(build), "--target", "uninstall")
    leftovers = [p for p in prefix.rglob("*") if p.is_file()]
    assert not leftovers, leftovers
