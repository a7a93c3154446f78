"""BASELINE config 2: free-mode Rosenbrock minimization via the request
loop (the reference's example/c_rosen.c workflow), with the known optimum
(1, 1) as ground truth."""
import numpy as np
import pytest

from stochqn_tpu.free import SQN_free, oLBFGS_free


def rosen_grad(x):
    g = np.zeros_like(x)
    g[:-1] = -400 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2 * (1 - x[:-1])
    g[1:] += 200 * (x[1:] - x[:-1] ** 2)
    return g


def rosen_hessvec(x, v, eps=1e-7):
    return (rosen_grad(x + eps * v) - rosen_grad(x - eps * v)) / (2 * eps)


@pytest.mark.parametrize("backend", ["jax", "native"])
def test_olbfgs_free_rosenbrock(backend):
    if backend == "native":
        pytest.importorskip("stochqn_tpu.native_backend")
        from stochqn_tpu.native_backend import native_available
        if not native_available():
            pytest.skip("native library unavailable")
    x = np.array([-1.2, 1.0])
    opt = oLBFGS_free(mem_size=7, backend=backend)
    req = opt.run_optimizer(x, 2.5e-3)
    for _ in range(40000):
        opt.update_gradient(rosen_grad(np.asarray(req["requested_on"])))
        req = opt.run_optimizer(x, 2.5e-3)
        if np.abs(rosen_grad(x)).max() < 1e-6:
            break
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)


def test_sqn_free_rosenbrock_hessvec():
    x = np.array([-1.2, 1.0])
    opt = SQN_free(mem_size=7, bfgs_upd_freq=4)
    req = opt.run_optimizer(x, 2.0e-3)
    for _ in range(40000):
        task = req["task"]
        if task in ("calc_grad", "calc_grad_big_batch"):
            opt.update_gradient(rosen_grad(np.asarray(req["requested_on"])))
        elif task == "calc_hess_vec":
            xr, vr = req["requested_on"]
            opt.update_hess_vec(rosen_hessvec(np.asarray(xr),
                                              np.asarray(vr)))
        req = opt.run_optimizer(x, 2.0e-3)
        if np.abs(rosen_grad(x)).max() < 1e-6:
            break
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)
