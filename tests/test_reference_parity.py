"""Golden parity vs the ACTUAL reference C core.

Compiles the unmodified reference sources from ``/root/reference`` (skipped
when absent) and drives them through their public C ABI in lockstep with
this framework's free-mode optimizers on identical problems: task
sequences, info codes, and iterate trajectories must agree.

Problems are well-conditioned quadratics so no curvature rejection occurs
— the reference's rejection path hits its inverted backup/rollback bug
(``src/stochqn.c:589-604``) which this framework deliberately does not
reproduce.

Note: the reference relies on standard BLAS beta==0 semantics (y is
write-only) — ``update_y_fisher`` (``src/stochqn.c:936-952``) passes
uninitialized malloc'd buffers as gemv outputs.  The shim BLAS in
``benchmarks/reference_baseline.py`` must not read y when beta==0, or
NaN heap garbage nondeterministically poisons the reference's correction
pairs (this was a rare parity flake; reproducible deterministically with
``MALLOC_PERTURB_=255``, which fills freed memory with 0xFF bytes — a
NaN double bit-pattern)."""
import ctypes
import importlib.util
import os
import shutil
import tempfile

import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE) or shutil.which("gcc") is None,
    reason="reference checkout or gcc unavailable")


@pytest.fixture(scope="module")
def reflib():
    spec = importlib.util.spec_from_file_location(
        "reference_baseline",
        os.path.join(REPO, "benchmarks", "reference_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    build_dir = tempfile.mkdtemp(prefix="stochqn_parity_")
    return mod.bind_reference(ctypes.CDLL(mod.compile_reference(build_dir)))


TASKS = {101: "calc_grad", 102: "calc_grad_same_batch",
         103: "calc_grad_big_batch", 104: "calc_hess_vec",
         105: "calc_fun_val_batch"}
INFOS = {200: "no_problems_encountered", 201: "func_increased",
         202: "curvature_too_small", 203: "search_direction_was_nan"}

_dp = ctypes.POINTER(ctypes.c_double)


def _quad(rng, n, nb=12):
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T
    centers = rng.standard_normal((nb, n))
    return a, centers


def _eval(task, on, a, centers, b, vec=None):
    cmean = centers.mean(axis=0)
    if task in ("calc_grad", "calc_grad_same_batch"):
        return a @ (on - centers[b % len(centers)])
    if task == "calc_grad_big_batch":
        return a @ (on - cmean)
    if task == "calc_hess_vec":
        return a @ vec
    if task == "calc_fun_val_batch":
        d = on - cmean
        return 0.5 * d @ a @ d
    raise AssertionError(task)


def test_olbfgs_matches_reference_c(reflib, rng):
    n, steps, eta = 10, 150, 0.05
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)

    from stochqn_tpu.free import oLBFGS_free
    ours = oLBFGS_free(mem_size=5, min_curvature=1e-4)
    x_j = x0.copy()
    req_j = ours.run_optimizer(x_j, eta)

    ws = reflib.initialize_oLBFGS(n, 5, 0.0, 0.0, 1e-4, 1, 1)
    x_c = x0.copy()
    grad_c = np.zeros(n)
    reqp, task, info = _dp(), ctypes.c_int(0), ctypes.c_int(0)

    def run_c():
        reflib.run_oLBFGS(eta, x_c.ctypes.data_as(_dp),
                          grad_c.ctypes.data_as(_dp), ctypes.byref(reqp),
                          ctypes.byref(task), ws, ctypes.byref(info))

    run_c()
    b = 0
    for it in range(steps):
        t_c = TASKS[task.value]
        assert req_j["task"] == t_c, f"step {it}"
        np.testing.assert_allclose(x_j, x_c, rtol=1e-7, atol=1e-9,
                                   err_msg=f"step {it}")
        if t_c == "calc_grad":
            b += 1
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,))
        grad_c[:] = _eval(t_c, req_pt.copy(), a, centers, b)
        ours.update_gradient(
            _eval(req_j["task"], np.asarray(req_j["requested_on"]), a,
                  centers, b))
        run_c()
        req_j = ours.run_optimizer(x_j, eta)
        assert req_j["info"]["iteration_info"] == INFOS[info.value], \
            f"step {it}"
    reflib.dealloc_oLBFGS(ws)


@pytest.mark.parametrize("use_grad_diff", [False, True])
def test_sqn_matches_reference_c(reflib, rng, use_grad_diff):
    n, steps, eta, L = 8, 140, 0.05, 5
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)

    from stochqn_tpu.free import SQN_free
    ours = SQN_free(mem_size=4, bfgs_upd_freq=L,
                    use_grad_diff=use_grad_diff)
    x_j = x0.copy()
    req_j = ours.run_optimizer(x_j, eta)

    ws = reflib.initialize_SQN(n, 4, L, 1e-4, int(use_grad_diff), 0.0, 1, 1)
    x_c = x0.copy()
    grad_c = np.zeros(n)
    hv_c = np.zeros(n)
    reqp, reqv = _dp(), _dp()
    task, info = ctypes.c_int(0), ctypes.c_int(0)

    def run_c():
        reflib.run_SQN(eta, x_c.ctypes.data_as(_dp),
                       grad_c.ctypes.data_as(_dp), hv_c.ctypes.data_as(_dp),
                       ctypes.byref(reqp), ctypes.byref(reqv),
                       ctypes.byref(task), ws, ctypes.byref(info))

    run_c()
    b = 0
    for it in range(steps):
        t_c = TASKS[task.value]
        assert req_j["task"] == t_c, f"step {it}"
        np.testing.assert_allclose(x_j, x_c, rtol=1e-7, atol=1e-9,
                                   err_msg=f"step {it}")
        if t_c == "calc_grad":
            b += 1
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        if t_c == "calc_hess_vec":
            vec_c = np.ctypeslib.as_array(reqv, shape=(n,)).copy()
            hv_c[:] = _eval(t_c, req_pt, a, centers, b, vec=vec_c)
            on_j = req_j["requested_on"]
            ours.update_hess_vec(
                _eval(t_c, np.asarray(on_j[0]), a, centers, b,
                      vec=np.asarray(on_j[1])))
        else:
            grad_c[:] = _eval(t_c, req_pt, a, centers, b)
            ours.update_gradient(
                _eval(t_c, np.asarray(req_j["requested_on"]), a, centers, b))
        run_c()
        req_j = ours.run_optimizer(x_j, eta)
        assert req_j["info"]["iteration_info"] == INFOS[info.value], \
            f"step {it}"
    reflib.dealloc_SQN(ws)


@pytest.mark.parametrize("use_grad_diff,max_incr", [(False, 1.01),
                                                    (False, 0.0),
                                                    (True, 1.01)])
def test_adaqn_matches_reference_c(reflib, rng, use_grad_diff, max_incr):
    # min_curvature disabled: the Fisher-path curvature ||Fs||^2/(k||s||^2)
    # legitimately dips below 1e-4 as gradients shrink, and the reference's
    # rejection path then writes UNINITIALIZED heap memory into a live pair
    # (the inverted backup/rollback bug, src/stochqn.c:589-604) — making
    # its trajectory nondeterministic.  With the gate off neither side
    # enters that path and parity is exact.
    n, steps, eta, L = 8, 140, 0.05, 5
    a, centers = _quad(rng, n)
    x0 = rng.standard_normal(n)

    from stochqn_tpu.free import adaQN_free
    ours = adaQN_free(mem_size=4, fisher_size=10, bfgs_upd_freq=L,
                      max_incr=(max_incr if max_incr > 0 else None),
                      min_curvature=None,
                      use_grad_diff=use_grad_diff)
    x_j = x0.copy()
    req_j = ours.run_optimizer(x_j, eta)

    ws = reflib.initialize_adaQN(n, 4, 10, L, max_incr, 0.0, 1e-4, 0.0,
                                 int(use_grad_diff), 0.0, 1, 1)
    x_c = x0.copy()
    grad_c = np.zeros(n)
    f_c = ctypes.c_double(0.0)
    reqp, task, info = _dp(), ctypes.c_int(0), ctypes.c_int(0)

    def run_c():
        reflib.run_adaQN(eta, x_c.ctypes.data_as(_dp), f_c.value,
                         grad_c.ctypes.data_as(_dp),
                         ctypes.byref(reqp), ctypes.byref(task), ws,
                         ctypes.byref(info))

    run_c()
    b = 0
    for it in range(steps):
        t_c = TASKS[task.value]
        assert req_j["task"] == t_c, f"step {it}"
        np.testing.assert_allclose(x_j, x_c, rtol=1e-7, atol=1e-9,
                                   err_msg=f"step {it}")
        if t_c == "calc_grad":
            b += 1
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        val = _eval(t_c, req_pt, a, centers, b)
        val_j = _eval(t_c, np.asarray(req_j["requested_on"]), a, centers, b)
        if t_c == "calc_fun_val_batch":
            f_c.value = float(val)
            ours.update_function(float(val_j))
        else:
            grad_c[:] = val
            ours.update_gradient(val_j)
        run_c()
        req_j = ours.run_optimizer(x_j, eta)
        assert req_j["info"]["iteration_info"] == INFOS[info.value], \
            f"step {it}"
    reflib.dealloc_adaQN(ws)
