"""Config-sweep lockstep parity vs the compiled reference C core.

Widens ``test_reference_parity.py`` from single golden configs to a sweep
over memory sizes, update frequencies, H0 modes, y-regularization,
RMSProp weights and curvature gates: every config drives the reference
binary and this framework's free-mode API in lockstep on the same
quadratic and asserts identical task sequences, info codes and iterate
trajectories.

Configs with ``min_curvature > 0`` stop comparing at the first curvature
rejection: the reference's rollback path then copies its *uninitialized*
backup buffers into the live pair slot (inverted backup/rollback,
``src/stochqn.c:589-604``), making its subsequent trajectory
nondeterministic garbage that this framework deliberately does not
reproduce.  Up to that point — including the rejecting step's info code —
behavior must match exactly.
"""
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
    build_dir = tempfile.mkdtemp(prefix="stochqn_fuzz_")
    return mod.bind_reference(ctypes.CDLL(mod.compile_reference(build_dir)))


TASKS = {101: "calc_grad", 102: "calc_grad_same_batch",
         103: "calc_grad_big_batch", 104: "calc_hess_vec",
         105: "calc_fun_val_batch"}
INFOS = {200: "no_problems_encountered", 201: "func_increased",
         202: "curvature_too_small", 203: "search_direction_was_nan"}

_dp = ctypes.POINTER(ctypes.c_double)
_z = lambda v: 0.0 if v is None else float(v)


def _problem(seed, n, nb=9):
    rng = np.random.default_rng(seed)
    q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    a = q @ np.diag(rng.uniform(0.5, 4.0, n)) @ q.T
    centers = rng.standard_normal((nb, n))
    x0 = rng.standard_normal(n)
    return a, centers, x0


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


def _lockstep(reflib, ours, run_c, feed_c, x_c, x_j, task, info,
              a, centers, steps, eta, tag, rtol=1e-7, atol=1e-9):
    """Drive both sides ``steps`` protocol calls, asserting lockstep.

    ``feed_c(t_c, b)`` supplies the reference its requested value;
    returns early (False) at the first curvature rejection (see module
    docstring)."""
    req_j = ours.run_optimizer(x_j, eta)
    run_c()
    b = 0
    for it in range(steps):
        t_c = TASKS[task.value]
        assert req_j["task"] == t_c, f"{tag} step {it}"
        np.testing.assert_allclose(x_j, x_c, rtol=rtol, atol=atol,
                                   err_msg=f"{tag} step {it}")
        if t_c == "calc_grad":
            b += 1
        feed_c(t_c, b)
        rj = req_j
        if rj["task"] == "calc_fun_val_batch":
            ours.update_function(float(_eval(
                rj["task"], np.asarray(rj["requested_on"]), a, centers, b)))
        elif rj["task"] == "calc_hess_vec":
            on_j = rj["requested_on"]
            ours.update_hess_vec(_eval(
                rj["task"], np.asarray(on_j[0]), a, centers, b,
                vec=np.asarray(on_j[1])))
        else:
            ours.update_gradient(_eval(
                rj["task"], np.asarray(rj["requested_on"]), a, centers, b))
        run_c()
        req_j = ours.run_optimizer(x_j, eta)
        assert req_j["info"]["iteration_info"] == INFOS[info.value], \
            f"{tag} step {it}"
        if info.value == 202:       # curvature_too_small: reference now UB
            return it
    return steps


OLBFGS_CONFIGS = [
    # (mem_size, hess_init, min_curvature, y_reg, pairs_interleaved)
    (1, None, None, None, False),
    (3, None, 1e-4, None, False),
    (7, 0.5, None, None, False),
    (3, 1.5, 1e-4, 1e-2, False),
    (5, None, None, 1e-2, False),
    (2, 0.1, 1e-4, None, False),
    # interleaved [2m, n] layout: must stay in reference lockstep too
    # (f64 reduction-order deltas ~1e-15 << the 1e-7 tolerance)
    (3, None, 1e-4, None, True),
    (5, None, None, 1e-2, True),
]


@pytest.mark.parametrize("mem,h0,mc,yreg,ilv", OLBFGS_CONFIGS)
def test_fuzz_olbfgs(reflib, mem, h0, mc, yreg, ilv):
    n, steps, eta = 6, 60, 0.05
    a, centers, x0 = _problem(seed=100 + mem, n=n)
    from stochqn_tpu.free import oLBFGS_free
    ours = oLBFGS_free(mem_size=mem, hess_init=h0, min_curvature=mc,
                       y_reg=yreg, pairs_interleaved=ilv)
    x_j, x_c = x0.copy(), x0.copy()
    grad_c = np.zeros(n)
    reqp, task, info = _dp(), ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib.initialize_oLBFGS(n, mem, _z(h0), _z(yreg), _z(mc), 1, 1)

    def run_c():
        reflib.run_oLBFGS(eta, x_c.ctypes.data_as(_dp),
                          grad_c.ctypes.data_as(_dp), ctypes.byref(reqp),
                          ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        grad_c[:] = _eval(t_c, req_pt, a, centers, b)

    done = _lockstep(reflib, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta,
                     tag=f"oLBFGS{(mem, h0, mc, yreg)}")
    reflib.dealloc_oLBFGS(ws)
    assert done >= 10   # a rejection on the very first pairs would mean
    #                     the config never exercised the two-loop path


SQN_CONFIGS = [
    # (mem_size, upd_freq, use_grad_diff, min_curvature, y_reg, interleaved)
    (2, 2, False, None, None, False),
    (5, 3, False, 1e-4, None, False),
    (3, 7, False, None, 1e-2, False),
    (1, 4, False, 1e-4, None, False),
    (2, 2, True, None, None, False),
    (4, 3, True, 1e-4, 1e-2, False),
    (3, 5, True, None, None, False),
    (6, 10, True, None, None, False),
    # interleaved layout in reference lockstep (see OLBFGS_CONFIGS note)
    (5, 3, False, 1e-4, None, True),
    (4, 3, True, 1e-4, 1e-2, True),
]


@pytest.mark.parametrize("mem,L,ugd,mc,yreg,ilv", SQN_CONFIGS)
def test_fuzz_sqn(reflib, mem, L, ugd, mc, yreg, ilv):
    n, steps, eta = 6, 70, 0.05
    a, centers, x0 = _problem(seed=200 + mem * 10 + L, n=n)
    from stochqn_tpu.free import SQN_free
    ours = SQN_free(mem_size=mem, bfgs_upd_freq=L, min_curvature=mc,
                    y_reg=yreg, use_grad_diff=ugd, pairs_interleaved=ilv)
    x_j, x_c = x0.copy(), x0.copy()
    grad_c, hv_c = np.zeros(n), np.zeros(n)
    reqp, reqv = _dp(), _dp()
    task, info = ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib.initialize_SQN(n, mem, L, _z(mc), int(ugd), _z(yreg), 1, 1)

    def run_c():
        reflib.run_SQN(eta, x_c.ctypes.data_as(_dp),
                       grad_c.ctypes.data_as(_dp), hv_c.ctypes.data_as(_dp),
                       ctypes.byref(reqp), ctypes.byref(reqv),
                       ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        if t_c == "calc_hess_vec":
            vec_c = np.ctypeslib.as_array(reqv, shape=(n,)).copy()
            hv_c[:] = _eval(t_c, req_pt, a, centers, b, vec=vec_c)
        else:
            grad_c[:] = _eval(t_c, req_pt, a, centers, b)

    done = _lockstep(reflib, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta,
                     tag=f"SQN{(mem, L, ugd, mc, yreg)}")
    reflib.dealloc_SQN(ws)
    assert done >= 2 * L + 2


ADAQN_CONFIGS = [
    # (mem, fisher, L, max_incr, min_curv, scal_reg, rmsprop, ugd, y_reg)
    (2, 3, 3, None, None, 1e-4, None, False, None),
    (4, 10, 5, 1.01, None, 1e-4, None, False, None),
    (3, 5, 3, 1.01, None, 1e-4, 0.9, False, None),
    (2, 4, 4, None, None, 1e-2, 0.9, False, None),
    (3, 6, 3, 1.01, None, 1e-4, None, True, None),
    (4, 8, 5, None, None, 1e-4, 0.9, True, 1e-2),
    (2, 3, 2, 1.01, 1e-4, 1e-4, None, False, None),
    (3, 5, 5, 1.01, 1e-4, 1e-4, 0.9, True, None),
    # y_reg with the Fisher y-source: the reference regularizes only
    # grad-diff y's, so y_reg must be a no-op on this path
    (3, 5, 3, 1.01, None, 1e-4, None, False, 1e-2),
]


@pytest.mark.parametrize(
    "mem,fisher,L,mi,mc,sreg,rms,ugd,yreg", ADAQN_CONFIGS)
def test_fuzz_adaqn(reflib, mem, fisher, L, mi, mc, sreg, rms, ugd, yreg):
    n, steps, eta = 6, 80, 0.05
    a, centers, x0 = _problem(seed=300 + mem * 10 + fisher, n=n)
    from stochqn_tpu.free import adaQN_free
    ours = adaQN_free(mem_size=mem, fisher_size=fisher, bfgs_upd_freq=L,
                      max_incr=mi, min_curvature=mc, scal_reg=sreg,
                      rmsprop_weight=rms, y_reg=yreg, use_grad_diff=ugd)
    x_j, x_c = x0.copy(), x0.copy()
    grad_c = np.zeros(n)
    f_c = ctypes.c_double(0.0)
    reqp, task, info = _dp(), ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib.initialize_adaQN(n, mem, fisher, L, _z(mi), _z(mc), sreg,
                                 _z(rms), int(ugd), _z(yreg), 1, 1)

    def run_c():
        reflib.run_adaQN(eta, x_c.ctypes.data_as(_dp), f_c.value,
                         grad_c.ctypes.data_as(_dp), ctypes.byref(reqp),
                         ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        val = _eval(t_c, req_pt, a, centers, b)
        if t_c == "calc_fun_val_batch":
            f_c.value = float(val)
        else:
            grad_c[:] = val

    done = _lockstep(reflib, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta,
                     tag=f"adaQN{(mem, fisher, L, mi, mc, rms, ugd, yreg)}")
    reflib.dealloc_adaQN(ws)
    assert done >= L + 2


# ---------------------------------------------------------------------------
# float32: the reference's dual-precision build (-DUSE_FLOAT, reference
# setup.py:51-58) vs this framework's use_float=True path.  Trajectories
# drift by fp op order (XLA f32 vs scalar C f32), so tolerances are loose
# and runs short; task/info sequences must still match exactly.  Gates
# (min_curvature, max_incr) are off: in f32 they sit close enough to
# knife edges that op-order noise could legitimately flip them.
# ---------------------------------------------------------------------------
_fp = ctypes.POINTER(ctypes.c_float)
F32_RTOL, F32_ATOL = 2e-3, 1e-4


@pytest.fixture(scope="module")
def reflib32():
    spec = importlib.util.spec_from_file_location(
        "reference_baseline",
        os.path.join(REPO, "benchmarks", "reference_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    build_dir = tempfile.mkdtemp(prefix="stochqn_fuzz32_")
    return mod.bind_reference(
        ctypes.CDLL(mod.compile_reference(build_dir, precision="float")),
        precision="float")


def test_fuzz_olbfgs_float32(reflib32):
    n, steps, eta = 6, 40, 0.05
    a, centers, x0 = _problem(seed=400, n=n)
    from stochqn_tpu.free import oLBFGS_free
    ours = oLBFGS_free(mem_size=4, min_curvature=None, use_float=True)
    x_j = x0.astype(np.float32)
    x_c = x0.astype(np.float32)
    grad_c = np.zeros(n, np.float32)
    reqp, task, info = _fp(), ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib32.initialize_oLBFGS(n, 4, 0.0, 0.0, 0.0, 1, 1)

    def run_c():
        reflib32.run_oLBFGS(eta, x_c.ctypes.data_as(_fp),
                            grad_c.ctypes.data_as(_fp), ctypes.byref(reqp),
                            ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        grad_c[:] = _eval(t_c, req_pt.astype(np.float64), a, centers, b)

    done = _lockstep(reflib32, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta, tag="oLBFGS-f32",
                     rtol=F32_RTOL, atol=F32_ATOL)
    reflib32.dealloc_oLBFGS(ws)
    assert done == steps


@pytest.mark.parametrize("ugd", [False, True])
def test_fuzz_sqn_float32(reflib32, ugd):
    n, steps, eta, L = 6, 50, 0.05, 4
    a, centers, x0 = _problem(seed=410 + ugd, n=n)
    from stochqn_tpu.free import SQN_free
    ours = SQN_free(mem_size=3, bfgs_upd_freq=L, min_curvature=None,
                    use_grad_diff=ugd, use_float=True)
    x_j = x0.astype(np.float32)
    x_c = x0.astype(np.float32)
    grad_c, hv_c = np.zeros(n, np.float32), np.zeros(n, np.float32)
    reqp, reqv = _fp(), _fp()
    task, info = ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib32.initialize_SQN(n, 3, L, 0.0, int(ugd), 0.0, 1, 1)

    def run_c():
        reflib32.run_SQN(eta, x_c.ctypes.data_as(_fp),
                         grad_c.ctypes.data_as(_fp),
                         hv_c.ctypes.data_as(_fp),
                         ctypes.byref(reqp), ctypes.byref(reqv),
                         ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        if t_c == "calc_hess_vec":
            vec_c = np.ctypeslib.as_array(reqv, shape=(n,)).copy()
            hv_c[:] = _eval(t_c, req_pt.astype(np.float64), a, centers, b,
                            vec=vec_c.astype(np.float64))
        else:
            grad_c[:] = _eval(t_c, req_pt.astype(np.float64), a, centers, b)

    done = _lockstep(reflib32, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta, tag=f"SQN-f32(ugd={ugd})",
                     rtol=F32_RTOL, atol=F32_ATOL)
    reflib32.dealloc_SQN(ws)
    assert done == steps


def test_fuzz_adaqn_float32(reflib32):
    n, steps, eta, L = 6, 60, 0.05, 4
    a, centers, x0 = _problem(seed=420, n=n)
    from stochqn_tpu.free import adaQN_free
    ours = adaQN_free(mem_size=3, fisher_size=6, bfgs_upd_freq=L,
                      max_incr=None, min_curvature=None, use_float=True)
    x_j = x0.astype(np.float32)
    x_c = x0.astype(np.float32)
    grad_c = np.zeros(n, np.float32)
    f_c = ctypes.c_float(0.0)
    reqp, task, info = _fp(), ctypes.c_int(0), ctypes.c_int(0)
    ws = reflib32.initialize_adaQN(n, 3, 6, L, 0.0, 0.0, 1e-4, 0.0,
                                   0, 0.0, 1, 1)

    def run_c():
        reflib32.run_adaQN(eta, x_c.ctypes.data_as(_fp), f_c.value,
                           grad_c.ctypes.data_as(_fp), ctypes.byref(reqp),
                           ctypes.byref(task), ws, ctypes.byref(info))

    def feed_c(t_c, b):
        req_pt = np.ctypeslib.as_array(reqp, shape=(n,)).copy()
        val = _eval(t_c, req_pt.astype(np.float64), a, centers, b)
        if t_c == "calc_fun_val_batch":
            f_c.value = float(val)
        else:
            grad_c[:] = val

    done = _lockstep(reflib32, ours, run_c, feed_c, x_c, x_j, task, info,
                     a, centers, steps, eta, tag="adaQN-f32",
                     rtol=F32_RTOL, atol=F32_ATOL)
    reflib32.dealloc_adaQN(ws)
    assert done == steps
