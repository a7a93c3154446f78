"""EXECUTE the R .Call bridge without an R interpreter.

``tests/r_api_stub/rshim.cpp`` implements the Rinternals subset
``r/stochqn.tpu/src/rwrapper.cpp`` uses (REALSXP vectors, named VECSXP
results, externalptr + finalizer, protect-stack accounting, Rf_error
unwinding); both are compiled into one shared library and the registered
``.Call`` routines are driven through ctypes.  This upgrades the R-bindings
assurance from "compiles against stub headers" to "the compiled wrapper
runs and its trajectories are call-by-call identical to the Python native
backend" — the executable counterpart of the run_tests.R scenarios
(reference surface: ``/root/reference/src/Rwrapper.c:98-196``; test battery
being mirrored: ``r/stochqn.tpu/tests/run_tests.R``).

Every successful call also re-verifies PROTECT/UNPROTECT balance (the
R CMD check "protect stack imbalance" invariant) inside shim_call.
"""
import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RPKG = os.path.join(REPO, "r", "stochqn.tpu")
STUB = os.path.join(REPO, "tests", "r_api_stub")

# native core Task/Info codes (native/include/stochqn_native.hpp:36-50)
CALC_GRAD = 101
CALC_GRAD_SAME_BATCH = 102
CALC_GRAD_BIG_BATCH = 103
CALC_HESS_VEC = 104
CALC_FUN_VAL_BATCH = 105
INFO_NAN_DIRECTION = 203


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++")
    lib_path = str(tmp_path_factory.mktemp("rshim") / "librshim.so")
    # The bit-identical trajectory assertions below require this build of
    # the core to round exactly like native_backend's (FMA contraction and
    # OpenMP reduction order are flag-dependent), so the numeric flags come
    # from the ONE source of truth rather than being restated here.
    from stochqn_tpu.native_backend import NUMERIC_FLAGS
    cmd = [gxx, *NUMERIC_FLAGS, "-std=c++17", "-shared", "-fPIC",
           f"-I{STUB}", f"-I{os.path.join(RPKG, 'src')}",
           os.path.join(RPKG, "src", "rwrapper.cpp"),
           os.path.join(STUB, "rshim.cpp"),
           "-o", lib_path]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    assert proc.returncode == 0, (
        "shim build failed:\n" + proc.stderr[-4000:])
    lib = ctypes.CDLL(lib_path)
    for name, restype, argtypes in [
        ("shim_init", None, []),
        ("shim_alloc_real", ctypes.c_void_p,
         [ctypes.POINTER(ctypes.c_double), ctypes.c_long]),
        ("shim_scalar_int", ctypes.c_void_p, [ctypes.c_int]),
        ("shim_scalar_real", ctypes.c_void_p, [ctypes.c_double]),
        ("shim_scalar_lgl", ctypes.c_void_p, [ctypes.c_int]),
        ("shim_null", ctypes.c_void_p, []),
        ("shim_typeof", ctypes.c_int, [ctypes.c_void_p]),
        ("shim_length", ctypes.c_long, [ctypes.c_void_p]),
        ("shim_real", ctypes.POINTER(ctypes.c_double), [ctypes.c_void_p]),
        ("shim_int_elt", ctypes.c_int, [ctypes.c_void_p, ctypes.c_long]),
        ("shim_list_elt", ctypes.c_void_p, [ctypes.c_void_p, ctypes.c_long]),
        ("shim_list_name", ctypes.c_char_p, [ctypes.c_void_p, ctypes.c_long]),
        ("shim_gc_finalize", None, [ctypes.c_void_p]),
        ("shim_protect_balance", ctypes.c_long, []),
        ("shim_call", ctypes.c_void_p,
         [ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
          ctypes.c_char_p, ctypes.c_int]),
    ]:
        f = getattr(lib, name)
        f.restype = restype
        f.argtypes = argtypes
    lib.shim_init()
    return _Shim(lib)


class RCallError(Exception):
    pass


class _Shim:
    """Thin pythonic veneer over the shim's C driver API."""

    def __init__(self, lib):
        self.lib = lib

    def real(self, arr):
        arr = np.ascontiguousarray(arr, np.float64)
        return self.lib.shim_alloc_real(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            arr.shape[0])

    def int_(self, v):
        return self.lib.shim_scalar_int(int(v))

    def num(self, v):
        return self.lib.shim_scalar_real(float(v))

    def lgl(self, v):
        return self.lib.shim_scalar_lgl(int(bool(v)))

    def null(self):
        return self.lib.shim_null()

    def call(self, name, *args):
        buf = ctypes.create_string_buffer(512)
        arr = (ctypes.c_void_p * max(len(args), 1))(*args)
        out = self.lib.shim_call(name.encode(), arr, len(args), buf, 512)
        if not out:
            raise RCallError(buf.value.decode())
        return out

    def to_numpy(self, sexp):
        n = self.lib.shim_length(sexp)
        ptr = self.lib.shim_real(sexp)
        assert ptr, "not a REALSXP"
        return np.ctypeslib.as_array(ptr, shape=(n,)).copy()

    def result_dict(self, res):
        """Unpack rwrapper's run result list by name."""
        out = {}
        for i in range(self.lib.shim_length(res)):
            name = self.lib.shim_list_name(res, i).decode()
            elt = self.lib.shim_list_elt(res, i)
            if name in ("task", "info", "iteration", "x_changed"):
                out[name] = self.lib.shim_int_elt(elt, 0)
            elif self.lib.shim_typeof(elt) == 0:       # NILSXP
                out[name] = None
            else:
                out[name] = self.to_numpy(elt)
        return out


def rosen_grad(x):
    return np.array([
        -400.0 * x[0] * (x[1] - x[0] ** 2) - 2.0 * (1.0 - x[0]),
        200.0 * (x[1] - x[0] ** 2)], np.float64)


def rosen_obj(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def _olbfgs_create(sh, mem_size=8, hess_init=0.0, min_curvature=1e-4,
                   y_reg=0.0, check_nan=True, n=2):
    return sh.call("C_olbfgs_create", sh.int_(n), sh.int_(mem_size),
                   sh.num(hess_init), sh.num(min_curvature), sh.num(y_reg),
                   sh.lgl(check_nan))


def test_olbfgs_descends_rosenbrock_and_matches_native(shim):
    """run_tests.R scenario 1, executed through the compiled .Call bridge,
    with every call's (task, info, x) matched bit-for-bit against the
    Python ctypes backend over the same C++ core."""
    from stochqn_tpu.native_backend import NativeOLBFGS, native_available
    if not native_available():
        pytest.skip("native backend unavailable")

    h = _olbfgs_create(shim)
    x = np.array([-1.2, 1.0])
    nat = NativeOLBFGS(mem_size=8, dtype=np.float64)
    nat.start(x)

    res = shim.result_dict(shim.call("C_olbfgs_run", h, shim.real(x),
                                     shim.real(np.zeros(2)), shim.num(1e-3)))
    t_nat, i_nat, _, req_nat, _ = nat.run(1e-3)
    assert (res["task"], res["info"]) == (t_nat, i_nat) == (CALC_GRAD, 200)

    f0 = rosen_obj(x)
    x_r = res["x"]
    for _ in range(400):
        g = rosen_grad(res["req"])
        res = shim.result_dict(shim.call(
            "C_olbfgs_run", h, shim.real(x_r), shim.real(g),
            shim.num(1e-3)))
        x_r = res["x"]

        nat.gradient[:] = rosen_grad(req_nat)
        t_nat, i_nat, _, req_nat, _ = nat.run(1e-3)
        np.testing.assert_array_equal(x_r, nat.x)
        assert res["task"] == t_nat and res["info"] == i_nat
        assert res["task"] in (CALC_GRAD, CALC_GRAD_SAME_BATCH)

    assert rosen_obj(x_r) < f0
    niter = shim.lib.shim_int_elt(
        shim.call("C_optimizer_niter", h), 0)
    assert niter == nat.niter > 100
    assert shim.lib.shim_protect_balance() == 0


def test_sqn_hess_vec_protocol_matches_native(shim):
    """run_tests.R scenario 2 (SQN with Hessian-vector requests)."""
    from stochqn_tpu.native_backend import NativeSQN, native_available
    if not native_available():
        pytest.skip("native backend unavailable")

    h = shim.call("C_sqn_create", shim.int_(2), shim.int_(5), shim.int_(5),
                  shim.num(1e-4), shim.num(0.0), shim.lgl(False),
                  shim.lgl(True))
    x = np.array([-1.2, 1.0])
    nat = NativeSQN(mem_size=5, upd_freq=5, dtype=np.float64)
    nat.start(x)

    res = shim.result_dict(shim.call(
        "C_sqn_run", h, shim.real(x), shim.real(np.zeros(2)),
        shim.null(), shim.num(1e-4)))
    t_nat, i_nat, _, req_nat, reqv_nat = nat.run(1e-4)
    assert res["task"] == t_nat == CALC_GRAD

    x_r, saw_hess_vec = res["x"], False
    grad = np.zeros(2)
    hv = None
    for _ in range(600):
        task = res["task"]
        if task in (CALC_GRAD, CALC_GRAD_BIG_BATCH):
            grad = rosen_grad(res["req"])
            hv = None
        elif task == CALC_HESS_VEC:
            saw_hess_vec = True
            eps = 1e-6
            p, v = res["req"], res["req_vec"]
            hv = (rosen_grad(p + eps * v) - rosen_grad(p)) / eps
        else:
            raise AssertionError(f"unexpected task {task}")
        res = shim.result_dict(shim.call(
            "C_sqn_run", h, shim.real(x_r), shim.real(grad),
            shim.null() if hv is None else shim.real(hv), shim.num(1e-4)))
        x_r = res["x"]

        nat.gradient[:] = grad
        if hv is not None:
            nat.hess_vec[:] = hv
        t_nat, i_nat, _, req_nat, reqv_nat = nat.run(1e-4)
        np.testing.assert_array_equal(x_r, nat.x)
        assert res["task"] == t_nat and res["info"] == i_nat

    assert saw_hess_vec
    assert rosen_obj(x_r) < rosen_obj(np.array([-1.2, 1.0]))
    assert shim.lib.shim_protect_balance() == 0


def test_adaqn_matches_native(shim):
    from stochqn_tpu.native_backend import NativeAdaQN, native_available
    if not native_available():
        pytest.skip("native backend unavailable")

    h = shim.call("C_adaqn_create", shim.int_(2), shim.int_(5), shim.int_(8),
                  shim.int_(4), shim.num(1.01), shim.num(1e-4),
                  shim.num(1e-4), shim.num(0.9), shim.num(0.0),
                  shim.lgl(False), shim.lgl(True), shim.lgl(True))
    x = np.array([-1.2, 1.0])
    nat = NativeAdaQN(mem_size=5, fisher_size=8, upd_freq=4, max_incr=1.01,
                      rmsprop_weight=0.9, dtype=np.float64)
    nat.start(x)

    res = shim.result_dict(shim.call(
        "C_adaqn_run", h, shim.real(x), shim.real(np.zeros(2)),
        shim.num(0.0), shim.num(1e-3)))
    nat.run(1e-3)
    x_r = res["x"]
    fval = 0.0
    for _ in range(200):
        task = res["task"]
        if task in (CALC_GRAD, CALC_GRAD_BIG_BATCH):
            grad = rosen_grad(res["req"])
        elif task == CALC_FUN_VAL_BATCH:
            grad = np.zeros(2)
            fval = rosen_obj(res["req"])
        else:
            raise AssertionError(f"unexpected task {task}")
        res = shim.result_dict(shim.call(
            "C_adaqn_run", h, shim.real(x_r), shim.real(grad),
            shim.num(fval), shim.num(1e-3)))
        x_r = res["x"]

        nat.gradient[:] = grad
        nat.f = fval
        t_nat, i_nat, _, _, _ = nat.run(1e-3)
        np.testing.assert_array_equal(x_r, nat.x)
        assert res["task"] == t_nat and res["info"] == i_nat
    assert shim.lib.shim_protect_balance() == 0


def test_nan_gradient_keeps_x(shim):
    """run_tests.R NaN scenario: search_direction_was_nan, x unchanged."""
    h = _olbfgs_create(shim, mem_size=10)
    x = np.array([1.0, 2.0])
    res = shim.result_dict(shim.call(
        "C_olbfgs_run", h, shim.real(x), shim.real(np.zeros(2)),
        shim.num(1e-3)))
    res = shim.result_dict(shim.call(
        "C_olbfgs_run", h, shim.real(res["x"]),
        shim.real(np.array([np.nan, 1.0])), shim.num(1e-3)))
    assert res["info"] == INFO_NAN_DIRECTION
    np.testing.assert_array_equal(res["x"], x)
    assert res["task"] == CALC_GRAD


def test_error_paths(shim):
    """run_tests.R error scenarios, at the .Call level."""
    # mem_size = 0 rejected before the size_t cast
    with pytest.raises(RCallError, match="mem_size"):
        _olbfgs_create(shim, mem_size=0)
    # NA n rejected (NaN numeric coerces to NA_INTEGER)
    with pytest.raises(RCallError, match="'n'"):
        shim.call("C_olbfgs_create", shim.num(float("nan")), shim.int_(8),
                  shim.num(0.0), shim.num(1e-4), shim.num(0.0),
                  shim.lgl(True))
    # wrong x length
    h = _olbfgs_create(shim, n=3)
    with pytest.raises(RCallError, match="length"):
        shim.call("C_olbfgs_run", h, shim.real(np.zeros(2)),
                  shim.real(np.zeros(3)), shim.num(1e-3))
    # wrong handle kind: an oLBFGS handle into C_sqn_run
    with pytest.raises(RCallError, match="wrong kind"):
        shim.call("C_sqn_run", h, shim.real(np.zeros(3)),
                  shim.real(np.zeros(3)), shim.null(), shim.num(1e-3))
    # not a handle at all
    with pytest.raises(RCallError, match="not an optimizer handle"):
        shim.call("C_olbfgs_run", shim.real(np.zeros(2)),
                  shim.real(np.zeros(3)), shim.real(np.zeros(3)),
                  shim.num(1e-3))
    # errors must reset the protect stack (longjmp semantics)
    assert shim.lib.shim_protect_balance() == 0


def test_finalizer_frees_and_stale_use_errors(shim):
    """GC finalization path: the externalptr's finalizer destroys the
    optimizer; use through the stale handle raises, not crashes."""
    h = _olbfgs_create(shim)
    # works before finalization
    shim.call("C_optimizer_n", h)
    shim.lib.shim_gc_finalize(h)
    with pytest.raises(RCallError, match="already freed"):
        shim.call("C_olbfgs_run", h, shim.real(np.zeros(2)),
                  shim.real(np.zeros(2)), shim.num(1e-3))
    with pytest.raises(RCallError, match="already freed"):
        shim.call("C_optimizer_niter", h)
