// R .Call bridge over the stochqn_tpu native C++17 core.
//
// TPU-native counterpart of the reference's R wrapper
// (/root/reference/src/Rwrapper.c:98-196): where the reference rebuilds a
// C struct of raw pointers into GC-owned R vectors on every call and
// mutates them in place, this shim owns the optimizer state in a C++
// object behind an external pointer with a GC finalizer, and every run
// call is functional on the R side — the updated iterate and the request
// buffer are returned as fresh numeric vectors.  That matches the rest of
// this framework (state is an opaque, serializable machine; buffers the
// caller sees are immutable snapshots) and removes the reference's
// in-place SEXP mutation hazard (R/optimizers_free.R:423-427 eval.parent).
//
// The core itself is the same header the Python ctypes backend builds
// (native/include/stochqn_native.hpp, synced copy in this directory —
// kept identical by tests/test_r_package.py).
#define R_NO_REMAP
#include <R.h>
#include <Rinternals.h>
#include <R_ext/Rdynload.h>

#include <cstdio>
#include <cstring>
#include <exception>
#include <new>

#include "stochqn_native.hpp"

using stochqn_native::AdaQN;
using stochqn_native::OLBFGS;
using stochqn_native::Request;
using stochqn_native::SQN;
using stochqn_native::Task;

namespace {

// Tag stored in the externalptr's tag slot so run calls can verify the
// handle kind before casting (a user passing an SQN handle to
// C_adaqn_run must get an R error, not a type-punned crash).
enum class Kind : int { OLBFGS = 1, SQN = 2, ADAQN = 3 };

struct Handle {
  Kind kind;
  std::size_t n;
  void* opt;
};

template <class Opt>
void destroy(Handle* h) {
  delete static_cast<Opt*>(h->opt);
  delete h;
}

void finalizer(SEXP ptr) {
  Handle* h = static_cast<Handle*>(R_ExternalPtrAddr(ptr));
  if (!h) return;
  switch (h->kind) {
    case Kind::OLBFGS: destroy<OLBFGS<double>>(h); break;
    case Kind::SQN: destroy<SQN<double>>(h); break;
    case Kind::ADAQN: destroy<AdaQN<double>>(h); break;
  }
  R_ClearExternalPtr(ptr);
}

SEXP wrap_handle(Kind kind, std::size_t n, void* opt) {
  Handle* h = new (std::nothrow) Handle{kind, n, opt};
  if (!h) Rf_error("allocation failure");
  SEXP ptr = PROTECT(R_MakeExternalPtr(h, R_NilValue, R_NilValue));
  R_RegisterCFinalizerEx(ptr, finalizer, TRUE);
  UNPROTECT(1);
  return ptr;
}

Handle* unwrap(SEXP ptr, Kind expected) {
  if (TYPEOF(ptr) != EXTPTRSXP) Rf_error("not an optimizer handle");
  Handle* h = static_cast<Handle*>(R_ExternalPtrAddr(ptr));
  if (!h) Rf_error("optimizer handle already freed");
  if (h->kind != expected) Rf_error("optimizer handle is of the wrong kind");
  return h;
}

// Validate an R scalar as a size BEFORE the size_t cast: NA_INTEGER and
// negative values must become R errors, not huge allocations (the R layer
// validates too, but the registered .Call routines are directly callable).
std::size_t size_in(SEXP x, const char* what, int min_value) {
  const int v = Rf_asInteger(x);
  if (v == NA_INTEGER || v < min_value)
    Rf_error("'%s' must be an integer >= %d", what, min_value);
  return static_cast<std::size_t>(v);
}

// The cores' constructors allocate std::vectors; a std::bad_alloc (or any
// other exception) escaping into R's C call frame would terminate the
// process.  Translate to Rf_error instead — raised AFTER the catch block
// completes, so the longjmp does not cut exception teardown short.
template <class Opt, class... Args>
Opt* make_opt(Args&&... args) {
  char msg[256];
  try {
    return new Opt(static_cast<Args&&>(args)...);
  } catch (const std::exception& e) {
    std::snprintf(msg, sizeof msg, "optimizer construction failed: %s",
                  e.what());
  } catch (...) {
    std::snprintf(msg, sizeof msg, "optimizer construction failed");
  }
  Rf_error("%s", msg);
  return nullptr;  // unreachable (Rf_error does not return)
}

const double* real_in(SEXP x, std::size_t n, const char* what) {
  if (TYPEOF(x) != REALSXP) Rf_error("'%s' must be a numeric vector", what);
  if (static_cast<std::size_t>(Rf_xlength(x)) != n)
    Rf_error("'%s' has length %lld, expected %lld", what,
             (long long)Rf_xlength(x), (long long)n);
  return REAL(x);
}

// Build the run-call result: list(task, info, x_changed, iteration, x, req,
// req_vec).  `x_new` is the already-protected updated iterate; req/req_vec
// are copied out of the request (which may point into x_new or into the
// optimizer's internal pending-pair slot).
SEXP run_result(const Request<double>& r, std::size_t n, SEXP x_new,
                bool has_vec) {
  const char* names[] = {"task",      "info", "x_changed", "iteration",
                         "x",         "req",  "req_vec",   ""};
  SEXP out = PROTECT(Rf_mkNamed(VECSXP, names));
  SET_VECTOR_ELT(out, 0, Rf_ScalarInteger(static_cast<int>(r.task)));
  SET_VECTOR_ELT(out, 1, Rf_ScalarInteger(static_cast<int>(r.info)));
  SET_VECTOR_ELT(out, 2, Rf_ScalarLogical(r.x_changed ? 1 : 0));
  SET_VECTOR_ELT(out, 3, Rf_ScalarInteger(static_cast<int>(r.iteration)));
  SET_VECTOR_ELT(out, 4, x_new);
  SEXP req = PROTECT(Rf_allocVector(REALSXP, n));
  if (r.point)
    std::memcpy(REAL(req), r.point, n * sizeof(double));
  else
    std::memset(REAL(req), 0, n * sizeof(double));
  SET_VECTOR_ELT(out, 5, req);
  UNPROTECT(1);
  if (has_vec && r.vector) {
    SEXP rv = PROTECT(Rf_allocVector(REALSXP, n));
    std::memcpy(REAL(rv), r.vector, n * sizeof(double));
    SET_VECTOR_ELT(out, 6, rv);
    UNPROTECT(1);
  } else {
    SET_VECTOR_ELT(out, 6, R_NilValue);
  }
  UNPROTECT(1);
  return out;
}

}  // namespace

extern "C" {

// ---------------- create ----------------

SEXP C_olbfgs_create(SEXP n_, SEXP mem_size_, SEXP hess_init_,
                     SEXP min_curvature_, SEXP y_reg_, SEXP check_nan_) {
  const std::size_t n = size_in(n_, "n", 1);
  OLBFGS<double>::Options o;
  o.mem_size = size_in(mem_size_, "mem_size", 1);
  o.hess_init = Rf_asReal(hess_init_);
  o.min_curvature = Rf_asReal(min_curvature_);
  o.y_reg = Rf_asReal(y_reg_);
  o.check_nan = Rf_asLogical(check_nan_) != 0;
  OLBFGS<double>* opt = make_opt<OLBFGS<double>>(n, o);
  return wrap_handle(Kind::OLBFGS, n, opt);
}

SEXP C_sqn_create(SEXP n_, SEXP mem_size_, SEXP upd_freq_,
                  SEXP min_curvature_, SEXP y_reg_, SEXP use_grad_diff_,
                  SEXP check_nan_) {
  const std::size_t n = size_in(n_, "n", 1);
  SQN<double>::Options o;
  o.mem_size = size_in(mem_size_, "mem_size", 1);
  o.upd_freq = size_in(upd_freq_, "bfgs_upd_freq", 1);
  o.min_curvature = Rf_asReal(min_curvature_);
  o.y_reg = Rf_asReal(y_reg_);
  o.use_grad_diff = Rf_asLogical(use_grad_diff_) != 0;
  o.check_nan = Rf_asLogical(check_nan_) != 0;
  SQN<double>* opt = make_opt<SQN<double>>(n, o);
  return wrap_handle(Kind::SQN, n, opt);
}

SEXP C_adaqn_create(SEXP n_, SEXP mem_size_, SEXP fisher_size_,
                    SEXP upd_freq_, SEXP max_incr_, SEXP min_curvature_,
                    SEXP scal_reg_, SEXP rmsprop_weight_, SEXP y_reg_,
                    SEXP use_grad_diff_, SEXP check_nan_,
                    SEXP h0_exact_reference_) {
  const std::size_t n = size_in(n_, "n", 1);
  AdaQN<double>::Options o;
  o.mem_size = size_in(mem_size_, "mem_size", 1);
  o.fisher_size = size_in(fisher_size_, "fisher_size", 0);
  o.upd_freq = size_in(upd_freq_, "bfgs_upd_freq", 1);
  o.max_incr = Rf_asReal(max_incr_);
  o.min_curvature = Rf_asReal(min_curvature_);
  o.scal_reg = Rf_asReal(scal_reg_);
  o.rmsprop_weight = Rf_asReal(rmsprop_weight_);
  o.y_reg = Rf_asReal(y_reg_);
  o.use_grad_diff = Rf_asLogical(use_grad_diff_) != 0;
  o.check_nan = Rf_asLogical(check_nan_) != 0;
  o.h0_exact_reference = Rf_asLogical(h0_exact_reference_) != 0;
  if (!o.use_grad_diff && o.fisher_size == 0)
    Rf_error("'fisher_size' must be >= 1 unless use_grad_diff");
  AdaQN<double>* opt = make_opt<AdaQN<double>>(n, o);
  return wrap_handle(Kind::ADAQN, n, opt);
}

// ---------------- run ----------------

SEXP C_olbfgs_run(SEXP ptr, SEXP x_, SEXP grad_, SEXP step_) {
  Handle* h = unwrap(ptr, Kind::OLBFGS);
  const std::size_t n = h->n;
  real_in(x_, n, "x");
  const double* grad = real_in(grad_, n, "gradient");
  SEXP x_new = PROTECT(Rf_duplicate(x_));
  Request<double> r = static_cast<OLBFGS<double>*>(h->opt)->run(
      Rf_asReal(step_), REAL(x_new), grad);
  SEXP out = run_result(r, n, x_new, false);
  UNPROTECT(1);
  return out;
}

SEXP C_sqn_run(SEXP ptr, SEXP x_, SEXP grad_, SEXP hess_vec_, SEXP step_) {
  Handle* h = unwrap(ptr, Kind::SQN);
  const std::size_t n = h->n;
  real_in(x_, n, "x");
  const double* grad = real_in(grad_, n, "gradient");
  const double* hv = Rf_isNull(hess_vec_)
                         ? nullptr
                         : real_in(hess_vec_, n, "hess_vec");
  SEXP x_new = PROTECT(Rf_duplicate(x_));
  Request<double> r = static_cast<SQN<double>*>(h->opt)->run(
      Rf_asReal(step_), REAL(x_new), grad, hv);
  SEXP out = run_result(r, n, x_new, true);
  UNPROTECT(1);
  return out;
}

SEXP C_adaqn_run(SEXP ptr, SEXP x_, SEXP grad_, SEXP f_, SEXP step_) {
  Handle* h = unwrap(ptr, Kind::ADAQN);
  const std::size_t n = h->n;
  real_in(x_, n, "x");
  const double* grad = real_in(grad_, n, "gradient");
  SEXP x_new = PROTECT(Rf_duplicate(x_));
  Request<double> r = static_cast<AdaQN<double>*>(h->opt)->run(
      Rf_asReal(step_), REAL(x_new), grad, Rf_asReal(f_));
  SEXP out = run_result(r, n, x_new, false);
  UNPROTECT(1);
  return out;
}

// ---------------- introspection ----------------

SEXP C_optimizer_n(SEXP ptr) {
  if (TYPEOF(ptr) != EXTPTRSXP) Rf_error("not an optimizer handle");
  Handle* h = static_cast<Handle*>(R_ExternalPtrAddr(ptr));
  if (!h) Rf_error("optimizer handle already freed");
  return Rf_ScalarInteger(static_cast<int>(h->n));
}

SEXP C_optimizer_niter(SEXP ptr) {
  if (TYPEOF(ptr) != EXTPTRSXP) Rf_error("not an optimizer handle");
  Handle* h = static_cast<Handle*>(R_ExternalPtrAddr(ptr));
  if (!h) Rf_error("optimizer handle already freed");
  long it = 0;
  switch (h->kind) {
    case Kind::OLBFGS:
      it = static_cast<OLBFGS<double>*>(h->opt)->iterations();
      break;
    case Kind::SQN:
      it = static_cast<SQN<double>*>(h->opt)->iterations();
      break;
    case Kind::ADAQN:
      it = static_cast<AdaQN<double>*>(h->opt)->iterations();
      break;
  }
  return Rf_ScalarInteger(static_cast<int>(it));
}

// ---------------- registration ----------------

static const R_CallMethodDef CallEntries[] = {
    {"C_olbfgs_create", (DL_FUNC)&C_olbfgs_create, 6},
    {"C_sqn_create", (DL_FUNC)&C_sqn_create, 7},
    {"C_adaqn_create", (DL_FUNC)&C_adaqn_create, 12},
    {"C_olbfgs_run", (DL_FUNC)&C_olbfgs_run, 4},
    {"C_sqn_run", (DL_FUNC)&C_sqn_run, 5},
    {"C_adaqn_run", (DL_FUNC)&C_adaqn_run, 5},
    {"C_optimizer_n", (DL_FUNC)&C_optimizer_n, 1},
    {"C_optimizer_niter", (DL_FUNC)&C_optimizer_niter, 1},
    {NULL, NULL, 0}};

void R_init_stochqn_tpu(DllInfo* dll) {
  R_registerRoutines(dll, NULL, CallEntries, NULL, NULL);
  R_useDynamicSymbols(dll, FALSE);
}

}  // extern "C"
