// Runnable mini-implementation of the Rinternals subset rwrapper.cpp uses.
//
// The compile-only stub headers in this directory catch type errors; this
// shim goes further and EXECUTES the R bridge without an R interpreter:
// real REALSXP vectors, VECSXP lists with names, externalptr handles with
// finalizers, a protect-stack balance check, and Rf_error unwinding
// (exception-based where real R longjmps — rwrapper.cpp is exception-safe
// C++ so the semantics match: Rf_error never returns to the caller).
//
// Compiled together with r/stochqn.tpu/src/rwrapper.cpp into one shared
// library by tests/test_r_shim.py, which then drives the registered .Call
// routines through ctypes and matches their trajectories against the
// Python native backend — the executable counterpart of the run_tests.R
// scenarios that need a real R (reference surface under test:
// /root/reference/src/Rwrapper.c:98-196).
#include "Rinternals.h"
#include "R_ext/Rdynload.h"

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct RError {
  std::string msg;
};

}  // namespace

// One SEXPREC type covers every SEXPTYPE the wrapper touches.
struct SEXPREC {
  SEXPTYPE type = NILSXP;
  std::vector<double> real;       // REALSXP
  std::vector<int> ints;          // INTSXP / LGLSXP
  std::vector<SEXP> list;         // VECSXP
  std::vector<std::string> names; // VECSXP names attribute
  void* ext_addr = nullptr;       // EXTPTRSXP
  R_CFinalizer_t ext_fin = nullptr;
};

namespace {

// Arena: SEXPs live until process exit (the driver is a short test run;
// real-R GC is emulated only where it matters — explicit finalization of
// externalptrs via shim_gc_finalize).
std::vector<SEXPREC*>& arena() {
  static std::vector<SEXPREC*> a;
  return a;
}

SEXP alloc_sexp(SEXPTYPE t) {
  SEXPREC* s = new SEXPREC();
  s->type = t;
  arena().push_back(s);
  return s;
}

long g_protect_depth = 0;

struct Routine {
  DL_FUNC fun;
  int num_args;
};
std::map<std::string, Routine> g_routines;

}  // namespace

extern "C" {

SEXP R_NilValue = nullptr;

static SEXP nil() {
  if (!R_NilValue) R_NilValue = alloc_sexp(NILSXP);
  return R_NilValue;
}

int TYPEOF(SEXP x) { return x ? static_cast<int>(x->type) : NILSXP; }

R_xlen_t Rf_xlength(SEXP x) {
  if (!x) return 0;
  switch (x->type) {
    case REALSXP: return static_cast<R_xlen_t>(x->real.size());
    case INTSXP:
    case LGLSXP: return static_cast<R_xlen_t>(x->ints.size());
    case VECSXP: return static_cast<R_xlen_t>(x->list.size());
    default: return 0;
  }
}

double* REAL(SEXP x) {
  if (!x || x->type != REALSXP) throw RError{"REAL() on a non-numeric"};
  return x->real.data();
}

int* INTEGER(SEXP x) {
  if (!x || x->type != INTSXP) throw RError{"INTEGER() on a non-integer"};
  return x->ints.data();
}

int* LOGICAL(SEXP x) {
  if (!x || x->type != LGLSXP) throw RError{"LOGICAL() on a non-logical"};
  return x->ints.data();
}

void Rf_error(const char* fmt, ...) {
  char buf[512];
  va_list ap;
  va_start(ap, fmt);
  std::vsnprintf(buf, sizeof buf, fmt, ap);
  va_end(ap);
  throw RError{buf};
}

SEXP Rf_allocVector(SEXPTYPE type, R_xlen_t n) {
  SEXP s = alloc_sexp(type);
  switch (type) {
    case REALSXP: s->real.assign(static_cast<size_t>(n), 0.0); break;
    case INTSXP:
    case LGLSXP: s->ints.assign(static_cast<size_t>(n), 0); break;
    case VECSXP: s->list.assign(static_cast<size_t>(n), nil()); break;
    default: throw RError{"Rf_allocVector: unsupported SEXPTYPE"};
  }
  return s;
}

SEXP Rf_duplicate(SEXP x) {
  if (!x || x->type == NILSXP) return nil();
  SEXP s = alloc_sexp(x->type);
  s->real = x->real;
  s->ints = x->ints;
  s->list = x->list;
  s->names = x->names;
  return s;
}

SEXP Rf_mkNamed(SEXPTYPE type, const char** names) {
  if (type != VECSXP) throw RError{"Rf_mkNamed: only VECSXP supported"};
  size_t n = 0;
  while (names[n] && names[n][0] != '\0') ++n;
  SEXP s = Rf_allocVector(VECSXP, static_cast<R_xlen_t>(n));
  for (size_t i = 0; i < n; ++i) s->names.emplace_back(names[i]);
  return s;
}

SEXP SET_VECTOR_ELT(SEXP v, R_xlen_t i, SEXP value) {
  if (!v || v->type != VECSXP) throw RError{"SET_VECTOR_ELT on non-list"};
  if (i < 0 || static_cast<size_t>(i) >= v->list.size())
    throw RError{"SET_VECTOR_ELT index out of range"};
  v->list[static_cast<size_t>(i)] = value;
  return value;
}

SEXP VECTOR_ELT(SEXP v, R_xlen_t i) {
  if (!v || v->type != VECSXP) throw RError{"VECTOR_ELT on non-list"};
  if (i < 0 || static_cast<size_t>(i) >= v->list.size())
    throw RError{"VECTOR_ELT index out of range"};
  return v->list[static_cast<size_t>(i)];
}

SEXP Rf_protect(SEXP x) {
  ++g_protect_depth;
  return x;
}

void Rf_unprotect(int n) {
  g_protect_depth -= n;
  if (g_protect_depth < 0) throw RError{"protect stack underflow"};
}

SEXP Rf_ScalarInteger(int x) {
  SEXP s = Rf_allocVector(INTSXP, 1);
  s->ints[0] = x;
  return s;
}

SEXP Rf_ScalarLogical(int x) {
  SEXP s = Rf_allocVector(LGLSXP, 1);
  s->ints[0] = x;
  return s;
}

SEXP Rf_ScalarReal(double x) {
  SEXP s = Rf_allocVector(REALSXP, 1);
  s->real[0] = x;
  return s;
}

double Rf_asReal(SEXP x) {
  if (x && x->type == REALSXP && !x->real.empty()) return x->real[0];
  if (x && (x->type == INTSXP || x->type == LGLSXP) && !x->ints.empty())
    return static_cast<double>(x->ints[0]);
  throw RError{"Rf_asReal: not a scalar"};
}

int Rf_asInteger(SEXP x) {
  if (x && (x->type == INTSXP || x->type == LGLSXP) && !x->ints.empty())
    return x->ints[0];
  if (x && x->type == REALSXP && !x->real.empty()) {
    double v = x->real[0];
    if (v != v) return NA_INTEGER;  // NaN -> NA, like real coercion
    return static_cast<int>(v);
  }
  throw RError{"Rf_asInteger: not a scalar"};
}

int Rf_asLogical(SEXP x) { return Rf_asInteger(x); }

int Rf_isNull(SEXP x) { return (!x || x->type == NILSXP) ? 1 : 0; }

SEXP R_MakeExternalPtr(void* p, SEXP, SEXP) {
  SEXP s = alloc_sexp(EXTPTRSXP);
  s->ext_addr = p;
  return s;
}

void* R_ExternalPtrAddr(SEXP s) {
  if (!s || s->type != EXTPTRSXP) return nullptr;
  return s->ext_addr;
}

void R_ClearExternalPtr(SEXP s) {
  if (s && s->type == EXTPTRSXP) s->ext_addr = nullptr;
}

void R_RegisterCFinalizerEx(SEXP s, R_CFinalizer_t fin, Rboolean) {
  if (!s || s->type != EXTPTRSXP)
    throw RError{"finalizer on non-externalptr"};
  s->ext_fin = fin;
}

int R_registerRoutines(DllInfo*, const R_CMethodDef*,
                       const R_CallMethodDef* callRoutines,
                       const R_FortranMethodDef*,
                       const R_ExternalMethodDef*) {
  for (const R_CallMethodDef* e = callRoutines; e && e->name; ++e)
    g_routines[e->name] = Routine{e->fun, e->numArgs};
  return 0;
}

Rboolean R_useDynamicSymbols(DllInfo*, Rboolean value) { return value; }

// ---------------- driver API (consumed by tests/test_r_shim.py) ---------- //

void R_init_stochqn_tpu(DllInfo* dll);  // defined in rwrapper.cpp

void shim_init() { R_init_stochqn_tpu(nullptr); }

SEXP shim_alloc_real(const double* data, long n) {
  SEXP s = Rf_allocVector(REALSXP, n);
  if (data) std::memcpy(s->real.data(), data, sizeof(double) * n);
  return s;
}

SEXP shim_scalar_int(int v) { return Rf_ScalarInteger(v); }
SEXP shim_scalar_real(double v) { return Rf_ScalarReal(v); }
SEXP shim_scalar_lgl(int v) { return Rf_ScalarLogical(v); }
SEXP shim_null() { return nil(); }

int shim_typeof(SEXP s) { return TYPEOF(s); }
long shim_length(SEXP s) { return static_cast<long>(Rf_xlength(s)); }

const double* shim_real(SEXP s) {
  return (s && s->type == REALSXP) ? s->real.data() : nullptr;
}

int shim_int_elt(SEXP s, long i) {
  if (!s || (s->type != INTSXP && s->type != LGLSXP)) return NA_INTEGER;
  if (i < 0 || static_cast<size_t>(i) >= s->ints.size()) return NA_INTEGER;
  return s->ints[static_cast<size_t>(i)];
}

SEXP shim_list_elt(SEXP s, long i) {
  if (!s || s->type != VECSXP) return nullptr;
  if (i < 0 || static_cast<size_t>(i) >= s->list.size()) return nullptr;
  return s->list[static_cast<size_t>(i)];
}

const char* shim_list_name(SEXP s, long i) {
  if (!s || s->type != VECSXP) return "";
  if (i < 0 || static_cast<size_t>(i) >= s->names.size()) return "";
  return s->names[static_cast<size_t>(i)].c_str();
}

// Emulate a GC pass collecting this externalptr: run its finalizer (which
// frees the C++ optimizer and clears the pointer, so later use through a
// stale handle must raise "already freed", exactly as after a real R gc()).
void shim_gc_finalize(SEXP s) {
  if (s && s->type == EXTPTRSXP && s->ext_fin) {
    R_CFinalizer_t fin = s->ext_fin;
    s->ext_fin = nullptr;
    fin(s);
  }
}

long shim_protect_balance() { return g_protect_depth; }

// Invoke a registered .Call routine by name.  Returns the result SEXP, or
// NULL with `err` filled when the routine raised an R error (Rf_error).
// Verifies PROTECT/UNPROTECT balance on success — the same invariant
// R CMD check's "protect stack imbalance" warning enforces.
SEXP shim_call(const char* name, SEXP* args, int nargs, char* err,
               int errlen) {
  auto it = g_routines.find(name);
  if (it == g_routines.end()) {
    std::snprintf(err, errlen, "unregistered routine '%s'", name);
    return nullptr;
  }
  if (it->second.num_args != nargs) {
    std::snprintf(err, errlen, "'%s' takes %d args, got %d", name,
                  it->second.num_args, nargs);
    return nullptr;
  }
  const long depth0 = g_protect_depth;
  DL_FUNC f = it->second.fun;
  try {
    SEXP out;
    SEXP a[12] = {nullptr};
    for (int i = 0; i < nargs && i < 12; ++i) a[i] = args[i];
    switch (nargs) {
      case 1: out = ((SEXP(*)(SEXP))f)(a[0]); break;
      case 4: out = ((SEXP(*)(SEXP, SEXP, SEXP, SEXP))f)(
          a[0], a[1], a[2], a[3]); break;
      case 5: out = ((SEXP(*)(SEXP, SEXP, SEXP, SEXP, SEXP))f)(
          a[0], a[1], a[2], a[3], a[4]); break;
      case 6: out = ((SEXP(*)(SEXP, SEXP, SEXP, SEXP, SEXP, SEXP))f)(
          a[0], a[1], a[2], a[3], a[4], a[5]); break;
      case 7: out = ((SEXP(*)(SEXP, SEXP, SEXP, SEXP, SEXP, SEXP, SEXP))f)(
          a[0], a[1], a[2], a[3], a[4], a[5], a[6]); break;
      case 12: out = ((SEXP(*)(SEXP, SEXP, SEXP, SEXP, SEXP, SEXP, SEXP,
                               SEXP, SEXP, SEXP, SEXP, SEXP))f)(
          a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
          a[10], a[11]); break;
      default:
        std::snprintf(err, errlen, "unsupported arity %d", nargs);
        return nullptr;
    }
    if (g_protect_depth != depth0) {
      std::snprintf(err, errlen,
                    "protect stack imbalance in '%s': %+ld", name,
                    g_protect_depth - depth0);
      g_protect_depth = depth0;
      return nullptr;
    }
    return out;
  } catch (const RError& e) {
    // real R longjmps past the frame and resets the protect stack
    g_protect_depth = depth0;
    std::snprintf(err, errlen, "%s", e.msg.c_str());
    return nullptr;
  } catch (const std::exception& e) {
    g_protect_depth = depth0;
    std::snprintf(err, errlen, "unexpected C++ exception: %s", e.what());
    return nullptr;
  }
}

}  // extern "C"
