/* Minimal stub of R's C API, used ONLY by tests/test_r_package.py to
 * compile-check r/stochqn.tpu/src/rwrapper.cpp in environments without an
 * R installation (this build image has none).  Signatures follow R-exts /
 * Rinternals.h for exactly the subset the wrapper uses; a successful
 * -fsyntax-only compile against these catches type errors and typos, not
 * ABI drift (the package still needs a real `R CMD INSTALL` elsewhere —
 * the Python test runs the full R battery when Rscript is on PATH). */
#ifndef STUB_RINTERNALS_H
#define STUB_RINTERNALS_H

#include <cstddef>

typedef struct SEXPREC* SEXP;
typedef std::ptrdiff_t R_xlen_t;
typedef unsigned int SEXPTYPE;
typedef enum { FALSE = 0, TRUE } Rboolean;

#define NILSXP 0
#define LGLSXP 10
#define INTSXP 13
#define REALSXP 14
#define STRSXP 16
#define VECSXP 19
#define EXTPTRSXP 22

/* R_ext/Arith.h: NA_INTEGER is INT_MIN */
#include <climits>
#define NA_INTEGER INT_MIN

extern "C" {

extern SEXP R_NilValue;

int TYPEOF(SEXP x);
R_xlen_t Rf_xlength(SEXP x);
double* REAL(SEXP x);
int* INTEGER(SEXP x);
int* LOGICAL(SEXP x);

void Rf_error(const char* fmt, ...);

SEXP Rf_allocVector(SEXPTYPE type, R_xlen_t n);
SEXP Rf_duplicate(SEXP x);
SEXP Rf_mkNamed(SEXPTYPE type, const char** names);
SEXP SET_VECTOR_ELT(SEXP v, R_xlen_t i, SEXP value);
SEXP VECTOR_ELT(SEXP v, R_xlen_t i);

SEXP Rf_protect(SEXP x);
void Rf_unprotect(int n);

SEXP Rf_ScalarInteger(int x);
SEXP Rf_ScalarLogical(int x);
SEXP Rf_ScalarReal(double x);
double Rf_asReal(SEXP x);
int Rf_asInteger(SEXP x);
int Rf_asLogical(SEXP x);
int Rf_isNull(SEXP x);

typedef void (*R_CFinalizer_t)(SEXP);
SEXP R_MakeExternalPtr(void* p, SEXP tag, SEXP prot);
void* R_ExternalPtrAddr(SEXP s);
void R_ClearExternalPtr(SEXP s);
void R_RegisterCFinalizerEx(SEXP s, R_CFinalizer_t fin, Rboolean onexit);

}  // extern "C"

#define PROTECT(s) Rf_protect(s)
#define UNPROTECT(n) Rf_unprotect(n)

#endif  /* STUB_RINTERNALS_H */
