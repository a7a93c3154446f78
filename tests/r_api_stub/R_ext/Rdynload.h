/* Stub — see ../Rinternals.h in this directory. */
#ifndef STUB_RDYNLOAD_H
#define STUB_RDYNLOAD_H

#include "../Rinternals.h"

extern "C" {

typedef void* (*DL_FUNC)();

typedef struct {
  const char* name;
  DL_FUNC fun;
  int numArgs;
} R_CallMethodDef;

typedef struct {
  const char* name;
  DL_FUNC fun;
  int numArgs;
  void* types;
} R_CMethodDef;

typedef R_CMethodDef R_FortranMethodDef;
typedef R_CallMethodDef R_ExternalMethodDef;

typedef struct _DllInfo DllInfo;

int R_registerRoutines(DllInfo* info, const R_CMethodDef* croutines,
                       const R_CallMethodDef* callRoutines,
                       const R_FortranMethodDef* fortranRoutines,
                       const R_ExternalMethodDef* externalRoutines);
Rboolean R_useDynamicSymbols(DllInfo* info, Rboolean value);

}  // extern "C"

#endif /* STUB_RDYNLOAD_H */
