/* Pure-C interface to the stochqn_native core (see stochqn_native.hpp for
 * the implementation and the C++ RAII classes).  The ABI is what
 * libstochqn_native.so exports and what the Python ctypes backend
 * (stochqn_tpu/native_backend.py) and the R package bind to; this header
 * makes it consumable from plain C (counterpart of the reference's
 * include/stochqn.h C API, /root/reference/include/stochqn.h:227-383).
 *
 * Conventions:
 *   - create functions return an opaque handle, or NULL on invalid
 *     arguments / allocation failure;
 *   - run functions return the next task code, write the evaluation point
 *     into req_out (and req_vec_out for SQN's Hessian-vector requests),
 *     and update x in place;
 *   - `n` must equal the n the optimizer was created with (validated:
 *     mismatch returns SQN_NATIVE_TASK_INVALID_INPUT and touches nothing);
 *   - _f64 / _f32 suffixes select the precision (the reference's
 *     USE_DOUBLE / USE_FLOAT builds, from one template here).
 */
#ifndef STOCHQN_NATIVE_H_
#define STOCHQN_NATIVE_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* task codes (== the reference's task_enum, include/stochqn.h:268-275) */
#define SQN_NATIVE_TASK_INVALID_INPUT 100
#define SQN_NATIVE_TASK_CALC_GRAD 101
#define SQN_NATIVE_TASK_CALC_GRAD_SAME_BATCH 102
#define SQN_NATIVE_TASK_CALC_GRAD_BIG_BATCH 103
#define SQN_NATIVE_TASK_CALC_HESS_VEC 104
#define SQN_NATIVE_TASK_CALC_FUN_VAL_BATCH 105

/* info codes (== the reference's info_enum, include/stochqn.h:279-284) */
#define SQN_NATIVE_INFO_NO_PROBLEMS 200
#define SQN_NATIVE_INFO_FUNC_INCREASED 201
#define SQN_NATIVE_INFO_CURVATURE_TOO_SMALL 202
#define SQN_NATIVE_INFO_SEARCH_DIRECTION_WAS_NAN 203

/* ---------------- oLBFGS ---------------- */
void* sqn_native_olbfgs_create_f64(size_t n, size_t mem_size,
                                   double hess_init, double min_curvature,
                                   double y_reg, int check_nan);
void* sqn_native_olbfgs_create_f32(size_t n, size_t mem_size,
                                   float hess_init, float min_curvature,
                                   float y_reg, int check_nan);
void sqn_native_olbfgs_destroy_f64(void* h);
void sqn_native_olbfgs_destroy_f32(void* h);
int sqn_native_olbfgs_run_f64(void* h, size_t n, double step, double* x,
                              const double* grad, double* req_out,
                              int* info, int* x_changed, long* iteration);
int sqn_native_olbfgs_run_f32(void* h, size_t n, float step, float* x,
                              const float* grad, float* req_out,
                              int* info, int* x_changed, long* iteration);

/* ---------------- SQN ---------------- */
void* sqn_native_sqn_create_f64(size_t n, size_t mem_size, size_t upd_freq,
                                double min_curvature, double y_reg,
                                int use_grad_diff, int check_nan);
void* sqn_native_sqn_create_f32(size_t n, size_t mem_size, size_t upd_freq,
                                float min_curvature, float y_reg,
                                int use_grad_diff, int check_nan);
void sqn_native_sqn_destroy_f64(void* h);
void sqn_native_sqn_destroy_f32(void* h);
int sqn_native_sqn_run_f64(void* h, size_t n, double step, double* x,
                           const double* grad, const double* hess_vec,
                           double* req_out, double* req_vec_out, int* info,
                           int* x_changed, long* iteration);
int sqn_native_sqn_run_f32(void* h, size_t n, float step, float* x,
                           const float* grad, const float* hess_vec,
                           float* req_out, float* req_vec_out, int* info,
                           int* x_changed, long* iteration);

/* ---------------- adaQN ---------------- */
void* sqn_native_adaqn_create_f64(size_t n, size_t mem_size,
                                  size_t fisher_size, size_t upd_freq,
                                  double max_incr, double min_curvature,
                                  double scal_reg, double rmsprop_weight,
                                  double y_reg, int use_grad_diff,
                                  int check_nan, int h0_exact_reference);
void* sqn_native_adaqn_create_f32(size_t n, size_t mem_size,
                                  size_t fisher_size, size_t upd_freq,
                                  float max_incr, float min_curvature,
                                  float scal_reg, float rmsprop_weight,
                                  float y_reg, int use_grad_diff,
                                  int check_nan, int h0_exact_reference);
void sqn_native_adaqn_destroy_f64(void* h);
void sqn_native_adaqn_destroy_f32(void* h);
int sqn_native_adaqn_run_f64(void* h, size_t n, double step, double* x,
                             const double* grad, double f, double* req_out,
                             int* info, int* x_changed, long* iteration);
int sqn_native_adaqn_run_f32(void* h, size_t n, float step, float* x,
                             const float* grad, float f, float* req_out,
                             int* info, int* x_changed, long* iteration);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* STOCHQN_NATIVE_H_ */
