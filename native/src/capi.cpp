// C ABI over the header-only native core, consumed by the Python ctypes
// backend (stochqn_tpu/native_backend.py) and available to other language
// bindings. Float and double instantiations, like the reference's dual
// USE_FLOAT/USE_DOUBLE builds — but from one template.
#include <new>
#include <cstring>

// the public C declarations first: any drift between the C header and the
// definitions below is then a compile error, not a silent ABI break
#include "stochqn_native.h"
#include "stochqn_native.hpp"

using stochqn_native::AdaQN;
using stochqn_native::OLBFGS;
using stochqn_native::Request;
using stochqn_native::SQN;

namespace {

template <class Real>
void fill_out(const Request<Real>& r, std::size_t n, Real* req_out,
              Real* req_vec_out, int* task, int* info, int* x_changed,
              long* iteration) {
  *task = static_cast<int>(r.task);
  *info = static_cast<int>(r.info);
  *x_changed = r.x_changed ? 1 : 0;
  *iteration = r.iteration;
  if (req_out && r.point) std::memcpy(req_out, r.point, n * sizeof(Real));
  if (req_vec_out && r.vector)
    std::memcpy(req_vec_out, r.vector, n * sizeof(Real));
}

// The run-call `n` is caller-supplied and used as the memcpy length into
// req_out/req_vec_out; a mismatch with the optimizer's own n would read or
// write out of bounds. Validate against the stored size and fail the call
// with Task::InvalidInput instead.
template <class Opt>
bool n_mismatch(const Opt* opt, std::size_t n, int* task, int* info,
                int* x_changed, long* iteration) {
  if (n == opt->n()) return false;
  *task = static_cast<int>(stochqn_native::Task::InvalidInput);
  *info = static_cast<int>(stochqn_native::Info::NoProblems);
  *x_changed = 0;
  *iteration = opt->iterations();
  return true;
}

}  // namespace

// Allocation failure must surface as nullptr across the C ABI (the
// reference C core returns NULL on malloc failure) — a std::bad_alloc
// escaping extern "C" into a ctypes caller aborts the process.
#define SQN_NATIVE_TRY_NEW(EXPR)                                             \
  try {                                                                      \
    return new EXPR;                                                         \
  } catch (const std::bad_alloc&) {                                          \
    return nullptr;                                                          \
  }

extern "C" {

// ---------------- oLBFGS ----------------
#define DEFINE_OLBFGS(SUFFIX, REAL)                                          \
  void* sqn_native_olbfgs_create_##SUFFIX(                                   \
      std::size_t n, std::size_t mem_size, REAL hess_init,                   \
      REAL min_curvature, REAL y_reg, int check_nan) {                       \
    if (n == 0 || mem_size == 0) return nullptr;                             \
    typename OLBFGS<REAL>::Options o;                                        \
    o.mem_size = mem_size;                                                   \
    o.hess_init = hess_init;                                                 \
    o.min_curvature = min_curvature;                                         \
    o.y_reg = y_reg;                                                         \
    o.check_nan = check_nan != 0;                                            \
    SQN_NATIVE_TRY_NEW(OLBFGS<REAL>(n, o));                                           \
  }                                                                          \
  void sqn_native_olbfgs_destroy_##SUFFIX(void* h) {                         \
    delete static_cast<OLBFGS<REAL>*>(h);                                    \
  }                                                                          \
  int sqn_native_olbfgs_run_##SUFFIX(void* h, std::size_t n, REAL step,      \
                                     REAL* x, const REAL* grad,              \
                                     REAL* req_out, int* info,               \
                                     int* x_changed, long* iteration) {      \
    auto* opt = static_cast<OLBFGS<REAL>*>(h);                               \
    int task;                                                                \
    if (n_mismatch(opt, n, &task, info, x_changed, iteration)) return task;  \
    Request<REAL> r = opt->run(step, x, grad);                               \
    fill_out(r, n, req_out, static_cast<REAL*>(nullptr), &task, info,        \
             x_changed, iteration);                                          \
    return task;                                                             \
  }

DEFINE_OLBFGS(f64, double)
DEFINE_OLBFGS(f32, float)

// ---------------- SQN ----------------
#define DEFINE_SQN(SUFFIX, REAL)                                             \
  void* sqn_native_sqn_create_##SUFFIX(                                      \
      std::size_t n, std::size_t mem_size, std::size_t upd_freq,             \
      REAL min_curvature, REAL y_reg, int use_grad_diff, int check_nan) {    \
    if (n == 0 || mem_size == 0 || upd_freq == 0) return nullptr;            \
    typename SQN<REAL>::Options o;                                           \
    o.mem_size = mem_size;                                                   \
    o.upd_freq = upd_freq;                                                   \
    o.min_curvature = min_curvature;                                         \
    o.y_reg = y_reg;                                                         \
    o.use_grad_diff = use_grad_diff != 0;                                    \
    o.check_nan = check_nan != 0;                                            \
    SQN_NATIVE_TRY_NEW(SQN<REAL>(n, o));                                              \
  }                                                                          \
  void sqn_native_sqn_destroy_##SUFFIX(void* h) {                            \
    delete static_cast<SQN<REAL>*>(h);                                       \
  }                                                                          \
  int sqn_native_sqn_run_##SUFFIX(void* h, std::size_t n, REAL step,         \
                                  REAL* x, const REAL* grad,                 \
                                  const REAL* hess_vec, REAL* req_out,       \
                                  REAL* req_vec_out, int* info,              \
                                  int* x_changed, long* iteration) {         \
    auto* opt = static_cast<SQN<REAL>*>(h);                                  \
    int task;                                                                \
    if (n_mismatch(opt, n, &task, info, x_changed, iteration)) return task;  \
    Request<REAL> r = opt->run(step, x, grad, hess_vec);                     \
    fill_out(r, n, req_out, req_vec_out, &task, info, x_changed,             \
             iteration);                                                     \
    return task;                                                             \
  }

DEFINE_SQN(f64, double)
DEFINE_SQN(f32, float)

// ---------------- adaQN ----------------
#define DEFINE_ADAQN(SUFFIX, REAL)                                           \
  void* sqn_native_adaqn_create_##SUFFIX(                                    \
      std::size_t n, std::size_t mem_size, std::size_t fisher_size,          \
      std::size_t upd_freq, REAL max_incr, REAL min_curvature,               \
      REAL scal_reg, REAL rmsprop_weight, REAL y_reg, int use_grad_diff,     \
      int check_nan, int h0_exact_reference) {                               \
    if (n == 0 || mem_size == 0 || upd_freq == 0 ||                          \
        (use_grad_diff == 0 && fisher_size == 0))                            \
      return nullptr;                                                        \
    typename AdaQN<REAL>::Options o;                                         \
    o.mem_size = mem_size;                                                   \
    o.fisher_size = fisher_size;                                             \
    o.upd_freq = upd_freq;                                                   \
    o.max_incr = max_incr;                                                   \
    o.min_curvature = min_curvature;                                         \
    o.scal_reg = scal_reg;                                                   \
    o.rmsprop_weight = rmsprop_weight;                                       \
    o.y_reg = y_reg;                                                         \
    o.use_grad_diff = use_grad_diff != 0;                                    \
    o.check_nan = check_nan != 0;                                            \
    o.h0_exact_reference = h0_exact_reference != 0;                          \
    SQN_NATIVE_TRY_NEW(AdaQN<REAL>(n, o));                                            \
  }                                                                          \
  void sqn_native_adaqn_destroy_##SUFFIX(void* h) {                          \
    delete static_cast<AdaQN<REAL>*>(h);                                     \
  }                                                                          \
  int sqn_native_adaqn_run_##SUFFIX(void* h, std::size_t n, REAL step,       \
                                    REAL* x, const REAL* grad, REAL f,       \
                                    REAL* req_out, int* info,                \
                                    int* x_changed, long* iteration) {       \
    auto* opt = static_cast<AdaQN<REAL>*>(h);                                \
    int task;                                                                \
    if (n_mismatch(opt, n, &task, info, x_changed, iteration)) return task;  \
    Request<REAL> r = opt->run(step, x, grad, f);                            \
    fill_out(r, n, req_out, static_cast<REAL*>(nullptr), &task, info,        \
             x_changed, iteration);                                          \
    return task;                                                             \
  }

DEFINE_ADAQN(f64, double)
DEFINE_ADAQN(f32, float)

}  // extern "C"
