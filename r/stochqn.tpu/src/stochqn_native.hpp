// stochqn_tpu native core — header-only C++17 implementation of the
// oLBFGS / SQN / adaQN request-driven optimizers.
//
// This is the framework's host-native tier: the same state-machine
// semantics as the JAX implementation (stochqn_tpu/core/*.py), re-expressed
// for CPUs. It serves as (a) a zero-dependency CPU backend for the Python
// free-mode API, (b) an embeddable C++ library (RAII classes below, the
// analogue of the reference's header-only C++ wrappers,
// include/stochqn.h:397-511), and (c) the C ABI surface (capi.cpp) that
// future language bindings (R, Julia, ...) can call, like the reference's
// .Call bridge did.
//
// Design notes vs the reference C core (src/stochqn.c):
//   * phases/sections, task and info codes, and update ordering match the
//     reference protocol exactly (same wire numbers);
//   * rejected correction pairs leave memory untouched — the candidate pair
//     lives outside the ring until accepted (the reference instead wrote
//     into the ring and "rolled back", with a copy-direction bug);
//   * a NaN curvature ratio rejects (the reference's `curv <= eps` NaN
//     comparison accepted);
//   * everything is templated on the scalar type instead of being compiled
//     twice behind USE_DOUBLE/USE_FLOAT macros.
#pragma once

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace stochqn_native {

enum class Task : int {
  InvalidInput = 100,
  CalcGrad = 101,
  CalcGradSameBatch = 102,
  CalcGradBigBatch = 103,
  CalcHessVec = 104,
  CalcFunValBatch = 105,
};

enum class Info : int {
  NoProblems = 200,
  FuncIncreased = 201,
  CurvatureTooSmall = 202,
  SearchDirectionWasNan = 203,
};

template <class Real>
struct Request {
  Task task = Task::CalcGrad;
  const Real* point = nullptr;   // where to evaluate
  const Real* vector = nullptr;  // hess-vec direction (CalcHessVec only)
  Info info = Info::NoProblems;
  bool x_changed = false;
  long iteration = 0;
};

namespace detail {

// Parallelize vector kernels only when n is large enough that threads pay
// for themselves — the reference applied the same gating idea
// (src/stochqn.c:208: `if(n > 1e7 && nthreads > 4)`); `omp simd` vectorizes
// the strict-FP reduction even without threads.
constexpr std::size_t kParallelThreshold = 1u << 19;

template <class Real>
inline Real dot(const Real* a, const Real* b, std::size_t n) {
  // Accumulate in double on EVERY path: float32 trajectories must not
  // depend on build flags (OpenMP on/off) or on crossing the threading
  // threshold — only the deterministic static partition of the
  // reduction differs with the thread count.
  double acc = 0.0;
#ifdef _OPENMP
  if (n >= kParallelThreshold) {
#pragma omp parallel for simd reduction(+ : acc) schedule(static)
    for (long long i = 0; i < static_cast<long long>(n); ++i)
      acc += static_cast<double>(a[i]) * static_cast<double>(b[i]);
    return static_cast<Real>(acc);
  }
#pragma omp simd reduction(+ : acc)
  for (std::size_t i = 0; i < n; ++i)
    acc += static_cast<double>(a[i]) * static_cast<double>(b[i]);
  return static_cast<Real>(acc);
#else
  for (std::size_t i = 0; i < n; ++i)
    acc += static_cast<double>(a[i]) * static_cast<double>(b[i]);
  return static_cast<Real>(acc);
#endif
}

template <class Real>
inline void axpy(Real a, const Real* x, Real* y, std::size_t n) {
#ifdef _OPENMP
  if (n >= kParallelThreshold) {
#pragma omp parallel for simd schedule(static)
    for (long long i = 0; i < static_cast<long long>(n); ++i)
      y[i] += a * x[i];
    return;
  }
#pragma omp simd
#endif
  for (std::size_t i = 0; i < n; ++i) y[i] += a * x[i];
}

template <class Real>
inline bool all_finite(const Real* a, std::size_t n) {
  for (std::size_t i = 0; i < n; ++i)
    if (!std::isfinite(a[i])) return false;
  return true;
}

}  // namespace detail

// Ring buffer of (s, y) correction pairs with a pending candidate slot.
template <class Real>
class PairMemory {
 public:
  PairMemory(std::size_t mem_size, std::size_t n, Real min_curvature,
             Real y_reg)
      : n_(n),
        mem_size_(mem_size),
        min_curvature_(min_curvature),
        y_reg_(y_reg),
        s_(mem_size * n, Real(0)),
        y_(mem_size * n, Real(0)),
        s_pending_(n, Real(0)) {}

  std::size_t size() const { return count_; }
  std::size_t capacity() const { return mem_size_; }
  const Real* s_row(std::size_t chrono) const {
    return s_.data() + row(chrono) * n_;
  }
  const Real* y_row(std::size_t chrono) const {
    return y_.data() + row(chrono) * n_;
  }
  Real* pending() { return s_pending_.data(); }
  const Real* pending() const { return s_pending_.data(); }

  void flush() {
    head_ = 0;
    count_ = 0;
  }

  // Commit (s_pending, y_cand) verbatim if it passes the curvature gate.
  // y_reg is deliberately NOT applied here: the reference regularizes
  // only gradient-difference y's (update_y_grad_diff,
  // reference src/stochqn.c:923); Hessian-vector and empirical-Fisher
  // y's (:936-966) are stored raw.  Those are exactly this method's
  // callers — grad-diff sources go through try_commit_diff below.
  bool try_commit(const Real* y_cand) {
    const Real* s = s_pending_.data();
    if (min_curvature_ > 0) {
      const Real sy = detail::dot(s, y_cand, n_);
      const Real ss = detail::dot(s, s, n_);
      if (!(sy / ss > min_curvature_)) return false;  // NaN rejects
    }
    Real* sdst = s_.data() + head_ * n_;
    Real* ydst = y_.data() + head_ * n_;
    for (std::size_t i = 0; i < n_; ++i) {
      sdst[i] = s[i];
      ydst[i] = y_cand[i];
    }
    bump();
    return true;
  }

  // Commit with y = g_new - g_prev (+ y_reg*s), never materializing y.
  bool try_commit_diff(const Real* g_new, const Real* g_prev) {
    const Real* s = s_pending_.data();
    if (min_curvature_ > 0) {
      Real sy = detail::dot(s, g_new, n_) - detail::dot(s, g_prev, n_);
      const Real ss = detail::dot(s, s, n_);
      if (y_reg_ > 0) sy += y_reg_ * ss;
      if (!(sy / ss > min_curvature_)) return false;  // NaN rejects
    }
    Real* sdst = s_.data() + head_ * n_;
    Real* ydst = y_.data() + head_ * n_;
    if (y_reg_ > 0) {
      for (std::size_t i = 0; i < n_; ++i) {
        sdst[i] = s[i];
        ydst[i] = g_new[i] - g_prev[i] + y_reg_ * s[i];
      }
    } else {
      for (std::size_t i = 0; i < n_; ++i) {
        sdst[i] = s[i];
        ydst[i] = g_new[i] - g_prev[i];
      }
    }
    bump();
    return true;
  }

 private:
  std::size_t row(std::size_t chrono) const {
    const std::size_t start = (head_ + mem_size_ - count_) % mem_size_;
    return (start + chrono) % mem_size_;
  }

  void bump() {
    head_ = (head_ + 1) % mem_size_;
    if (count_ < mem_size_) ++count_;
  }

  std::size_t n_, mem_size_;
  Real min_curvature_, y_reg_;
  std::size_t head_ = 0, count_ = 0;
  std::vector<Real> s_, y_, s_pending_;
};

// Recent-gradient store for adaQN's empirical Fisher product.
template <class Real>
class FisherMemory {
 public:
  FisherMemory(std::size_t mem_size, std::size_t n)
      : n_(n), mem_size_(mem_size), f_(mem_size * n, Real(0)) {}

  void flush() {
    head_ = 0;
    count_ = 0;
  }

  void append(const Real* grad) {
    Real* dst = f_.data() + head_ * n_;
    for (std::size_t i = 0; i < n_; ++i) dst[i] = grad[i];
    head_ = (head_ + 1) % mem_size_;
    if (count_ < mem_size_) ++count_;
  }

  // y = F^T (F s) / count
  void product(const Real* s, Real* out) const {
    for (std::size_t i = 0; i < n_; ++i) out[i] = 0;
    if (count_ == 0) return;
    for (std::size_t r = 0; r < count_; ++r) {
      const Real* row = f_.data() + r * n_;
      const Real fs = detail::dot(row, s, n_);
      detail::axpy(fs, row, out, n_);
    }
    const Real inv = Real(1) / Real(count_);
    for (std::size_t i = 0; i < n_; ++i) out[i] *= inv;
  }

 private:
  std::size_t n_, mem_size_;
  std::size_t head_ = 0, count_ = 0;
  std::vector<Real> f_;
};

// Classic sequential two-loop recursion over the ring (the CPU-optimal
// form; the JAX tier uses the batched compact form instead).
template <class Real>
class TwoLoopScratch {
 public:
  // q holds the gradient on entry and the search direction on exit.
  // diag: optional elementwise H0; h0: optional scalar H0 (<=0 -> gamma
  // from the latest pair). Empty memory leaves q as the raw gradient.
  void direction(Real* q, std::size_t n, const PairMemory<Real>& mem,
                 const Real* diag, Real h0) {
    const std::size_t k = mem.size();
    if (k == 0) return;
    alpha_.resize(k);
    rho_.resize(k);
    for (std::size_t ii = 0; ii < k; ++ii) {
      const std::size_t c = k - 1 - ii;
      const Real* s = mem.s_row(c);
      const Real* y = mem.y_row(c);
      rho_[c] = Real(1) / detail::dot(y, s, n);
      alpha_[c] = rho_[c] * detail::dot(q, s, n);
      detail::axpy(-alpha_[c], y, q, n);
    }
    if (diag != nullptr) {
      for (std::size_t i = 0; i < n; ++i) q[i] *= diag[i];
    } else {
      Real gamma = h0;
      if (!(gamma > 0)) {
        const Real* s = mem.s_row(k - 1);
        const Real* y = mem.y_row(k - 1);
        gamma = detail::dot(s, y, n) / detail::dot(y, y, n);
      }
      for (std::size_t i = 0; i < n; ++i) q[i] *= gamma;
    }
    for (std::size_t c = 0; c < k; ++c) {
      const Real* s = mem.s_row(c);
      const Real* y = mem.y_row(c);
      const Real beta = rho_[c] * detail::dot(y, q, n);
      detail::axpy(alpha_[c] - beta, s, q, n);
    }
  }

 private:
  std::vector<Real> alpha_, rho_;
};

// ---------------------------------------------------------------------------
// oLBFGS (Schraudolph et al., 2007)
// ---------------------------------------------------------------------------
template <class Real>
class OLBFGS {
 public:
  struct Options {
    std::size_t mem_size = 10;
    Real hess_init = 0;       // <=0: gamma from latest pair
    Real min_curvature = Real(1e-4);
    Real y_reg = 0;
    bool check_nan = true;
  };

  OLBFGS(std::size_t n, Options opt = {})
      : n_(n),
        opt_(opt),
        mem_(opt.mem_size, n, opt.min_curvature, opt.y_reg),
        grad_prev_(n, Real(0)),
        dir_(n, Real(0)) {}

  long iterations() const { return niter_; }
  std::size_t n() const { return n_; }

  // One protocol round; `grad` is the previously requested quantity.
  Request<Real> run(Real step_size, Real* x, const Real* grad) {
    Request<Real> req;
    req.iteration = niter_;
    switch (phase_) {
      case Phase::Start:
        phase_ = Phase::Step;
        req.task = Task::CalcGrad;
        req.point = x;
        return req;
      case Phase::Step: {
        for (std::size_t i = 0; i < n_; ++i) {
          grad_prev_[i] = grad[i];
          dir_[i] = grad[i];
        }
        scratch_.direction(dir_.data(), n_, mem_, nullptr, opt_.hess_init);
        ++niter_;
        req.iteration = niter_;
        if (opt_.check_nan && direction_bad()) {
          mem_.flush();
          req.task = Task::CalcGrad;
          req.point = x;
          req.info = Info::SearchDirectionWasNan;
          return req;  // stay in Phase::Step
        }
        Real* s = mem_.pending();
        for (std::size_t i = 0; i < n_; ++i) {
          s[i] = -step_size * dir_[i];
          x[i] += s[i];
        }
        phase_ = Phase::Pair;
        req.task = Task::CalcGradSameBatch;
        req.point = x;
        req.x_changed = true;
        return req;
      }
      case Phase::Pair: {
        const bool ok = mem_.try_commit_diff(grad, grad_prev_.data());
        if (!ok && opt_.min_curvature > 0) req.info = Info::CurvatureTooSmall;
        phase_ = Phase::Step;
        req.task = Task::CalcGrad;
        req.point = x;
        return req;
      }
    }
    req.task = Task::InvalidInput;
    return req;
  }

 private:
  enum class Phase { Start, Step, Pair };

  bool direction_bad() const {
    if (!detail::all_finite(dir_.data(), n_)) return true;
    const Real nrm =
        std::sqrt(detail::dot(dir_.data(), dir_.data(), n_));
    return nrm > Real(1e3) * Real(n_);
  }

  std::size_t n_;
  Options opt_;
  PairMemory<Real> mem_;
  TwoLoopScratch<Real> scratch_;
  std::vector<Real> grad_prev_, dir_;
  Phase phase_ = Phase::Start;
  long niter_ = 0;
};

// ---------------------------------------------------------------------------
// SQN (Byrd et al., 2016)
// ---------------------------------------------------------------------------
template <class Real>
class SQN {
 public:
  struct Options {
    std::size_t mem_size = 10;
    std::size_t upd_freq = 20;
    Real min_curvature = Real(1e-4);
    Real y_reg = 0;
    bool use_grad_diff = false;
    bool check_nan = true;
  };

  SQN(std::size_t n, Options opt = {})
      : n_(n),
        opt_(opt),
        mem_(opt.mem_size, n, opt.min_curvature, opt.y_reg),
        grad_prev_(n, Real(0)),
        x_sum_(n, Real(0)),
        x_avg_prev_(n, Real(0)),
        dir_(n, Real(0)) {}

  long iterations() const { return niter_; }
  std::size_t n() const { return n_; }

  Request<Real> run(Real step_size, Real* x, const Real* grad,
                    const Real* hess_vec) {
    Request<Real> req;
    req.iteration = niter_;
    switch (phase_) {
      case Phase::Start:
        return resume(req, x);
      case Phase::Step:
        return step(req, step_size, x, grad);
      case Phase::FirstBigGrad:
        for (std::size_t i = 0; i < n_; ++i) grad_prev_[i] = grad[i];
        return resume(req, x);
      case Phase::PairGradDiff: {
        const bool ok = mem_.try_commit_diff(grad, grad_prev_.data());
        if (ok) {
          for (std::size_t i = 0; i < n_; ++i) {
            grad_prev_[i] = grad[i];
            x_avg_prev_[i] = x_sum_[i];  // x_sum holds x_avg here
          }
        } else if (opt_.min_curvature > 0) {
          req.info = Info::CurvatureTooSmall;
        }
        zero_sum();
        return resume(req, x);
      }
      case Phase::PairHessVec: {
        const bool ok = mem_.try_commit(hess_vec);
        if (!ok && opt_.min_curvature > 0) req.info = Info::CurvatureTooSmall;
        for (std::size_t i = 0; i < n_; ++i) x_avg_prev_[i] = x_sum_[i];
        zero_sum();
        return resume(req, x);
      }
    }
    req.task = Task::InvalidInput;
    return req;
  }

 private:
  enum class Phase { Start, Step, FirstBigGrad, PairGradDiff, PairHessVec };

  Request<Real> resume(Request<Real>& req, Real* x) {
    phase_ = Phase::Step;
    req.task = Task::CalcGrad;
    req.point = x;
    return req;
  }

  void zero_sum() {
    for (std::size_t i = 0; i < n_; ++i) x_sum_[i] = 0;
  }

  Request<Real> step(Request<Real>& req, Real step_size, Real* x,
                     const Real* grad) {
    for (std::size_t i = 0; i < n_; ++i) dir_[i] = grad[i];
    scratch_.direction(dir_.data(), n_, mem_, nullptr, Real(0));
    bool bad = false;
    if (opt_.check_nan) {
      bad = !detail::all_finite(dir_.data(), n_) ||
            std::sqrt(detail::dot(dir_.data(), dir_.data(), n_)) >
                Real(1e3) * Real(n_);
    }
    if (bad) {
      mem_.flush();
      req.info = Info::SearchDirectionWasNan;
    } else {
      detail::axpy(-step_size, dir_.data(), x, n_);
      req.x_changed = true;
    }
    ++niter_;
    req.iteration = niter_;
    detail::axpy(Real(1), x, x_sum_.data(), n_);

    const std::size_t L = opt_.upd_freq;
    if (static_cast<std::size_t>(niter_) % L != 0) return resume(req, x);

    const Real inv_l = Real(1) / Real(L);
    for (std::size_t i = 0; i < n_; ++i) x_sum_[i] *= inv_l;  // now x_avg
    if (static_cast<std::size_t>(niter_) == L) {
      for (std::size_t i = 0; i < n_; ++i) x_avg_prev_[i] = x_sum_[i];
      zero_sum();
      if (opt_.use_grad_diff) {
        phase_ = Phase::FirstBigGrad;
        req.task = Task::CalcGradBigBatch;
        req.point = x_avg_prev_.data();
        return req;
      }
      return resume(req, x);
    }
    Real* s = mem_.pending();
    for (std::size_t i = 0; i < n_; ++i) s[i] = x_sum_[i] - x_avg_prev_[i];
    if (opt_.use_grad_diff) {
      phase_ = Phase::PairGradDiff;
      req.task = Task::CalcGradBigBatch;
      req.point = x_sum_.data();
    } else {
      phase_ = Phase::PairHessVec;
      req.task = Task::CalcHessVec;
      req.point = x_sum_.data();
      req.vector = mem_.pending();
    }
    return req;
  }

  std::size_t n_;
  Options opt_;
  PairMemory<Real> mem_;
  TwoLoopScratch<Real> scratch_;
  std::vector<Real> grad_prev_, x_sum_, x_avg_prev_, dir_;
  Phase phase_ = Phase::Start;
  long niter_ = 0;
};

// ---------------------------------------------------------------------------
// adaQN (Keskar & Berahas, 2016)
// ---------------------------------------------------------------------------
template <class Real>
class AdaQN {
 public:
  struct Options {
    std::size_t mem_size = 10;
    std::size_t fisher_size = 100;
    std::size_t upd_freq = 20;
    Real max_incr = Real(1.01);   // <=0: no function-value guard
    Real min_curvature = Real(1e-4);
    Real scal_reg = Real(1e-4);
    Real rmsprop_weight = 0;      // 0: AdaGrad
    Real y_reg = 0;
    bool use_grad_diff = false;
    bool check_nan = true;
    bool h0_exact_reference = true;
  };

  AdaQN(std::size_t n, Options opt = {})
      : n_(n),
        opt_(opt),
        mem_(opt.mem_size, n, opt.min_curvature, opt.y_reg),
        fisher_(opt.use_grad_diff ? 1 : opt.fisher_size, n),
        grad_prev_(n, Real(0)),
        x_sum_(n, Real(0)),
        x_avg_prev_(n, Real(0)),
        grad_sum_sq_(n, Real(0)),
        h0_(n, Real(0)),
        dir_(n, Real(0)) {}

  long iterations() const { return niter_; }
  std::size_t n() const { return n_; }

  Request<Real> run(Real step_size, Real* x, const Real* grad, Real f) {
    Request<Real> req;
    req.iteration = niter_;
    switch (phase_) {
      case Phase::Start:
        return resume(req, x);
      case Phase::Step:
        return step(req, step_size, x, grad);
      case Phase::FirstBigGrad:
        for (std::size_t i = 0; i < n_; ++i) grad_prev_[i] = grad[i];
        if (opt_.max_incr > 0) {
          phase_ = Phase::FirstFVal;
          req.task = Task::CalcFunValBatch;
          req.point = x_avg_prev_.data();
          return req;
        }
        return resume(req, x);
      case Phase::FirstFVal:
        f_prev_ = f;
        return resume(req, x);
      case Phase::PairGradDiff: {
        const bool ok = mem_.try_commit_diff(grad, grad_prev_.data());
        if (ok) {
          for (std::size_t i = 0; i < n_; ++i) grad_prev_[i] = grad[i];
          // x_avg_prev deliberately NOT refreshed (reference quirk,
          // src/stochqn.c:1265-1270)
        } else if (opt_.min_curvature > 0) {
          req.info = Info::CurvatureTooSmall;
        }
        zero_sum();
        return resume(req, x);
      }
      case Phase::Guard:
        return guard(req, x, f);
    }
    req.task = Task::InvalidInput;
    return req;
  }

 private:
  enum class Phase { Start, Step, FirstBigGrad, FirstFVal, PairGradDiff,
                     Guard };

  Request<Real> resume(Request<Real>& req, Real* x) {
    phase_ = Phase::Step;
    req.task = Task::CalcGrad;
    req.point = x;
    return req;
  }

  void zero_sum() {
    for (std::size_t i = 0; i < n_; ++i) x_sum_[i] = 0;
  }

  Request<Real> commit_fisher(Request<Real>& req, Real* x) {
    grad_diff_.resize(n_);
    fisher_.product(mem_.pending(), grad_diff_.data());
    const bool ok = mem_.try_commit(grad_diff_.data());
    if (ok) {
      for (std::size_t i = 0; i < n_; ++i) x_avg_prev_[i] = x_sum_[i];
    } else if (opt_.min_curvature > 0) {
      req.info = Info::CurvatureTooSmall;
    }
    zero_sum();
    return resume(req, x);
  }

  Request<Real> step(Request<Real>& req, Real step_size, Real* x,
                     const Real* grad) {
    if (!opt_.use_grad_diff) fisher_.append(grad);

    // accumulator update + rescale
    const Real w = opt_.rmsprop_weight;
    if (w > 0 && w < 1) {
      for (std::size_t i = 0; i < n_; ++i)
        grad_sum_sq_[i] = w * grad_sum_sq_[i] +
                          (Real(1) - w) * grad[i] * grad[i];
    } else {
      for (std::size_t i = 0; i < n_; ++i)
        grad_sum_sq_[i] += grad[i] * grad[i];
    }
    for (std::size_t i = 0; i < n_; ++i) {
      const Real denom = std::sqrt(grad_sum_sq_[i] + opt_.scal_reg);
      h0_[i] = opt_.h0_exact_reference ? grad[i] / denom : Real(1) / denom;
    }

    if (mem_.size() == 0) {
      for (std::size_t i = 0; i < n_; ++i)
        dir_[i] = grad[i] / std::sqrt(grad_sum_sq_[i] + opt_.scal_reg);
    } else {
      for (std::size_t i = 0; i < n_; ++i) dir_[i] = grad[i];
      scratch_.direction(dir_.data(), n_, mem_, h0_.data(), Real(0));
    }

    bool bad = false;
    if (opt_.check_nan) {
      bad = !detail::all_finite(dir_.data(), n_) ||
            std::sqrt(detail::dot(dir_.data(), dir_.data(), n_)) >
                Real(1e3) * Real(n_);
    }
    if (bad) {
      mem_.flush();  // Fisher NOT flushed (reference quirk)
      req.info = Info::SearchDirectionWasNan;
    } else {
      detail::axpy(-step_size, dir_.data(), x, n_);
      req.x_changed = true;
    }
    ++niter_;
    req.iteration = niter_;
    detail::axpy(Real(1), x, x_sum_.data(), n_);

    const std::size_t L = opt_.upd_freq;
    if (static_cast<std::size_t>(niter_) % L != 0) return resume(req, x);

    const Real inv_l = Real(1) / Real(L);
    for (std::size_t i = 0; i < n_; ++i) x_sum_[i] *= inv_l;
    if (static_cast<std::size_t>(niter_) == L) {
      for (std::size_t i = 0; i < n_; ++i) x_avg_prev_[i] = x_sum_[i];
      zero_sum();
      if (opt_.use_grad_diff) {
        phase_ = Phase::FirstBigGrad;
        req.task = Task::CalcGradBigBatch;
        req.point = x_avg_prev_.data();
        return req;
      }
      if (opt_.max_incr > 0) {
        phase_ = Phase::FirstFVal;
        req.task = Task::CalcFunValBatch;
        req.point = x_avg_prev_.data();
        return req;
      }
      return resume(req, x);
    }
    if (opt_.max_incr > 0) {
      phase_ = Phase::Guard;
      req.task = Task::CalcFunValBatch;
      req.point = x_sum_.data();
      return req;
    }
    Real* s = mem_.pending();
    for (std::size_t i = 0; i < n_; ++i) s[i] = x_sum_[i] - x_avg_prev_[i];
    if (opt_.use_grad_diff) {
      phase_ = Phase::PairGradDiff;
      req.task = Task::CalcGradBigBatch;
      req.point = x_sum_.data();
      return req;
    }
    return commit_fisher(req, x);
  }

  Request<Real> guard(Request<Real>& req, Real* x, Real f) {
    if (f > opt_.max_incr * f_prev_ || !std::isfinite(f)) {
      mem_.flush();
      fisher_.flush();
      for (std::size_t i = 0; i < n_; ++i) x[i] = x_avg_prev_[i];
      // x_sum deliberately not reset (reference quirk)
      req.info = Info::FuncIncreased;
      req.x_changed = true;
      return resume(req, x);
    }
    f_prev_ = f;
    Real* s = mem_.pending();
    for (std::size_t i = 0; i < n_; ++i) s[i] = x_sum_[i] - x_avg_prev_[i];
    if (opt_.use_grad_diff) {
      phase_ = Phase::PairGradDiff;
      req.task = Task::CalcGradBigBatch;
      req.point = x_sum_.data();
      return req;
    }
    return commit_fisher(req, x);
  }

  std::size_t n_;
  Options opt_;
  PairMemory<Real> mem_;
  FisherMemory<Real> fisher_;
  TwoLoopScratch<Real> scratch_;
  std::vector<Real> grad_prev_, x_sum_, x_avg_prev_, grad_sum_sq_, h0_,
      dir_, grad_diff_;
  Phase phase_ = Phase::Start;
  long niter_ = 0;
  Real f_prev_ = 0;
};

}  // namespace stochqn_native
