// Free-mode Rosenbrock minimization with the native C++ core — the C++
// usage example, analogous to the reference's example/cpp_rosen.cpp
// workflow (request loop until the gradient is small).
#include <cmath>
#include <cstdio>
#include <vector>

#include "stochqn_native.hpp"

namespace {

void rosen_grad(const double* x, double* g, std::size_t n) {
  for (std::size_t i = 0; i < n; ++i) g[i] = 0;
  for (std::size_t i = 0; i + 1 < n; ++i) {
    const double t = x[i + 1] - x[i] * x[i];
    g[i] += -400.0 * x[i] * t - 2.0 * (1.0 - x[i]);
    g[i + 1] += 200.0 * t;
  }
}

double grad_norm(const double* g, std::size_t n) {
  double s = 0;
  for (std::size_t i = 0; i < n; ++i) s += g[i] * g[i];
  return std::sqrt(s);
}

}  // namespace

int main() {
  constexpr std::size_t n = 2;
  std::vector<double> x = {-1.2, 1.0};
  std::vector<double> g(n, 0.0);

  stochqn_native::OLBFGS<double>::Options opt;
  opt.mem_size = 7;
  stochqn_native::OLBFGS<double> solver(n, opt);

  auto req = solver.run(2.5e-3, x.data(), nullptr);
  int evals = 0;
  while (evals < 200000) {
    rosen_grad(req.point, g.data(), n);
    ++evals;
    // oLBFGS always requests gradients at the caller's current x, so the
    // gradient just computed doubles as the convergence check — one
    // evaluation per protocol call, as the request-loop cost model intends.
    if (req.point == x.data() && grad_norm(g.data(), n) < 1e-5) break;
    req = solver.run(2.5e-3, x.data(), g.data());
  }
  std::printf("x = (%.6f, %.6f) after %ld iterations, %d gradient evals\n",
              x[0], x[1], solver.iterations(), evals);
  const bool ok = std::fabs(x[0] - 1.0) < 1e-3 && std::fabs(x[1] - 1.0) < 1e-3;
  std::printf(ok ? "CONVERGED\n" : "NOT CONVERGED\n");
  return ok ? 0 : 1;
}
