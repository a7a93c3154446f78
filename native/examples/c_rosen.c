/* Pure-C free-mode example: minimize the 2-D Rosenbrock function with the
 * SQN optimizer through the C ABI (stochqn_native.h) — the counterpart of
 * the reference's example/c_rosen.c (its request loop at :100-119),
 * driving our library's protocol: run -> task code -> evaluate -> run.
 *
 * Build (after cmake --build):
 *   cc c_rosen.c -I../include -L../build -lstochqn_native -lm
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "stochqn_native.h"

static void rosen_grad(const double x[2], double g[2]) {
  g[0] = -400.0 * x[0] * (x[1] - x[0] * x[0]) - 2.0 * (1.0 - x[0]);
  g[1] = 200.0 * (x[1] - x[0] * x[0]);
}

static double rosen(const double x[2]) {
  double a = 1.0 - x[0], b = x[1] - x[0] * x[0];
  return a * a + 100.0 * b * b;
}

/* Hessian-vector product by central differences of the gradient. */
static void rosen_hess_vec(const double x[2], const double v[2],
                           double hv[2]) {
  const double eps = 1e-7;
  double xp[2], xm[2], gp[2], gm[2];
  int i;
  for (i = 0; i < 2; i++) {
    xp[i] = x[i] + eps * v[i];
    xm[i] = x[i] - eps * v[i];
  }
  rosen_grad(xp, gp);
  rosen_grad(xm, gm);
  for (i = 0; i < 2; i++) hv[i] = (gp[i] - gm[i]) / (2.0 * eps);
}

int main(void) {
  double x[2] = {-1.2, 1.0};
  double req[2], req_vec[2], grad[2], hv[2];
  const double f0 = rosen(x);
  int info, x_changed, task;
  long iteration = 0;
  int call;

  void* opt = sqn_native_sqn_create_f64(
      /*n=*/2, /*mem_size=*/5, /*upd_freq=*/5,
      /*min_curvature=*/1e-4, /*y_reg=*/0.0,
      /*use_grad_diff=*/0, /*check_nan=*/1);
  if (!opt) {
    fprintf(stderr, "allocation failed\n");
    return 1;
  }

  /* first call asks for the initial gradient at x */
  task = sqn_native_sqn_run_f64(opt, 2, 1e-4, x, NULL, NULL, req, req_vec,
                                &info, &x_changed, &iteration);
  for (call = 0; call < 600; call++) {
    switch (task) {
      case SQN_NATIVE_TASK_CALC_GRAD:
      case SQN_NATIVE_TASK_CALC_GRAD_BIG_BATCH:
        rosen_grad(req, grad);
        task = sqn_native_sqn_run_f64(opt, 2, 1e-4, x, grad, NULL, req,
                                      req_vec, &info, &x_changed,
                                      &iteration);
        break;
      case SQN_NATIVE_TASK_CALC_HESS_VEC:
        rosen_hess_vec(req, req_vec, hv);
        task = sqn_native_sqn_run_f64(opt, 2, 1e-4, x, NULL, hv, req,
                                      req_vec, &info, &x_changed,
                                      &iteration);
        break;
      default:
        fprintf(stderr, "unexpected task %d\n", task);
        sqn_native_sqn_destroy_f64(opt);
        return 1;
    }
  }

  printf("after %ld iterations: f(%.4f, %.4f) = %.6f (started at %.2f)\n",
         iteration, x[0], x[1], rosen(x), f0);
  sqn_native_sqn_destroy_f64(opt);
  if (!(rosen(x) < f0) || iteration < 100) {
    fprintf(stderr, "did not descend\n");
    return 1;
  }
  return 0;
}
