# stopifnot-based test battery (no testthat dependency), run by
# `R CMD check` or directly with `Rscript tests/run_tests.R` from the
# package root after `R CMD INSTALL .`.
#
# Mirrors the Python suite's coverage at small scale: free-mode protocol
# on Rosenbrock (the reference's own example problem,
# /root/reference/example/c_rosen.c), guided partial_fit on logistic
# regression, the error paths, and the adaQN guard wiring.
library(stochqn.tpu)

rosen_grad <- function(x) {
    c(-400 * x[1] * (x[2] - x[1]^2) - 2 * (1 - x[1]),
      200 * (x[2] - x[1]^2))
}
rosen_obj <- function(x) (1 - x[1])^2 + 100 * (x[2] - x[1]^2)^2

# ---- free-mode oLBFGS descends Rosenbrock --------------------------------
opt <- oLBFGS_free(mem_size = 8)
x <- c(-1.2, 1.0)
req <- run_oLBFGS_free(opt, x, 1e-3)
stopifnot(req$task == "calc_grad")
f0 <- rosen_obj(x)
for (i in 1:400) {
    stopifnot(req$task %in% c("calc_grad", "calc_grad_same_batch"))
    update_gradient(opt, rosen_grad(req$requested_on))
    req <- run_oLBFGS_free(opt, req$x, 1e-3)
}
x <- req$x
stopifnot(rosen_obj(x) < f0)
stopifnot(get_iteration_number(opt) > 100)
print(opt)

# ---- free-mode SQN with Hessian-vector requests --------------------------
opt <- SQN_free(mem_size = 5, bfgs_upd_freq = 5)
x <- c(-1.2, 1.0)
req <- run_SQN_free(opt, x, 1e-4)
saw_hess_vec <- FALSE
for (i in 1:600) {
    task <- req$task
    if (task %in% c("calc_grad", "calc_grad_big_batch")) {
        req_x <- if (is.list(req$requested_on)) req$requested_on$req_x
                 else req$requested_on
        update_gradient(opt, rosen_grad(req_x))
    } else if (task == "calc_hess_vec") {
        saw_hess_vec <- TRUE
        h <- 1e-6
        p <- req$requested_on$req_x
        v <- req$requested_on$req_vec
        update_hess_vec(opt, (rosen_grad(p + h * v) - rosen_grad(p)) / h)
    } else {
        stop(sprintf("unexpected task %s", task))
    }
    req <- run_SQN_free(opt, req$x, 1e-4)
}
stopifnot(saw_hess_vec)
stopifnot(rosen_obj(req$x) < rosen_obj(c(-1.2, 1.0)))

# ---- error paths ----------------------------------------------------------
res <- tryCatch(oLBFGS_free(mem_size = 0), error = function(e) "err")
stopifnot(identical(res, "err"))
res <- tryCatch(update_hess_vec(oLBFGS_free(), c(1, 2)),
                error = function(e) "err")
stopifnot(identical(res, "err"))
opt <- oLBFGS_free()
invisible(run_oLBFGS_free(opt, c(1, 2, 3), 1e-3))
res <- tryCatch(run_oLBFGS_free(opt, c(1, 2), 1e-3),
                error = function(e) "err")
stopifnot(identical(res, "err"))

# ---- NaN gradient -> search_direction_was_nan, x unchanged ----------------
opt <- oLBFGS_free()
req <- run_oLBFGS_free(opt, c(1.0, 2.0), 1e-3)
update_gradient(opt, c(NaN, 1.0))
req <- run_oLBFGS_free(opt, req$x, 1e-3)
stopifnot(req$info$iteration_info == "search_direction_was_nan")
stopifnot(identical(req$x, c(1.0, 2.0)))
stopifnot(req$task == "calc_grad")

# ---- guided logistic regression learns a separable problem ----------------
set.seed(42)
n <- 2000
d <- 8
X <- matrix(rnorm(n * d), n, d)
true_w <- 3 * rnorm(d)   # strong signal: optimal accuracy ~0.93
y <- as.numeric(1 / (1 + exp(-(X %*% true_w))) > runif(n))

model <- stochastic_logistic_regression(dim = d, optimizer = "adaQN",
                                        lambda = 1e-4,
                                        initial_step = 1e-1)
batches <- split(seq_len(n), rep(1:20, length.out = n))
for (epoch in 1:10) {
    for (b in batches) {
        partial_fit_logistic(model, X[b, , drop = FALSE], y[b])
    }
}
acc <- mean(predict(model, X) == y)
cat(sprintf("adaQN logistic accuracy: %.3f\n", acc))
stopifnot(acc > 0.80)
cf <- coef(model)
stopifnot(length(cf$coefficients) == d)
print(model)

# ---- guided SQN with grad-diff pairs on the same data ----------------------
model2 <- stochastic_logistic_regression(dim = d, optimizer = "SQN",
                                         lambda = 1e-4,
                                         initial_step = 5e-2,
                                         use_grad_diff = TRUE,
                                         bfgs_upd_freq = 5)
for (epoch in 1:6) {
    for (b in batches) {
        partial_fit_logistic(model2, X[b, , drop = FALSE], y[b])
    }
}
acc2 <- mean(predict(model2, X) == y)
cat(sprintf("SQN logistic accuracy: %.3f\n", acc2))
stopifnot(acc2 > 0.75)

# ---- guided oLBFGS through the raw guided API ------------------------------
lam <- 1e-4
opt <- oLBFGS(x0 = rnorm(d + 1),
              grad_fun = function(x, X, y, w, ...) {
                  logistic_grad(x, X, y, w, lam)
              },
              pred_fun = logistic_pred, initial_step = 1e-1,
              verbose = FALSE)
Xi <- cbind(X, 1.0)
for (b in batches) partial_fit(opt, Xi[b, , drop = FALSE], y[b])
stopifnot(get_iteration_number(opt) == length(batches))
stopifnot(length(get_curr_x(opt)) == d + 1)

# ---- formula interface: factors, pos_class, data.frame predict ------------
set.seed(7)
nf <- 600
df <- data.frame(
    x1  = rnorm(nf),
    x2  = rnorm(nf),
    grp = sample(c("a", "b", "c"), nf, replace = TRUE),
    stringsAsFactors = FALSE)
lin <- 2.5 * df$x1 - 2.0 * df$x2 + c(a = 0, b = 1.5, c = -1.5)[df$grp]
df$label <- factor(ifelse(1 / (1 + exp(-lin)) > runif(nf), "pos", "neg"))

fmodel <- stochastic_logistic_regression(label ~ x1 + x2 + grp,
                                         pos_class = "pos",
                                         optimizer = "adaQN",
                                         lambda = 1e-4,
                                         initial_step = 1e-1)
fbatches <- split(seq_len(nf), rep(1:10, length.out = nf))
for (epoch in 1:10) {
    for (b in fbatches) {
        partial_fit_logistic(fmodel, df[b, , drop = FALSE])
    }
}
# design columns: (Intercept), x1, x2, grpb, grpc — levels pinned
cf <- coef(fmodel)
stopifnot(is.matrix(cf), nrow(cf) == 5)
stopifnot(identical(rownames(cf),
                    c("(Intercept)", "x1", "x2", "grpb", "grpc")))
pr <- predict(fmodel, df, type = "prob")
stopifnot(all(pr >= 0 & pr <= 1))
cls <- predict(fmodel, df, type = "class")
stopifnot(all(cls %in% c("pos", "neg")))
facc <- mean(cls == as.character(df$label))
cat(sprintf("formula adaQN accuracy: %.3f\n", facc))
stopifnot(facc > 0.80)
# predict on new data WITHOUT the target column (delete.response path)
nd <- df[1:5, c("x1", "x2", "grp")]
stopifnot(length(predict(fmodel, nd, type = "prob")) == 5)
# unseen factor level -> pinned to NA -> model.matrix drops the row
nd2 <- df[1:4, c("x1", "x2", "grp")]
nd2$grp[1] <- "zzz"
stopifnot(length(predict(fmodel, nd2, type = "prob")) == 3)
print(fmodel)

# TRAINING batch containing an unseen factor level: the row must be
# dropped from X, y AND weights together (one model.frame), never
# recycled against a misaligned design matrix
dfu <- df[1:60, ]
dfu$grp[1] <- "unseen_level"
wts <- rep(1.0, 60)
n_before <- get_iteration_number(fmodel$optimizer)
partial_fit_logistic(fmodel, dfu, weights = wts)
stopifnot(get_iteration_number(fmodel$optimizer) == n_before + 1)
stopifnot(all(is.finite(coef(fmodel))))
# a batch with NO usable rows must error, not train on garbage
dfa <- df[1:3, ]
dfa$grp <- "zzz"
res <- tryCatch(partial_fit_logistic(fmodel, dfa),
                error = function(e) "err")
stopifnot(identical(res, "err"))

# formula error paths
res <- tryCatch(stochastic_logistic_regression(label ~ x1),
                error = function(e) "err")  # pos_class missing
stopifnot(identical(res, "err"))
res <- tryCatch(
    stochastic_logistic_regression(label ~ x1, pos_class = "pos",
                                   x0 = rnorm(3)),
    error = function(e) "err")              # x0 incompatible with formula
stopifnot(identical(res, "err"))
res <- tryCatch(partial_fit_logistic(fmodel, df, y = rep(0, nf)),
                error = function(e) "err")  # y forbidden with formula
stopifnot(identical(res, "err"))
res <- tryCatch({
    m <- stochastic_logistic_regression(label ~ x1, pos_class = "nope")
    partial_fit_logistic(m, df)
}, error = function(e) "err")               # pos_class not a level
stopifnot(identical(res, "err"))
res <- tryCatch({
    m <- stochastic_logistic_regression(label ~ x1, pos_class = "pos")
    partial_fit_logistic(m, as.matrix(df[, 1:2]))
}, error = function(e) "err")               # matrix with formula model
stopifnot(identical(res, "err"))

# formula + adaQN validation set (val_data transformed at init)
vmodel <- stochastic_logistic_regression(label ~ x1 + x2 + grp,
                                         pos_class = "pos",
                                         optimizer = "adaQN",
                                         lambda = 1e-4,
                                         initial_step = 1e-1,
                                         val_data = list(X = df[1:100, ]))
for (b in fbatches) partial_fit_logistic(vmodel, df[b, , drop = FALSE])
stopifnot(get_iteration_number(vmodel$optimizer) == length(fbatches))

cat("all R binding tests passed\n")
