# Free-mode optimizers: the raw request/response protocol.
#
# Same surface as the reference R package (R/optimizers_free.R):
# constructors oLBFGS_free / SQN_free / adaQN_free, steppers
# run_oLBFGS_free / run_SQN_free / run_adaQN_free, updaters
# update_gradient / update_hess_vec / update_fun, print methods.
#
# Two deliberate design deltas from the reference (see ../README.md):
#   * optimizer objects are environments — `run_*` and `update_*` mutate
#     them directly, with no `eval.parent(substitute(...))` injection into
#     the caller's frame (reference R/optimizers_free.R:423-427);
#   * the iterate `x` is never modified in place through the C boundary —
#     each run returns the updated vector in the request (`$x`), which the
#     caller feeds to the next run.  The reference instead mutates the SEXP
#     data of the caller's vector (src/Rwrapper.c:117-123).
# The protocol itself — task order, info codes, defaults — is identical,
# driven by the same C++17 core as the Python `backend="native"` engine.

new.free.optimizer <- function(cls, params) {
    obj <- new.env(parent = emptyenv())
    obj$params   <- params
    obj$handle   <- NULL
    obj$n        <- NULL
    obj$x        <- NULL
    obj$gradient <- NULL
    obj$hess_vec <- NULL
    obj$f        <- 0.0
    class(obj) <- c(cls, "stochQN_free")
    obj
}

#' Create an oLBFGS free-mode optimizer (Schraudolph et al., 2007).
#' Defaults match the reference package (mem_size 10, min_curvature 1e-4).
#' @export
oLBFGS_free <- function(mem_size = 10, hess_init = NULL, min_curvature = 1e-4,
                        y_reg = NULL, check_nan = TRUE) {
    new.free.optimizer("oLBFGS_free", list(
        mem_size      = check.positive.integer(mem_size, "mem_size"),
        hess_init     = check.nonneg.number(hess_init, "hess_init"),
        min_curvature = check.nonneg.number(min_curvature, "min_curvature"),
        y_reg         = check.nonneg.number(y_reg, "y_reg"),
        check_nan     = check.flag(check_nan, "check_nan")))
}

#' Create an SQN free-mode optimizer (Byrd et al., 2016).
#' @export
SQN_free <- function(mem_size = 10, bfgs_upd_freq = 20, min_curvature = 1e-4,
                     y_reg = NULL, use_grad_diff = FALSE, check_nan = TRUE) {
    new.free.optimizer("SQN_free", list(
        mem_size      = check.positive.integer(mem_size, "mem_size"),
        bfgs_upd_freq = check.positive.integer(bfgs_upd_freq, "bfgs_upd_freq"),
        min_curvature = check.nonneg.number(min_curvature, "min_curvature"),
        y_reg         = check.nonneg.number(y_reg, "y_reg"),
        use_grad_diff = check.flag(use_grad_diff, "use_grad_diff"),
        check_nan     = check.flag(check_nan, "check_nan")))
}

#' Create an adaQN free-mode optimizer (Keskar & Berahas, 2016).
#' @export
adaQN_free <- function(mem_size = 10, fisher_size = 100, bfgs_upd_freq = 20,
                       max_incr = 1.01, min_curvature = 1e-4, scal_reg = 1e-4,
                       rmsprop_weight = NULL, y_reg = NULL,
                       use_grad_diff = FALSE, check_nan = TRUE,
                       h0_exact_reference = FALSE) {
    new.free.optimizer("adaQN_free", list(
        mem_size       = check.positive.integer(mem_size, "mem_size"),
        fisher_size    = if (use_grad_diff) 0L
                         else check.positive.integer(fisher_size, "fisher_size"),
        bfgs_upd_freq  = check.positive.integer(bfgs_upd_freq, "bfgs_upd_freq"),
        max_incr       = check.nonneg.number(max_incr, "max_incr"),
        min_curvature  = check.nonneg.number(min_curvature, "min_curvature"),
        scal_reg       = check.nonneg.number(scal_reg, "scal_reg"),
        rmsprop_weight = check.nonneg.number(rmsprop_weight, "rmsprop_weight"),
        y_reg          = check.nonneg.number(y_reg, "y_reg"),
        use_grad_diff  = check.flag(use_grad_diff, "use_grad_diff"),
        check_nan      = check.flag(check_nan, "check_nan"),
        h0_exact_reference = check.flag(h0_exact_reference,
                                        "h0_exact_reference")))
}

lazy.init <- function(optimizer, x) {
    n <- length(x)
    p <- optimizer$params
    optimizer$handle <- if (inherits(optimizer, "oLBFGS_free")) {
        .Call(C_olbfgs_create, n, p$mem_size, p$hess_init, p$min_curvature,
              p$y_reg, p$check_nan)
    } else if (inherits(optimizer, "SQN_free")) {
        .Call(C_sqn_create, n, p$mem_size, p$bfgs_upd_freq, p$min_curvature,
              p$y_reg, p$use_grad_diff, p$check_nan)
    } else {
        .Call(C_adaqn_create, n, p$mem_size, p$fisher_size, p$bfgs_upd_freq,
              p$max_incr, p$min_curvature, p$scal_reg, p$rmsprop_weight,
              p$y_reg, p$use_grad_diff, p$check_nan, p$h0_exact_reference)
    }
    optimizer$n        <- n
    optimizer$gradient <- numeric(n)
    optimizer$hess_vec <- numeric(n)
    invisible(optimizer)
}

run.free <- function(optimizer, cls, x, step_size, runner) {
    if (!inherits(optimizer, cls)) {
        stop(sprintf("this function only applies to %s optimizers", cls))
    }
    x <- check.numeric.vector(x, "x")
    step_size <- check.step.size(step_size)
    if (is.null(optimizer$handle)) lazy.init(optimizer, x)
    if (length(x) != optimizer$n) stop("'x' has the wrong length")
    raw <- runner(optimizer, x, step_size)
    optimizer$x <- raw$x
    make.request(raw, optimizer$n)
}

#' Run one protocol round of oLBFGS; serve the previous request with
#' `update_gradient` first.  Returns the next request (see `make.request`).
#' @export
run_oLBFGS_free <- function(optimizer, x, step_size) {
    run.free(optimizer, "oLBFGS_free", x, step_size, function(o, x, s) {
        .Call(C_olbfgs_run, o$handle, x, o$gradient, s)
    })
}

#' Run one protocol round of SQN.
#' @export
run_SQN_free <- function(optimizer, x, step_size) {
    run.free(optimizer, "SQN_free", x, step_size, function(o, x, s) {
        .Call(C_sqn_run, o$handle, x, o$gradient, o$hess_vec, s)
    })
}

#' Run one protocol round of adaQN.
#' @export
run_adaQN_free <- function(optimizer, x, step_size) {
    run.free(optimizer, "adaQN_free", x, step_size, function(o, x, s) {
        .Call(C_adaqn_run, o$handle, x, o$gradient, o$f, s)
    })
}

#' Feed the requested gradient (all three optimizers).
#' @export
update_gradient <- function(optimizer, gradient) {
    if (!inherits(optimizer, "stochQN_free")) {
        stop("'optimizer' must be a free-mode optimizer from this package")
    }
    gradient <- check.numeric.vector(gradient, "gradient")
    if (!is.null(optimizer$n) && length(gradient) != optimizer$n) {
        stop("'gradient' must have the same length as 'x'")
    }
    optimizer$gradient <- gradient
    invisible(NULL)
}

#' Feed the requested Hessian-vector product (SQN only).
#' @export
update_hess_vec <- function(optimizer, hess_vec) {
    if (!inherits(optimizer, "SQN_free")) {
        stop("'update_hess_vec' only applies to SQN optimizers")
    }
    hess_vec <- check.numeric.vector(hess_vec, "hess_vec")
    if (!is.null(optimizer$n) && length(hess_vec) != optimizer$n) {
        stop("'hess_vec' must have the same length as 'x'")
    }
    optimizer$hess_vec <- hess_vec
    invisible(NULL)
}

#' Feed the requested objective value (adaQN only).
#' @export
update_fun <- function(optimizer, fun) {
    if (!inherits(optimizer, "adaQN_free")) {
        stop("'update_fun' only applies to adaQN optimizers")
    }
    if (length(fun) != 1L || !is.numeric(fun)) stop("'fun' must be a number")
    optimizer$f <- as.numeric(fun)
    invisible(NULL)
}

print.free <- function(x, what) {
    cat(sprintf("%s free-mode optimizer (stochqn.tpu)\n", what))
    if (is.null(x$handle)) {
        cat("not yet initialized (dimension set on first run)\n")
    } else {
        cat(sprintf("dimension: %d\n", x$n))
        cat(sprintf("iterations: %d\n", .Call(C_optimizer_niter, x$handle)))
    }
    invisible(x)
}

#' @export
print.oLBFGS_free <- function(x, ...) print.free(x, "oLBFGS")
#' @export
print.SQN_free <- function(x, ...) print.free(x, "SQN")
#' @export
print.adaQN_free <- function(x, ...) print.free(x, "adaQN")
