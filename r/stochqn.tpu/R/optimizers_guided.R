# Guided optimizers: partial_fit driver over the free-mode protocol.
#
# Mirrors the reference R package's guided layer
# (R/optimizers_guided.R:26-111): each `partial_fit(optimizer, X, y, w)`
# call serves protocol requests from the user's grad/obj/Hessian-vector
# functions on the given batch until the iteration counter advances by
# one.  Big-batch requests (calc_grad_big_batch / calc_hess_vec /
# calc_fun_val_batch) are served from the batches stored since the last
# big-batch request (reference R/helpers.R:146-191), or from an explicit
# validation set when one was given (adaQN).  Batches are saved AFTER the
# update, like the reference (R/optimizers_guided.R:100-103).
#
# User-function signatures match the reference:
#   grad_fun(x, X, y, weights, ...)        -> numeric(n)
#   obj_fun(x, X, y, weights, ...)         -> number          (adaQN)
#   hess_vec_fun(x, vec, X, y, weights, ...) -> numeric(n)    (SQN)
#   pred_fun(X, x, ...)                    -> predictions

new.guided <- function(cls, x0, free_opt, grad_fun, pred_fun, initial_step,
                       step_fun, callback_iter, args_cb, verbose) {
    if (!is.function(grad_fun)) stop("'grad_fun' must be a function")
    if (!is.null(pred_fun) && !is.function(pred_fun)) {
        stop("'pred_fun' must be a function")
    }
    if (!is.function(step_fun)) stop("'step_fun' must be a function")
    obj <- new.env(parent = emptyenv())
    obj$optimizer     <- free_opt
    obj$x             <- check.numeric.vector(x0, "x0")
    obj$grad_fun      <- grad_fun
    obj$obj_fun       <- NULL
    obj$hess_vec_fun  <- NULL
    obj$pred_fun      <- pred_fun
    obj$initial_step  <- check.step.size(initial_step)
    obj$step_fun      <- step_fun
    obj$callback_iter <- callback_iter
    obj$args_cb       <- args_cb
    obj$verbose       <- check.flag(verbose, "verbose")
    obj$valset        <- NULL
    obj$stored_X      <- list()
    obj$stored_y      <- list()
    obj$stored_w      <- list()
    class(obj) <- c(cls, "stochQN_guided")
    # Pop the core's Start-phase round: the first run consumes no gradient
    # and returns the initial calc_grad request at x0, so the first
    # partial_fit serves exactly one gradient per iteration.
    obj$req <- run.step(obj, obj$initial_step)
    obj
}

#' Guided oLBFGS: feed batches via `partial_fit`.
#' @export
oLBFGS <- function(x0, grad_fun, pred_fun = NULL, initial_step = 1e-2,
                   step_fun = function(iter) 1 / sqrt((iter / 10) + 1),
                   callback_iter = NULL, args_cb = NULL, verbose = TRUE,
                   mem_size = 10, hess_init = NULL, min_curvature = 1e-4,
                   y_reg = NULL, check_nan = TRUE) {
    new.guided("oLBFGS", x0,
               oLBFGS_free(mem_size, hess_init, min_curvature, y_reg,
                           check_nan),
               grad_fun, pred_fun, initial_step, step_fun, callback_iter,
               args_cb, verbose)
}

#' Guided SQN; needs `hess_vec_fun` unless `use_grad_diff`.
#' @export
SQN <- function(x0, grad_fun, hess_vec_fun = NULL, pred_fun = NULL,
                initial_step = 1e-3,
                step_fun = function(iter) 1 / sqrt((iter / 10) + 1),
                callback_iter = NULL, args_cb = NULL, verbose = TRUE,
                mem_size = 10, bfgs_upd_freq = 20, min_curvature = 1e-4,
                y_reg = NULL, use_grad_diff = FALSE, check_nan = TRUE) {
    if (!use_grad_diff && !is.function(hess_vec_fun)) {
        stop("'hess_vec_fun' is required when 'use_grad_diff' is FALSE")
    }
    obj <- new.guided("SQN", x0,
                      SQN_free(mem_size, bfgs_upd_freq, min_curvature, y_reg,
                               use_grad_diff, check_nan),
                      grad_fun, pred_fun, initial_step, step_fun,
                      callback_iter, args_cb, verbose)
    obj$hess_vec_fun <- hess_vec_fun
    obj
}

#' Guided adaQN; needs `obj_fun` when `max_incr > 0`; an explicit
#' validation set (`X_val`, `y_val`, `w_val`) replaces stored batches for
#' function-value requests, like the reference (R/optimizers_guided.R:517).
#' @export
adaQN <- function(x0, grad_fun, obj_fun = NULL, pred_fun = NULL,
                  initial_step = 1e-2,
                  step_fun = function(iter) 1 / sqrt((iter / 100) + 1),
                  callback_iter = NULL, args_cb = NULL, verbose = TRUE,
                  mem_size = 10, fisher_size = 100, bfgs_upd_freq = 20,
                  max_incr = 1.01, min_curvature = 1e-4, scal_reg = 1e-4,
                  rmsprop_weight = NULL, y_reg = NULL, use_grad_diff = FALSE,
                  check_nan = TRUE, X_val = NULL, y_val = NULL,
                  w_val = NULL) {
    max_incr <- check.nonneg.number(max_incr, "max_incr")
    if (max_incr > 0 && !is.function(obj_fun)) {
        stop("'obj_fun' is required when 'max_incr' > 0")
    }
    obj <- new.guided("adaQN", x0,
                      adaQN_free(mem_size, fisher_size, bfgs_upd_freq,
                                 max_incr, min_curvature, scal_reg,
                                 rmsprop_weight, y_reg, use_grad_diff,
                                 check_nan),
                      grad_fun, pred_fun, initial_step, step_fun,
                      callback_iter, args_cb, verbose)
    obj$obj_fun <- obj_fun
    if (!is.null(X_val)) obj$valset <- list(X = X_val, y = y_val, w = w_val)
    obj
}

run.step <- function(this, step_size) {
    if (inherits(this, "oLBFGS")) {
        run_oLBFGS_free(this$optimizer, this$x, step_size)
    } else if (inherits(this, "SQN")) {
        run_SQN_free(this$optimizer, this$x, step_size)
    } else {
        run_adaQN_free(this$optimizer, this$x, step_size)
    }
}

long.batch <- function(this) {
    if (!is.null(this$valset)) return(this$valset)
    if (!length(this$stored_X)) {
        stop(paste("a big-batch calculation was requested before any batch",
                   "was stored — pass data through partial_fit first"))
    }
    out <- list(X = do.call(rbind, this$stored_X),
                y = if (length(this$stored_y)) {
                        if (is.null(dim(this$stored_y[[1]])))
                            do.call(c, this$stored_y)
                        else do.call(rbind, this$stored_y)
                    } else NULL,
                w = if (length(this$stored_w)) do.call(c, this$stored_w)
                    else NULL)
    this$stored_X <- list()
    this$stored_y <- list()
    this$stored_w <- list()
    out
}

needs.batch.storage <- function(this) {
    if (inherits(this, "SQN")) return(TRUE)
    if (inherits(this, "adaQN")) {
        p <- this$optimizer$params
        return(is.null(this$valset) &&
               (p$max_incr > 0 || p$use_grad_diff))
    }
    FALSE
}

#' Run exactly one optimizer iteration on a batch, serving every protocol
#' request it takes to get there.  Mutates `optimizer` (an environment).
#' @export
partial_fit <- function(optimizer, X, y = NULL, weights = NULL, ...) {
    this <- optimizer
    if (!inherits(this, "stochQN_guided")) stop("invalid optimizer object")
    start_iter <- this$req$info$iteration_number

    repeat {
        task <- this$req$task
        if (task %in% c("calc_grad", "calc_grad_same_batch")) {
            req_x <- if (is.list(this$req$requested_on))
                         this$req$requested_on$req_x
                     else this$req$requested_on
            update_gradient(this$optimizer,
                            this$grad_fun(req_x, X, y, weights, ...))
        } else if (task == "calc_grad_big_batch") {
            lb <- long.batch(this)
            req_x <- if (is.list(this$req$requested_on))
                         this$req$requested_on$req_x
                     else this$req$requested_on
            update_gradient(this$optimizer,
                            this$grad_fun(req_x, lb$X, lb$y, lb$w, ...))
        } else if (task == "calc_hess_vec") {
            lb <- long.batch(this)
            update_hess_vec(this$optimizer,
                            this$hess_vec_fun(this$req$requested_on$req_x,
                                              this$req$requested_on$req_vec,
                                              lb$X, lb$y, lb$w, ...))
        } else if (task == "calc_fun_val_batch") {
            lb <- long.batch(this)
            req_x <- if (is.list(this$req$requested_on))
                         this$req$requested_on$req_x
                     else this$req$requested_on
            update_fun(this$optimizer,
                       this$obj_fun(req_x, lb$X, lb$y, lb$w, ...))
        } else {
            stop(sprintf("optimizer requested '%s' — invalid inputs", task))
        }

        niter <- this$req$info$iteration_number
        step_size <- this$step_fun(niter) * this$initial_step
        this$req <- run.step(this, step_size)
        this$x <- this$req$x

        if (this$verbose &&
            this$req$info$iteration_info != "no_problems_encountered") {
            cat(sprintf("%s - at iteration %d: %s\n", class(this)[1],
                        this$req$info$iteration_number,
                        this$req$info$iteration_info))
        }
        # Iteration boundary = the next fresh-batch gradient request, like
        # the reference's Python driver (_optimizers.py:379-382).  The
        # reference's R loop instead breaks as soon as the counter
        # increments (R/optimizers_guided.R:93), which leaves oLBFGS's
        # calc_grad_same_batch pending and serves it with the NEXT batch —
        # defeating the same-batch y = g2 - g1 construction.  That quirk is
        # not reproduced (see docs/protocol.md: reference bugs are not).
        if (this$req$task == "calc_grad" &&
            this$req$info$iteration_number > start_iter) break
    }

    if (!is.null(this$callback_iter)) {
        this$callback_iter(this$x, this$req$info$iteration_number,
                           this$args_cb)
    }
    # Store this batch AFTER the update, like the reference
    # (R/optimizers_guided.R:100-103), for future big-batch requests.
    if (needs.batch.storage(this)) {
        this$stored_X[[length(this$stored_X) + 1L]] <- X
        if (!is.null(y)) this$stored_y[[length(this$stored_y) + 1L]] <- y
        if (!is.null(weights)) {
            this$stored_w[[length(this$stored_w) + 1L]] <- weights
        }
    }
    invisible(NULL)
}

#' @export
predict.stochQN_guided <- function(object, newdata, ...) {
    if (is.null(object$pred_fun)) {
        stop("this optimizer was built without a 'pred_fun'")
    }
    object$pred_fun(newdata, object$x, ...)
}

#' Current iterate.
#' @export
get_curr_x <- function(optimizer) {
    if (inherits(optimizer, "stochQN_guided")) return(optimizer$x)
    if (inherits(optimizer, "stochQN_free")) return(optimizer$x)
    stop("'optimizer' must be a stochqn.tpu optimizer object")
}

#' Number of completed optimizer iterations.
#' @export
get_iteration_number <- function(optimizer) {
    if (inherits(optimizer, "stochQN_guided")) {
        return(optimizer$req$info$iteration_number)
    }
    if (inherits(optimizer, "stochQN_free")) {
        if (is.null(optimizer$handle)) return(0L)
        return(.Call(C_optimizer_niter, optimizer$handle))
    }
    stop("'optimizer' must be a stochqn.tpu optimizer object")
}

print.guided <- function(x, what) {
    cat(sprintf("%s guided optimizer (stochqn.tpu)\n", what))
    cat(sprintf("dimension: %d\n", length(x$x)))
    cat(sprintf("iterations: %d\n", x$req$info$iteration_number))
    invisible(x)
}

#' @export
print.oLBFGS <- function(x, ...) print.guided(x, "oLBFGS")
#' @export
print.SQN <- function(x, ...) print.guided(x, "SQN")
#' @export
print.adaQN <- function(x, ...) print.guided(x, "adaQN")
