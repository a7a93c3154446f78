# Stochastic (binary) logistic regression over the guided optimizers —
# the counterpart of the reference's R model (R/logistic.R), matrix
# interface, with self-contained closed-form loss / gradient /
# Hessian-vector functions.
#
# Note the reference's `logistic_Hess_vec` scales `t(X)` by the sigmoid
# variance with element-wise recycling (`(t(X) * diag) %*% ...`,
# reference R/logistic.R:30), which is only the intended row scaling when
# the feature count equals the batch size; the forms here compute the
# standard X^T (sigma'(Xw) * (X v)) product.  Reference bugs are not
# reproduced (see docs/protocol.md in the repo root).

#' Regularized binary log-loss; `lambda * ||coefs||^2` penalty.
#' @export
logistic_loss <- function(coefs, X, y, weights = NULL, lambda = 1e-3) {
    z <- as.numeric(X %*% coefs)
    # log(1 + exp(-|z|)) form: no overflow, exact at both tails
    ll <- pmax(z, 0) - z * y + log1p(exp(-abs(z)))
    m <- if (is.null(weights)) mean(ll) else sum(ll * weights) / sum(weights)
    m + lambda * sum(coefs^2)
}

#' Gradient of `logistic_loss`.
#' @export
logistic_grad <- function(coefs, X, y, weights = NULL, lambda = 1e-3) {
    p <- 1 / (1 + exp(-as.numeric(X %*% coefs)))
    r <- p - y
    g <- if (is.null(weights)) {
        as.numeric(crossprod(X, r)) / nrow(X)
    } else {
        as.numeric(crossprod(X, r * weights)) / sum(weights)
    }
    g + 2 * lambda * as.numeric(coefs)
}

#' Hessian-vector product of `logistic_loss`.
#' @export
logistic_Hess_vec <- function(coefs, vec, X, y, weights = NULL,
                              lambda = 1e-3) {
    p <- 1 / (1 + exp(-as.numeric(X %*% coefs)))
    d <- p * (1 - p)
    Xv <- as.numeric(X %*% vec)
    hv <- if (is.null(weights)) {
        as.numeric(crossprod(X, d * Xv)) / nrow(X)
    } else {
        as.numeric(crossprod(X, d * Xv * weights)) / sum(weights)
    }
    hv + 2 * lambda * as.numeric(vec)
}

#' Predicted probabilities.
#' @export
logistic_pred <- function(X, coefs, ...) {
    1 / (1 + exp(-as.numeric(X %*% coefs)))
}

with.intercept <- function(X, intercept) {
    X <- as.matrix(X)
    if (intercept) cbind(X, 1.0) else X
}

#' Binary logistic regression fit in batches with oLBFGS / SQN / adaQN.
#' Matrix interface; `dim` (number of features) may be deferred to the
#' first `partial_fit_logistic` batch, like the reference
#' (R/logistic.R:344-403).
#' @export
stochastic_logistic_regression <- function(dim = NULL, intercept = TRUE,
                                           x0 = NULL, optimizer = "adaQN",
                                           lambda = 1e-3, random_seed = 1,
                                           ...) {
    if (!optimizer %in% c("oLBFGS", "SQN", "adaQN")) {
        stop("'optimizer' must be one of 'oLBFGS', 'SQN', 'adaQN'")
    }
    model <- new.env(parent = emptyenv())
    model$intercept <- check.flag(intercept, "intercept")
    model$lambda    <- check.nonneg.number(lambda, "lambda")
    model$opt_name  <- optimizer
    model$opt_args  <- list(...)
    model$seed      <- random_seed
    model$optimizer <- NULL
    if (!is.null(x0)) {
        model$x0 <- check.numeric.vector(x0, "x0")
    } else if (!is.null(dim)) {
        nvar <- check.positive.integer(dim, "dim") + as.integer(intercept)
        set.seed(random_seed)
        model$x0 <- rnorm(nvar)
    } else {
        model$x0 <- NULL  # deferred to the first batch
    }
    class(model) <- "stochastic_logistic_regression"
    model
}

init.logistic <- function(model, nfeat) {
    if (is.null(model$x0)) {
        set.seed(model$seed)
        model$x0 <- rnorm(nfeat + as.integer(model$intercept))
    }
    lam <- model$lambda
    grad_fun <- function(x, X, y, w, ...) logistic_grad(x, X, y, w, lam)
    obj_fun  <- function(x, X, y, w, ...) logistic_loss(x, X, y, w, lam)
    hv_fun   <- function(x, v, X, y, w, ...) {
        logistic_Hess_vec(x, v, X, y, w, lam)
    }
    ctor_args <- c(list(x0 = model$x0, grad_fun = grad_fun,
                        pred_fun = logistic_pred, verbose = FALSE),
                   model$opt_args)
    if (model$opt_name == "SQN") {
        ctor_args$hess_vec_fun <- hv_fun
        model$optimizer <- do.call(SQN, ctor_args)
    } else if (model$opt_name == "adaQN") {
        ctor_args$obj_fun <- obj_fun
        model$optimizer <- do.call(adaQN, ctor_args)
    } else {
        model$optimizer <- do.call(oLBFGS, ctor_args)
    }
    invisible(model)
}

#' Update the model with one batch (one optimizer iteration).
#' @export
partial_fit_logistic <- function(model, X, y, weights = NULL) {
    if (!inherits(model, "stochastic_logistic_regression")) {
        stop("'model' must come from stochastic_logistic_regression()")
    }
    X <- as.matrix(X)
    y <- as.numeric(y)
    if (!all(y %in% c(0, 1))) stop("'y' must be 0/1")
    if (nrow(X) != length(y)) stop("'X' and 'y' disagree on batch size")
    if (is.null(model$optimizer)) init.logistic(model, ncol(X))
    Xi <- with.intercept(X, model$intercept)
    if (ncol(Xi) != length(get_curr_x(model$optimizer))) {
        stop("'X' has the wrong number of columns")
    }
    partial_fit(model$optimizer, Xi, y, weights)
    invisible(NULL)
}

#' @export
coef.stochastic_logistic_regression <- function(object, ...) {
    if (is.null(object$optimizer)) stop("model not fitted yet")
    x <- get_curr_x(object$optimizer)
    if (object$intercept) {
        list(coefficients = x[-length(x)], intercept = x[length(x)])
    } else {
        list(coefficients = x, intercept = 0.0)
    }
}

#' @export
predict.stochastic_logistic_regression <- function(object, newdata,
                                                   type = "class", ...) {
    if (is.null(object$optimizer)) stop("model not fitted yet")
    Xi <- with.intercept(as.matrix(newdata), object$intercept)
    p <- logistic_pred(Xi, get_curr_x(object$optimizer))
    if (type == "prob") p else as.numeric(p >= 0.5)
}

#' @export
print.stochastic_logistic_regression <- function(x, ...) {
    cat("Stochastic logistic regression (stochqn.tpu)\n")
    cat(sprintf("optimizer: %s\n", x$opt_name))
    if (is.null(x$optimizer)) {
        cat("not fitted yet\n")
    } else {
        cat(sprintf("features: %d (intercept: %s)\n",
                    length(get_curr_x(x$optimizer)) -
                        as.integer(x$intercept),
                    if (x$intercept) "yes" else "no"))
        cat(sprintf("iterations: %d\n",
                    get_iteration_number(x$optimizer)))
    }
    invisible(x)
}

#' @export
summary.stochastic_logistic_regression <- function(object, ...) {
    print(object)
}
