# Stochastic (binary) logistic regression over the guided optimizers —
# the counterpart of the reference's R model (R/logistic.R): formula
# interface with factor-level pinning and `pos_class` handling
# (reference R/logistic.R:120-210,333-435), data.frame `predict`
# (:218-318), plus the matrix interface, with self-contained closed-form
# loss / gradient / Hessian-vector functions.
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

# Re-pin the factor columns of a data.frame to the levels seen in the
# first batch — whatever levels the first batch had ARE the model's
# levels (reference R/logistic.R:347-354,408-412); unseen levels in later
# batches become NA rather than silently renumbering the design columns.
pin.factor.levels <- function(df, cols, levs) {
    for (cl in cols) {
        df[[cl]] <- factor(df[[cl]], levels = levs[[cl]])
    }
    df
}

chars.to.factors <- function(df) {
    chr <- names(df)[vapply(df, is.character, logical(1))]
    for (cl in chr) df[[cl]] <- factor(df[[cl]])
    df
}

#' Binary logistic regression fit in batches with oLBFGS / SQN / adaQN.
#'
#' Two interfaces, as in the reference (R/logistic.R:120-210):
#'   * formula: pass `formula` + `pos_class`; batches are data.frames
#'     containing the target column; the design matrix (factor encoding
#'     included) comes from `model.matrix`, with factor levels pinned
#'     from the FIRST batch; `intercept`/`dim` are ignored.
#'   * matrix: pass `dim` (or `x0`, or defer to the first batch's column
#'     count) and 0/1 targets.
#' `val_data = list(X=, y=, w=)` supplies adaQN's function-value guard
#' validation set (with formula, `X` is a data.frame containing the
#' target and `y` is derived from it).
#' @export
stochastic_logistic_regression <- function(formula = NULL, pos_class = NULL,
                                           dim = NULL, intercept = TRUE,
                                           x0 = NULL, optimizer = "adaQN",
                                           lambda = 1e-3, random_seed = 1,
                                           val_data = NULL, ...) {
    if (!optimizer %in% c("oLBFGS", "SQN", "adaQN")) {
        stop("'optimizer' must be one of 'oLBFGS', 'SQN', 'adaQN'")
    }
    if (!is.null(val_data)) {
        if (!is.list(val_data) || !("X" %in% names(val_data))) {
            stop("'val_data' must be a list with entries 'X', 'y', ",
                 "optionally 'w'")
        }
        if (is.null(formula) && is.null(val_data$y)) {
            stop("'val_data$y' is required without a formula")
        }
    }
    model <- new.env(parent = emptyenv())
    model$formula   <- NULL
    model$pos_class <- NULL
    model$colnames  <- NULL
    if (!is.null(formula)) {
        if (!inherits(formula, "formula")) {
            stop("'formula' must be a formula, e.g. y ~ x1 + x2")
        }
        if (is.null(pos_class) || length(pos_class) != 1L ||
            !is.character(pos_class)) {
            stop("with 'formula', 'pos_class' must be a single string")
        }
        if (!is.null(x0) || !is.null(dim)) {
            stop("'x0'/'dim' are incompatible with 'formula': the design ",
                 "size (and coefficient init) comes from the first batch")
        }
        model$formula   <- formula
        model$pos_class <- pos_class
        intercept <- FALSE             # model.matrix supplies the column
    }
    model$intercept <- check.flag(intercept, "intercept")
    model$lambda    <- check.nonneg.number(lambda, "lambda")
    model$opt_name  <- optimizer
    model$opt_args  <- list(...)
    model$seed      <- random_seed
    model$val_data  <- val_data
    model$optimizer <- NULL
    if (!is.null(x0)) {
        model$x0 <- check.numeric.vector(x0, "x0")
    } else if (!is.null(dim)) {
        nvar <- check.positive.integer(dim, "dim") + as.integer(intercept)
        set.seed(random_seed)
        model$x0 <- rnorm(nvar, sd = 0.1)
    } else {
        model$x0 <- NULL  # deferred to the first batch
    }
    class(model) <- "stochastic_logistic_regression"
    model
}

build.optimizer <- function(model) {
    lam <- model$lambda
    grad_fun <- function(x, X, y, w, ...) logistic_grad(x, X, y, w, lam)
    obj_fun  <- function(x, X, y, w, ...) logistic_loss(x, X, y, w, lam)
    hv_fun   <- function(x, v, X, y, w, ...) {
        logistic_Hess_vec(x, v, X, y, w, lam)
    }
    ctor_args <- c(list(x0 = model$x0, grad_fun = grad_fun,
                        pred_fun = logistic_pred, verbose = FALSE),
                   model$opt_args)
    if (model$opt_name == "adaQN" && !is.null(model$val_data)) {
        ctor_args$X_val <- model$val_data$X
        ctor_args$y_val <- model$val_data$y
        ctor_args$w_val <- model$val_data$w
    }
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

init.logistic <- function(model, nfeat) {
    if (is.null(model$x0)) {
        set.seed(model$seed)
        model$x0 <- rnorm(nfeat + as.integer(model$intercept), sd = 0.1)
    }
    if (!is.null(model$val_data)) {
        model$val_data$X <- with.intercept(as.matrix(model$val_data$X),
                                           model$intercept)
        model$val_data$y <- as.numeric(model$val_data$y)
    }
    build.optimizer(model)
}

# Formula-path deferred initialization from the first batch (reference
# R/logistic.R:344-403): character columns become factors; factor levels
# are pinned; the target column comes from the formula's response, must
# be a 2-level factor containing `pos_class`; the design size and column
# names come from `model.matrix` on the (level-pinned) batch.
init.formula <- function(model, X) {
    X <- chars.to.factors(X)
    target <- all.vars(model$formula)[1]
    if (!(target %in% colnames(X))) {
        stop("'X' does not contain the target column")
    }
    if (!is.factor(X[[target]])) {
        stop("the target column in the formula must be a factor")
    }
    if (length(levels(X[[target]])) != 2) {
        stop("the target column must have exactly 2 factor levels")
    }
    if (!(model$pos_class %in% levels(X[[target]]))) {
        stop("'pos_class' is not a factor level of the target column")
    }
    model$target_col <- target
    model$neg_class  <- setdiff(levels(X[[target]]), model$pos_class)
    fac <- names(X)[vapply(X, is.factor, logical(1))]
    model$factor_cols <- setdiff(fac, target)
    model$factor_levs <- lapply(model$factor_cols,
                                function(cl) levels(X[[cl]]))
    names(model$factor_levs) <- model$factor_cols

    design <- model.matrix(model$formula, data = X)
    model$colnames <- colnames(design)
    set.seed(model$seed)
    model$x0 <- rnorm(ncol(design), sd = 0.1)

    if (!is.null(model$val_data)) {
        xv <- chars.to.factors(as.data.frame(model$val_data$X))
        xv <- pin.factor.levels(xv, model$factor_cols, model$factor_levs)
        if (!(target %in% colnames(xv))) {
            stop("'X' in 'val_data' does not contain the target column")
        }
        # one model.frame keeps y/w aligned with NA-dropped design rows
        # (see formula.batch)
        mfv <- stats::model.frame(model$formula, data = xv,
                                  na.action = stats::na.omit)
        model$val_data$y <- as.numeric(
            stats::model.response(mfv) == model$pos_class)
        droppedv <- attr(mfv, "na.action")
        if (!is.null(model$val_data$w) && !is.null(droppedv)) {
            model$val_data$w <- model$val_data$w[-as.integer(droppedv)]
        }
        model$val_data$X <- model.matrix(model$formula, data = mfv)
    }
    build.optimizer(model)
}

# data.frame batch -> (design matrix, 0/1 target, weights) under the
# pinned levels.  Built from ONE model.frame so rows that model.matrix
# drops (NA predictors, unseen-then-pinned-to-NA factor levels) are
# dropped from y and weights too — computing y from the raw data.frame
# would silently misalign it against the design matrix.
formula.batch <- function(model, X, weights = NULL) {
    if (!is.data.frame(X)) {
        stop("'X' must be a data.frame when using the formula interface")
    }
    X <- chars.to.factors(X)
    X <- pin.factor.levels(X, model$factor_cols, model$factor_levs)
    if (!(model$target_col %in% colnames(X))) {
        stop("'X' does not contain the target column")
    }
    mf <- stats::model.frame(model$formula, data = X,
                             na.action = stats::na.omit)
    if (nrow(mf) == 0) {
        stop("batch has no usable rows after dropping NAs / unseen ",
             "factor levels")
    }
    y <- as.numeric(stats::model.response(mf) == model$pos_class)
    dropped <- attr(mf, "na.action")
    if (!is.null(weights) && !is.null(dropped)) {
        weights <- weights[-as.integer(dropped)]
    }
    list(X = model.matrix(model$formula, data = mf), y = y, w = weights)
}

#' Update the model with one batch (one optimizer iteration).
#' With a formula model, `X` is a data.frame containing the target column
#' and `y` must be omitted; with the matrix interface, `X` is a numeric
#' matrix and `y` a 0/1 vector.
#' @export
partial_fit_logistic <- function(model, X, y = NULL, weights = NULL) {
    if (!inherits(model, "stochastic_logistic_regression")) {
        stop("'model' must come from stochastic_logistic_regression()")
    }
    if (!is.null(model$formula)) {
        if (!is.null(y)) stop("'y' is only used for non-formula models")
        if (!is.data.frame(X)) {
            stop("'X' must be a data.frame when using the formula interface")
        }
        if (is.null(model$optimizer)) init.formula(model, X)
        b <- formula.batch(model, X, weights)
        partial_fit(model$optimizer, b$X, b$y, b$w)
        return(invisible(NULL))
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
    if (!is.null(object$formula)) {
        # glm-style named column matrix (reference R/logistic.R:255-262)
        out <- matrix(x, nrow = length(x))
        rownames(out) <- object$colnames
        return(out)
    }
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
    if (!(type %in% c("class", "prob"))) {
        stop("'type' must be 'class' or 'prob'")
    }
    if (!is.null(object$formula)) {
        nd <- chars.to.factors(as.data.frame(newdata))
        nd <- pin.factor.levels(nd, object$factor_cols, object$factor_levs)
        # predict must work without the target column: build the design
        # from the RHS terms only when the response is absent
        if (object$target_col %in% colnames(nd)) {
            tt <- stats::terms(object$formula, data = nd)
        } else {
            tt <- stats::delete.response(
                stats::terms(object$formula, data = nd))
        }
        # na.pass (not the na.omit default): rows with NAs or unseen
        # (pinned-to-NA) factor levels must yield NA predictions instead
        # of being silently dropped — callers align predictions to
        # nrow(newdata) positionally
        mf <- stats::model.frame(tt, data = nd,
                                 na.action = stats::na.pass)
        Xi <- stats::model.matrix(tt, data = mf)
        p <- logistic_pred(Xi, get_curr_x(object$optimizer))
        if (anyNA(p)) {
            warning(sprintf(
                "%d newdata row(s) had NAs or unseen factor levels; their predictions are NA (rows: %s)",
                sum(is.na(p)),
                paste(utils::head(which(is.na(p)), 10L),
                      collapse = ", ")))
        }
        if (type == "prob") return(p)
        return(ifelse(p >= 0.5, object$pos_class, object$neg_class))
    }
    Xi <- with.intercept(as.matrix(newdata), object$intercept)
    p <- logistic_pred(Xi, get_curr_x(object$optimizer))
    if (type == "prob") p else as.numeric(p >= 0.5)
}

#' @export
print.stochastic_logistic_regression <- function(x, ...) {
    cat("Stochastic logistic regression (stochqn.tpu)\n")
    cat(sprintf("optimizer: %s\n", x$opt_name))
    if (!is.null(x$formula)) {
        cat("formula: "); print(x$formula)
        cat(sprintf("positive class: %s\n", x$pos_class))
    }
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
