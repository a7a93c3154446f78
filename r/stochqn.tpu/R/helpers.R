# Shared helpers: protocol enum decoding and input validation.
#
# Task/info integer codes mirror the reference's enums
# (/root/reference/include/stochqn.h:268-284) and this framework's
# stochqn_tpu/core/enums.py; the decoded strings are identical to the
# reference R package's (R/helpers.R:35-61) so downstream dispatch code
# ports unchanged.

decode.task <- function(code) {
    switch(as.character(code),
           "100" = "invalid_input",
           "101" = "calc_grad",
           "102" = "calc_grad_same_batch",
           "103" = "calc_grad_big_batch",
           "104" = "calc_hess_vec",
           "105" = "calc_fun_val_batch",
           stop(sprintf("unknown task code %s", code)))
}

decode.info <- function(code) {
    switch(as.character(code),
           "200" = "no_problems_encountered",
           "201" = "func_increased",
           "202" = "curvature_too_small",
           "203" = "search_direction_was_nan",
           stop(sprintf("unknown info code %s", code)))
}

decode.x.changed <- function(flag) {
    if (isTRUE(flag) || identical(flag, 1L)) "updated_x" else "did_not_update_x"
}

check.positive.integer <- function(value, name) {
    if (is.null(value) || length(value) != 1L || is.na(value) ||
        value != floor(value) || value < 1) {
        stop(sprintf("'%s' must be a positive integer", name))
    }
    as.integer(value)
}

check.nonneg.number <- function(value, name, null_ok = TRUE) {
    if (is.null(value)) {
        if (null_ok) return(0.0)
        stop(sprintf("'%s' cannot be NULL", name))
    }
    if (length(value) != 1L || is.na(value) || !is.numeric(value) || value < 0) {
        stop(sprintf("'%s' must be a non-negative number", name))
    }
    as.numeric(value)
}

check.flag <- function(value, name) {
    if (length(value) != 1L || is.na(value) || !is.logical(value)) {
        stop(sprintf("'%s' must be TRUE or FALSE", name))
    }
    value
}

check.numeric.vector <- function(value, name) {
    if (is.integer(value)) value <- as.numeric(value)
    if (!is.numeric(value) || anyNA(value)) {
        stop(sprintf("'%s' must be a numeric vector without NAs", name))
    }
    as.numeric(value)
}

check.step.size <- function(step_size) {
    if (length(step_size) != 1L || is.na(step_size) ||
        !is.numeric(step_size) || step_size <= 0) {
        stop("'step_size' must be a positive number")
    }
    as.numeric(step_size)
}

# Assemble the request list every run_*_free returns — the same schema as
# the reference R package (R/optimizers_free.R:456-464) plus the updated
# iterate under `x` (this package is functional: the caller's vector is
# never mutated in place).
make.request <- function(raw, n) {
    requested_on <- if (is.null(raw$req_vec)) {
        raw$req
    } else {
        list(req_x = raw$req, req_vec = raw$req_vec)
    }
    list(task = decode.task(raw$task),
         requested_on = requested_on,
         x = raw$x,
         info = list(x_changed_in_run = decode.x.changed(raw$x_changed),
                     iteration_number = raw$iteration,
                     iteration_info   = decode.info(raw$info)))
}

