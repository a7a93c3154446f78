from stochqn_tpu.utils.schedules import step_size_const, step_size_sqrt  # noqa: F401
