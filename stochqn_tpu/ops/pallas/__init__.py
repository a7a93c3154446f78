from stochqn_tpu.ops.pallas import two_loop_kernel  # noqa: F401
