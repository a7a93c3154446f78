from stochqn_tpu.ops.accumulators import diag_rescal, update_sum_sq  # noqa: F401
from stochqn_tpu.ops.pairs import (commit_pair, direction_is_bad,  # noqa: F401
                                   fisher_y)
from stochqn_tpu.ops.two_loop import (two_loop, two_loop_cached,  # noqa: F401
                                      two_loop_sequential)
