from stochqn_tpu.parallel.evaluate import (data_parallel_grad,  # noqa: F401
                                           data_parallel_hvp,
                                           data_parallel_value)
from stochqn_tpu.parallel.hlo_stats import (collective_bytes,  # noqa: F401
                                            collective_ops)
from stochqn_tpu.parallel.mesh import (DATA_AXIS, PARAM_AXIS,  # noqa: F401
                                       batch_sharding,
                                       epoch_batch_constraint, make_mesh,
                                       param_sharding, replicated,
                                       shard_batches, shard_state)
