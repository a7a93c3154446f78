from stochqn_tpu.core import adaqn, olbfgs, sqn  # noqa: F401
from stochqn_tpu.core.config import AdaQNConfig, OLBFGSConfig, SQNConfig  # noqa: F401
from stochqn_tpu.core.enums import Info, Task  # noqa: F401
from stochqn_tpu.core.state import (AdaQNState, BFGSMemory,  # noqa: F401
                                    FisherMemory, OLBFGSState, SQNState)
