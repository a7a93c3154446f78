from stochqn_tpu.models import losses  # noqa: F401
from stochqn_tpu.models.logistic import StochasticLogisticRegression  # noqa: F401
