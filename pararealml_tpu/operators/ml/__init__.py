from pararealml_tpu.operators.ml.deeponet import (
    FNN,
    DeepONet,
    Standardized,
)
from pararealml_tpu.operators.ml.supervised.sklearn_jax_regressor import (
    SKLearnJaxRegressor,
)
from pararealml_tpu.operators.ml.supervised.supervised_ml_operator import (
    SupervisedMLOperator,
)

__all__ = [
    "DeepONet",
    "FNN",
    "Standardized",
    "SupervisedMLOperator",
    "SKLearnJaxRegressor",
]
