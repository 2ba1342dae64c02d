from pararealml_tpu.operators.ml.deeponet import DeepONet
from pararealml_tpu.operators.ml.supervised.deeponet_refinement import (
    refine_affine_deeponet_branch,
)
from pararealml_tpu.operators.ml.supervised.sklearn_jax_regressor import (
    SKLearnJaxRegressor,
)
from pararealml_tpu.operators.ml.supervised.state_operator_regressor import (
    ReducedQuadraticStateOperatorRegressor,
    StateOperatorRidgeRegressor,
)
from pararealml_tpu.operators.ml.supervised.supervised_ml_operator import (
    SupervisedMLOperator,
)

# migration alias for the reference's Keras-based regressor name
# (/root/reference/pararealml/operators/ml/supervised/__init__.py:11-15)
SKLearnKerasRegressor = SKLearnJaxRegressor

__all__ = [
    "DeepONet",
    "ReducedQuadraticStateOperatorRegressor",
    "SKLearnJaxRegressor",
    "SKLearnKerasRegressor",
    "StateOperatorRidgeRegressor",
    "SupervisedMLOperator",
    "refine_affine_deeponet_branch",
]
