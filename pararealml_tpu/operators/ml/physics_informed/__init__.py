from pararealml_tpu.operators.ml.deeponet import FNN, DeepONet
from pararealml_tpu.operators.ml.physics_informed.auto_differentiator \
    import AutoDifferentiator
from pararealml_tpu.operators.ml.physics_informed.\
    collocation_point_sampler import (
        AxialBoundaryPoints,
        CollocationPoints,
        CollocationPointSampler,
        UniformRandomCollocationPointSampler,
    )
from pararealml_tpu.operators.ml.physics_informed.dataset import (
    BoundaryBatch,
    Dataset,
    DatasetIterator,
    DomainBatch,
    InitialBatch,
)
from pararealml_tpu.operators.ml.physics_informed.\
    physics_informed_ml_operator import (
        DataArgs,
        ModelArgs,
        OptimizationArgs,
        PhysicsInformedMLOperator,
    )
from pararealml_tpu.operators.ml.physics_informed.\
    physics_informed_regressor import PhysicsInformedRegressor

__all__ = [
    "DeepONet",
    "FNN",
    "AutoDifferentiator",
    "CollocationPointSampler",
    "CollocationPoints",
    "AxialBoundaryPoints",
    "UniformRandomCollocationPointSampler",
    "Dataset",
    "DatasetIterator",
    "DomainBatch",
    "InitialBatch",
    "BoundaryBatch",
    "PhysicsInformedRegressor",
    "DataArgs",
    "ModelArgs",
    "OptimizationArgs",
    "PhysicsInformedMLOperator",
]
