from pararealml_tpu.operators.fdm.fdm_operator import FDMOperator
from pararealml_tpu.operators.fdm.fdm_symbol_mapper import (
    FDMSymbolMapArg,
    FDMSymbolMapper,
)
from pararealml_tpu.operators.fdm.numerical_differentiator import (
    FivePointCentralDifferenceMethod,
    NumericalDifferentiator,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.operators.fdm.numerical_integrator import (
    BackwardEulerMethod,
    CrankNicolsonMethod,
    ExplicitMidpointMethod,
    ForwardEulerMethod,
    ImplicitMethod,
    NumericalIntegrator,
    RK4,
)
from pararealml_tpu.operators.fdm.padded_grid import (
    PaddedThreePointCentralDifferenceMethod,
)

__all__ = [
    "FDMOperator",
    "FDMSymbolMapArg",
    "FDMSymbolMapper",
    "NumericalDifferentiator",
    "ThreePointCentralDifferenceMethod",
    "FivePointCentralDifferenceMethod",
    "PaddedThreePointCentralDifferenceMethod",
    "NumericalIntegrator",
    "ForwardEulerMethod",
    "ExplicitMidpointMethod",
    "RK4",
    "ImplicitMethod",
    "BackwardEulerMethod",
    "CrankNicolsonMethod",
]
