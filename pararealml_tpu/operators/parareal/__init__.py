from pararealml_tpu.operators.parareal.parareal_operator import (
    PararealOperator,
)
from pararealml_tpu.operators.parareal.space_time import (
    SpaceTimePararealOperator,
)

__all__ = ["PararealOperator", "SpaceTimePararealOperator"]
