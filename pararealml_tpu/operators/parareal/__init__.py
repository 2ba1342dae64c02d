from pararealml_tpu.operators.parareal.parareal_operator import (
    PararealOperator,
)

__all__ = ["PararealOperator"]
