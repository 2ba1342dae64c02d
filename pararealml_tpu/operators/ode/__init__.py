from pararealml_tpu.operators.ode.ode_operator import (
    ODEOperator,
    RKTableau,
)

__all__ = ["ODEOperator", "RKTableau"]
