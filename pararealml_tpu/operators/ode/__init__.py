from pararealml_tpu.operators.ode.ode_operator import ODEOperator

__all__ = ["ODEOperator"]
