import numpy as np
import pytest

from pararealml_tpu import Constraint
from pararealml_tpu.operators.fdm import (
    BackwardEulerMethod,
    CrankNicolsonMethod,
    ExplicitMidpointMethod,
    ForwardEulerMethod,
    RK4,
)


def _integrate_exponential(integrator, d_t, steps):
    """Integrates y' = y from y(0) = 1 with no constraints."""
    import jax

    step = jax.jit(
        lambda y: integrator.integral(
            y, d_t, lambda offset, y_arg: y_arg, lambda offset: None
        )
    )
    y = np.ones((1, 1))
    for _ in range(steps):
        y = step(y)
    return float(np.asarray(y)[0, 0])


def test_explicit_methods_order_of_accuracy():
    d_t, steps = 0.1, 10
    exact = np.e
    euler_error = abs(
        _integrate_exponential(ForwardEulerMethod(), d_t, steps) - exact
    )
    midpoint_error = abs(
        _integrate_exponential(ExplicitMidpointMethod(), d_t, steps)
        - exact
    )
    rk4_error = abs(_integrate_exponential(RK4(), d_t, steps) - exact)
    assert rk4_error < 5e-6
    assert midpoint_error < 5e-3
    assert euler_error < 0.2
    assert rk4_error < midpoint_error < euler_error


def test_implicit_methods_converge():
    d_t, steps = 0.1, 10
    exact = np.e
    backward_error = abs(
        _integrate_exponential(BackwardEulerMethod(), d_t, steps) - exact
    )
    crank_error = abs(
        _integrate_exponential(CrankNicolsonMethod(), d_t, steps) - exact
    )
    assert backward_error < 0.2
    assert crank_error < 5e-3
    assert crank_error < backward_error


def test_implicit_method_validation():
    with pytest.raises(ValueError):
        BackwardEulerMethod(tol=-1.0)
    with pytest.raises(ValueError):
        BackwardEulerMethod(max_iterations=0)
    with pytest.raises(ValueError):
        CrankNicolsonMethod(a=1.5)


def test_crank_nicolson_weights():
    # a=0 reduces to forward Euler, a=1 to backward Euler
    d_t, steps = 0.1, 5
    forward = _integrate_exponential(ForwardEulerMethod(), d_t, steps)
    backward = _integrate_exponential(BackwardEulerMethod(), d_t, steps)
    assert np.isclose(
        _integrate_exponential(CrankNicolsonMethod(a=0.0), d_t, steps),
        forward,
        rtol=1e-6,
    )
    assert np.isclose(
        _integrate_exponential(CrankNicolsonMethod(a=1.0), d_t, steps),
        backward,
        rtol=1e-6,
    )


def test_constraints_applied_to_result():
    mask = np.array([[True]])
    values = np.array([[42.0]])
    constraint = Constraint(values, mask)
    y = np.ones((1, 1))
    out = np.asarray(
        RK4().integral(
            y,
            0.1,
            lambda offset, y_arg: y_arg,
            lambda offset: constraint,
        )
    )
    assert out[0, 0] == 42.0


def test_stage_offsets_passed_to_rhs():
    seen = []

    def rhs(offset, y_arg):
        seen.append(offset)
        return y_arg

    RK4().integral(
        np.ones((1, 1)), 0.1, rhs, lambda offset: None
    )
    assert seen == [0.0, 0.5, 0.5, 1.0]
