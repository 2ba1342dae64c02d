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


@pytest.mark.parametrize(
    "integrator,expected_order",
    [
        (ForwardEulerMethod(), 1),
        (ExplicitMidpointMethod(), 2),
        (RK4(), 4),
        (BackwardEulerMethod(), 1),
        (CrankNicolsonMethod(), 2),
    ],
)
def test_empirical_convergence_order(integrator, expected_order):
    # halving the step must cut the global error by ~2^order on the
    # exact exponential
    exact = np.e
    errors = []
    for d_t, steps in ((0.1, 10), (0.05, 20)):
        errors.append(
            abs(
                _integrate_exponential(integrator, d_t, steps) - exact
            )
        )
    ratio = errors[0] / errors[1]
    assert 2**expected_order * 0.6 < ratio < 2**expected_order * 1.7, (
        errors,
        ratio,
    )


def test_constraints_applied_at_every_stage():
    # a pinned component must hold its value through multi-stage
    # integration, exactly as the reference applies constraints at each
    # stage (numerical_integrator.py:93-132)
    mask = np.array([[False], [True]])
    values = np.where(mask, 5.0, 0.0)
    constraint = Constraint(
        np.asarray(values, np.float64), np.asarray(mask)
    )

    def apply(y):
        import jax.numpy as jnp

        return jnp.where(jnp.asarray(mask), 5.0, y)

    y = np.array([[1.0], [5.0]])
    for integrator in (
        ForwardEulerMethod(),
        RK4(),
        CrankNicolsonMethod(),
    ):
        result = integrator.integral(
            y,
            0.1,
            lambda offset, y_arg: y_arg,
            lambda offset: None,
        )
        # without constraints both components grow
        assert float(np.asarray(result)[1, 0]) > 5.0

        result = integrator.integral(
            y,
            0.1,
            lambda offset, y_arg: apply(y_arg) * 1.0,
            lambda offset, _c=constraint: _constraint_fn(_c),
        )
        assert np.isclose(float(np.asarray(result)[1, 0]), 5.0)


def _constraint_fn(constraint):
    return constraint


def test_implicit_methods_solve_stiff_decay_stably():
    # y' = -50 y with d_t = 0.1 blows up explicitly but must decay
    # monotonically under the implicit methods
    import jax

    for integrator in (BackwardEulerMethod(), CrankNicolsonMethod()):
        step = jax.jit(
            lambda y, _i=integrator: _i.integral(
                y,
                0.1,
                lambda offset, y_arg: -50.0 * y_arg,
                lambda offset: None,
            )
        )
        y = np.ones((1, 1))
        previous = 1.0
        for _ in range(20):
            y = step(y)
            value = abs(float(np.asarray(y)[0, 0]))
            assert value < previous + 1e-12
            previous = value
        assert previous < 1.0

    explicit = ForwardEulerMethod()
    y = np.ones((1, 1))
    for _ in range(20):
        y = explicit.integral(
            y, 0.1, lambda offset, y_arg: -50.0 * y_arg,
            lambda offset: None,
        )
    assert abs(float(np.asarray(y)[0, 0])) > 1e3  # explicit blow-up
