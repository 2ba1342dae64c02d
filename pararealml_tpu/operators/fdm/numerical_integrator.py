"""Time integration for the FDM operator.

Capability match for /root/reference/pararealml/operators/fdm/
numerical_integrator.py:10-270: forward Euler, explicit midpoint, RK4,
backward Euler, and the weighted Crank-Nicolson IMEX method.

Jit-native API redesign: the reference passes the absolute stage time to
its callbacks and looks constraints up in time-keyed dict caches, which
cannot trace. Here both callbacks are parameterized by the *static* stage
offset fraction (0.0, 0.5 or 1.0 of ``d_t``) — ``d_y_over_d_t(offset,
y)`` and ``y_constraint_function(offset) -> Optional[Constraint]`` — so
the FDM operator can select precomputed constraint tensors with a traced
step index while the stage structure stays static. The implicit solvers
replace SciPy's secant ``newton`` with an element-wise secant iteration
in a ``lax.while_loop``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pararealml_tpu.constraint import (
    Constraint,
    apply_constraints_along_last_axis,
)

DYOverDTFunction = Callable[[float, jax.Array], jax.Array]
YConstraintFunction = Callable[[float], Optional[Constraint]]


class NumericalIntegrator:
    """Base class for single-step time integrators."""

    def integral(
        self,
        y: jax.Array,
        d_t: float,
        d_y_over_d_t: DYOverDTFunction,
        y_constraint_function: YConstraintFunction,
    ) -> jax.Array:
        """Estimates y at the next time point.

        :param y: the current state
        :param d_t: the step size
        :param d_y_over_d_t: ``(offset, y) -> dy/dt`` evaluated at the
            stage time ``t + offset * d_t`` (offset is a static float)
        :param y_constraint_function: ``offset -> Optional[Constraint]``
            returning the solution constraints at the stage time
        :return: the estimate of y at the next time point
        """
        raise NotImplementedError


class ForwardEulerMethod(NumericalIntegrator):
    """The explicit first-order forward Euler method."""

    def integral(self, y, d_t, d_y_over_d_t, y_constraint_function):
        return apply_constraints_along_last_axis(
            y_constraint_function(1.0), y + d_t * d_y_over_d_t(0.0, y)
        )


class ExplicitMidpointMethod(NumericalIntegrator):
    """The explicit second-order midpoint method."""

    def integral(self, y, d_t, d_y_over_d_t, y_constraint_function):
        y_half = apply_constraints_along_last_axis(
            y_constraint_function(0.5),
            y + (d_t / 2.0) * d_y_over_d_t(0.0, y),
        )
        return apply_constraints_along_last_axis(
            y_constraint_function(1.0),
            y + d_t * d_y_over_d_t(0.5, y_half),
        )


class RK4(NumericalIntegrator):
    """The classic explicit fourth-order Runge-Kutta method with
    constraints applied at every stage."""

    def integral(self, y, d_t, d_y_over_d_t, y_constraint_function):
        half_constraint = y_constraint_function(0.5)
        full_constraint = y_constraint_function(1.0)

        k1 = d_t * d_y_over_d_t(0.0, y)
        k2 = d_t * d_y_over_d_t(
            0.5,
            apply_constraints_along_last_axis(half_constraint, y + k1 / 2.0),
        )
        k3 = d_t * d_y_over_d_t(
            0.5,
            apply_constraints_along_last_axis(half_constraint, y + k2 / 2.0),
        )
        k4 = d_t * d_y_over_d_t(
            1.0,
            apply_constraints_along_last_axis(full_constraint, y + k3),
        )
        return apply_constraints_along_last_axis(
            full_constraint,
            y + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0,
        )


class ImplicitMethod(NumericalIntegrator):
    """Base class for implicit methods solving the update equation with
    an element-wise secant iteration (the same scheme SciPy's ``newton``
    applies to array arguments) inside a ``lax.while_loop``."""

    def __init__(self, tol: float = 1.48e-8, max_iterations: int = 50):
        if tol < 0.0:
            raise ValueError("tolerance must be non-negative")
        if max_iterations <= 0:
            raise ValueError(
                "number of maximum iterations must be greater than 0"
            )
        self._tol = tol
        self._max_iterations = max_iterations

    def _solve(
        self,
        residual_function: Callable[[jax.Array], jax.Array],
        y_next_init: jax.Array,
    ) -> jax.Array:
        """Finds a root of the residual, element-wise, by secant."""
        eps = 1e-4
        p0 = y_next_init
        p1 = p0 * (1 + eps) + jnp.where(p0 >= 0, eps, -eps)
        q0 = residual_function(p0)
        q1 = residual_function(p1)

        def cond(carry):
            _, _, _, _, step_size, i = carry
            return (step_size > self._tol) & (i < self._max_iterations)

        def body(carry):
            p0, q0, p1, q1, _, i = carry
            denominator = q1 - q0
            safe = jnp.abs(denominator) > jnp.finfo(p1.dtype).tiny
            p = jnp.where(
                safe,
                p1 - q1 * (p1 - p0) / jnp.where(safe, denominator, 1.0),
                p1,
            )
            step_size = jnp.max(jnp.abs(p - p1))
            return p1, q1, p, residual_function(p), step_size, i + 1

        init = (p0, q0, p1, q1, jnp.asarray(jnp.inf, p1.dtype), 0)
        _, _, p_final, _, _, _ = jax.lax.while_loop(cond, body, init)
        return p_final


class BackwardEulerMethod(ImplicitMethod):
    """The implicit first-order backward Euler method."""

    def integral(self, y, d_t, d_y_over_d_t, y_constraint_function):
        next_constraint = y_constraint_function(1.0)
        y_next_init = apply_constraints_along_last_axis(
            next_constraint, y + d_t * d_y_over_d_t(0.0, y)
        )

        def residual(y_next):
            return y_next - apply_constraints_along_last_axis(
                next_constraint, y + d_t * d_y_over_d_t(1.0, y_next)
            )

        return self._solve(residual, y_next_init)


class CrankNicolsonMethod(ImplicitMethod):
    """A weighted implicit-explicit combination of the forward and
    backward Euler methods (``a`` is the implicit weight)."""

    def __init__(
        self, a: float = 0.5, tol: float = 1.48e-8, max_iterations: int = 50
    ):
        if not 0.0 <= a <= 1.0:
            raise ValueError("the value of 'a' must be between 0 and 1")
        super().__init__(tol, max_iterations)
        self._a = a

    def integral(self, y, d_t, d_y_over_d_t, y_constraint_function):
        next_constraint = y_constraint_function(1.0)
        explicit_update = d_t * d_y_over_d_t(0.0, y)
        y_next_init = apply_constraints_along_last_axis(
            next_constraint, y + explicit_update
        )
        a, b = self._a, 1.0 - self._a

        def residual(y_next):
            return y_next - apply_constraints_along_last_axis(
                next_constraint,
                y
                + a * d_t * d_y_over_d_t(1.0, y_next)
                + b * explicit_update,
            )

        return self._solve(residual, y_next_init)
