"""Tests for automatic stiff/non-stiff method selection ("LSODA") and
user-supplied solver pass-through (custom :class:`RKTableau` instances
and integrator-builder callables) — parity with the reference's
acceptance of any SciPy method string or ``OdeSolver`` class
(/root/reference/pararealml/operators/ode/ode_operator.py:17-44)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    ContinuousInitialCondition,
    InitialValueProblem,
    PopulationGrowthEquation,
    VanDerPolEquation,
)
from pararealml_tpu.operators.ode import ODEOperator, RKTableau


def _van_der_pol_ivp(mu, t_end):
    cp = ConstrainedProblem(VanDerPolEquation(mu))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([2.0, 0.0]))
    return InitialValueProblem(cp, (0.0, t_end), ic)


def test_lsoda_stiff_van_der_pol_matches_scipy():
    from scipy.integrate import solve_ivp

    mu, t_end = 1000.0, 100.0
    solution = ODEOperator(
        "LSODA", 5.0, rtol=1e-8, atol=1e-10
    ).solve(_van_der_pol_ivp(mu, t_end))
    reference = solve_ivp(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0.0, t_end),
        [2.0, 0.0],
        method="LSODA",
        t_eval=solution.t_coordinates,
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, atol=1e-5
    )


def test_lsoda_nonstiff_van_der_pol_matches_scipy():
    from scipy.integrate import solve_ivp

    mu, t_end = 5.0, 25.0
    solution = ODEOperator(
        "LSODA", 0.25, rtol=1e-8, atol=1e-10
    ).solve(_van_der_pol_ivp(mu, t_end))
    reference = solve_ivp(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0.0, t_end),
        [2.0, 0.0],
        method="LSODA",
        t_eval=solution.t_coordinates,
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, atol=1e-5
    )


@pytest.mark.slow
def test_lsoda_probe_selects_expected_branch():
    from pararealml_tpu.operators.ode.ode_operator import (
        _build_lsoda_integrator,
    )

    t_offsets = np.linspace(0.25, 25.0, 100)

    def make_vdp(mu):
        def fn(t, y):
            return jnp.stack(
                [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]]
            )

        return fn

    # the branch decision is observable through the BDF integrator's
    # distinct status codes only on failure, so probe the metric
    # directly: a tiny threshold forces the stiff branch, a huge one
    # the non-stiff branch, and both must still solve the problem
    y0 = jnp.asarray([2.0, 0.0])
    t0 = jnp.asarray(0.0)
    for threshold in (1e-6, 1e12):
        integrate = jax.jit(
            _build_lsoda_integrator(
                make_vdp(5.0),
                t_offsets,
                1e-6,
                1e-8,
                np.inf,
                None,
                stiffness_threshold=threshold,
            )
        )
        ys, status = integrate(y0, t0)
        assert int(status) == 0
        assert np.all(np.isfinite(np.asarray(ys)))
    # and the two forced branches agree on the trajectory
    forced = [
        np.asarray(
            jax.jit(
                _build_lsoda_integrator(
                    make_vdp(5.0),
                    t_offsets,
                    1e-10,
                    1e-12,
                    np.inf,
                    None,
                    stiffness_threshold=thr,
                )
            )(y0, t0)[0]
        )
        for thr in (1e-6, 1e12)
    ]
    np.testing.assert_allclose(forced[0], forced[1], atol=1e-6)


def test_lsoda_trajectory_function_is_jittable():
    ivp = _van_der_pol_ivp(5.0, 2.0)
    op = ODEOperator("LSODA", 0.1)
    fn, t = op.trajectory_function(ivp.constrained_problem, (0.0, 2.0))
    ys = jax.jit(fn)(jnp.asarray([2.0, 0.0]), jnp.asarray(0.0))
    assert ys.shape == (len(t), 2)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_custom_tableau_with_hermite_dense_output():
    # Bogacki-Shampine coefficients passed as a *custom* tableau with no
    # dense-output matrix, exercising the cubic Hermite fallback
    tableau = RKTableau(
        a=((), (1 / 2,), (0.0, 3 / 4)),
        b=(2 / 9, 1 / 3, 4 / 9),
        c=(0.0, 1 / 2, 3 / 4),
        e=(5 / 72, -1 / 12, -1 / 9, 1 / 8),
        p=None,
        error_exponent=-1.0 / 3.0,
    )
    r, y_0 = 1.5, 2.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)
    solution = ODEOperator(
        tableau, 0.1, rtol=1e-8, atol=1e-10
    ).solve(ivp)
    expected = y_0 * np.exp(r * solution.t_coordinates)
    np.testing.assert_allclose(
        solution.discrete_y()[:, 0], expected, rtol=1e-5
    )


def test_custom_builder_callable():
    def fixed_rk4_builder(fn, t_offsets, rtol, atol, max_step, first_step):
        h_sub = float(t_offsets[0]) / 8.0

        def integrate(y0, t0):
            def rk4(y, t):
                k1 = fn(t, y)
                k2 = fn(t + h_sub / 2, y + h_sub / 2 * k1)
                k3 = fn(t + h_sub / 2, y + h_sub / 2 * k2)
                k4 = fn(t + h_sub, y + h_sub * k3)
                return y + h_sub / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

            def out_step(y, t_target):
                def body(i, state):
                    y_c, t_c = state
                    return rk4(y_c, t_c), t_c + h_sub

                y_new, _ = jax.lax.fori_loop(
                    0, 8, body, (y, t_target - 8 * h_sub)
                )
                return y_new, y_new

            _, ys = jax.lax.scan(
                out_step, y0, t0 + jnp.asarray(t_offsets)
            )
            return ys, jnp.asarray(0)

        return integrate

    r, y_0 = 0.8, 1.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)
    solution = ODEOperator(fixed_rk4_builder, 0.125).solve(ivp)
    expected = y_0 * np.exp(r * solution.t_coordinates)
    np.testing.assert_allclose(
        solution.discrete_y()[:, 0], expected, rtol=1e-6
    )
