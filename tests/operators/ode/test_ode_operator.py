import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    ContinuousInitialCondition,
    DiffusionEquation,
    InitialValueProblem,
    LorenzEquation,
    LotkaVolterraEquation,
    Mesh,
    NeumannBoundaryCondition,
    PopulationGrowthEquation,
)
from pararealml_tpu.operators.ode import ODEOperator


def test_invalid_method():
    with pytest.raises(ValueError):
        ODEOperator("NoSuchMethod", 0.1)


def test_rejects_pde():
    diff_eq = DiffusionEquation(1)
    mesh = Mesh([(0.0, 1.0)], [0.1])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp = ConstrainedProblem(diff_eq, mesh, [(bc, bc)])
    ic = ContinuousInitialCondition(cp, lambda x: np.zeros_like(x))
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)

    with pytest.raises(ValueError):
        ODEOperator("RK45", 0.1).solve(ivp)


def test_population_growth_matches_analytic_solution():
    r = 0.5
    y_0 = 2.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda _: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 4.0), ic)

    solution = ODEOperator("RK45", 0.1, rtol=1e-8, atol=1e-10).solve(ivp)
    t = solution.t_coordinates
    assert np.allclose(
        solution.discrete_y()[:, 0], y_0 * np.exp(r * t), rtol=1e-6
    )


def test_rk23_population_growth():
    cp = ConstrainedProblem(PopulationGrowthEquation(1.0))
    ic = ContinuousInitialCondition(cp, lambda _: np.array([1.0]))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)

    solution = ODEOperator("RK23", 0.1, rtol=1e-6, atol=1e-9).solve(ivp)
    t = solution.t_coordinates
    assert np.allclose(
        solution.discrete_y()[:, 0], np.exp(t), rtol=1e-4
    )


def test_solution_shape_and_grid():
    cp = ConstrainedProblem(LorenzEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)

    solution = ODEOperator("RK45", 0.25).solve(ivp)
    assert solution.discrete_y().shape == (4, 3)
    assert np.allclose(solution.t_coordinates, [0.25, 0.5, 0.75, 1.0])
    assert solution.d_t == 0.25


def test_lorenz_matches_scipy_reference():
    from scipy.integrate import solve_ivp

    cp = ConstrainedProblem(LorenzEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)

    solution = ODEOperator(
        "RK45", 0.01, rtol=1e-9, atol=1e-12
    ).solve(ivp)

    def lorenz_rhs(_, y):
        return np.array(
            [
                10.0 * (y[1] - y[0]),
                y[0] * (28.0 - y[2]) - y[1],
                y[0] * y[1] - (8.0 / 3.0) * y[2],
            ]
        )

    reference = solve_ivp(
        lorenz_rhs,
        (0.0, 2.0),
        np.ones(3),
        "DOP853",
        t_eval=solution.t_coordinates,
        rtol=1e-12,
        atol=1e-12,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, rtol=1e-5, atol=1e-6
    )


def test_fixed_step_methods_converge():
    cp = ConstrainedProblem(PopulationGrowthEquation(1.0))
    ic = ContinuousInitialCondition(cp, lambda _: np.array([1.0]))
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)

    errors = {}
    for method, tol in (("Euler", 2e-2), ("Midpoint", 1e-3),
                        ("RK4", 1e-7)):
        solution = ODEOperator(method, 0.01).solve(ivp)
        error = abs(solution.discrete_y()[-1, 0] - np.e)
        assert error < tol, method
        errors[method] = error
    assert errors["RK4"] < errors["Midpoint"] < errors["Euler"]


def test_lotka_volterra_conserved_quantity():
    alpha, beta, gamma, delta = 2.0, 0.04, 1.06, 0.02
    cp = ConstrainedProblem(
        LotkaVolterraEquation(alpha, beta, gamma, delta)
    )
    ic = ContinuousInitialCondition(
        cp, lambda _: np.array([100.0, 15.0])
    )
    ivp = InitialValueProblem(cp, (0.0, 10.0), ic)

    solution = ODEOperator("RK45", 0.05, rtol=1e-9, atol=1e-12).solve(ivp)
    y = solution.discrete_y()
    invariant = (
        delta * y[:, 0]
        - gamma * np.log(y[:, 0])
        + beta * y[:, 1]
        - alpha * np.log(y[:, 1])
    )
    assert np.allclose(invariant, invariant[0], rtol=1e-6)


def test_trajectory_function_reusable_across_start_times():
    import jax
    import jax.numpy as jnp

    cp = ConstrainedProblem(PopulationGrowthEquation(1.0))
    op = ODEOperator("RK45", 0.1, rtol=1e-9, atol=1e-12)
    fn, t = op.trajectory_function(cp, (0.0, 1.0))
    fn = jax.jit(fn)

    y_from_0 = fn(jnp.array([1.0]), 0.0)
    y_from_5 = fn(jnp.array([1.0]), 5.0)
    # autonomous system: same relative trajectory from any start time
    assert np.allclose(
        np.asarray(y_from_0), np.asarray(y_from_5), rtol=1e-9
    )
    assert np.allclose(np.asarray(y_from_0)[-1, 0], np.e, rtol=1e-6)


def test_dop853_matches_scipy_reference():
    from scipy.integrate import solve_ivp

    cp = ConstrainedProblem(LorenzEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)

    solution = ODEOperator(
        "DOP853", 0.01, rtol=1e-9, atol=1e-12
    ).solve(ivp)

    def lorenz_rhs(_, y):
        return np.array(
            [
                10.0 * (y[1] - y[0]),
                y[0] * (28.0 - y[2]) - y[1],
                y[0] * y[1] - (8.0 / 3.0) * y[2],
            ]
        )

    reference = solve_ivp(
        lorenz_rhs,
        (0.0, 2.0),
        np.ones(3),
        "DOP853",
        t_eval=solution.t_coordinates,
        rtol=1e-13,
        atol=1e-13,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, rtol=1e-5, atol=1e-6
    )


def test_dop853_population_growth_analytic():
    r, y_0 = 0.5, 2.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda _: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 4.0), ic)
    solution = ODEOperator(
        "DOP853", 0.1, rtol=1e-10, atol=1e-12
    ).solve(ivp)
    t = solution.t_coordinates
    assert np.allclose(
        solution.discrete_y()[:, 0], y_0 * np.exp(r * t), rtol=1e-8
    )


def test_radau_stiff_van_der_pol_matches_scipy():
    from scipy.integrate import solve_ivp

    from pararealml_tpu import VanDerPolEquation

    mu = 1000.0
    cp = ConstrainedProblem(VanDerPolEquation(mu))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([2.0, 0.0]))
    t_end = 100.0
    ivp = InitialValueProblem(cp, (0.0, t_end), ic)

    solution = ODEOperator(
        "Radau", 5.0, rtol=1e-8, atol=1e-10
    ).solve(ivp)

    reference = solve_ivp(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0.0, t_end),
        [2.0, 0.0],
        method="Radau",
        t_eval=solution.t_coordinates,
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, atol=1e-6
    )


def test_radau_population_growth_analytic():
    r, y_0 = 1.5, 2.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)
    solution = ODEOperator(
        "Radau", 0.1, rtol=1e-8, atol=1e-10
    ).solve(ivp)
    t = solution.t_coordinates
    assert np.allclose(
        solution.discrete_y()[:, 0], y_0 * np.exp(r * t), rtol=1e-6
    )


def test_radau_trajectory_function_is_jittable():
    import jax
    import jax.numpy as jnp

    cp = ConstrainedProblem(PopulationGrowthEquation(1.0))
    op = ODEOperator("Radau", 0.1, rtol=1e-7, atol=1e-9)
    fn, t = op.trajectory_function(cp, (0.0, 1.0))
    ys = jax.jit(fn)(jnp.array([1.0]), jnp.asarray(0.0))
    assert ys.shape == (len(t), 1)
    assert np.allclose(
        np.asarray(ys)[:, 0], np.exp(t), rtol=1e-6
    )


def test_bdf_stiff_van_der_pol_matches_scipy():
    from scipy.integrate import solve_ivp

    from pararealml_tpu import VanDerPolEquation

    mu = 1000.0
    cp = ConstrainedProblem(VanDerPolEquation(mu))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([2.0, 0.0]))
    t_end = 100.0
    ivp = InitialValueProblem(cp, (0.0, t_end), ic)

    solution = ODEOperator(
        "BDF", 5.0, rtol=1e-8, atol=1e-10
    ).solve(ivp)

    reference = solve_ivp(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0.0, t_end),
        [2.0, 0.0],
        method="BDF",
        t_eval=solution.t_coordinates,
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, atol=1e-6
    )


def test_bdf_population_growth_analytic():
    r, y_0 = 1.5, 2.0
    cp = ConstrainedProblem(PopulationGrowthEquation(r))
    ic = ContinuousInitialCondition(cp, lambda x: np.array([y_0]))
    ivp = InitialValueProblem(cp, (0.0, 2.0), ic)
    solution = ODEOperator(
        "BDF", 0.1, rtol=1e-8, atol=1e-10
    ).solve(ivp)
    t = solution.t_coordinates
    # BDF's global error at these tolerances is ~1e-5 (SciPy's own BDF
    # measures 1.06e-5 on this exact problem)
    assert np.allclose(
        solution.discrete_y()[:, 0], y_0 * np.exp(r * t), rtol=3e-5
    )


def test_bdf_lotka_volterra_matches_rk45():
    cp = ConstrainedProblem(LotkaVolterraEquation(2.0, 0.04, 0.02, 1.06))
    ic = ContinuousInitialCondition(
        cp, lambda x: np.array([100.0, 15.0])
    )
    ivp = InitialValueProblem(cp, (0.0, 10.0), ic)
    bdf = ODEOperator("BDF", 0.1, rtol=1e-9, atol=1e-11).solve(ivp)
    rk = ODEOperator("RK45", 0.1, rtol=1e-11, atol=1e-13).solve(ivp)
    assert np.allclose(
        bdf.discrete_y(), rk.discrete_y(), rtol=1e-4, atol=1e-4
    )


def test_bdf_trajectory_function_is_jittable():
    import jax
    import jax.numpy as jnp

    cp = ConstrainedProblem(PopulationGrowthEquation(1.0))
    op = ODEOperator("BDF", 0.1, rtol=1e-7, atol=1e-9)
    fn, t = op.trajectory_function(cp, (0.0, 1.0))
    ys = jax.jit(fn)(jnp.array([1.0]), jnp.asarray(0.0))
    assert ys.shape == (len(t), 1)
    assert np.allclose(
        np.asarray(ys)[:, 0], np.exp(t), rtol=1e-5
    )


@pytest.mark.parametrize("method", ["BDF", "Radau"])
def test_stiff_robertson_matches_scipy(method):
    # the Robertson chemical kinetics problem: rate constants spanning
    # nine orders of magnitude, the classic extreme-stiffness benchmark
    from scipy.integrate import solve_ivp

    from pararealml_tpu import (
        DifferentialEquation,
        SymbolicEquationSystem,
    )

    class RobertsonEquation(DifferentialEquation):
        def __init__(self):
            super().__init__(0, 3)

        @property
        def symbolic_equation_system(self):
            y = self._symbols.y
            r1 = 0.04 * y[0]
            r2 = 1e4 * y[1] * y[2]
            r3 = 3e7 * y[1] ** 2
            return SymbolicEquationSystem(
                [-r1 + r2, r1 - r2 - r3, r3]
            )

    cp = ConstrainedProblem(RobertsonEquation())
    ic = ContinuousInitialCondition(
        cp, lambda _: np.array([1.0, 0.0, 0.0])
    )
    t_end = 100.0
    ivp = InitialValueProblem(cp, (0.0, t_end), ic)
    solution = ODEOperator(
        method, 10.0, rtol=1e-8, atol=1e-10
    ).solve(ivp)

    def rhs(t, y):
        r1 = 0.04 * y[0]
        r2 = 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] ** 2
        return [-r1 + r2, r1 - r2 - r3, r3]

    reference = solve_ivp(
        rhs,
        (0.0, t_end),
        [1.0, 0.0, 0.0],
        method=method,
        t_eval=solution.t_coordinates,
        rtol=1e-8,
        atol=1e-10,
    )
    assert np.allclose(
        solution.discrete_y(), reference.y.T, rtol=1e-4, atol=1e-10
    )
