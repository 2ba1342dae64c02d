import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    ContinuousInitialCondition,
    DiffusionEquation,
    InitialValueProblem,
    LorenzEquation,
    Mesh,
    NeumannBoundaryCondition,
    Solution,
)


def _ode_ivp():
    cp = ConstrainedProblem(LorenzEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
    return InitialValueProblem(cp, (0.0, 1.0), ic)


def _pde_ivp():
    diff_eq = DiffusionEquation(1)
    mesh = Mesh([(0.0, 1.0)], [0.25])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp = ConstrainedProblem(diff_eq, mesh, [(bc, bc)])
    ic = ContinuousInitialCondition(cp, lambda x: x**2)
    return InitialValueProblem(cp, (0.0, 1.0), ic)


def test_solution_validation():
    ivp = _ode_ivp()
    with pytest.raises(ValueError):
        Solution(ivp, np.zeros((2, 2)), np.zeros((2, 3)))
    with pytest.raises(ValueError):
        Solution(ivp, np.array([]), np.zeros((0, 3)))
    with pytest.raises(ValueError):
        Solution(ivp, np.array([0.5, 1.0]), np.zeros((2, 4)))

    pde_ivp = _pde_ivp()
    with pytest.raises(ValueError):
        Solution(pde_ivp, np.array([1.0]), np.zeros((1, 5, 1)))


def test_solution_properties():
    ivp = _ode_ivp()
    t = np.array([0.5, 1.0])
    sol = Solution(ivp, t, np.ones((2, 3)))
    assert sol.d_t == 0.5
    assert sol.vertex_oriented is None
    assert np.array_equal(sol.t_coordinates, t)
    assert np.array_equal(sol.discrete_y(), np.ones((2, 3)))


def test_pde_solution_interpolation():
    ivp = _pde_ivp()
    t = np.array([0.5, 1.0])
    x_grid = ivp.constrained_problem.mesh.vertex_axis_coordinates[0]
    discrete_y = np.stack(
        [x_grid.reshape(-1, 1), 2.0 * x_grid.reshape(-1, 1)]
    )
    sol = Solution(ivp, t, discrete_y, vertex_oriented=True)

    y = sol.y(np.array([[0.125], [0.625]]))
    assert y.shape == (2, 2, 1)
    assert np.allclose(y[0, :, 0], [0.125, 0.625])
    assert np.allclose(y[1, :, 0], [0.25, 1.25])


def test_pde_solution_orientation_resampling():
    ivp = _pde_ivp()
    x_grid = ivp.constrained_problem.mesh.vertex_axis_coordinates[0]
    discrete_y = x_grid.reshape(1, -1, 1)
    sol = Solution(ivp, np.array([1.0]), discrete_y, vertex_oriented=True)

    cell_y = sol.discrete_y(False)
    assert cell_y.shape == (1, 4, 1)
    assert np.allclose(cell_y[0, :, 0], [0.125, 0.375, 0.625, 0.875])


def test_solution_diff():
    ivp = _ode_ivp()
    fine = Solution(
        ivp,
        np.linspace(0.25, 1.0, 4),
        np.arange(12, dtype=float).reshape(4, 3),
        d_t=0.25,
    )
    coarse = Solution(
        ivp,
        np.array([0.5, 1.0]),
        np.zeros((2, 3)),
        d_t=0.5,
    )
    diffs = fine.diff([coarse])
    assert np.allclose(diffs.matching_time_points, [0.5, 1.0])
    assert diffs.differences[0].shape == (2, 3)
    assert np.array_equal(diffs.differences[0][0], -fine.discrete_y()[1])

    with pytest.raises(ValueError):
        fine.diff([])


def test_generate_plots_ode():
    ivp = _ode_ivp()
    sol = Solution(ivp, np.array([0.5, 1.0]), np.ones((2, 3)))
    plots = list(sol.generate_plots())
    assert len(plots) == 2
    for plot in plots:
        plot.close()


def test_generate_plots_pde():
    ivp = _pde_ivp()
    sol = Solution(
        ivp, np.array([1.0]), np.zeros((1, 5, 1)), vertex_oriented=True
    )
    plots = list(sol.generate_plots())
    assert len(plots) == 1
    for plot in plots:
        plot.close()
