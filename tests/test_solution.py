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


def _pde_2d_ivp(y_dimension=1):
    from pararealml_tpu import (
        BurgersEquation,
        GaussianInitialCondition,
    )

    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    if y_dimension == 1:
        diff_eq = DiffusionEquation(2)
    else:
        diff_eq = BurgersEquation(2)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), diff_eq.y_dimension)),
        is_static=True,
    )
    cp = ConstrainedProblem(diff_eq, mesh, [(bc, bc)] * 2)
    ic = GaussianInitialCondition(
        cp,
        [(np.full(2, 0.5), 0.1 * np.eye(2))] * diff_eq.y_dimension,
    )
    return InitialValueProblem(cp, (0.0, 1.0), ic)


def test_interpolation_of_linear_field_is_exact():
    # linear interpolation must reproduce a linear field exactly at
    # arbitrary interior query points
    ivp = _pde_2d_ivp()
    mesh = ivp.constrained_problem.mesh
    x0, x1 = mesh.vertex_coordinate_grids
    values = (2.0 * x0 - x1)[None, ..., None]
    solution = Solution(
        ivp, np.array([1.0]), values, vertex_oriented=True
    )
    queries = np.array([[0.3, 0.7], [0.11, 0.49], [0.875, 0.125]])
    interpolated = solution.y(queries)
    expected = (2.0 * queries[:, 0] - queries[:, 1])[None, :, None]
    assert np.allclose(interpolated, expected)


def test_generate_plots_2d_vector_field_includes_flow_plots():
    from pararealml_tpu import QuiverPlot, StreamPlot

    ivp = _pde_2d_ivp(y_dimension=2)
    shape = (2,) + tuple(
        ivp.constrained_problem.y_shape(True)
    )
    solution = Solution(
        ivp,
        np.array([0.5, 1.0]),
        np.random.rand(*shape),
        vertex_oriented=True,
    )
    plots = list(solution.generate_plots())
    kinds = {type(p) for p in plots}
    assert QuiverPlot in kinds
    assert StreamPlot in kinds
    for plot in plots:
        plot.close()


def test_generate_plots_3d_scalar_field_uses_scatter():
    from pararealml_tpu import GaussianInitialCondition, ScatterPlot

    mesh = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp = ConstrainedProblem(DiffusionEquation(3), mesh, [(bc, bc)] * 3)
    ic = GaussianInitialCondition(
        cp, [(np.full(3, 0.5), 0.1 * np.eye(3))]
    )
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)
    solution = Solution(
        ivp,
        np.array([1.0]),
        np.random.rand(1, *cp.y_shape(True)),
        vertex_oriented=True,
    )
    plots = list(solution.generate_plots())
    assert any(isinstance(p, ScatterPlot) for p in plots)
    for plot in plots:
        plot.close()


def test_generate_plots_n_body():
    from pararealml_tpu import (
        NBodyGravitationalEquation,
        NBodyPlot,
    )

    cp = ConstrainedProblem(
        NBodyGravitationalEquation(2, [1.0, 2.0])
    )
    ivp = InitialValueProblem(
        cp,
        (0.0, 1.0),
        ContinuousInitialCondition(
            cp, lambda _: np.arange(cp.y_shape()[0], dtype=float)
        ),
    )
    solution = Solution(
        ivp, np.array([0.5, 1.0]), np.random.rand(2, cp.y_shape()[0])
    )
    plots = list(solution.generate_plots(n_frames=2))
    assert any(isinstance(p, NBodyPlot) for p in plots)
    for plot in plots:
        plot.close()


def test_diff_requires_multiple_solutions():
    ivp = _ode_ivp()
    solution = Solution(ivp, np.array([0.5, 1.0]), np.ones((2, 3)))
    with pytest.raises(ValueError):
        solution.diff([])


def test_generate_plots_3d_vector_field_uses_quiver():
    from pararealml_tpu import BurgersEquation, QuiverPlot

    mesh = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 3)), is_static=True
    )
    cp = ConstrainedProblem(
        BurgersEquation(3, 100.0), mesh, [(bc, bc)] * 3
    )
    ic = ContinuousInitialCondition(
        cp, lambda x: np.zeros((len(x), 3))
    )
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)
    solution = Solution(
        ivp,
        np.array([1.0]),
        np.random.rand(1, *cp.y_shape(True)),
        vertex_oriented=True,
    )
    plots = list(solution.generate_plots())
    assert any(isinstance(p, QuiverPlot) for p in plots)
    for plot in plots:
        plot.close()
