import numpy as np
import pytest

from pararealml_tpu import (
    ConstantInitialCondition,
    CoordinateSystem,
    ConstrainedProblem,
    ContinuousInitialCondition,
    DiffusionEquation,
    DirichletBoundaryCondition,
    DiscreteInitialCondition,
    GaussianInitialCondition,
    LorenzEquation,
    MarginalBetaProductInitialCondition,
    Mesh,
    NeumannBoundaryCondition,
    vectorize_ic_function,
)


def _zero_neumann_cp(diff_eq, mesh):
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), diff_eq.y_dimension)),
        is_static=True,
    )
    return ConstrainedProblem(
        diff_eq, mesh, [(bc, bc)] * diff_eq.x_dimension
    )


def test_discrete_initial_condition_ode():
    cp = ConstrainedProblem(LorenzEquation())
    ic = DiscreteInitialCondition(cp, np.array([1.0, 2.0, 3.0]))
    assert np.array_equal(ic.discrete_y_0(), [1.0, 2.0, 3.0])
    assert np.array_equal(ic.y_0(None), [1.0, 2.0, 3.0])


def test_discrete_initial_condition_pde_requires_orientation():
    cp = _zero_neumann_cp(DiffusionEquation(1), Mesh([(0.0, 1.0)], [0.5]))
    with pytest.raises(ValueError):
        DiscreteInitialCondition(cp, np.zeros((3, 1)))


def test_discrete_initial_condition_shape_validation():
    cp = ConstrainedProblem(LorenzEquation())
    with pytest.raises(ValueError):
        DiscreteInitialCondition(cp, np.zeros(5))


def test_discrete_initial_condition_applies_static_constraints():
    bc = DirichletBoundaryCondition(
        lambda x, t: np.full((len(x), 1), 7.0), is_static=True
    )
    cp = ConstrainedProblem(
        DiffusionEquation(1), Mesh([(0.0, 1.0)], [0.25]), [(bc, bc)]
    )
    ic = DiscreteInitialCondition(cp, np.zeros((5, 1)), True)
    y_0 = ic.discrete_y_0(True)
    assert y_0[0, 0] == 7.0 and y_0[-1, 0] == 7.0


def test_discrete_initial_condition_resampling():
    cp = _zero_neumann_cp(
        DiffusionEquation(1), Mesh([(0.0, 1.0)], [0.25])
    )
    vertex_y_0 = np.linspace(0.0, 1.0, 5).reshape(5, 1)
    ic = DiscreteInitialCondition(cp, vertex_y_0, True)
    cell_y_0 = ic.discrete_y_0(False)
    assert cell_y_0.shape == (4, 1)
    assert np.allclose(cell_y_0[:, 0], [0.125, 0.375, 0.625, 0.875])


def test_constant_initial_condition():
    cp = _zero_neumann_cp(
        DiffusionEquation(2), Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    )
    ic = ConstantInitialCondition(cp, [4.0])
    assert np.all(ic.discrete_y_0(True) == 4.0)
    with pytest.raises(ValueError):
        ConstantInitialCondition(cp, [1.0, 2.0])


def test_continuous_initial_condition_ode():
    cp = ConstrainedProblem(LorenzEquation())
    ic = ContinuousInitialCondition(
        cp, lambda _: np.array([1.0, 2.0, 3.0])
    )
    assert np.array_equal(ic.discrete_y_0(), [1.0, 2.0, 3.0])


def test_continuous_initial_condition_pde():
    cp = _zero_neumann_cp(
        DiffusionEquation(1), Mesh([(0.0, np.pi)], [np.pi / 10.0])
    )
    ic = ContinuousInitialCondition(
        cp, lambda x: np.sin(x), multipliers=[2.0]
    )
    y_0 = ic.discrete_y_0(True)
    x = cp.mesh.vertex_axis_coordinates[0]
    assert np.allclose(y_0[:, 0], 2.0 * np.sin(x))


def test_gaussian_initial_condition():
    cp = _zero_neumann_cp(
        DiffusionEquation(2),
        Mesh([(-1.0, 1.0), (-1.0, 1.0)], [0.5, 0.5]),
    )
    ic = GaussianInitialCondition(
        cp, [(np.zeros(2), 0.1 * np.eye(2))]
    )
    y_0 = ic.discrete_y_0(True)
    center = np.unravel_index(np.argmax(y_0[..., 0]), y_0[..., 0].shape)
    assert center == (2, 2)
    with pytest.raises(ValueError):
        GaussianInitialCondition(
            cp, [(np.zeros(3), np.eye(2))]
        )


def test_gaussian_requires_pde():
    cp = ConstrainedProblem(LorenzEquation())
    with pytest.raises(ValueError):
        GaussianInitialCondition(cp, [(np.zeros(1), np.eye(1))] * 3)


def test_marginal_beta_product_initial_condition():
    cp = _zero_neumann_cp(
        DiffusionEquation(1), Mesh([(0.0, 1.0)], [0.1])
    )
    ic = MarginalBetaProductInitialCondition(cp, [[(2.0, 2.0)]])
    y_0 = ic.discrete_y_0(True)
    x = cp.mesh.vertex_axis_coordinates[0]
    assert np.allclose(y_0[:, 0], 6.0 * x * (1.0 - x))


def test_vectorize_ic_function():
    fn = vectorize_ic_function(lambda x: [x[0] ** 2, -x[0]])
    out = fn(np.array([[1.0], [2.0]]))
    assert np.array_equal(out, [[1.0, -1.0], [4.0, -2.0]])


def test_gaussian_initial_condition_validation():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    cp = _zero_neumann_cp(DiffusionEquation(2), mesh)
    with pytest.raises(ValueError):  # wrong number of (mean, cov) pairs
        GaussianInitialCondition(cp, [])
    with pytest.raises(ValueError):  # wrong mean shape
        GaussianInitialCondition(cp, [(np.zeros(3), np.eye(2))])
    with pytest.raises(ValueError):  # wrong cov shape
        GaussianInitialCondition(cp, [(np.zeros(2), np.eye(3))])
    with pytest.raises(ValueError):  # wrong multipliers length
        GaussianInitialCondition(
            cp, [(np.zeros(2), np.eye(2))], [1.0, 2.0]
        )


def test_gaussian_initial_condition_integrates_to_multiplier():
    # the Gaussian PDF over a domain that contains virtually all its
    # mass must integrate to the multiplier
    mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [0.1, 0.1])
    cp = _zero_neumann_cp(DiffusionEquation(2), mesh)
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), 0.25 * np.eye(2))], [7.0]
    )
    y_0 = np.asarray(ic.discrete_y_0(False))  # cell centers
    integral = y_0.sum() * 0.1 * 0.1
    assert np.isclose(integral, 7.0, rtol=1e-3)


def test_gaussian_initial_condition_polar_mesh():
    # the PDF is evaluated at the Cartesian image of curvilinear points
    mesh = Mesh(
        [(0.5, 2.0), (0.0, np.pi)],
        [0.25, np.pi / 8],
        CoordinateSystem.POLAR,
    )
    cp = _zero_neumann_cp(DiffusionEquation(2), mesh)
    mean = np.array([0.0, 1.0])  # cartesian (x, y)
    ic = GaussianInitialCondition(cp, [(mean, 0.5 * np.eye(2))])
    r_grid, theta_grid = mesh.vertex_coordinate_grids
    cartesian = np.stack(
        [r_grid * np.cos(theta_grid), r_grid * np.sin(theta_grid)], -1
    )
    distances = np.linalg.norm(cartesian - mean, axis=-1)
    y_0 = np.asarray(ic.discrete_y_0(True))[..., 0]
    # the maximum must sit at the grid point nearest the Cartesian mean
    assert np.unravel_index(
        y_0.argmax(), y_0.shape
    ) == np.unravel_index(distances.argmin(), distances.shape)


def test_continuous_initial_condition_wrong_output_shape():
    mesh = Mesh([(0.0, 1.0)], [0.25])
    cp = _zero_neumann_cp(DiffusionEquation(1), mesh)
    with pytest.raises(ValueError):
        ContinuousInitialCondition(
            cp, lambda x: np.zeros((len(x), 3))  # y_dimension is 1
        ).discrete_y_0(True)


def test_constant_initial_condition_wrong_length():
    cp = ConstrainedProblem(LorenzEquation())
    with pytest.raises(ValueError):
        ConstantInitialCondition(cp, [1.0])


def test_marginal_beta_product_validation():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    cp = _zero_neumann_cp(DiffusionEquation(2), mesh)
    with pytest.raises(ValueError):  # needs x_dimension * y_dimension
        MarginalBetaProductInitialCondition(cp, [[(1.0, 1.0)]] * 2)


def test_discrete_ic_resampling_preserves_smooth_fields():
    # vertex -> cell resampling of a linear field is exact up to
    # interpolation error at the boundary
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    cp = _zero_neumann_cp(DiffusionEquation(2), mesh)
    x0, x1 = mesh.vertex_coordinate_grids
    values = (2.0 * x0 + 3.0 * x1)[..., None]
    ic = DiscreteInitialCondition(cp, values, vertex_oriented=True)
    cells = np.asarray(ic.discrete_y_0(False))
    c0, c1 = mesh.cell_center_coordinate_grids
    expected = (2.0 * c0 + 3.0 * c1)[..., None]
    assert np.allclose(cells, expected, atol=1e-10)
