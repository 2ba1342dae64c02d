import numpy as np
import pytest

from pararealml_tpu import (
    ConstantInitialCondition,
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
