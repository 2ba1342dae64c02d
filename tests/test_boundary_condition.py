import numpy as np
import pytest

from pararealml_tpu import (
    CauchyBoundaryCondition,
    ConstantBoundaryCondition,
    ConstantFluxBoundaryCondition,
    ConstantValueBoundaryCondition,
    DirichletBoundaryCondition,
    NeumannBoundaryCondition,
    vectorize_bc_function,
)

X = np.array([[0.0], [0.5], [1.0]])


def test_dirichlet():
    bc = DirichletBoundaryCondition(
        lambda x, t: np.full((len(x), 1), 3.0), is_static=True
    )
    assert bc.has_y_condition and not bc.has_d_y_condition
    assert bc.is_static
    assert np.all(bc.y_condition(X, None) == 3.0)
    with pytest.raises(RuntimeError):
        bc.d_y_condition(X, None)


def test_neumann():
    bc = NeumannBoundaryCondition(lambda x, t: np.full((len(x), 1), t))
    assert bc.has_d_y_condition and not bc.has_y_condition
    assert not bc.is_static
    assert np.all(bc.d_y_condition(X, 2.0) == 2.0)
    with pytest.raises(RuntimeError):
        bc.y_condition(X, 2.0)


def test_cauchy():
    bc = CauchyBoundaryCondition(
        lambda x, t: np.ones((len(x), 1)),
        lambda x, t: -np.ones((len(x), 1)),
        is_static=True,
    )
    assert bc.has_y_condition and bc.has_d_y_condition
    assert np.all(bc.y_condition(X, None) == 1.0)
    assert np.all(bc.d_y_condition(X, None) == -1.0)


def test_constant_boundary_condition():
    with pytest.raises(ValueError):
        ConstantBoundaryCondition(None, None)

    bc = ConstantBoundaryCondition([1.0, None], [None, 2.0])
    y = bc.y_condition(X, None)
    assert np.all(y[:, 0] == 1.0) and np.all(np.isnan(y[:, 1]))
    d_y = bc.d_y_condition(X, None)
    assert np.all(np.isnan(d_y[:, 0])) and np.all(d_y[:, 1] == 2.0)
    assert bc.is_static


def test_constant_value_and_flux():
    value_bc = ConstantValueBoundaryCondition([5.0])
    assert np.all(value_bc.y_condition(X, None) == 5.0)
    with pytest.raises(RuntimeError):
        value_bc.d_y_condition(X, None)

    flux_bc = ConstantFluxBoundaryCondition([0.5])
    assert np.all(flux_bc.d_y_condition(X, None) == 0.5)
    with pytest.raises(RuntimeError):
        flux_bc.y_condition(X, None)


def test_vectorize_bc_function():
    fn = vectorize_bc_function(lambda x, t: (x[0] + t, None))
    out = fn(X, 1.0)
    assert out.shape == (3, 2)
    assert np.allclose(out[:, 0], [1.0, 1.5, 2.0])
    assert np.all(np.isnan(out[:, 1]))


def test_cauchy_in_fdm_solve():
    """Cauchy conditions constrain both y and its normal derivative in a
    solve (value pins the boundary, flux shapes the halo)."""
    from pararealml_tpu import (
        ConstantInitialCondition,
        ConstrainedProblem,
        DiffusionEquation,
        InitialValueProblem,
        Mesh,
    )
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )

    mesh = Mesh([(0.0, 1.0)], [0.1])
    bc = CauchyBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)),
        lambda x, t: np.zeros((len(x), 1)),
        is_static=True,
    )
    cp = ConstrainedProblem(DiffusionEquation(1), mesh, [(bc, bc)])
    ic = ConstantInitialCondition(cp, [1.0])
    ivp = InitialValueProblem(cp, (0.0, 0.5), ic)
    y = (
        FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.001)
        .solve(ivp)
        .discrete_y()
    )
    assert np.all(y[:, 0, 0] == 0.0) and np.all(y[:, -1, 0] == 0.0)
    assert np.all(np.isfinite(y))
    # diffusion drains mass through the pinned boundaries
    assert y[-1].sum() < y[0].sum()
