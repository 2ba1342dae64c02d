import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    DiffusionEquation,
    DirichletBoundaryCondition,
    LorenzEquation,
    Mesh,
    NeumannBoundaryCondition,
    WaveEquation,
)


def _static_dirichlet(value, y_dim=1):
    return DirichletBoundaryCondition(
        lambda x, t, v=value: np.full((len(x), y_dim), v), is_static=True
    )


def test_ode_constrained_problem():
    cp = ConstrainedProblem(LorenzEquation())
    assert cp.mesh is None
    assert cp.boundary_conditions is None
    assert cp.y_shape() == (3,)
    assert cp.static_y_vertex_constraints is None
    assert not cp.are_all_boundary_conditions_static
    assert not cp.are_there_boundary_conditions_on_y


def test_pde_requires_mesh_and_bcs():
    diff_eq = DiffusionEquation(1)
    mesh = Mesh([(0.0, 1.0)], [0.1])
    with pytest.raises(ValueError):
        ConstrainedProblem(diff_eq)
    with pytest.raises(ValueError):
        ConstrainedProblem(diff_eq, mesh)
    with pytest.raises(ValueError):
        ConstrainedProblem(
            diff_eq, mesh, [(_static_dirichlet(0.0),) * 2] * 2
        )
    with pytest.raises(ValueError):
        ConstrainedProblem(
            DiffusionEquation(2), mesh, [(_static_dirichlet(0.0),) * 2]
        )


def test_pde_shapes():
    cp = ConstrainedProblem(
        WaveEquation(2),
        Mesh([(0.0, 1.0), (0.0, 2.0)], [0.5, 0.5]),
        [
            (_static_dirichlet(0.0, 2), _static_dirichlet(0.0, 2)),
            (_static_dirichlet(0.0, 2), _static_dirichlet(0.0, 2)),
        ],
    )
    assert cp.y_vertices_shape == (3, 5, 2)
    assert cp.y_cells_shape == (2, 4, 2)
    assert cp.y_shape(True) == (3, 5, 2)
    assert cp.y_shape(False) == (2, 4, 2)


def test_static_flags():
    mesh = Mesh([(0.0, 1.0)], [0.1])
    diff_eq = DiffusionEquation(1)

    static_cp = ConstrainedProblem(
        diff_eq, mesh, [(_static_dirichlet(1.0), _static_dirichlet(2.0))]
    )
    assert static_cp.are_all_boundary_conditions_static
    assert static_cp.are_there_boundary_conditions_on_y

    neumann_cp = ConstrainedProblem(
        diff_eq,
        mesh,
        [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 1)), is_static=True
                ),
            )
            * 2
        ],
    )
    assert neumann_cp.are_all_boundary_conditions_static
    assert not neumann_cp.are_there_boundary_conditions_on_y
    assert neumann_cp.static_y_vertex_constraints is None

    dynamic_cp = ConstrainedProblem(
        diff_eq,
        mesh,
        [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), 1), t)
                ),
            )
            * 2
        ],
    )
    assert not dynamic_cp.are_all_boundary_conditions_static


def test_static_y_vertex_constraint_values():
    cp = ConstrainedProblem(
        DiffusionEquation(2),
        Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25]),
        [
            (_static_dirichlet(1.0), _static_dirichlet(2.0)),
            (_static_dirichlet(3.0), _static_dirichlet(4.0)),
        ],
    )
    out = np.asarray(
        cp.static_y_vertex_constraints.apply(
            np.zeros(cp.y_vertices_shape)
        )
    )
    # interiors of faces
    assert np.all(out[0, 1:-1, 0] == 1.0)
    assert np.all(out[-1, 1:-1, 0] == 2.0)
    assert np.all(out[1:-1, 0, 0] == 3.0)
    assert np.all(out[1:-1, -1, 0] == 4.0)
    # later axes win on shared corners
    assert out[0, 0, 0] == 3.0
    assert out[-1, -1, 0] == 4.0
    # interior untouched
    assert np.all(out[1:-1, 1:-1, 0] == 0.0)


def test_nan_masked_partial_constraints():
    def partial_condition(x, t):
        out = np.full((len(x), 2), np.nan)
        out[:, 0] = 5.0
        return out

    cp = ConstrainedProblem(
        WaveEquation(1),
        Mesh([(0.0, 1.0)], [0.25]),
        [
            (
                DirichletBoundaryCondition(
                    partial_condition, is_static=True
                ),
            )
            * 2
        ],
    )
    out = np.asarray(
        cp.static_y_vertex_constraints.apply(
            np.zeros(cp.y_vertices_shape)
        )
    )
    assert out[0, 0] == 5.0 and out[-1, 0] == 5.0
    assert np.all(out[:, 1] == 0.0)


def test_dynamic_boundary_constraints_evaluated_at_t():
    cp = ConstrainedProblem(
        DiffusionEquation(1),
        Mesh([(0.0, 1.0)], [0.25]),
        [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), 1), t)
                ),
            )
            * 2
        ],
    )
    assert cp.static_boundary_vertex_constraints.y[0].lower is None

    evaluated = cp.create_boundary_constraints(True, t=3.5)
    lower = evaluated.y[0].lower
    assert np.allclose(np.asarray(lower.values).ravel(), 3.5)

    y_constraints = cp.create_y_vertex_constraints(evaluated.y)
    out = np.asarray(
        y_constraints.apply(np.zeros(cp.y_vertices_shape))
    )
    assert out[0, 0] == 3.5 and out[-1, 0] == 3.5


def test_cell_constraints_evaluated_at_domain_bounds():
    seen_x = []

    def record(x, t):
        seen_x.append(np.copy(x))
        return np.zeros((len(x), 1))

    ConstrainedProblem(
        DiffusionEquation(1),
        Mesh([(0.0, 1.0)], [0.25]),
        [(DirichletBoundaryCondition(record, is_static=True),) * 2],
    )
    # both vertex and cell evaluations pin the axis coordinate to the
    # actual domain bounds
    boundary_x_values = {float(x[0, 0]) for x in seen_x}
    assert boundary_x_values == {0.0, 1.0}


def test_wrong_boundary_condition_pair_count():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    bc_pair = (_static_dirichlet(1.0), _static_dirichlet(1.0))
    with pytest.raises(ValueError):  # one pair for a 2D mesh
        ConstrainedProblem(DiffusionEquation(2), mesh, [bc_pair])
    with pytest.raises(ValueError):  # three pairs for a 2D mesh
        ConstrainedProblem(
            DiffusionEquation(2), mesh, [bc_pair] * 3
        )


def test_boundary_condition_wrong_y_width():
    mesh = Mesh([(0.0, 1.0)], [0.5])
    # conditions emitting 2 components for a 1-component equation
    wide = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 2)), is_static=True
    )
    with pytest.raises(ValueError):
        ConstrainedProblem(DiffusionEquation(1), mesh, [(wide, wide)])


def test_3d_pde_constraint_shapes():
    mesh = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 2)), is_static=True
    )
    cp = ConstrainedProblem(WaveEquation(3), mesh, [(bc, bc)] * 3)
    assert cp.y_shape(True) == (3, 3, 3, 2)
    assert cp.y_shape(False) == (2, 2, 2, 2)
    d_y = cp.static_boundary_vertex_constraints.d_y
    assert len(d_y) == 3
    # the axis-0 boundary constraint covers a (1, 3, 3) face per
    # component pair
    pair = d_y[0]
    assert np.asarray(pair.lower.mask).shape[:-1] == (1, 3, 3)


def test_mixed_static_dynamic_flags():
    mesh = Mesh([(0.0, 1.0)], [0.5])
    static = _static_dirichlet(1.0)
    dynamic = DirichletBoundaryCondition(
        lambda x, t: np.full((len(x), 1), t)
    )
    cp = ConstrainedProblem(
        DiffusionEquation(1), mesh, [(static, dynamic)]
    )
    assert not cp.are_all_boundary_conditions_static
    assert cp.are_there_boundary_conditions_on_y
    # per-t evaluation reflects both the static and the dynamic side
    for t in (0.25, 2.0):
        constraints = cp.create_boundary_constraints(True, t)
        pair = constraints.y[0]
        assert float(np.asarray(pair.lower.values).ravel()[0]) == 1.0
        assert float(np.asarray(pair.upper.values).ravel()[0]) == t


def test_cell_vs_vertex_constraint_independence():
    mesh = Mesh([(0.0, 2.0)], [0.5])
    cp = ConstrainedProblem(
        DiffusionEquation(1),
        mesh,
        [(_static_dirichlet(3.0), _static_dirichlet(-1.0))],
    )
    vertex = cp.static_boundary_vertex_constraints
    cell = cp.static_boundary_cell_constraints
    # vertex y-constraints pin the first/last vertices
    y_constraint = cp.static_y_vertex_constraints
    values = np.where(
        np.asarray(y_constraint.mask),
        np.asarray(y_constraint.values),
        np.nan,
    ).reshape(-1)
    assert values[0] == 3.0 and values[-1] == -1.0
    assert vertex is not cell
