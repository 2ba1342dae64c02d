"""Direct unit tests of the tail-padded differentiator.

Every vector-calculus operation of
:class:`PaddedThreePointCentralDifferenceMethod` on a padded array must
equal :class:`ThreePointCentralDifferenceMethod` on the unpadded array
at every real vertex — including under random Neumann-style derivative
boundary constraints — for all four coordinate systems. The end-to-end
decomposition tests cover whatever operations each equation happens to
use; these pin the full operator x padding matrix.
"""

import numpy as np
import pytest

from pararealml_tpu import ConstrainedProblem  # noqa: F401
from pararealml_tpu.constrained_problem import BoundaryConstraintPair
from pararealml_tpu.constraint import Constraint
from pararealml_tpu.mesh import CoordinateSystem, Mesh
from pararealml_tpu.operators.fdm import (
    PaddedThreePointCentralDifferenceMethod,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.operators.fdm.padded_grid import pad_state


def _random_constraints(rng, shape, y_dim):
    """Random per-axis derivative boundary constraint pairs with
    randomly masked entries."""
    pairs = []
    for axis in range(len(shape)):
        face_shape = tuple(
            1 if a == axis else s for a, s in enumerate(shape)
        ) + (y_dim,)

        def constraint():
            return Constraint(
                rng.normal(size=face_shape),
                rng.uniform(size=face_shape) < 0.5,
            )

        pairs.append(
            BoundaryConstraintPair(constraint(), constraint())
        )
    return tuple(pairs)


def _compare_all_ops(mesh, y_dim, vector=False, seed=0):
    rng = np.random.default_rng(seed)
    shape = mesh.vertices_shape
    dims = mesh.dimensions
    y = rng.normal(size=shape + (y_dim,))
    constraints = _random_constraints(rng, shape, y_dim)

    padded_shape = tuple(
        s + (3 if axis == 0 else (2 if axis == 1 else 0))
        for axis, s in enumerate(shape)
    )
    y_pad = np.asarray(pad_state(y, shape, padded_shape))
    pad_constraints = tuple(
        BoundaryConstraintPair(
            Constraint(
                np.asarray(
                    pad_state(
                        pair.lower.values, shape_face, padded_face
                    )
                ),
                np.asarray(
                    pad_state(pair.lower.mask, shape_face, padded_face)
                ),
            ),
            Constraint(
                np.asarray(
                    pad_state(
                        pair.upper.values, shape_face, padded_face
                    )
                ),
                np.asarray(
                    pad_state(pair.upper.mask, shape_face, padded_face)
                ),
            ),
        )
        for axis, pair in enumerate(constraints)
        for shape_face in [
            tuple(
                1 if a == axis else s for a, s in enumerate(shape)
            )
        ]
        for padded_face in [
            tuple(
                1 if a == axis else s
                for a, s in enumerate(padded_shape)
            )
        ]
    )

    base = ThreePointCentralDifferenceMethod()
    padded = PaddedThreePointCentralDifferenceMethod(
        shape, padded_shape
    )
    real = tuple(slice(0, s) for s in shape)

    def check(name, expected, actual):
        np.testing.assert_allclose(
            np.asarray(actual)[real],
            np.asarray(expected),
            rtol=0,
            atol=1e-12,
            err_msg=name,
        )

    for axis in range(dims):
        check(
            f"gradient axis {axis}",
            base.gradient(y, mesh, axis, constraints),
            padded.gradient(y_pad, mesh, axis, pad_constraints),
        )
    for axis1 in range(dims):
        for axis2 in range(dims):
            check(
                f"hessian {axis1},{axis2}",
                base.hessian(y, mesh, axis1, axis2, constraints),
                padded.hessian(
                    y_pad, mesh, axis1, axis2, pad_constraints
                ),
            )
    check(
        "laplacian",
        base.laplacian(y, mesh, constraints),
        padded.laplacian(y_pad, mesh, pad_constraints),
    )
    if vector:
        check(
            "divergence",
            base.divergence(y, mesh, constraints),
            padded.divergence(y_pad, mesh, pad_constraints),
        )
        for ind in range(dims if dims == 3 else 1):
            check(
                f"curl {ind}",
                base.curl(y, mesh, ind, constraints),
                padded.curl(y_pad, mesh, ind, pad_constraints),
            )
        for ind in range(dims):
            check(
                f"vector laplacian {ind}",
                base.vector_laplacian(y, mesh, ind, constraints),
                padded.vector_laplacian(
                    y_pad, mesh, ind, pad_constraints
                ),
            )


def test_cartesian_scalar_ops_match_unpadded():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.2)], [0.125, 0.2])  # 9x7
    _compare_all_ops(mesh, y_dim=1)


def test_cartesian_vector_ops_match_unpadded():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.2)], [0.125, 0.2])
    _compare_all_ops(mesh, y_dim=2, vector=True)


def test_polar_ops_match_unpadded():
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 2.0 * np.pi)],
        [0.25, np.pi / 4.0],
        CoordinateSystem.POLAR,
    )
    _compare_all_ops(mesh, y_dim=2, vector=True)


@pytest.mark.slow
def test_cylindrical_ops_match_unpadded():
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 2.0 * np.pi), (0.0, 1.5)],
        [0.5, np.pi / 2.0, 0.375],
        CoordinateSystem.CYLINDRICAL,
    )
    _compare_all_ops(mesh, y_dim=3, vector=True)


def test_spherical_ops_match_unpadded():
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 2.0 * np.pi), (0.25 * np.pi, 0.75 * np.pi)],
        [0.5, np.pi / 2.0, 0.125 * np.pi],
        CoordinateSystem.SPHERICAL,
    )
    _compare_all_ops(mesh, y_dim=3, vector=True)


def test_anti_laplacian_matches_unpadded():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.2)], [0.125, 0.2])
    rng = np.random.default_rng(3)
    shape = mesh.vertices_shape
    laplacian = rng.normal(size=shape + (1,))
    # Dirichlet edge values so the Poisson problem is well posed
    mask = np.zeros(shape + (1,), dtype=bool)
    mask[0], mask[-1], mask[:, 0], mask[:, -1] = True, True, True, True
    y_constraint = Constraint(np.zeros(shape + (1,)), mask)

    base = ThreePointCentralDifferenceMethod(tol=1e-6)
    expected = np.asarray(
        base.anti_laplacian(laplacian, mesh, y_constraint)
    )

    padded_shape = (shape[0] + 3, shape[1] + 2)
    padded = PaddedThreePointCentralDifferenceMethod(
        shape, padded_shape, tol=1e-6
    )
    lap_pad = pad_state(laplacian, shape, padded_shape)
    constraint_pad = Constraint(
        np.asarray(
            pad_state(y_constraint.values, shape, padded_shape)
        ),
        np.asarray(pad_state(y_constraint.mask, shape, padded_shape)),
    )
    actual = np.asarray(
        padded.anti_laplacian(lap_pad, mesh, constraint_pad)
    )
    real = tuple(slice(0, s) for s in shape)
    np.testing.assert_allclose(
        actual[real], expected, rtol=0, atol=1e-12
    )


def test_shape_validation():
    with pytest.raises(ValueError, match="at least the real"):
        PaddedThreePointCentralDifferenceMethod((8, 8), (7, 8))
    with pytest.raises(ValueError, match="same rank"):
        PaddedThreePointCentralDifferenceMethod((8, 8), (8, 8, 8))
