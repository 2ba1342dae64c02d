"""Differential parity harness against the reference implementation.

These tests run only where the reference library is available (mounted at
/root/reference); they feed identical random inputs to both
implementations and require agreement to near machine precision. They are
skipped automatically elsewhere (CI), where the oracle-based tests carry
the coverage.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "pararealml")),
    reason="reference implementation not available",
)


@pytest.fixture(scope="module")
def reference():
    if not hasattr(np, "product"):
        np.product = np.prod  # the reference targets an older numpy
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import pararealml as ref
        import pararealml.operators.fdm as ref_fdm

        yield ref, ref_fdm
    finally:
        sys.path.remove(REFERENCE_PATH)


def _meshes(module):
    return {
        "cartesian": module.Mesh(
            [(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1]
        ),
        "polar": module.Mesh(
            [(1.0, 2.0), (0.0, 2.0)],
            [0.1, 0.2],
            module.CoordinateSystem.POLAR,
        ),
        "cylindrical": module.Mesh(
            [(1.0, 2.0), (0.0, 2.0), (0.0, 1.0)],
            [0.2, 0.4, 0.2],
            module.CoordinateSystem.CYLINDRICAL,
        ),
        "spherical": module.Mesh(
            [(1.0, 2.0), (0.0, 2.0), (0.5, 1.5)],
            [0.2, 0.4, 0.2],
            module.CoordinateSystem.SPHERICAL,
        ),
    }


def test_differentiator_ops_match_reference(reference):
    ref, ref_fdm = reference
    import pararealml_tpu as mine
    from pararealml_tpu.operators.fdm import (
        ThreePointCentralDifferenceMethod,
    )

    rng = np.random.default_rng(42)
    my_diff = ThreePointCentralDifferenceMethod()
    ref_diff = ref_fdm.ThreePointCentralDifferenceMethod()

    for name in ("cartesian", "polar", "cylindrical", "spherical"):
        my_mesh = _meshes(mine)[name]
        ref_mesh = _meshes(ref)[name]
        dims = my_mesh.dimensions
        y_vector = rng.standard_normal(
            my_mesh.vertices_shape + (dims,)
        )
        y_scalar = y_vector[..., :1]

        for axis in range(dims):
            mine_out = np.asarray(
                my_diff.gradient(y_scalar, my_mesh, axis)
            )
            ref_out = ref_diff.gradient(y_scalar, ref_mesh, axis)
            assert np.allclose(mine_out, ref_out, atol=1e-10), (
                f"gradient {name} axis {axis}"
            )

        for axis1 in range(dims):
            for axis2 in range(dims):
                mine_out = np.asarray(
                    my_diff.hessian(y_scalar, my_mesh, axis1, axis2)
                )
                ref_out = ref_diff.hessian(
                    y_scalar, ref_mesh, axis1, axis2
                )
                assert np.allclose(mine_out, ref_out, atol=1e-10), (
                    f"hessian {name} axes {axis1},{axis2}"
                )

        assert np.allclose(
            np.asarray(my_diff.divergence(y_vector, my_mesh)),
            ref_diff.divergence(y_vector, ref_mesh),
            atol=1e-10,
        ), f"divergence {name}"

        curl_indices = [0] if dims == 2 else [0, 1, 2]
        for curl_index in curl_indices:
            assert np.allclose(
                np.asarray(
                    my_diff.curl(y_vector, my_mesh, curl_index)
                ),
                ref_diff.curl(y_vector, ref_mesh, curl_index),
                atol=1e-10,
            ), f"curl {name} {curl_index}"

        assert np.allclose(
            np.asarray(my_diff.laplacian(y_scalar, my_mesh)),
            ref_diff.laplacian(y_scalar, ref_mesh),
            atol=1e-10,
        ), f"laplacian {name}"

        if name == "spherical":
            # known reference defect: its spherical vector Laplacian
            # combines the scalar Laplacian of component i with the
            # curvilinear correction terms of a *different* component
            # (numerical_differentiator.py:773-841 — e.g. index 1 pairs
            # lap(y_theta) with the r-component corrections), so its
            # outputs match no standard formula. This implementation
            # uses the textbook assignment, validated by
            # test_numerical_differentiator.py::
            # test_spherical_vector_laplacian against a coordinate-free
            # Cartesian oracle (runs in CI without this harness).
            continue

        for index in range(dims):
            assert np.allclose(
                np.asarray(
                    my_diff.vector_laplacian(y_vector, my_mesh, index)
                ),
                ref_diff.vector_laplacian(y_vector, ref_mesh, index),
                atol=1e-10,
            ), f"vector_laplacian {name} {index}"


def _build_diffusion_problem(module, t_end):
    diff_eq = module.DiffusionEquation(2, 0.25)
    mesh = module.Mesh([(0.0, 5.0), (0.0, 5.0)], [0.25, 0.25])
    bcs = [
        (
            module.DirichletBoundaryCondition(
                lambda x, t: np.full((len(x), 1), 2.0), is_static=True
            ),
            module.DirichletBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        ),
        (
            module.NeumannBoundaryCondition(
                lambda x, t: np.full((len(x), 1), 0.5), is_static=True
            ),
            module.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        ),
    ]
    cp = module.ConstrainedProblem(diff_eq, mesh, bcs)
    ic = module.GaussianInitialCondition(
        cp, [(np.full(2, 2.5), np.eye(2))], [20.0]
    )
    return module.InitialValueProblem(cp, (0.0, t_end), ic)


def test_fdm_solve_matches_reference(reference):
    ref, ref_fdm = reference
    import pararealml_tpu as mine
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )

    my_ivp = _build_diffusion_problem(mine, 0.5)
    ref_ivp = _build_diffusion_problem(ref, 0.5)

    my_solution = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.01,
        fused_kernels=False,
    ).solve(my_ivp)
    ref_solution = ref_fdm.FDMOperator(
        ref_fdm.RK4(), ref_fdm.ThreePointCentralDifferenceMethod(), 0.01
    ).solve(ref_ivp)

    assert np.allclose(
        my_solution.discrete_y(),
        ref_solution.discrete_y(),
        atol=1e-10,
    )


def test_dynamic_bc_solve_matches_reference(reference):
    ref, ref_fdm = reference
    import pararealml_tpu as mine
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )

    def build(module):
        diff_eq = module.DiffusionEquation(1, 0.5)
        mesh = module.Mesh([(0.0, 1.0)], [0.1])
        bcs = [
            (
                module.DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), 1), t)
                ),
                module.NeumannBoundaryCondition(
                    lambda x, t: np.full((len(x), 1), np.sin(t))
                ),
            )
        ]
        cp = module.ConstrainedProblem(diff_eq, mesh, bcs)
        ic = module.ContinuousInitialCondition(
            cp, lambda x: np.zeros_like(x)
        )
        return module.InitialValueProblem(cp, (0.0, 1.0), ic)

    my_solution = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.05
    ).solve(build(mine))
    ref_solution = ref_fdm.FDMOperator(
        ref_fdm.RK4(), ref_fdm.ThreePointCentralDifferenceMethod(), 0.05
    ).solve(build(ref))

    assert np.allclose(
        my_solution.discrete_y(),
        ref_solution.discrete_y(),
        atol=1e-10,
    )
