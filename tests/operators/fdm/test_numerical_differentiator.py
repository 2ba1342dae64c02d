import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    CoordinateSystem,
    DiffusionEquation,
    DirichletBoundaryCondition,
    Mesh,
    NeumannBoundaryCondition,
)
from pararealml_tpu.operators.fdm import (
    ThreePointCentralDifferenceMethod,
)

DIFF = ThreePointCentralDifferenceMethod()


def _interior(a, dims):
    sl = tuple([slice(1, -1)] * dims)
    return np.asarray(a)[sl]


def test_derivative_of_quadratic_is_exact_in_interior():
    mesh = Mesh([(0.0, 1.0)], [0.1])
    x = mesh.vertex_coordinate_grids[0][..., None]
    y = x**2
    derivative = DIFF.gradient(y, mesh, 0)
    assert np.allclose(_interior(derivative, 1), _interior(2 * x, 1))


def test_derivative_input_validation():
    mesh = Mesh([(0.0, 1.0)], [0.5])
    y = np.zeros((3, 1))
    with pytest.raises(ValueError):
        DIFF.gradient(y, mesh, 1)
    with pytest.raises(ValueError):
        DIFF.gradient(np.zeros((4, 1)), mesh, 0)
    small_mesh = Mesh([(0.0, 1.0)], [1.0])
    with pytest.raises(ValueError):
        DIFF.gradient(np.zeros((2, 1)), small_mesh, 0)


def test_second_derivative_of_cubic():
    mesh = Mesh([(0.0, 1.0)], [0.05])
    x = mesh.vertex_coordinate_grids[0][..., None]
    y = x**3
    second = DIFF.hessian(y, mesh, 0, 0)
    assert np.allclose(_interior(second, 1), _interior(6 * x, 1))


def test_mixed_second_derivative():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0][..., None], grids[1][..., None]
    y = x0 * x1
    mixed = DIFF.hessian(y, mesh, 0, 1)
    # interior of the interior (the inner derivative is polluted at the
    # boundary by the zero halos)
    assert np.allclose(np.asarray(mixed)[2:-2, 2:-2], 1.0)


def test_cartesian_laplacian():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0][..., None], grids[1][..., None]
    y = x0**2 + x1**2
    laplacian = DIFF.laplacian(y, mesh)
    assert np.allclose(_interior(laplacian, 2), 4.0)


def test_polar_laplacian():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0)],
        [0.05, 0.05],
        CoordinateSystem.POLAR,
    )
    r = mesh.vertex_coordinate_grids[0][..., None]
    laplacian = DIFF.laplacian(r**2, mesh)
    assert np.allclose(_interior(laplacian, 2), 4.0)


def test_cylindrical_laplacian():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0), (0.0, 1.0)],
        [0.1, 0.1, 0.1],
        CoordinateSystem.CYLINDRICAL,
    )
    grids = mesh.vertex_coordinate_grids
    r, z = grids[0][..., None], grids[2][..., None]
    laplacian = DIFF.laplacian(r**2 + z**2, mesh)
    assert np.allclose(_interior(laplacian, 3), 6.0)


def test_spherical_laplacian():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0), (1.0, 2.0)],
        [0.05, 0.1, 0.05],
        CoordinateSystem.SPHERICAL,
    )
    r = mesh.vertex_coordinate_grids[0][..., None]
    laplacian = DIFF.laplacian(r**2, mesh)
    assert np.allclose(_interior(laplacian, 3), 6.0, rtol=1e-3)


def test_polar_gradient():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0)],
        [0.05, 0.05],
        CoordinateSystem.POLAR,
    )
    grids = mesh.vertex_coordinate_grids
    r, theta = grids[0][..., None], grids[1][..., None]
    d_theta = DIFF.gradient(theta.copy(), mesh, 1)
    assert np.allclose(_interior(d_theta, 2), _interior(1.0 / r, 2))


def test_cartesian_divergence():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0], grids[1]
    field = np.stack([x0**2, x1**2], axis=-1)
    divergence = DIFF.divergence(field, mesh)
    expected = 2 * x0[..., None] + 2 * x1[..., None]
    assert np.allclose(_interior(divergence, 2), _interior(expected, 2))


def test_cylindrical_divergence():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0), (0.0, 1.0)],
        [0.1, 0.1, 0.1],
        CoordinateSystem.CYLINDRICAL,
    )
    grids = mesh.vertex_coordinate_grids
    r, z = grids[0], grids[2]
    field = np.stack([r, np.zeros_like(r), z], axis=-1)
    divergence = DIFF.divergence(field, mesh)
    assert np.allclose(_interior(divergence, 3), 3.0)


def test_divergence_requires_vector_field():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    with pytest.raises(ValueError):
        DIFF.divergence(np.zeros(mesh.vertices_shape + (1,)), mesh)


def test_cartesian_curl_2d():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0], grids[1]
    field = np.stack([-x1, x0], axis=-1)
    curl = DIFF.curl(field, mesh)
    assert np.allclose(_interior(curl, 2), 2.0)


def test_cartesian_curl_3d():
    mesh = Mesh([(0.0, 1.0)] * 3, [0.2] * 3)
    grids = mesh.vertex_coordinate_grids
    x0, x1, x2 = grids
    field = np.stack([x1 * x2, np.zeros_like(x0), np.zeros_like(x0)],
                     axis=-1)
    # curl of (y*z, 0, 0) = (0, y, -z)
    curl_0 = DIFF.curl(field, mesh, 0)
    curl_1 = DIFF.curl(field, mesh, 1)
    curl_2 = DIFF.curl(field, mesh, 2)
    assert np.allclose(_interior(curl_0, 3), 0.0)
    assert np.allclose(
        _interior(curl_1, 3), _interior(x1[..., None], 3)
    )
    assert np.allclose(
        _interior(curl_2, 3), _interior(-x2[..., None], 3)
    )


def test_curl_validation():
    mesh = Mesh([(0.0, 1.0)], [0.25])
    with pytest.raises(ValueError):
        DIFF.curl(np.zeros((5, 1)), mesh)
    mesh2 = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    with pytest.raises(ValueError):
        DIFF.curl(np.zeros(mesh2.vertices_shape + (2,)), mesh2, 1)


def test_cartesian_vector_laplacian_matches_scalar():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0], grids[1]
    field = np.stack([x0**2, x1**2], axis=-1)
    for ind in range(2):
        vector_laplacian = DIFF.vector_laplacian(field, mesh, ind)
        scalar_laplacian = DIFF.laplacian(field[..., ind: ind + 1], mesh)
        assert np.allclose(
            np.asarray(vector_laplacian), np.asarray(scalar_laplacian)
        )


def test_polar_vector_laplacian():
    # constant radial field (1, 0): vector Laplacian r-component is -1/r^2
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0)],
        [0.05, 0.05],
        CoordinateSystem.POLAR,
    )
    r = mesh.vertex_coordinate_grids[0][..., None]
    field = np.concatenate([np.ones_like(r), np.zeros_like(r)], axis=-1)
    vector_laplacian = DIFF.vector_laplacian(field, mesh, 0)
    assert np.allclose(
        _interior(vector_laplacian, 2), _interior(-1.0 / r**2, 2)
    )


def _dirichlet_diffusion_cp(mesh, value_fn):
    bc = DirichletBoundaryCondition(value_fn, is_static=True)
    return ConstrainedProblem(
        DiffusionEquation(mesh.dimensions), mesh,
        [(bc, bc)] * mesh.dimensions,
    )


def test_anti_laplacian_roundtrip():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.1, 0.1])
    grids = mesh.vertex_coordinate_grids
    x0, x1 = grids[0][..., None], grids[1][..., None]
    y_true = x0**2 - x1**2 + x0 * x1

    def boundary_values(x, t):
        return (
            x[:, :1] ** 2 - x[:, 1:] ** 2 + x[:, :1] * x[:, 1:]
        )

    cp = _dirichlet_diffusion_cp(mesh, boundary_values)
    y_constraint = cp.static_y_vertex_constraints

    differentiator = ThreePointCentralDifferenceMethod(tol=1e-12)
    laplacian = differentiator.laplacian(y_true, mesh)
    recovered = differentiator.anti_laplacian(
        laplacian, mesh, y_constraint
    )
    assert np.allclose(np.asarray(recovered), y_true, atol=1e-4)


def test_derivative_boundary_constraint_override():
    mesh = Mesh([(0.0, 1.0)], [0.25])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.full((len(x), 1), 3.0), is_static=True
    )
    cp = ConstrainedProblem(
        DiffusionEquation(1), mesh, [(bc, bc)]
    )
    d_y_bcs = cp.static_boundary_vertex_constraints.d_y
    x = mesh.vertex_coordinate_grids[0][..., None]
    derivative = DIFF.gradient(x.copy(), mesh, 0, d_y_bcs)
    out = np.asarray(derivative)
    # boundary derivative values overridden to the constrained 3.0
    assert out[0, 0] == 3.0 and out[-1, 0] == 3.0
    assert np.allclose(out[1:-1, 0], 1.0)


def test_neumann_halos_in_second_derivative():
    # y = x on [0, 1] with d y / d n = 1 on both boundaries (i.e.
    # d y/d x = -1 at lower in normal convention? the constraint is on
    # the derivative along the axis): with constrained axis derivative 1
    # at both ends, the ghost points make the second derivative vanish
    # everywhere.
    mesh = Mesh([(0.0, 1.0)], [0.25])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.full((len(x), 1), 1.0), is_static=True
    )
    cp = ConstrainedProblem(DiffusionEquation(1), mesh, [(bc, bc)])
    d_y_bcs = cp.static_boundary_vertex_constraints.d_y
    x = mesh.vertex_coordinate_grids[0][..., None]
    second = DIFF.hessian(x.copy(), mesh, 0, 0, d_y_bcs)
    assert np.allclose(np.asarray(second), 0.0)


# -- spherical analytic oracles ---------------------------------------------
# Fields are defined by their Cartesian components (where vector calculus
# is trivial) and converted to spherical components through the local unit
# vectors, so every expected value has a closed form independent of the
# implementation. These keep the spherical operators covered in CI without
# the reference parity harness (VERDICT.md round 1, item 5).


def _spherical_mesh(d=0.025):
    return Mesh(
        [(1.0, 2.0), (0.5, 1.5), (0.6, 1.4)],
        [2 * d, 2 * d, d],
        CoordinateSystem.SPHERICAL,
    )


def _spherical_basis(mesh):
    """Unit vectors e_r, e_theta (azimuthal), e_phi (polar) as arrays of
    shape (3=component, *grid, 3=cartesian)."""
    grids = mesh.vertex_coordinate_grids
    theta, phi = grids[1], grids[2]
    sin_t, cos_t = np.sin(theta), np.cos(theta)
    sin_p, cos_p = np.sin(phi), np.cos(phi)
    e_r = np.stack([sin_p * cos_t, sin_p * sin_t, cos_p], -1)
    e_theta = np.stack([-sin_t, cos_t, np.zeros_like(theta)], -1)
    e_phi = np.stack([cos_p * cos_t, cos_p * sin_t, -sin_p], -1)
    return np.stack([e_r, e_theta, e_phi])


def _spherical_cartesian_points(mesh):
    grids = mesh.vertex_coordinate_grids
    r, theta, phi = grids
    sin_p = np.sin(phi)
    return (
        r * sin_p * np.cos(theta),
        r * sin_p * np.sin(theta),
        r * np.cos(phi),
    )


def test_spherical_gradient():
    mesh = _spherical_mesh()
    grids = mesh.vertex_coordinate_grids
    r, phi = grids[0], grids[2]
    # f = z = r cos(phi): cartesian gradient is (0, 0, 1), so the
    # spherical components are e_i . z_hat
    f = (r * np.cos(phi))[..., None]
    basis = _spherical_basis(mesh)
    for axis in range(3):
        gradient = DIFF.gradient(f.copy(), mesh, axis)
        expected = basis[axis][..., 2:]
        assert np.allclose(
            _interior(gradient, 3), _interior(expected, 3), atol=1e-3
        ), axis


def test_spherical_hessian_of_r_squared_is_identity():
    mesh = _spherical_mesh()
    r = mesh.vertex_coordinate_grids[0][..., None]
    # the covariant Hessian of |x|^2 is 2*I in every coordinate system
    f = r**2
    for i in range(3):
        for j in range(3):
            hessian = DIFF.hessian(f, mesh, i, j)
            expected = 2.0 if i == j else 0.0
            assert np.allclose(
                _interior(hessian, 3), expected, atol=2e-2
            ), (i, j)


def test_spherical_hessian_of_linear_function_vanishes():
    mesh = _spherical_mesh()
    grids = mesh.vertex_coordinate_grids
    f = (grids[0] * np.cos(grids[2]))[..., None]  # f = z
    for i in range(3):
        for j in range(3):
            hessian = DIFF.hessian(f, mesh, i, j)
            assert np.allclose(
                _interior(hessian, 3), 0.0, atol=2e-2
            ), (i, j)


def test_spherical_divergence():
    mesh = _spherical_mesh()
    x, y, z = _spherical_cartesian_points(mesh)
    basis = _spherical_basis(mesh)
    # A_cart = (x^2, y^2, z^2): div A = 2(x + y + z)
    a_cart = np.stack([x**2, y**2, z**2], -1)
    a_sph = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(3)], -1
    )
    divergence = DIFF.divergence(a_sph, mesh)
    expected = (2 * (x + y + z))[..., None]
    assert np.allclose(
        _interior(divergence, 3), _interior(expected, 3),
        rtol=2e-3, atol=2e-3,
    )


def test_spherical_curl():
    mesh = _spherical_mesh()
    x, y, _ = _spherical_cartesian_points(mesh)
    basis = _spherical_basis(mesh)
    # A_cart = (-y, x, 0): curl A = (0, 0, 2)
    a_cart = np.stack([-y, x, np.zeros_like(x)], -1)
    a_sph = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(3)], -1
    )
    curl_cart = np.array([0.0, 0.0, 2.0])
    for ind in range(3):
        curl = DIFF.curl(a_sph, mesh, ind)
        expected = (basis[ind] @ curl_cart)[..., None]
        assert np.allclose(
            _interior(curl, 3), _interior(expected, 3), atol=5e-3
        ), ind


def test_spherical_vector_laplacian():
    mesh = _spherical_mesh()
    x, y, z = _spherical_cartesian_points(mesh)
    basis = _spherical_basis(mesh)
    # A_cart = (x^2, y^2, z^2): vector Laplacian is (2, 2, 2) since the
    # Cartesian vector Laplacian acts componentwise
    a_cart = np.stack([x**2, y**2, z**2], -1)
    a_sph = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(3)], -1
    )
    lap_cart = np.array([2.0, 2.0, 2.0])
    for ind in range(3):
        vector_laplacian = DIFF.vector_laplacian(a_sph, mesh, ind)
        expected = (basis[ind] @ lap_cart)[..., None]
        # second derivatives of trig-modulated components: the interior
        # of the interior avoids halo pollution of chained stencils
        inner = tuple([slice(2, -2)] * 3)
        assert np.allclose(
            np.asarray(vector_laplacian)[inner],
            expected[inner],
            atol=2e-2,
        ), ind


# -- polar / cylindrical analytic oracles ------------------------------------
# Same Cartesian-conversion approach as the spherical oracles above.


def _polar_mesh(d=0.02):
    return Mesh(
        [(1.0, 2.0), (0.5, 1.5)], [2 * d, 2 * d], CoordinateSystem.POLAR
    )


def _cylindrical_mesh(d=0.025):
    return Mesh(
        [(1.0, 2.0), (0.5, 1.5), (0.0, 1.0)],
        [2 * d, 2 * d, 2 * d],
        CoordinateSystem.CYLINDRICAL,
    )


def _circular_basis(mesh):
    """e_r, e_theta (+ e_z for cylindrical) as (n_axes, *grid, n_axes)."""
    grids = mesh.vertex_coordinate_grids
    theta = grids[1]
    sin_t, cos_t = np.sin(theta), np.cos(theta)
    zero = np.zeros_like(theta)
    if mesh.dimensions == 2:
        e_r = np.stack([cos_t, sin_t], -1)
        e_theta = np.stack([-sin_t, cos_t], -1)
        return np.stack([e_r, e_theta])
    one = np.ones_like(theta)
    e_r = np.stack([cos_t, sin_t, zero], -1)
    e_theta = np.stack([-sin_t, cos_t, zero], -1)
    e_z = np.stack([zero, zero, one], -1)
    return np.stack([e_r, e_theta, e_z])


def _circular_cartesian(mesh):
    grids = mesh.vertex_coordinate_grids
    r, theta = grids[0], grids[1]
    if mesh.dimensions == 2:
        return (r * np.cos(theta), r * np.sin(theta))
    return (r * np.cos(theta), r * np.sin(theta), grids[2])


@pytest.mark.parametrize(
    "mesh_factory", [_polar_mesh, _cylindrical_mesh]
)
def test_circular_gradient_oracle(mesh_factory):
    mesh = mesh_factory()
    dims = mesh.dimensions
    points = _circular_cartesian(mesh)
    # f = x + 2y (+ 3z): cartesian gradient (1, 2[, 3])
    f = (points[0] + 2.0 * points[1])[..., None]
    grad_cart = np.array([1.0, 2.0])
    if dims == 3:
        f = f + (3.0 * points[2])[..., None]
        grad_cart = np.array([1.0, 2.0, 3.0])
    basis = _circular_basis(mesh)
    for axis in range(dims):
        gradient = DIFF.gradient(f.copy(), mesh, axis)
        expected = (basis[axis] @ grad_cart)[..., None]
        assert np.allclose(
            _interior(gradient, dims), _interior(expected, dims),
            atol=2e-3,
        ), axis


@pytest.mark.parametrize(
    "mesh_factory", [_polar_mesh, _cylindrical_mesh]
)
def test_circular_hessian_oracle(mesh_factory):
    mesh = mesh_factory()
    dims = mesh.dimensions
    r = mesh.vertex_coordinate_grids[0][..., None]
    # covariant Hessian of r^2 = x^2 + y^2 is 2 diag(1, 1[, 0])
    f = r**2
    for i in range(dims):
        for j in range(dims):
            hessian = DIFF.hessian(f, mesh, i, j)
            expected = 2.0 if (i == j and i < 2) else 0.0
            assert np.allclose(
                _interior(hessian, dims), expected, atol=2e-2
            ), (i, j)


@pytest.mark.parametrize(
    "mesh_factory", [_polar_mesh, _cylindrical_mesh]
)
def test_circular_divergence_oracle(mesh_factory):
    mesh = mesh_factory()
    dims = mesh.dimensions
    points = _circular_cartesian(mesh)
    basis = _circular_basis(mesh)
    # A_cart = (x^2, y^2[, z^2]): div = 2(x + y [+ z])
    a_cart = np.stack([p**2 for p in points], -1)
    a = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(dims)], -1
    )
    divergence = DIFF.divergence(a, mesh)
    expected = (2.0 * sum(points))[..., None]
    assert np.allclose(
        _interior(divergence, dims), _interior(expected, dims),
        rtol=5e-3, atol=5e-3,
    )


def test_polar_curl_oracle():
    mesh = _polar_mesh()
    x, y = _circular_cartesian(mesh)
    basis = _circular_basis(mesh)
    # A_cart = (-y, x): scalar curl = 2
    a_cart = np.stack([-y, x], -1)
    a = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(2)], -1
    )
    curl = DIFF.curl(a, mesh, 0)
    assert np.allclose(_interior(curl, 2), 2.0, atol=5e-3)


def test_cylindrical_curl_oracle():
    mesh = _cylindrical_mesh()
    x, y, z = _circular_cartesian(mesh)
    basis = _circular_basis(mesh)
    # A_cart = (-y z, x z, 0): curl = (-x, -y, 2 z)
    a_cart = np.stack([-y * z, x * z, np.zeros_like(z)], -1)
    a = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(3)], -1
    )
    curl_cart = np.stack([-x, -y, 2.0 * z], -1)
    for ind in range(3):
        curl = DIFF.curl(a, mesh, ind)
        expected = np.sum(basis[ind] * curl_cart, -1)[..., None]
        assert np.allclose(
            _interior(curl, 3), _interior(expected, 3), atol=1e-2
        ), ind


@pytest.mark.parametrize(
    "mesh_factory", [_polar_mesh, _cylindrical_mesh]
)
def test_circular_vector_laplacian_oracle(mesh_factory):
    mesh = mesh_factory()
    dims = mesh.dimensions
    points = _circular_cartesian(mesh)
    basis = _circular_basis(mesh)
    # A_cart = (x^2, y^2[, z^2]): vector Laplacian = (2, 2[, 2])
    a_cart = np.stack([p**2 for p in points], -1)
    a = np.stack(
        [np.sum(basis[i] * a_cart, -1) for i in range(dims)], -1
    )
    lap_cart = np.full(dims, 2.0)
    inner = tuple([slice(2, -2)] * dims)
    for ind in range(dims):
        vector_laplacian = DIFF.vector_laplacian(a, mesh, ind)
        expected = (basis[ind] @ lap_cart)[..., None]
        assert np.allclose(
            np.asarray(vector_laplacian)[inner],
            expected[inner],
            atol=5e-2,
        ), ind
