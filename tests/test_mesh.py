import numpy as np
import pytest

from pararealml_tpu import (
    CoordinateSystem,
    Mesh,
    from_cartesian_coordinates,
    to_cartesian_coordinates,
    unit_vectors_at,
)


def test_mesh_constructor_validation():
    with pytest.raises(ValueError):
        Mesh([], [])
    with pytest.raises(ValueError):
        Mesh([(0.0, 1.0)], [0.1, 0.1])
    with pytest.raises(ValueError):
        Mesh([(1.0, 0.0)], [0.1])
    with pytest.raises(ValueError):
        Mesh([(0.0, 1.0)], [-0.1])


def test_polar_mesh_validation():
    with pytest.raises(ValueError):
        Mesh([(0.0, 1.0)], [0.1], CoordinateSystem.POLAR)
    with pytest.raises(ValueError):
        Mesh(
            [(-1.0, 1.0), (0.0, np.pi)],
            [0.1, 0.1],
            CoordinateSystem.POLAR,
        )
    with pytest.raises(ValueError):
        Mesh(
            [(0.0, 1.0), (0.0, 3.0 * np.pi)],
            [0.1, 0.1],
            CoordinateSystem.POLAR,
        )


def test_spherical_mesh_validation():
    with pytest.raises(ValueError):
        Mesh(
            [(0.0, 1.0), (0.0, np.pi), (0.0, 2.0 * np.pi)],
            [0.1] * 3,
            CoordinateSystem.SPHERICAL,
        )


def test_cartesian_mesh_geometry():
    mesh = Mesh([(0.0, 1.0), (0.0, 2.0)], [0.25, 0.5])

    assert mesh.dimensions == 2
    assert mesh.vertices_shape == (5, 5)
    assert mesh.cells_shape == (4, 4)
    assert np.isclose(mesh.volume, 2.0)
    assert np.allclose(mesh.boundary_sizes, [(2.0, 2.0), (1.0, 1.0)])

    x0 = mesh.vertex_axis_coordinates[0]
    assert np.allclose(x0, [0.0, 0.25, 0.5, 0.75, 1.0])
    c0 = mesh.cell_center_axis_coordinates[0]
    assert np.allclose(c0, [0.125, 0.375, 0.625, 0.875])

    grids = mesh.vertex_coordinate_grids
    assert grids[0].shape == (5, 5)
    assert np.allclose(grids[0][:, 0], x0)
    assert np.allclose(grids[1][0, :], mesh.vertex_axis_coordinates[1])


def test_mesh_shape_and_coordinate_accessors():
    mesh = Mesh([(0.0, 1.0)], [0.1])
    assert mesh.shape(True) == (11,)
    assert mesh.shape(False) == (10,)
    assert len(mesh.axis_coordinates(True)) == 1
    assert mesh.all_index_coordinates(True).shape == (11, 1)
    assert mesh.all_index_coordinates(False, flatten=True).shape == (10, 1)


def test_polar_mesh_geometry():
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 2.0 * np.pi)],
        [0.5, np.pi / 4.0],
        CoordinateSystem.POLAR,
    )
    assert np.isclose(mesh.volume, 0.5 * (9.0 - 1.0) * 2.0 * np.pi)
    assert np.allclose(
        mesh.boundary_sizes,
        [(2.0 * np.pi, 6.0 * np.pi), (2.0, 2.0)],
    )


def test_cylindrical_mesh_geometry():
    mesh = Mesh(
        [(0.0, 2.0), (0.0, np.pi), (0.0, 3.0)],
        [0.5, np.pi / 4.0, 1.0],
        CoordinateSystem.CYLINDRICAL,
    )
    assert np.isclose(mesh.volume, 0.5 * 4.0 * np.pi * 3.0)
    assert np.allclose(
        mesh.boundary_sizes,
        [
            (0.0, 2.0 * np.pi * 3.0),
            (2.0 * 3.0, 2.0 * 3.0),
            (2.0 * np.pi, 2.0 * np.pi),
        ],
    )


def test_spherical_mesh_geometry():
    mesh = Mesh(
        [(0.0, 2.0), (0.0, 2.0 * np.pi), (0.0, np.pi)],
        [0.5, np.pi / 2.0, np.pi / 4.0],
        CoordinateSystem.SPHERICAL,
    )
    assert np.isclose(mesh.volume, 4.0 / 3.0 * np.pi * 8.0)
    # outer radial boundary is the full sphere surface
    assert np.isclose(mesh.boundary_sizes[0][1], 4.0 * np.pi * 4.0)
    assert np.isclose(mesh.boundary_sizes[0][0], 0.0)


def test_cartesian_coordinate_conversion_roundtrip():
    rng = np.random.default_rng(0)
    for cs in (
        CoordinateSystem.POLAR,
        CoordinateSystem.CYLINDRICAL,
        CoordinateSystem.SPHERICAL,
    ):
        dims = 2 if cs == CoordinateSystem.POLAR else 3
        x = [rng.uniform(0.1, 1.0, 10) for _ in range(dims)]
        x[1] = rng.uniform(0.0, np.pi, 10)
        cartesian = to_cartesian_coordinates(x, cs)
        back = from_cartesian_coordinates(cartesian, cs)
        for a, b in zip(x, back):
            assert np.allclose(a, b)


def test_unit_vectors_are_orthonormal():
    for cs, dims in (
        (CoordinateSystem.CARTESIAN, 3),
        (CoordinateSystem.POLAR, 2),
        (CoordinateSystem.CYLINDRICAL, 3),
        (CoordinateSystem.SPHERICAL, 3),
    ):
        x = [np.array([0.5]), np.array([0.7]), np.array([0.9])][:dims]
        vectors = unit_vectors_at(x, cs)
        assert len(vectors) == dims
        for i in range(dims):
            v_i = np.concatenate(
                [np.atleast_1d(c) for c in vectors[i]]
            )
            assert np.isclose(np.linalg.norm(v_i), 1.0)
            for j in range(i + 1, dims):
                v_j = np.concatenate(
                    [np.atleast_1d(c) for c in vectors[j]]
                )
                assert np.isclose(v_i @ v_j, 0.0)


def test_unit_vector_grids_shape():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, np.pi)],
        [0.5, np.pi / 4.0],
        CoordinateSystem.POLAR,
    )
    grids = mesh.unit_vector_grids(True)
    assert len(grids) == 2
    assert grids[0].shape == (3, 5, 2)


def test_device_coordinate_grids_cached():
    mesh = Mesh([(0.0, 1.0)], [0.5])
    first = mesh.device_coordinate_grids(True)
    second = mesh.device_coordinate_grids(True)
    assert first is second
    assert np.allclose(np.asarray(first[0]), [0.0, 0.5, 1.0])


# -- analytic geometry oracles ------------------------------------------------
# Volumes and boundary sizes are checked against closed-form geometry
# (independent derivations; the reference pins literal arrays instead).


def test_polar_volume_and_boundary_sizes():
    r_lo, r_hi = 1.0, 3.0
    theta_span = np.pi / 2
    mesh = Mesh(
        [(r_lo, r_hi), (0.0, theta_span)],
        [0.1, theta_span / 10],
        CoordinateSystem.POLAR,
    )
    # quarter annulus: area = span/2 (r_hi^2 - r_lo^2)
    assert np.isclose(mesh.volume, theta_span / 2 * (r_hi**2 - r_lo**2))
    (inner, outer), (side_lo, side_hi) = mesh.boundary_sizes
    assert np.isclose(inner, r_lo * theta_span)
    assert np.isclose(outer, r_hi * theta_span)
    assert np.isclose(side_lo, r_hi - r_lo)
    assert np.isclose(side_hi, r_hi - r_lo)


def test_cylindrical_volume_and_boundary_sizes():
    r_lo, r_hi, theta_span, z_span = 0.5, 2.0, np.pi, 3.0
    mesh = Mesh(
        [(r_lo, r_hi), (0.0, theta_span), (0.0, z_span)],
        [0.25, np.pi / 8, 0.5],
        CoordinateSystem.CYLINDRICAL,
    )
    assert np.isclose(
        mesh.volume, theta_span / 2 * (r_hi**2 - r_lo**2) * z_span
    )
    boundaries = mesh.boundary_sizes
    # r faces: curved walls theta_span * r * z_span
    assert np.isclose(boundaries[0][0], r_lo * theta_span * z_span)
    assert np.isclose(boundaries[0][1], r_hi * theta_span * z_span)
    # theta faces: flat radial cuts (r_hi - r_lo) * z_span
    assert np.isclose(boundaries[1][0], (r_hi - r_lo) * z_span)
    # z faces: annular sector area
    assert np.isclose(
        boundaries[2][0], theta_span / 2 * (r_hi**2 - r_lo**2)
    )


def test_spherical_volume_and_boundary_sizes():
    r_lo, r_hi = 1.0, 2.0
    theta_span = np.pi / 2
    phi_lo, phi_hi = np.pi / 6, np.pi / 2
    mesh = Mesh(
        [(r_lo, r_hi), (0.0, theta_span), (phi_lo, phi_hi)],
        [0.25, np.pi / 8, np.pi / 12],
        CoordinateSystem.SPHERICAL,
    )
    # V = span_theta/3 (r_hi^3 - r_lo^3)(cos(phi_lo) - cos(phi_hi))
    expected_volume = (
        theta_span
        / 3.0
        * (r_hi**3 - r_lo**3)
        * (np.cos(phi_lo) - np.cos(phi_hi))
    )
    assert np.isclose(mesh.volume, expected_volume)
    boundaries = mesh.boundary_sizes
    # r faces: spherical zones r^2 theta_span (cos(phi_lo)-cos(phi_hi))
    cos_span = np.cos(phi_lo) - np.cos(phi_hi)
    assert np.isclose(boundaries[0][0], r_lo**2 * theta_span * cos_span)
    assert np.isclose(boundaries[0][1], r_hi**2 * theta_span * cos_span)
    # theta faces: flat half-annulus cut (phi span weighted)
    assert np.isclose(
        boundaries[1][0],
        0.5 * (r_hi**2 - r_lo**2) * (phi_hi - phi_lo),
    )
    # phi faces: cones r sin(phi) theta_span x radial extent
    assert np.isclose(
        boundaries[2][0],
        0.5 * (r_hi**2 - r_lo**2) * theta_span * np.sin(phi_lo),
    )
    assert np.isclose(
        boundaries[2][1],
        0.5 * (r_hi**2 - r_lo**2) * theta_span * np.sin(phi_hi),
    )


def test_cell_center_coordinates_offset_by_half_step():
    mesh = Mesh(
        [(1.0, 2.0), (0.0, 1.0)], [0.25, 0.2], CoordinateSystem.POLAR
    )
    for axis in range(2):
        vertices = mesh.vertex_axis_coordinates[axis]
        centers = mesh.cell_center_axis_coordinates[axis]
        assert len(centers) == len(vertices) - 1
        assert np.allclose(centers, (vertices[:-1] + vertices[1:]) / 2)


def test_all_index_coordinates_cover_grid():
    mesh = Mesh([(0.0, 1.0), (2.0, 3.0)], [0.5, 0.25])
    coords = mesh.all_index_coordinates(True)
    assert coords.shape == mesh.vertices_shape + (2,)
    flat = mesh.all_index_coordinates(True, flatten=True)
    assert flat.shape == (np.prod(mesh.vertices_shape), 2)
    assert np.isclose(flat[:, 0].min(), 0.0)
    assert np.isclose(flat[:, 0].max(), 1.0)
    assert np.isclose(flat[:, 1].min(), 2.0)
    assert np.isclose(flat[:, 1].max(), 3.0)
    # every row unique
    assert len(np.unique(flat, axis=0)) == flat.shape[0]


def test_from_cartesian_inverts_to_cartesian_spherical():
    from pararealml_tpu.mesh import (
        from_cartesian_coordinates,
        to_cartesian_coordinates,
    )

    x = [1.2, 0.7, 0.9]  # r, theta, phi within principal ranges
    cartesian = to_cartesian_coordinates(
        x, CoordinateSystem.SPHERICAL
    )
    back = from_cartesian_coordinates(
        cartesian, CoordinateSystem.SPHERICAL
    )
    assert np.allclose(back, x)


def test_unit_vectors_match_coordinate_derivatives():
    # e_i must equal the normalized derivative of the cartesian
    # position with respect to coordinate i
    from pararealml_tpu.mesh import (
        to_cartesian_coordinates,
        unit_vectors_at,
    )

    for cs in (
        CoordinateSystem.POLAR,
        CoordinateSystem.CYLINDRICAL,
        CoordinateSystem.SPHERICAL,
    ):
        dims = 2 if cs == CoordinateSystem.POLAR else 3
        x = np.array([1.3, 0.8, 0.6][:dims])
        eps = 1e-6
        unit_vectors = np.asarray(unit_vectors_at(list(x), cs))
        for axis in range(dims):
            x_hi = x.copy()
            x_hi[axis] += eps
            d = (
                np.asarray(to_cartesian_coordinates(list(x_hi), cs))
                - np.asarray(to_cartesian_coordinates(list(x), cs))
            ) / eps
            d /= np.linalg.norm(d)
            assert np.allclose(
                unit_vectors[axis], d, atol=1e-5
            ), (cs, axis)


def test_device_grids_cached_inside_trace_stay_concrete():
    """The first device_coordinate_grids call may come from inside a
    jit trace; the cache must hold concrete arrays, not tracers —
    a cached tracer would poison every later trace (regression test
    for the leak surfaced by solving one problem with two different
    operators)."""
    import jax
    import jax.numpy as jnp

    mesh = Mesh([(1.0, 2.0), (0.0, 1.0)], [0.5, 0.5])

    @jax.jit
    def first_use(y):
        return y * mesh.device_coordinate_grids(True)[0]

    first_use(jnp.ones(mesh.vertices_shape))
    for grid in mesh.device_coordinate_grids(True):
        assert not isinstance(grid, jax.core.Tracer)

    # a second, separate trace must be able to reuse the cache
    @jax.jit
    def second_use(y):
        return y + mesh.device_coordinate_grids(True)[1]

    second_use(jnp.ones(mesh.vertices_shape))
