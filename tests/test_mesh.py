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
