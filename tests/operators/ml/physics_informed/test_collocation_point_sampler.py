import numpy as np
import pytest

from pararealml_tpu import Mesh
from pararealml_tpu.operators.ml.physics_informed import (
    UniformRandomCollocationPointSampler,
)

SAMPLER = UniformRandomCollocationPointSampler()


def test_domain_point_validation():
    with pytest.raises(ValueError):
        SAMPLER.sample_domain_points(0, (0.0, 1.0), None)


def test_ode_domain_points():
    np.random.seed(0)
    points = SAMPLER.sample_domain_points(50, (1.0, 3.0), None)
    assert points.x is None
    assert points.t.shape == (50, 1)
    assert np.all((points.t >= 1.0) & (points.t <= 3.0))


def test_pde_domain_points():
    np.random.seed(0)
    mesh = Mesh([(0.0, 1.0), (2.0, 4.0)], [0.1, 0.1])
    points = SAMPLER.sample_domain_points(100, (0.0, 1.0), mesh)
    assert points.x.shape == (100, 2)
    assert np.all((points.x[:, 0] >= 0.0) & (points.x[:, 0] <= 1.0))
    assert np.all((points.x[:, 1] >= 2.0) & (points.x[:, 1] <= 4.0))


def test_boundary_point_validation():
    mesh = Mesh([(0.0, 1.0)], [0.1])
    with pytest.raises(ValueError):
        SAMPLER.sample_boundary_points(0, (0.0, 1.0), mesh)


def test_boundary_points():
    np.random.seed(0)
    mesh = Mesh([(0.0, 1.0), (2.0, 4.0)], [0.1, 0.1])
    all_points = SAMPLER.sample_boundary_points(200, (0.0, 1.0), mesh)
    assert len(all_points) == 2

    total = 0
    for axis, pair in enumerate(all_points):
        for side, points in enumerate(pair):
            if points is None:
                continue
            total += len(points.t)
            expected = mesh.x_intervals[axis][side]
            assert np.all(points.x[:, axis] == expected)
    assert total == 200
