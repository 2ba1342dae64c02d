import jax.numpy as jnp
import numpy as np
import pytest

from pararealml_tpu import CoordinateSystem
from pararealml_tpu.operators.ml.physics_informed import (
    AutoDifferentiator,
)

AD = AutoDifferentiator()


def _random_x(n, dims, seed=0, low=0.5, high=1.5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(low, high, (n, dims)))


def test_batch_gradient_cartesian():
    x = _random_x(16, 2)
    y_fn = lambda x_: (x_[:, :1] ** 2 + 3.0 * x_[:, 1:])  # noqa: E731
    assert np.allclose(
        AD.batch_gradient(x, y_fn, 0), 2.0 * np.asarray(x[:, :1])
    )
    assert np.allclose(AD.batch_gradient(x, y_fn, 1), 3.0)


def test_batch_gradient_invalid_axis():
    x = _random_x(4, 2)
    with pytest.raises(ValueError):
        AD.batch_gradient(x, lambda x_: x_[:, :1], 2)


def test_batch_gradient_per_sample_axis():
    x = _random_x(4, 2)
    y_fn = lambda x_: x_[:, :1] ** 2 + 3.0 * x_[:, 1:]  # noqa: E731
    axes = jnp.asarray([0, 1, 0, 1])
    out = np.asarray(AD.batch_gradient(x, y_fn, axes))
    expected = np.where(
        np.asarray(axes)[:, None] == 0, 2.0 * np.asarray(x[:, :1]), 3.0
    )
    assert np.allclose(out, expected)


def test_batch_gradient_polar():
    x = _random_x(16, 2)
    y_fn = lambda x_: x_[:, 1:]  # y = theta  # noqa: E731
    out = AD.batch_gradient(
        x, y_fn, 1, CoordinateSystem.POLAR
    )
    assert np.allclose(out, 1.0 / np.asarray(x[:, :1]))


def test_batch_hessian_cartesian():
    x = _random_x(16, 2)
    y_fn = lambda x_: x_[:, :1] ** 3 + x_[:, :1] * x_[:, 1:]  # noqa: E731
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 0, 0), 6.0 * np.asarray(x[:, :1])
    )
    assert np.allclose(AD.batch_hessian(x, y_fn, 0, 1), 1.0)
    assert np.allclose(AD.batch_hessian(x, y_fn, 1, 1), 0.0)


def test_batch_laplacian_cartesian():
    x = _random_x(16, 2)
    y_fn = lambda x_: x_[:, :1] ** 2 + x_[:, 1:] ** 2  # noqa: E731
    assert np.allclose(AD.batch_laplacian(x, y_fn), 4.0)


def test_batch_laplacian_polar():
    x = _random_x(16, 2)
    y_fn = lambda x_: x_[:, :1] ** 2  # y = r^2  # noqa: E731
    out = AD.batch_laplacian(x, y_fn, CoordinateSystem.POLAR)
    assert np.allclose(out, 4.0)


def test_batch_laplacian_spherical():
    x = _random_x(16, 3)
    y_fn = lambda x_: x_[:, :1] ** 2  # noqa: E731
    out = AD.batch_laplacian(x, y_fn, CoordinateSystem.SPHERICAL)
    assert np.allclose(out, 6.0, rtol=1e-5)


def test_batch_divergence_cartesian():
    x = _random_x(16, 2)
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1] ** 2, x_[:, 1:] ** 2], axis=1
    )
    expected = 2.0 * np.asarray(x).sum(axis=1, keepdims=True)
    assert np.allclose(AD.batch_divergence(x, y_fn), expected)


def test_batch_divergence_cylindrical():
    x = _random_x(16, 3)
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1], jnp.zeros_like(x_[:, :1]), x_[:, 2:]], axis=1
    )
    out = AD.batch_divergence(
        x, y_fn, CoordinateSystem.CYLINDRICAL
    )
    assert np.allclose(out, 3.0)


def test_batch_divergence_shape_mismatch():
    x = _random_x(4, 2)
    with pytest.raises(ValueError):
        AD.batch_divergence(x, lambda x_: x_[:, :1])


def test_batch_curl_2d():
    x = _random_x(16, 2)
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [-x_[:, 1:], x_[:, :1]], axis=1
    )
    assert np.allclose(AD.batch_curl(x, y_fn), 2.0)


def test_batch_curl_3d():
    x = _random_x(16, 3)
    # curl of (y*z, 0, 0) = (0, y, -z)
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [
            x_[:, 1:2] * x_[:, 2:],
            jnp.zeros_like(x_[:, :1]),
            jnp.zeros_like(x_[:, :1]),
        ],
        axis=1,
    )
    assert np.allclose(AD.batch_curl(x, y_fn, 0), 0.0)
    assert np.allclose(
        AD.batch_curl(x, y_fn, 1), np.asarray(x[:, 1:2])
    )
    assert np.allclose(
        AD.batch_curl(x, y_fn, 2), -np.asarray(x[:, 2:])
    )


def test_batch_curl_validation():
    x = _random_x(4, 2)
    y_fn = lambda x_: x_  # noqa: E731
    with pytest.raises(ValueError):
        AD.batch_curl(x, y_fn, 1)


def test_batch_vector_laplacian_polar():
    x = _random_x(16, 2)
    # constant radial field: vector Laplacian r component = -1/r^2
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [jnp.ones_like(x_[:, :1]), jnp.zeros_like(x_[:, :1])], axis=1
    )
    out = AD.batch_vector_laplacian(
        x, y_fn, 0, CoordinateSystem.POLAR
    )
    assert np.allclose(out, -1.0 / np.asarray(x[:, :1]) ** 2)


def test_batch_vector_laplacian_cartesian_matches_scalar():
    x = _random_x(16, 2)
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1] ** 2, x_[:, 1:] ** 3], axis=1
    )
    for ind in range(2):
        vector = AD.batch_vector_laplacian(x, y_fn, ind)
        scalar = AD.batch_laplacian(
            x, lambda x_, _i=ind: y_fn(x_)[:, _i: _i + 1]
        )
        assert np.allclose(np.asarray(vector), np.asarray(scalar))
