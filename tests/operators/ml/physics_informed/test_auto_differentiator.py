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

    # non-constant radial field A = (r^2, 0): the scalar part must use
    # the POLAR Laplacian (lap(r^2) = 4), so the r component is
    # 4 - r^2/r^2 = 3 (regression for a dropped coordinate system)
    y_fn_r2 = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1] ** 2, jnp.zeros_like(x_[:, :1])], axis=1
    )
    out = AD.batch_vector_laplacian(
        x, y_fn_r2, 0, CoordinateSystem.POLAR
    )
    assert np.allclose(out, 3.0, atol=1e-6)


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


# -- spherical oracles --------------------------------------------------------
# Vector fields defined by Cartesian components (where the calculus is
# trivial), converted to spherical components through the local unit
# vectors — exact up to autodiff precision, mirroring the FDM spherical
# oracles in tests/operators/fdm/test_numerical_differentiator.py.


def _spherical_x(n=24, seed=3):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.5, 2.0, (n, 1))
    theta = rng.uniform(0.2, 1.3, (n, 1))
    phi = rng.uniform(0.4, 1.2, (n, 1))
    return jnp.asarray(np.concatenate([r, theta, phi], axis=1))


def _spherical_basis_fn(x):
    theta, phi = x[:, 1:2], x[:, 2:]
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sin_p, cos_p = jnp.sin(phi), jnp.cos(phi)
    e_r = jnp.concatenate([sin_p * cos_t, sin_p * sin_t, cos_p], axis=1)
    e_theta = jnp.concatenate(
        [-sin_t, cos_t, jnp.zeros_like(theta)], axis=1
    )
    e_phi = jnp.concatenate(
        [cos_p * cos_t, cos_p * sin_t, -sin_p], axis=1
    )
    return e_r, e_theta, e_phi


def _cartesian_points_fn(x):
    r, theta, phi = x[:, :1], x[:, 1:2], x[:, 2:]
    sin_p = jnp.sin(phi)
    return (
        r * sin_p * jnp.cos(theta),
        r * sin_p * jnp.sin(theta),
        r * jnp.cos(phi),
    )


def _spherical_field_fn(cartesian_field):
    """Wraps a cartesian vector field (x,y,z) -> (Ax,Ay,Az) as a
    function of spherical inputs returning spherical components."""

    def y_fn(x):
        xc, yc, zc = _cartesian_points_fn(x)
        a_cart = jnp.concatenate(cartesian_field(xc, yc, zc), axis=1)
        basis = _spherical_basis_fn(x)
        return jnp.concatenate(
            [jnp.sum(e * a_cart, axis=1, keepdims=True) for e in basis],
            axis=1,
        )

    return y_fn


def test_batch_gradient_spherical():
    x = _spherical_x()
    # f = z = r cos(phi); cartesian gradient (0, 0, 1)
    y_fn = lambda x_: x_[:, :1] * jnp.cos(x_[:, 2:])  # noqa: E731
    e_r, e_theta, e_phi = _spherical_basis_fn(x)
    for axis, e in ((0, e_r), (1, e_theta), (2, e_phi)):
        out = AD.batch_gradient(
            x, y_fn, axis, CoordinateSystem.SPHERICAL
        )
        assert np.allclose(out, e[:, 2:], atol=1e-6), axis


def test_batch_hessian_spherical_of_r_squared():
    x = _spherical_x()
    y_fn = lambda x_: x_[:, :1] ** 2  # noqa: E731
    for i in range(3):
        for j in range(3):
            out = AD.batch_hessian(
                x, y_fn, i, j, CoordinateSystem.SPHERICAL
            )
            assert np.allclose(
                out, 2.0 if i == j else 0.0, atol=1e-6
            ), (i, j)


def test_batch_divergence_spherical():
    x = _spherical_x()
    y_fn = _spherical_field_fn(
        lambda xc, yc, zc: (xc**2, yc**2, zc**2)
    )
    out = AD.batch_divergence(x, y_fn, CoordinateSystem.SPHERICAL)
    xc, yc, zc = _cartesian_points_fn(x)
    assert np.allclose(out, 2.0 * (xc + yc + zc), atol=1e-5)


def test_batch_curl_spherical():
    x = _spherical_x()
    y_fn = _spherical_field_fn(
        lambda xc, yc, zc: (-yc, xc, jnp.zeros_like(zc))
    )
    basis = _spherical_basis_fn(x)
    for ind in range(3):
        out = AD.batch_curl(
            x, y_fn, ind, CoordinateSystem.SPHERICAL
        )
        assert np.allclose(out, 2.0 * basis[ind][:, 2:], atol=1e-5), ind


def test_batch_vector_laplacian_spherical():
    x = _spherical_x()
    y_fn = _spherical_field_fn(
        lambda xc, yc, zc: (xc**2, yc**2, zc**2)
    )
    basis = _spherical_basis_fn(x)
    expected = 2.0 * (
        basis[0] + basis[1] + basis[2]
    )  # basis @ (2,2,2) per component below
    for ind in range(3):
        out = AD.batch_vector_laplacian(
            x, y_fn, ind, CoordinateSystem.SPHERICAL
        )
        component = 2.0 * jnp.sum(basis[ind], axis=1, keepdims=True)
        assert np.allclose(out, component, atol=1e-4), ind


def test_batch_gradient_cylindrical():
    x = _random_x(16, 3)
    r = np.asarray(x[:, :1])
    # y = theta: physical gradient component along theta is (1/r) dy/dtheta
    out = AD.batch_gradient(
        x, lambda x_: x_[:, 1:2], 1, CoordinateSystem.CYLINDRICAL
    )
    assert np.allclose(out, 1.0 / r)
    # y = z: the axial component is the plain derivative
    out = AD.batch_gradient(
        x, lambda x_: x_[:, 2:], 2, CoordinateSystem.CYLINDRICAL
    )
    assert np.allclose(out, 1.0)


def test_batch_hessian_polar():
    x = _random_x(16, 2)
    theta = np.asarray(x[:, 1:])
    y_fn = lambda x_: x_[:, :1] ** 2 * x_[:, 1:]  # y = r^2 theta  # noqa: E731
    # H_rr = d2y/dr2 = 2 theta
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 0, 0, CoordinateSystem.POLAR),
        2.0 * theta,
    )
    # H_tt = (1/r^2) d2y/dt2 + (1/r) dy/dr = 0 + 2 theta
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 1, 1, CoordinateSystem.POLAR),
        2.0 * theta,
    )
    # H_rt = (1/r)(d2y/drdt - (1/r) dy/dt) = (2r - r)/r = 1
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 0, 1, CoordinateSystem.POLAR), 1.0
    )


def test_batch_hessian_cylindrical():
    x = _random_x(16, 3)
    r = np.asarray(x[:, :1])
    # y = r z: H_rz is the plain mixed derivative
    y_fn = lambda x_: x_[:, :1] * x_[:, 2:]  # noqa: E731
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 0, 2, CoordinateSystem.CYLINDRICAL),
        1.0,
    )
    # y = theta z: H_tz = (1/r) d2y/dtdz
    y_fn = lambda x_: x_[:, 1:2] * x_[:, 2:]  # noqa: E731
    assert np.allclose(
        AD.batch_hessian(x, y_fn, 1, 2, CoordinateSystem.CYLINDRICAL),
        1.0 / r,
    )


def _smooth_scalar(x_):
    return (
        jnp.sin(x_[:, :1])
        + x_[:, :1] * jnp.cos(x_[:, 1:2])
        + (x_[:, 2:] ** 2 if x_.shape[1] > 2 else 0.0)
    )


@pytest.mark.parametrize(
    "cs,dims",
    [
        (CoordinateSystem.POLAR, 2),
        (CoordinateSystem.CYLINDRICAL, 3),
        (CoordinateSystem.SPHERICAL, 3),
    ],
)
def test_batch_hessian_is_symmetric_curvilinear(cs, dims):
    x = _random_x(16, dims, seed=3)
    for i in range(dims):
        for j in range(i + 1, dims):
            assert np.allclose(
                np.asarray(AD.batch_hessian(x, _smooth_scalar, i, j, cs)),
                np.asarray(AD.batch_hessian(x, _smooth_scalar, j, i, cs)),
                rtol=1e-6,
            )


@pytest.mark.parametrize(
    "cs,dims",
    [
        (CoordinateSystem.CARTESIAN, 2),
        (CoordinateSystem.POLAR, 2),
        (CoordinateSystem.CYLINDRICAL, 3),
        (CoordinateSystem.SPHERICAL, 3),
    ],
)
def test_batch_laplacian_is_hessian_trace(cs, dims):
    x = _random_x(16, dims, seed=4)
    trace = sum(
        np.asarray(AD.batch_hessian(x, _smooth_scalar, i, i, cs))
        for i in range(dims)
    )
    assert np.allclose(
        np.asarray(AD.batch_laplacian(x, _smooth_scalar, cs)),
        trace,
        rtol=1e-6,
    )


def test_batch_divergence_polar():
    x = _random_x(16, 2)
    # field (r, 0): div = (1/r) d(r^2)/dr = 2
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1], jnp.zeros_like(x_[:, :1])], axis=1
    )
    out = AD.batch_divergence(x, y_fn, CoordinateSystem.POLAR)
    assert np.allclose(out, 2.0)


def test_batch_curl_polar():
    x = _random_x(16, 2)
    # field (0, r): curl = (1/r) d(r^2)/dr = 2
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [jnp.zeros_like(x_[:, :1]), x_[:, :1]], axis=1
    )
    out = AD.batch_curl(x, y_fn, 0, CoordinateSystem.POLAR)
    assert np.allclose(out, 2.0)


def test_batch_curl_cylindrical():
    x = _random_x(16, 3)
    z = np.asarray(x[:, 2:])
    # field (z^2, 0, 0): curl_theta = dy_r/dz - dy_z/dr = 2z, others 0
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, 2:] ** 2, jnp.zeros_like(x_[:, :1]),
         jnp.zeros_like(x_[:, :1])],
        axis=1,
    )
    assert np.allclose(
        AD.batch_curl(x, y_fn, 1, CoordinateSystem.CYLINDRICAL), 2.0 * z
    )
    assert np.allclose(
        AD.batch_curl(x, y_fn, 0, CoordinateSystem.CYLINDRICAL), 0.0
    )
    assert np.allclose(
        AD.batch_curl(x, y_fn, 2, CoordinateSystem.CYLINDRICAL), 0.0
    )


def test_batch_vector_laplacian_cylindrical():
    x = _random_x(16, 3)
    # field (r, 0, 0): radial component laplacian(r) - r/r^2 = 0
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [x_[:, :1], jnp.zeros_like(x_[:, :1]),
         jnp.zeros_like(x_[:, :1])],
        axis=1,
    )
    assert np.allclose(
        AD.batch_vector_laplacian(
            x, y_fn, 0, CoordinateSystem.CYLINDRICAL
        ),
        0.0,
        atol=1e-6,
    )
    # field (0, 0, r^2): axial component is the scalar laplacian = 4
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [jnp.zeros_like(x_[:, :1]), jnp.zeros_like(x_[:, :1]),
         x_[:, :1] ** 2],
        axis=1,
    )
    assert np.allclose(
        AD.batch_vector_laplacian(
            x, y_fn, 2, CoordinateSystem.CYLINDRICAL
        ),
        4.0,
        rtol=1e-6,
    )


def test_batch_vector_laplacian_polar_azimuthal():
    x = _random_x(16, 2)
    # field (0, r): theta component laplacian(r) - (r - 0)/r^2 = 0
    y_fn = lambda x_: jnp.concatenate(  # noqa: E731
        [jnp.zeros_like(x_[:, :1]), x_[:, :1]], axis=1
    )
    assert np.allclose(
        AD.batch_vector_laplacian(x, y_fn, 1, CoordinateSystem.POLAR),
        0.0,
        atol=1e-6,
    )


def test_batch_laplacian_cylindrical():
    x = _random_x(16, 3)
    y_fn = lambda x_: x_[:, :1] ** 2 + x_[:, 2:] ** 2  # noqa: E731
    out = AD.batch_laplacian(x, y_fn, CoordinateSystem.CYLINDRICAL)
    assert np.allclose(out, 6.0)


def test_batch_curl_1d_x_rejected():
    x = _random_x(4, 1)
    with pytest.raises(ValueError):
        AD.batch_curl(x, lambda x_: x_, 0)


def test_batch_curl_4d_x_rejected():
    x = _random_x(4, 4)
    with pytest.raises(ValueError):
        AD.batch_curl(x, lambda x_: x_, 0)


def test_batch_curl_2d_nonzero_ind_rejected():
    x = _random_x(4, 2)
    with pytest.raises(ValueError):
        AD.batch_curl(x, lambda x_: x_, 1)


def test_batch_curl_out_of_bounds_ind_rejected():
    x = _random_x(4, 3)
    with pytest.raises(ValueError):
        AD.batch_curl(x, lambda x_: x_, 3)


def test_batch_vector_laplacian_out_of_bounds_ind_rejected():
    x = _random_x(4, 2)
    with pytest.raises(ValueError):
        AD.batch_vector_laplacian(x, lambda x_: x_, 2)


def test_batch_vector_laplacian_shape_mismatch_rejected():
    x = _random_x(4, 2)
    with pytest.raises(ValueError):
        AD.batch_vector_laplacian(x, lambda x_: x_[:, :1], 0)
