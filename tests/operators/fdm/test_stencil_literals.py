"""Hand-computed literal expected arrays for the central-difference
stencils, pinning exact values including the zero-halo boundary
behavior (the reference pins every operator x coordinate system against
literal arrays, /root/reference/tests/operators/fdm/
test_numerical_differentiator.py; the analytic oracles in
test_numerical_differentiator.py here cover interiors — these pin the
boundaries too)."""

import numpy as np

from pararealml_tpu import CoordinateSystem, Mesh
from pararealml_tpu.operators.fdm import (
    ThreePointCentralDifferenceMethod,
)

DIFF = ThreePointCentralDifferenceMethod()


def test_gradient_1d_literal():
    # y = x^2 on x = 0..4, d_x = 1; zero halos at both ends:
    # [(1-0)/2, (4-0)/2, (9-1)/2, (16-4)/2, (0-9)/2]
    mesh = Mesh([(0.0, 4.0)], [1.0])
    y = np.array([[0.0], [1.0], [4.0], [9.0], [16.0]])
    expected = np.array([[0.5], [2.0], [4.0], [6.0], [-4.5]])
    assert np.allclose(np.asarray(DIFF.gradient(y, mesh, 0)), expected)


def test_second_derivative_1d_literal():
    # (y[i-1] - 2 y[i] + y[i+1]) / d_x^2 with zero halos:
    # [0-0+1, 0-2+4, 1-8+9, 4-18+16, 9-32+0]
    mesh = Mesh([(0.0, 4.0)], [1.0])
    y = np.array([[0.0], [1.0], [4.0], [9.0], [16.0]])
    expected = np.array([[1.0], [2.0], [2.0], [2.0], [-23.0]])
    assert np.allclose(
        np.asarray(DIFF.hessian(y, mesh, 0, 0)), expected
    )


def test_gradient_2d_axis1_literal():
    # f = [[2, 4, 8], [16, 32, 64]], d_x1 = 1; zero halos along axis 1:
    # [[(4-0)/2, (8-2)/2, (0-4)/2], [(32-0)/2, (64-16)/2, (0-32)/2]]
    mesh = Mesh([(0.0, 1.0), (0.0, 2.0)], [1.0, 1.0])
    f = np.array([[2.0, 4.0, 8.0], [16.0, 32.0, 64.0]])[..., None]
    expected = np.array(
        [[2.0, 3.0, -2.0], [16.0, 24.0, -16.0]]
    )[..., None]
    assert np.allclose(np.asarray(DIFF.gradient(f, mesh, 1)), expected)


def test_mixed_second_derivative_literal():
    # f = x0^2 * x1 on the 3x3 unit grid; the mixed stencil
    # (f[i+1,j+1] - f[i+1,j-1] - f[i-1,j+1] + f[i-1,j-1]) / (4 d_x0 d_x1)
    # with zero halos on both axes
    mesh = Mesh([(0.0, 2.0), (0.0, 2.0)], [1.0, 1.0])
    x0, x1 = mesh.vertex_coordinate_grids
    f = (x0**2 * x1)[..., None]
    expected = np.array(
        [
            [0.25, 0.5, -0.25],
            [1.0, 2.0, -1.0],
            [-0.25, -0.5, 0.25],
        ]
    )[..., None]
    assert np.allclose(
        np.asarray(DIFF.hessian(f, mesh, 0, 1)), expected
    )
    # mixed central differences commute
    assert np.allclose(
        np.asarray(DIFF.hessian(f, mesh, 1, 0)), expected
    )


def test_polar_theta_gradient_literal():
    # f = r * theta on r = [1, 2, 3], theta = [0, 0.5, 1]:
    # (1/r) df/dtheta with zero halos along the theta axis gives the
    # same [0.5, 1.0, -0.5] row at every radius
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 1.0)], [1.0, 0.5], CoordinateSystem.POLAR
    )
    r, theta = mesh.vertex_coordinate_grids
    f = (r * theta)[..., None]
    expected = np.tile([0.5, 1.0, -0.5], (3, 1))[..., None]
    assert np.allclose(np.asarray(DIFF.gradient(f, mesh, 1)), expected)


def test_polar_laplacian_literal():
    # f = r^2 on r = [1, 2, 3], theta axis constant:
    # lap = f_rr + f_r / r + f_tt / r^2. With zero halos:
    # f_rr rows: [(0 - 2*1 + 4), (1 - 8 + 9), (4 - 18 + 0)] = [2, 2, -14]
    # f_r rows: [(4-0)/2, (9-1)/2, (0-4)/2] = [2, 4, -2]
    # f_tt cols (d_theta=0.5, f const along theta): per row value v:
    #   [(0 - 2v + v)/0.25, (v - 2v + v)/0.25, (v - 2v + 0)/0.25]
    #   = [-4v, 0, -4v]
    mesh = Mesh(
        [(1.0, 3.0), (0.0, 1.0)], [1.0, 0.5], CoordinateSystem.POLAR
    )
    r, _ = mesh.vertex_coordinate_grids
    f = (r**2)[..., None]
    f_rr = np.array([2.0, 2.0, -14.0])[:, None]
    f_r = np.array([2.0, 4.0, -2.0])[:, None]
    v = np.array([1.0, 4.0, 9.0])[:, None]
    f_tt = np.concatenate([-4 * v, 0 * v, -4 * v], axis=1)
    r2 = r[:, :1] ** 2
    expected = (f_rr + f_r / r[:, :1] + f_tt / r2)[..., None]
    assert np.allclose(np.asarray(DIFF.laplacian(f, mesh)), expected)


def test_divergence_2d_literal():
    # A = (x1, x0) on the 3x3 unit grid: div = dA0/dx0 + dA1/dx1,
    # zero halos on each term's own axis
    mesh = Mesh([(0.0, 2.0), (0.0, 2.0)], [1.0, 1.0])
    x0, x1 = mesh.vertex_coordinate_grids
    field = np.stack([x1, x0], axis=-1)
    # dA0/dx0: A0 = x1 constant along axis 0 -> rows
    # [(x1-0)/2, 0, (0-x1)/2]
    d0 = np.stack(
        [x1[0] / 2, np.zeros(3), -x1[0] / 2]
    )
    # dA1/dx1: A1 = x0 constant along axis 1 -> columns
    # [(x0-0)/2, 0, (0-x0)/2]
    d1 = np.stack(
        [x0[:, 0] / 2, np.zeros(3), -x0[:, 0] / 2], axis=1
    )
    expected = (d0 + d1)[..., None]
    assert np.allclose(np.asarray(DIFF.divergence(field, mesh)), expected)


def test_curl_2d_literal():
    # A = (-x1^2, x0^2): curl = dA1/dx0 - dA0/dx1 with zero halos
    mesh = Mesh([(0.0, 2.0), (0.0, 2.0)], [1.0, 1.0])
    x0, x1 = mesh.vertex_coordinate_grids
    field = np.stack([-(x1**2), x0**2], axis=-1)
    # dA1/dx0: A1 = x0^2 = [0, 1, 4] along axis 0:
    # [(1-0)/2, (4-0)/2, (0-1)/2] at every column
    d_a1_d0 = np.tile(
        np.array([0.5, 2.0, -0.5])[:, None], (1, 3)
    )
    # dA0/dx1: A0 = -x1^2 = [0, -1, -4] along axis 1:
    # [(-1-0)/2, (-4-0)/2, (0+1)/2] at every row
    d_a0_d1 = np.tile(np.array([-0.5, -2.0, 0.5]), (3, 1))
    expected = (d_a1_d0 - d_a0_d1)[..., None]
    assert np.allclose(np.asarray(DIFF.curl(field, mesh)), expected)


def test_laplacian_2d_literal():
    # f = x0^2 + x1^2 on the 3x3 unit grid: five-point stencil with
    # zero halos; computed by hand:
    # f = [[0, 1, 4], [1, 2, 5], [4, 5, 8]]
    mesh = Mesh([(0.0, 2.0), (0.0, 2.0)], [1.0, 1.0])
    x0, x1 = mesh.vertex_coordinate_grids
    f = (x0**2 + x1**2)[..., None]
    expected = np.array(
        [
            # row 0: halo above is 0
            # (0,0): (0 + 1 - 0) + (0 + 1 - 0) = 2
            # (0,1): (0 + 2 - 2) + (0 + 4 - 2) = 2
            # (0,2): (0 + 5 - 8) + (1 + 0 - 8) = -10
            [2.0, 2.0, -10.0],
            # row 1:
            # (1,0): (0 + 4 - 2) + (0 + 2 - 2) = 2
            # (1,1): (1 + 5 - 4) + (1 + 5 - 4) = 4
            # (1,2): (4 + 8 - 10) + (2 + 0 - 10) = -6
            [2.0, 4.0, -6.0],
            # row 2: halo below is 0
            # (2,0): (1 + 0 - 8) + (0 + 5 - 8) = -10
            # (2,1): (2 + 0 - 10) + (4 + 8 - 10) = -6
            # (2,2): (5 + 0 - 16) + (5 + 0 - 16) = -22
            [-10.0, -6.0, -22.0],
        ]
    )[..., None]
    assert np.allclose(np.asarray(DIFF.laplacian(f, mesh)), expected)
