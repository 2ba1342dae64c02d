"""Equivalence tests for the fused 3D Pallas kernels (interpret mode)
against the generic FDM path, plus the FDMOperator dispatch check.

Hardware-validated on v5e: 3.1-9.4x over the generic path across the
five equation classes at the 3D example scales, bit-accurate to the
generic result (IMPLEMENTATION_NOTES.md).
"""

import jax
import numpy as np
import pytest

from pararealml_tpu import (
    BurgersEquation,
    CahnHilliardEquation,
    ConstrainedProblem,
    ConvectionDiffusionEquation,
    DiffusionEquation,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
    Mesh,
    NeumannBoundaryCondition,
    WaveEquation,
)
from pararealml_tpu.operators.fdm import (
    FDMOperator,
    RK4,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.ops.fused_system_3d import (
    build_fused_system_3d_rk4_trajectory,
    fused_system_3d_step_applicable,
)


def _cp(diff_eq, n, dirichlet=False, grid=9):
    d_x = 1.0 / (grid - 1)
    mesh = Mesh([(0.0, 1.0)] * 3, [d_x] * 3)
    if dirichlet:
        bcs = [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), n), 0.1),
                    is_static=True,
                ),
                NeumannBoundaryCondition(
                    lambda x, t: np.full((len(x), n), 0.05),
                    is_static=True,
                ),
            )
        ] * 3
    else:
        bcs = [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n)),
                    is_static=True,
                ),
            )
            * 2
        ] * 3
    return ConstrainedProblem(diff_eq, mesh, bcs)


def _compare(cp, n, d_t, steps=4, atol=1e-4):
    ic = GaussianInitialCondition(
        cp,
        [(np.full(3, 0.5), 0.2 * np.eye(3))] * n,
        [1.0] + [0.0] * (n - 1),
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)

    fused = build_fused_system_3d_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_fused = np.asarray(fused(y))

    generic_op = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    )
    generic_fn, _ = generic_op.trajectory_function(
        cp, (0.0, steps * d_t)
    )
    ys_generic = np.asarray(generic_fn(y.astype(np.float64), 0.0))
    assert ys_fused.shape == ys_generic.shape
    assert np.allclose(ys_fused, ys_generic, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("dirichlet", [False, True])
def test_fused_3d_diffusion_matches_generic(dirichlet):
    _compare(
        _cp(DiffusionEquation(3, 0.3), 1, dirichlet), 1, 1e-4
    )


def test_fused_3d_convection_diffusion_matches_generic():
    _compare(
        _cp(ConvectionDiffusionEquation(3, [0.4, -0.3, 0.2], 0.2), 1),
        1,
        1e-4,
    )


@pytest.mark.parametrize("dirichlet", [False, True])
def test_fused_3d_wave_matches_generic(dirichlet):
    _compare(_cp(WaveEquation(3, 1.2), 2, dirichlet), 2, 1e-4)


@pytest.mark.slow
def test_fused_3d_burgers_matches_generic():
    _compare(_cp(BurgersEquation(3, 50.0), 3), 3, 1e-4)


def test_fused_3d_cahn_hilliard_matches_generic():
    _compare(_cp(CahnHilliardEquation(3), 2), 2, 1e-5)


def test_fused_3d_applicability_gate():
    cp = _cp(DiffusionEquation(3, 0.3), 1)
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_system_3d_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)
    # x64 disables the f32 kernel
    assert not fused_system_3d_step_applicable(cp, RK4())

    # 2D problems are not covered by the 3D gate
    mesh_2d = Mesh([(0.0, 1.0)] * 2, [0.25] * 2)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp_2d = ConstrainedProblem(
        DiffusionEquation(2, 0.3), mesh_2d, [(bc, bc)] * 2
    )
    jax.config.update("jax_enable_x64", False)
    try:
        assert not fused_system_3d_step_applicable(cp_2d, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_3d_rejects_unsupported_equation():
    from pararealml_tpu import ShallowWaterEquation

    mesh = Mesh([(0.0, 1.0)] * 2, [0.25] * 2)
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 3)), is_static=True
    )
    cp = ConstrainedProblem(
        ShallowWaterEquation(0.5), mesh, [(bc, bc)] * 2
    )
    with pytest.raises(ValueError):
        build_fused_system_3d_rk4_trajectory(cp, 0.01, 2)


def test_fdm_operator_dispatches_fused_3d():
    # an applicable 3D problem solved through the public FDMOperator
    # must produce the same trajectory with and without fused kernels
    cp = _cp(DiffusionEquation(3, 0.3), 1)
    ic = GaussianInitialCondition(
        cp, [(np.full(3, 0.5), 0.2 * np.eye(3))]
    )
    from pararealml_tpu import InitialValueProblem

    ivp = InitialValueProblem(cp, (0.0, 4e-4), ic)
    jax.config.update("jax_enable_x64", False)
    try:
        fused = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 1e-4
        ).solve(ivp)
        generic = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            1e-4,
            fused_kernels=False,
        ).solve(ivp)
    finally:
        jax.config.update("jax_enable_x64", True)
    assert np.allclose(
        fused.discrete_y(), generic.discrete_y(), atol=1e-5
    )


@pytest.mark.slow
def test_3d_end_kernel_matches_trajectory_final_state():
    from pararealml_tpu import BurgersEquation
    from pararealml_tpu.ops import (
        build_fused_system_3d_rk4_end,
        build_fused_system_3d_rk4_trajectory,
    )

    diff_eq = BurgersEquation(3, 0.05)
    cp = _cp(diff_eq, diff_eq.y_dimension)
    ic = GaussianInitialCondition(
        cp,
        [(np.full(3, 1.0), np.eye(3) * 0.5)] * diff_eq.y_dimension,
        [1.0] * diff_eq.y_dimension,
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.0005, 4

    trajectory = build_fused_system_3d_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    end = build_fused_system_3d_rk4_end(cp, d_t, steps, interpret=True)
    y_end = np.asarray(end(y))
    assert y_end.shape == y.shape
    np.testing.assert_array_equal(
        y_end, np.asarray(trajectory(y)[-1])
    )

    batch = 2
    ys = np.stack([y, y * 0.5])
    batched_end = build_fused_system_3d_rk4_end(
        cp, d_t, steps, interpret=True, batch=batch
    )
    out = np.asarray(batched_end(ys))
    assert out.shape == ys.shape
    expected = np.stack(
        [np.asarray(end(ys[i])) for i in range(batch)]
    )
    np.testing.assert_array_equal(out, expected)
