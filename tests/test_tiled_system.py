"""Equivalence and applicability tests for the block-tiled system
kernels (pararealml_tpu/ops/tiled_system.py): small grids whose tile
plans still exercise multi-tile pipelining, run in interpreter mode and
compared against the generic XLA path."""

import jax
import numpy as np
import pytest

from pararealml_tpu import (
    BurgersEquation,
    CahnHilliardEquation,
    ConstrainedProblem,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
    Mesh,
    NavierStokesEquation,
    NeumannBoundaryCondition,
    ShallowWaterEquation,
    WaveEquation,
)
from pararealml_tpu.operators.fdm import (
    FDMOperator,
    RK4,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.ops.tiled_system import (
    build_tiled_system_rk4_trajectory,
    make_system_tile_plan,
    tiled_system_applicable,
)


def _bcs(n, dirichlet, dirichlet_value=0.0, flux=0.0):
    if dirichlet:
        return [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), n), dirichlet_value),
                    is_static=True,
                ),
            )
            * 2,
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.full((len(x), n), flux),
                    is_static=True,
                ),
            )
            * 2,
        ]
    return [
        (
            NeumannBoundaryCondition(
                lambda x, t: np.full((len(x), n), flux), is_static=True
            ),
        )
        * 2
    ] * 2


def _mesh(h_extent=4.0, w_extent=8.0, d_x=0.25):
    # (17, 33) grid: the clamped last tile has a single valid row and
    # overlaps both global boundary rows
    return Mesh([(0.0, h_extent), (0.0, w_extent)], [d_x, d_x])


def _gaussian_ic(cp, magnitudes):
    mesh = cp.mesh
    means = [
        (interval[0] + interval[1]) / 2.0
        for interval in mesh.x_intervals
    ]
    return GaussianInitialCondition(
        cp,
        [(np.array(means), 0.5 * np.eye(2))] * len(magnitudes),
        magnitudes,
    )


def _compare(cp, magnitudes, d_t=0.005, steps=5, atol=1e-4):
    n = cp.differential_equation.y_dimension
    assert (
        make_system_tile_plan(*cp.mesh.vertices_shape, n) is not None
    )
    y = np.asarray(
        _gaussian_ic(cp, magnitudes).discrete_y_0(True), np.float32
    )

    tiled = build_tiled_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_tiled = np.asarray(tiled(y))

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

    assert ys_tiled.shape == ys_generic.shape
    assert np.allclose(ys_tiled, ys_generic, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("dirichlet", [True, False])
def test_tiled_wave_matches_generic(dirichlet):
    cp = ConstrainedProblem(
        WaveEquation(2, 1.5), _mesh(), _bcs(2, dirichlet, flux=0.1)
    )
    _compare(cp, [1.0, 0.0], d_t=0.02, steps=6)


def test_tiled_burgers_matches_generic():
    cp = ConstrainedProblem(
        BurgersEquation(2, 100.0), _mesh(8.0, 4.0), _bcs(2, True)
    )
    _compare(cp, [0.5, -0.5])


@pytest.mark.slow
def test_tiled_shallow_water_matches_generic():
    cp = ConstrainedProblem(
        ShallowWaterEquation(0.5), _mesh(), _bcs(3, False)
    )
    _compare(cp, [0.2, 0.0, 0.0])


def test_tiled_cahn_hilliard_matches_generic():
    cp = ConstrainedProblem(
        CahnHilliardEquation(2), _mesh(), _bcs(2, False)
    )
    _compare(cp, [0.1, 0.0])


def test_tiled_plan_scales_with_components():
    plan2 = make_system_tile_plan(641, 641, 2)
    plan3 = make_system_tile_plan(641, 641, 3)
    assert plan2 is not None and plan3 is not None
    assert plan3.block <= plan2.block
    for plan in (plan2, plan3):
        assert all(s % 8 == 0 for s in plan.starts)
        assert plan.starts[0] == 0
        for prev, nxt in zip(plan.starts, plan.starts[1:]):
            assert nxt <= prev + plan.block
        assert plan.starts[-1] + plan.block == plan.h_traj >= 641
    assert make_system_tile_plan(10_000, 10_000, 2) is None


def test_navier_stokes_not_tileable():
    mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [10.0 / 640] * 2)
    bcs = [
        (
            DirichletBoundaryCondition(
                lambda x, t: np.zeros((len(x), 4)), is_static=True
            ),
        )
        * 2
    ] * 2
    cp = ConstrainedProblem(NavierStokesEquation(500.0), mesh, bcs)
    assert not tiled_system_applicable(cp)
    with pytest.raises(ValueError):
        build_tiled_system_rk4_trajectory(cp, 0.01, 2)


def test_applicability_extends_beyond_vmem_cap():
    from pararealml_tpu.ops import fused_wave_step_applicable

    # 641x641x2 >> the whole-grid-in-VMEM system cap
    mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [10.0 / 640] * 2)
    cp = ConstrainedProblem(
        WaveEquation(2), mesh, _bcs(2, True)
    )
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_wave_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)
    assert tiled_system_applicable(cp)


def test_shallow_water_not_dispatched_to_tiled_beyond_vmem():
    # the generic XLA shallow-water graph outruns the tiled kernel on
    # v5e (0.81x at 641^2), so dispatch excludes it beyond VMEM even
    # though the kernel itself is equivalence-tested above
    mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [10.0 / 640] * 2)
    cp = ConstrainedProblem(
        ShallowWaterEquation(0.5), mesh, _bcs(3, False)
    )
    assert not tiled_system_applicable(cp)


@pytest.mark.slow
def test_tiled_wave_three_tiles_matches_generic():
    # a 520-row grid plans 3 tiles (block=256), so the steady-state
    # DMA drain branches (the "i >= 2" waits) actually execute — the
    # small-grid tests above only ever produce 2-tile plans
    plan = make_system_tile_plan(520, 9, 2)
    assert plan is not None and plan.n_tiles == 3
    d_x = 0.25
    mesh = Mesh(
        [(0.0, 519 * d_x), (0.0, 8 * d_x)], [d_x, d_x]
    )
    cp = ConstrainedProblem(
        WaveEquation(2, 1.5), mesh, _bcs(2, False, flux=0.1)
    )
    _compare(cp, [1.0, 0.0], d_t=0.02, steps=3)


@pytest.mark.slow
def test_bf16_storage_matches_f32_within_bf16_resolution():
    import jax.numpy as jnp

    from pararealml_tpu.ops.tiled_system import (
        build_tiled_system_rk4_trajectory,
        make_system_tile_plan,
    )

    plan = make_system_tile_plan(641, 641, 2, sublane=16)
    assert plan is not None and plan.halo == 16
    assert all(s % 16 == 0 for s in plan.starts)
    assert plan.block % 16 == 0 and plan.h_traj % 16 == 0

    cp = ConstrainedProblem(
        WaveEquation(2, 0.5), _mesh(), _bcs(2, True)
    )
    y = np.asarray(
        _gaussian_ic(cp, [1.0, 0.0]).discrete_y_0(True), np.float32
    )
    d_t, steps = 0.002, 4

    f32 = build_tiled_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    bf16 = build_tiled_system_rk4_trajectory(
        cp, d_t, steps, interpret=True, storage_dtype=jnp.bfloat16
    )
    ys_f32 = np.asarray(f32(y), np.float32)
    ys_bf16 = np.asarray(bf16(y), np.float32)
    assert ys_bf16.shape == ys_f32.shape
    scale = np.max(np.abs(ys_f32))
    assert np.max(np.abs(ys_bf16 - ys_f32)) < 0.02 * scale
