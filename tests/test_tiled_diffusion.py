import jax
import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    ConvectionDiffusionEquation,
    DiffusionEquation,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
    Mesh,
    NeumannBoundaryCondition,
)
from pararealml_tpu.operators.fdm import (
    FDMOperator,
    RK4,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.ops import fused_diffusion_step_applicable
from pararealml_tpu.ops.tiled_diffusion import (
    build_tiled_diffusion_rk4_trajectory,
    dirichlet_is_face_only,
    make_tile_plan,
)


def _build_cp(h_extent, w_extent, d_x, convection=False, flux=0.0):
    if convection:
        diff_eq = ConvectionDiffusionEquation(2, [0.8, -0.4], 0.3)
    else:
        diff_eq = DiffusionEquation(2, 0.3)
    mesh = Mesh([(0.0, h_extent), (0.0, w_extent)], [d_x, d_x])
    bcs = [
        (
            DirichletBoundaryCondition(
                lambda x, t: np.full((len(x), 1), 1.5), is_static=True
            ),
        )
        * 2,
        (
            NeumannBoundaryCondition(
                lambda x, t: np.full((len(x), 1), flux), is_static=True
            ),
        )
        * 2,
    ]
    return ConstrainedProblem(diff_eq, mesh, bcs)


@pytest.mark.parametrize(
    "h_extent,w_extent,d_x,convection,flux",
    [
        # (17, 33) grid: the clamped last tile has a single valid row
        # and overlaps both global boundary rows
        (4.0, 8.0, 0.25, False, 0.0),
        (8.0, 4.0, 0.25, True, 0.2),
        (10.0, 10.0, 0.125, False, 0.1),
    ],
)
def test_tiled_trajectory_matches_generic(
    h_extent, w_extent, d_x, convection, flux
):
    cp = _build_cp(h_extent, w_extent, d_x, convection, flux)
    assert make_tile_plan(*cp.mesh.vertices_shape) is not None
    ic = GaussianInitialCondition(
        cp,
        [(np.array([h_extent / 2, w_extent / 2]), np.eye(2))],
        [20.0],
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 5

    tiled = build_tiled_diffusion_rk4_trajectory(
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
    assert np.allclose(ys_tiled, ys_generic, atol=1e-4, rtol=1e-4)


def test_tile_plan_geometry():
    plan = make_tile_plan(641, 641)
    assert plan is not None
    # aligned, gap-free cover of the grid
    assert all(s % 8 == 0 for s in plan.starts)
    assert plan.starts[0] == 0
    for prev, nxt in zip(plan.starts, plan.starts[1:]):
        assert nxt <= prev + plan.block
    assert plan.starts[-1] + plan.block == plan.h_traj >= 641
    # far outside the supported range
    assert make_tile_plan(10_000, 10_000) is None


def test_tile_plan_geometry_bf16_sublane():
    # bfloat16 storage needs 16-row sublane alignment on every DMA
    # offset and buffer height
    plan = make_tile_plan(641, 641, sublane=16)
    assert plan is not None
    assert plan.halo == 16
    assert plan.block % 16 == 0 and plan.h_traj % 16 == 0
    assert all(s % 16 == 0 for s in plan.starts)
    assert plan.starts[-1] + plan.block == plan.h_traj >= 641
    assert plan.tile_h == plan.block + 32


def test_bf16_storage_matches_f32_within_bf16_resolution():
    import jax.numpy as jnp

    cp = _build_cp(10.0, 10.0, 0.125)  # 81x81
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [20.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 5

    f32 = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    bf16 = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True, storage_dtype=jnp.bfloat16
    )
    ys_f32 = np.asarray(f32(y), np.float32)
    ys_bf16 = np.asarray(bf16(y), np.float32)
    assert ys_bf16.shape == ys_f32.shape
    assert ys_bf16.dtype == ys_f32.dtype  # cast back to the input dtype
    scale = np.max(np.abs(ys_f32))
    # one bf16 rounding per step on a dissipative problem stays within
    # a few ulps of the bf16 resolution (2^-8) relative to the scale
    assert np.max(np.abs(ys_bf16 - ys_f32)) < 0.02 * scale


def test_applicability_extends_beyond_vmem_cap():
    # 1025x1025 >> the whole-grid-in-VMEM cap; the tiled kernel must
    # keep the fused path applicable (VERDICT.md item 3)
    cp = _build_cp(10.0, 10.0, 10.0 / 1024.0)
    assert cp.mesh.vertices_shape == (1025, 1025)
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_diffusion_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_dirichlet_face_only_detection():
    cp = _build_cp(4.0, 8.0, 0.25)
    assert dirichlet_is_face_only(cp)


def test_tiled_builder_rejects_interior_dirichlet():
    import pytest as _pytest

    from pararealml_tpu.constraint import Constraint

    cp = _build_cp(10.0, 10.0, 0.125)  # 81x81, within tile range
    # forge an interior static y constraint
    mask = np.zeros((81, 81, 1), bool)
    mask[40, 40] = True
    values = np.where(mask, 1.0, 0.0)
    cp._y_vertex_constraints = Constraint(
        np.asarray(values), np.asarray(mask)
    )
    assert not dirichlet_is_face_only(cp)
    with _pytest.raises(ValueError):
        build_tiled_diffusion_rk4_trajectory(cp, 0.01, 2)

@pytest.mark.parametrize("temporal_block", [2, 4])
@pytest.mark.parametrize("convection", [False, True])
def test_temporally_blocked_matches_single_step_exactly(
    temporal_block, convection
):
    # K chained in-VMEM steps perform the identical per-step arithmetic
    # (halo rows are recomputed, not reloaded), so the f32 blocked
    # pipeline is bit-exact against the single-step pipeline
    cp = _build_cp(10.0, 10.0, 10.0 / 63.0, convection, flux=0.1)
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [20.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 8

    single = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    blocked = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True, temporal_block=temporal_block
    )
    assert np.array_equal(np.asarray(single(y)), np.asarray(blocked(y)))


def test_blocked_bf16_snapshots_round_once():
    import jax.numpy as jnp

    cp = _build_cp(10.0, 10.0, 10.0 / 63.0)
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [20.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 8

    f32 = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    split = build_tiled_diffusion_rk4_trajectory(
        cp,
        d_t,
        steps,
        interpret=True,
        temporal_block=4,
        traj_dtype=jnp.bfloat16,
    )
    ys_f32 = np.asarray(f32(y), np.float32)
    ys_split = np.asarray(split(y), np.float32)
    assert ys_split.shape == ys_f32.shape
    scale = np.max(np.abs(ys_f32))
    # the integration state stays f32, so every snapshot is a SINGLE
    # bf16 rounding of the exact f32 frame: within one bf16 epsilon
    # (2^-8) of the frame scale — NOT the accumulated per-step drift
    # of a bf16 state
    assert np.max(np.abs(ys_split - ys_f32)) <= 2.0 ** -8 * scale * 1.01


def test_blocked_plan_halo_covers_stencil_creep():
    plan = make_tile_plan(641, 641, sublane=8, temporal_block=6)
    assert plan is not None
    assert plan.halo >= 4 * 6 and plan.halo % 8 == 0
    assert plan.tile_h == plan.block + 2 * plan.halo
    assert plan.starts[-1] + plan.block == plan.h_traj >= 641


def test_blocked_builder_validation():
    import jax.numpy as jnp

    cp = _build_cp(10.0, 10.0, 10.0 / 63.0)
    with pytest.raises(ValueError, match="even"):
        build_tiled_diffusion_rk4_trajectory(
            cp, 0.01, 9, interpret=True, temporal_block=3
        )
    with pytest.raises(ValueError, match="divide"):
        build_tiled_diffusion_rk4_trajectory(
            cp, 0.01, 9, interpret=True, temporal_block=4
        )
    with pytest.raises(ValueError, match="temporal_block"):
        build_tiled_diffusion_rk4_trajectory(
            cp, 0.01, 8, interpret=True, traj_dtype=jnp.bfloat16
        )


def test_pick_temporal_block():
    from pararealml_tpu.ops.tiled_diffusion import pick_temporal_block

    assert pick_temporal_block(500, 10) == 10
    assert pick_temporal_block(500, 8) == 4  # 8 does not divide 500
    assert pick_temporal_block(512, 8) == 8
    assert pick_temporal_block(7, 8) == 1  # no even divisor
    assert pick_temporal_block(100, 1) == 1


def test_resolve_temporal_block_respects_tile_plan_feasibility():
    from pararealml_tpu.ops.tiled_diffusion import (
        pick_temporal_block,
        resolve_temporal_block,
        takes_streaming_path,
    )

    # a ~2049-wide grid takes the streaming path; a requested block of
    # 64 would need a 256-row halo that leaves almost no tile advance
    big_cp = _build_cp(10.0, 10.0, 10.0 / 2048.0)
    assert takes_streaming_path(big_cp)
    assert pick_temporal_block(512, 64) == 64
    resolved = resolve_temporal_block(big_cp, 512, 64)
    assert 1 < resolved < 64  # stepped down, not degraded to 1
    # the resolved block must actually plan
    plan = make_tile_plan(
        *big_cp.mesh.vertices_shape, 8, resolved, max_tile_elems=1_200_000
    )
    assert plan is not None and plan.block >= plan.halo

    # a VMEM-resident grid ignores the block: divisibility pick only
    small_cp = _build_cp(10.0, 10.0, 10.0 / 63.0)
    assert not takes_streaming_path(small_cp)
    assert resolve_temporal_block(small_cp, 512, 64) == 64


def test_fdm_operator_warns_when_traj_dtype_dropped():
    import warnings as _warnings

    import jax.numpy as jnp

    # streaming-path grid, odd step count: no even temporal block
    # divides it, so the requested bf16 snapshots must be dropped and
    # the operator must say so instead of silently rounding differently
    cp = _build_cp(10.0, 10.0, 10.0 / 2048.0)
    op = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        0.0001,
        kernel_temporal_block=4,
        kernel_traj_dtype=jnp.bfloat16,
    )
    jax.config.update("jax_enable_x64", False)
    try:
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            op.trajectory_function(cp, (0.0, 7 * 0.0001))
        assert any(
            "kernel_traj_dtype" in str(w.message) for w in caught
        )
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fdm_operator_temporal_block_matches_generic():
    # end-to-end through the operator surface: beyond-VMEM streaming
    # path is exercised in interpret mode off-TPU
    import jax.numpy as jnp

    cp = _build_cp(10.0, 10.0, 10.0 / 63.0)
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [20.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 8

    direct = build_tiled_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    op = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        kernel_temporal_block=4,
        kernel_traj_dtype=jnp.float32,
    )
    # the fused applicability gates require f32 mode
    jax.config.update("jax_enable_x64", False)
    try:
        fn, _ = op.trajectory_function(cp, (0.0, steps * d_t))
        # the 64x64 grid fits VMEM, so the operator may route to a
        # whole-grid kernel; agreement is to f32 rounding either way
        assert np.allclose(
            np.asarray(fn(y, 0.0)),
            np.asarray(direct(y)),
            atol=1e-4,
            rtol=1e-4,
        )
    finally:
        jax.config.update("jax_enable_x64", True)
