import jax.numpy as jnp
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
from pararealml_tpu.ops.resident_diffusion import (
    build_resident_diffusion_rk4_trajectory,
    make_resident_plan,
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
        (4.0, 8.0, 0.25, False, 0.0),
        (8.0, 4.0, 0.25, True, 0.2),
        (10.0, 10.0, 0.125, False, 0.1),
        # exact register-tile multiples: the wrap-safety padding must
        # still leave at least one zero row and lane
        (2.0, 2.0, 2.0 / 7.0, False, 0.1),
    ],
)
def test_resident_trajectory_matches_generic(
    h_extent, w_extent, d_x, convection, flux
):
    cp = _build_cp(h_extent, w_extent, d_x, convection, flux)
    assert make_resident_plan(*cp.mesh.vertices_shape) is not None
    ic = GaussianInitialCondition(
        cp,
        [(np.array([h_extent / 2, w_extent / 2]), np.eye(2))],
        [20.0],
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 5

    resident = build_resident_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_resident = np.asarray(resident(y))

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

    assert ys_resident.shape == ys_generic.shape
    assert np.allclose(ys_resident, ys_generic, atol=1e-4, rtol=1e-4)


def test_resident_plan_geometry():
    plan = make_resident_plan(641, 641)
    assert plan is not None
    # wrap-safety: at least one zero padding row and lane
    assert plan.h_pad > 641 and plan.h_pad % 8 == 0
    assert plan.w_pad > 641 and plan.w_pad % 128 == 0
    # exact tile multiples still get padded past the grid
    plan = make_resident_plan(640, 512)
    assert plan.h_pad == 648 and plan.w_pad == 640
    # beyond the resident VMEM budget
    assert make_resident_plan(2049, 2049) is None


def test_bf16_snapshots_do_not_accumulate_rounding():
    """bf16 storage rounds only the stored snapshots; the resident
    state stays f32, so the last-step error is one rounding, not the
    step count's worth (unlike the tiled kernel's bf16 state)."""
    cp = _build_cp(10.0, 10.0, 0.125)  # 81x81
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [20.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 20

    f32 = build_resident_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    bf16 = build_resident_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True, storage_dtype=jnp.bfloat16
    )
    ys_f32 = np.asarray(f32(y), np.float32)
    ys_bf16 = np.asarray(bf16(y), np.float32)
    assert ys_bf16.shape == ys_f32.shape
    scale = np.max(np.abs(ys_f32))
    # single-rounding bound: half a bf16 ulp (2^-9) of the scale, with
    # slack — NOT the tiled kernel's accumulated ~1e-2
    assert np.max(np.abs(ys_bf16 - ys_f32)) < 3e-3 * scale


def test_resident_builder_rejects_interior_dirichlet():
    from pararealml_tpu.constraint import Constraint

    cp = _build_cp(10.0, 10.0, 0.125)  # 81x81
    mask = np.zeros((81, 81, 1), bool)
    mask[40, 40] = True
    values = np.where(mask, 1.0, 0.0)
    cp._y_vertex_constraints = Constraint(
        np.asarray(values), np.asarray(mask)
    )
    with pytest.raises(ValueError):
        build_resident_diffusion_rk4_trajectory(cp, 0.01, 2)


def test_dispatch_prefers_resident_for_mid_size_grids():
    """641x641 is beyond the classic whole-grid cap but inside the
    resident budget: the fused trajectory dispatch must pick the
    resident kernel there and the tiled kernel beyond."""
    from pararealml_tpu.ops.fused_diffusion import _MAX_VMEM_CELLS, \
        _padded_cells

    shape_mid = (641, 641)
    assert _padded_cells(shape_mid) > _MAX_VMEM_CELLS
    assert make_resident_plan(*shape_mid) is not None
    assert make_resident_plan(1281, 1281) is not None
    shape_large = (2049, 2049)
    assert make_resident_plan(*shape_large) is None
