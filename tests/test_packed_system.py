"""Tests for the width-packed batched system kernels.

The contract is agreement with B independent single-slice fused-kernel
solves to float32 rounding (bit-identity across differently-shaped
compiled programs is not promised — compilation may reassociate — but
the packed kernel must drift no faster than the fused kernels drift
from their own out-of-kernel math), plus the structural invariants the
packing relies on: gap columns and padding stay exactly zero so no
state can leak between neighboring slices.
"""
import numpy as np
import pytest

import jax

from pararealml_tpu import (
    BurgersEquation,
    CahnHilliardEquation,
    ConstrainedProblem,
    ConvectionDiffusionEquation,
    DiffusionEquation,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
    Mesh,
    NavierStokesEquation,
    NeumannBoundaryCondition,
    ShallowWaterEquation,
    WaveEquation,
)
from pararealml_tpu.operators.fdm import RK4
from pararealml_tpu.ops.fused_system import (
    build_fused_system_rk4_end,
    build_fused_system_rk4_trajectory,
)
from pararealml_tpu.ops.packed_system import (
    _PackedConfig,
    build_packed_system_rk4_ends,
    build_packed_system_rk4_trajectory,
    packed_system_applicable,
)


def _build_cp(eq, n_comp, kind="neumann"):
    mesh = Mesh([(0.0, 4.0), (0.0, 5.0)], [0.25, 0.25])  # 17 x 21
    if kind == "neumann":
        bcs = [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n_comp)),
                    is_static=True,
                ),
            )
            * 2,
        ] * 2
    else:
        bcs = [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), n_comp), 0.5),
                    is_static=True,
                ),
            )
            * 2,
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n_comp)),
                    is_static=True,
                ),
            )
            * 2,
        ]
    return ConstrainedProblem(eq, mesh, bcs)


CASES = [
    ("burgers-neumann", BurgersEquation(2, 100), 2, "neumann"),
    ("burgers-mixed", BurgersEquation(2, 100), 2, "mixed"),
    ("wave-mixed", WaveEquation(2, 0.5), 2, "mixed"),
    ("shallow-water", ShallowWaterEquation(0.5), 3, "neumann"),
    ("diffusion-mixed", DiffusionEquation(2, 0.5), 1, "mixed"),
    (
        "convection-diffusion",
        ConvectionDiffusionEquation(2, [0.4, -0.3], 0.5),
        1,
        "neumann",
    ),
]


@pytest.fixture(autouse=True)
def _f32_mode():
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize(
    "name,eq,n_comp,kind", CASES, ids=[c[0] for c in CASES]
)
def test_packed_ends_match_single_slice_fused(name, eq, n_comp, kind):
    cp = _build_cp(eq, n_comp, kind)
    assert packed_system_applicable(cp, RK4(), 4)
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(0)
    batch, steps, d_t = 4, 8, 0.002
    y = rng.standard_normal((batch, h, w, n_comp)).astype(
        np.float32
    ) * 0.3

    single = build_fused_system_rk4_end(cp, d_t, steps, interpret=True)
    packed = build_packed_system_rk4_ends(
        cp, d_t, steps, batch, interpret=True
    )
    expected = np.stack(
        [np.asarray(single(y[i])) for i in range(batch)]
    )
    got = np.asarray(packed(y))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-7, rtol=1e-5)


def test_packed_trajectory_matches_single_slice_fused():
    cp = _build_cp(BurgersEquation(2, 100), 2, "mixed")
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(1)
    batch, steps, d_t = 3, 6, 0.002
    y = rng.standard_normal((batch, h, w, 2)).astype(np.float32) * 0.3

    single = build_fused_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    packed = build_packed_system_rk4_trajectory(
        cp, d_t, steps, batch, interpret=True
    )
    expected = np.stack(
        [np.asarray(single(y[i])) for i in range(batch)]
    )
    got = np.asarray(packed(y))
    assert got.shape == (batch, steps, h, w, 2)
    np.testing.assert_allclose(got, expected, atol=5e-7, rtol=1e-5)


def test_packed_trajectory_bf16_snapshots_round_frames_only():
    """``traj_dtype=bfloat16`` must round the STORED frames only: the
    integration carry stays float32, so every frame agrees with the
    float32 trajectory to one bfloat16 rounding (no error accumulation
    across steps), and the returned dtype is still the input's."""
    import jax.numpy as jnp

    cp = _build_cp(BurgersEquation(2, 100), 2, "neumann")
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(2)
    batch, steps, d_t = 3, 12, 0.002
    y = rng.standard_normal((batch, h, w, 2)).astype(np.float32) * 0.3

    full = build_packed_system_rk4_trajectory(
        cp, d_t, steps, batch, interpret=True
    )
    rounded = build_packed_system_rk4_trajectory(
        cp, d_t, steps, batch, interpret=True,
        traj_dtype=jnp.bfloat16,
    )
    expected = np.asarray(full(y))
    got = np.asarray(rounded(y))
    assert got.dtype == np.float32
    assert got.shape == expected.shape
    # one rounding of values at scale ~0.3: |err| <= 2^-9 * scale
    np.testing.assert_allclose(got, expected, atol=3e-3)
    # and NOT bit-identical (the knob actually does something)
    assert np.any(got != expected)


def test_trajectory_raw_unpack_round_trip():
    """``trajectory.raw`` + ``unpack``/``unpack_last`` must reproduce
    the direct trajectory output exactly (they are the same epilogue,
    deferred)."""
    cp = _build_cp(BurgersEquation(2, 100), 2, "neumann")
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(4)
    batch, steps, d_t = 3, 8, 0.002
    y = rng.standard_normal((batch, h, w, 2)).astype(np.float32) * 0.3
    traj = build_packed_system_rk4_trajectory(
        cp, d_t, steps, batch, interpret=True
    )
    direct = np.asarray(traj(y))
    raw = traj.raw(y)
    unpacked = np.asarray(traj.unpack(raw, y.shape[1:]))
    np.testing.assert_array_equal(unpacked, direct)
    last = np.asarray(traj.unpack_last(raw, y.shape[1:]))
    np.testing.assert_array_equal(last, direct[:, -1])


def test_gap_and_pad_cells_stay_exactly_zero():
    """The packing invariant: gaps and padding are never written, so a
    slice's stencil can only ever read zeros from beyond its edges —
    the same zero-halo semantics as the single-grid kernels."""
    cp = _build_cp(BurgersEquation(2, 100), 2, "neumann")
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(2)
    batch, d_t = 3, 0.002
    y = rng.standard_normal((batch, h, w, 2)).astype(np.float32) * 0.3

    cfg = _PackedConfig(cp, d_t, batch)
    step = cfg.make_step(*cfg.packed_constants)
    state = tuple(cfg.pack(y)[c] for c in range(2))
    for _ in range(5):
        state = step(state)
    for plane in state:
        arr = np.asarray(plane)
        for i in range(batch):
            gap = arr[:, i * cfg.stride + w]
            assert np.all(gap == 0.0)
        assert np.all(arr[h:, :] == 0.0)
        assert np.all(arr[:, batch * cfg.stride:] == 0.0)


def test_applicability_gate():
    cp = _build_cp(BurgersEquation(2, 100), 2)
    assert packed_system_applicable(cp, RK4(), 8)
    # batch below 2 has nothing to pack
    assert not packed_system_applicable(cp, RK4(), 1)
    # Navier-Stokes' in-kernel Jacobi convergence norm would couple
    # the packed slices' stopping criteria
    ns_cp = _build_cp(NavierStokesEquation(2), 4)
    assert not packed_system_applicable(ns_cp, RK4(), 8)
    # VMEM budget: a batch too wide to pack is rejected
    assert not packed_system_applicable(cp, RK4(), 100_000)
    # x64 mode disables the f32 kernels
    jax.config.update("jax_enable_x64", True)
    try:
        assert not packed_system_applicable(cp, RK4(), 8)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_cahn_hilliard_packed_matches_generic_dynamics():
    """Cahn-Hilliard amplifies last-bit noise quickly (cubic term),
    so it is compared over a short horizon only."""
    cp = _build_cp(CahnHilliardEquation(2, 0.5, 0.3), 2, "neumann")
    h, w = cp.mesh.vertices_shape
    rng = np.random.default_rng(3)
    batch, steps, d_t = 3, 3, 0.001
    y = rng.standard_normal((batch, h, w, 2)).astype(np.float32) * 0.3
    single = build_fused_system_rk4_end(cp, d_t, steps, interpret=True)
    packed = build_packed_system_rk4_ends(
        cp, d_t, steps, batch, interpret=True
    )
    expected = np.stack(
        [np.asarray(single(y[i])) for i in range(batch)]
    )
    got = np.asarray(packed(y))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


def test_parareal_routes_small_grid_batches_through_packed_kernels():
    """Compiled Parareal on a sub-threshold 2D system grid with
    vmap-batched slices must take the packed kernels (and match the
    fine solve), not the vmapped generic fallback."""
    from pararealml_tpu import (
        GaussianInitialCondition as GIC,
        InitialValueProblem,
    )
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.parareal import PararealOperator

    cp = _build_cp(BurgersEquation(2, 100), 2, "neumann")
    ic = GIC(cp, [(np.array([2.0, 2.5]), np.eye(2))] * 2, [1.0, -1.0])
    ivp = InitialValueProblem(cp, (0.0, 1.0), ic)
    f = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.005)
    g = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.025)

    parareal = PararealOperator(f, g, 0.001, num_time_slices=8)
    fn, _ = parareal.trajectory_function(cp, (0.0, 1.0))
    import jax.numpy as jnp

    y0 = jnp.asarray(
        ivp.initial_condition.discrete_y_0(True), jnp.float32
    )
    out = np.asarray(fn(y0, jnp.asarray(0.0, jnp.float32)))
    fine_fn, _ = f.trajectory_function(
        cp, (0.0, 1.0), allow_fused=False
    )
    ref = np.asarray(fine_fn(y0, 0.0))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-5
