import jax
import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    CoordinateSystem,
    DiffusionEquation,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
    InitialValueProblem,
    Mesh,
    NeumannBoundaryCondition,
    WaveEquation,
)
from pararealml_tpu.operators.fdm import (
    FDMOperator,
    ForwardEulerMethod,
    RK4,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.ops import (
    build_fused_wave_rk4_trajectory,
    fused_wave_step_applicable,
)


def _wave_cp(dirichlet=True, c=1.5):
    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    if dirichlet:
        bcs = [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2,
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2,
        ]
    else:
        bcs = [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.full((len(x), 2), 0.1),
                    is_static=True,
                ),
            )
            * 2
        ] * 2
    return ConstrainedProblem(WaveEquation(2, c), mesh, bcs)


def _ic(cp):
    return GaussianInitialCondition(
        cp, [(np.full(2, 2.0), 0.5 * np.eye(2))] * 2, [1.0, 0.0]
    )


def test_wave_applicability_gate():
    cp = _wave_cp()
    assert not fused_wave_step_applicable(cp, RK4())  # x64 default
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_wave_step_applicable(cp, RK4())
        assert not fused_wave_step_applicable(cp, ForwardEulerMethod())

        class DampedWaveEquation(WaveEquation):
            pass

        damped_cp = ConstrainedProblem(
            DampedWaveEquation(2),
            cp.mesh,
            cp.boundary_conditions,
        )
        assert not fused_wave_step_applicable(damped_cp, RK4())

        mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
        bc = NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        )
        diffusion_cp = ConstrainedProblem(
            DiffusionEquation(2), mesh, [(bc, bc)] * 2
        )
        assert not fused_wave_step_applicable(diffusion_cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("dirichlet", [True, False])
def test_fused_wave_trajectory_matches_generic(dirichlet):
    cp = _wave_cp(dirichlet)
    y = np.asarray(_ic(cp).discrete_y_0(True), np.float32)
    d_t, steps = 0.02, 6

    fused = build_fused_wave_rk4_trajectory(
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
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_fused_wave_used_by_operator_in_f32():
    jax.config.update("jax_enable_x64", False)
    try:
        cp = _wave_cp()
        ivp = InitialValueProblem(cp, (0.0, 0.1), _ic(cp))
        fused_op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 0.02
        )
        generic_op = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            0.02,
            fused_kernels=False,
        )
        y_fused = fused_op.solve(ivp).discrete_y()
        y_generic = generic_op.solve(ivp).discrete_y()
        assert np.allclose(y_fused, y_generic, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_wave_energy_behavior():
    # with reflecting (zero-Dirichlet displacement) walls and zero-flux
    # velocity the discrete wave must neither blow up nor decay to zero
    # over a short horizon
    jax.config.update("jax_enable_x64", False)
    try:
        cp = _wave_cp()
        ivp = InitialValueProblem(cp, (0.0, 1.0), _ic(cp))
        op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 0.01
        )
        y = op.solve(ivp).discrete_y()
        energy = (y[..., 1] ** 2).sum(axis=(1, 2))
        assert np.all(np.isfinite(y))
        assert energy[-1] > 0.0
        assert energy.max() < 1e3 * max(energy[0], 1e-12)
    finally:
        jax.config.update("jax_enable_x64", True)


def _burgers_cp(re=100.0):
    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    bcs = [
        (
            DirichletBoundaryCondition(
                lambda x, t: np.zeros((len(x), 2)), is_static=True
            ),
        )
        * 2,
        (
            NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 2)), is_static=True
            ),
        )
        * 2,
    ]
    from pararealml_tpu import BurgersEquation

    return ConstrainedProblem(BurgersEquation(2, re), mesh, bcs)


def test_burgers_applicability_gate():
    from pararealml_tpu.ops import fused_burgers_step_applicable

    cp = _burgers_cp()
    assert not fused_burgers_step_applicable(cp, RK4())  # x64 default
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_burgers_step_applicable(cp, RK4())
        assert not fused_burgers_step_applicable(
            cp, ForwardEulerMethod()
        )
        # wave gate must not accept Burgers and vice versa
        assert not fused_wave_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_burgers_trajectory_matches_generic():
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    cp = _burgers_cp()
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 2.0), 0.5 * np.eye(2))] * 2, [0.5, 0.3]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.01, 6

    fused = build_fused_system_rk4_trajectory(
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
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_fused_burgers_used_by_operator_in_f32():
    jax.config.update("jax_enable_x64", False)
    try:
        cp = _burgers_cp()
        ic = GaussianInitialCondition(
            cp, [(np.full(2, 2.0), 0.5 * np.eye(2))] * 2, [0.5, 0.3]
        )
        ivp = InitialValueProblem(cp, (0.0, 0.05), ic)
        fused_op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 0.01
        )
        generic_op = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            0.01,
            fused_kernels=False,
        )
        y_fused = fused_op.solve(ivp).discrete_y()
        y_generic = generic_op.solve(ivp).discrete_y()
        assert np.allclose(y_fused, y_generic, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", True)


def _swe_cp(h=0.5):
    from pararealml_tpu import ShallowWaterEquation

    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    bcs = [
        (
            NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 3)), is_static=True
            ),
        )
        * 2
    ] * 2
    return ConstrainedProblem(ShallowWaterEquation(h), mesh, bcs)


def test_shallow_water_applicability_gate():
    from pararealml_tpu.ops import (
        fused_shallow_water_step_applicable,
        fused_system_step_applicable,
    )

    cp = _swe_cp()
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_shallow_water_step_applicable(cp, RK4())
        assert fused_system_step_applicable(cp, RK4())
        assert not fused_wave_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_shallow_water_matches_generic():
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    cp = _swe_cp()
    ic = GaussianInitialCondition(
        cp,
        [(np.full(2, 2.0), 0.5 * np.eye(2))] * 3,
        [0.2, 0.0, 0.0],
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.005, 6

    fused = build_fused_system_rk4_trajectory(
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
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def _cahn_hilliard_cp(dirichlet=False):
    from pararealml_tpu import CahnHilliardEquation

    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    if dirichlet:
        bcs = [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.full((len(x), 2), 0.1),
                    is_static=True,
                ),
            )
            * 2,
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2,
        ]
    else:
        bcs = [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2
        ] * 2
    return ConstrainedProblem(CahnHilliardEquation(2), mesh, bcs)


def test_cahn_hilliard_applicability_gate():
    from pararealml_tpu.ops import (
        fused_cahn_hilliard_step_applicable,
        fused_system_step_applicable,
    )

    cp = _cahn_hilliard_cp()
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_cahn_hilliard_step_applicable(cp, RK4())
        assert fused_system_step_applicable(cp, RK4())
        assert not fused_wave_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("dirichlet", [False, True])
def test_fused_cahn_hilliard_matches_generic(dirichlet):
    from pararealml_tpu import DiscreteInitialCondition
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    cp = _cahn_hilliard_cp(dirichlet)
    np.random.seed(0)
    ic = DiscreteInitialCondition(
        cp,
        np.random.uniform(-0.5, 0.5, (17, 17, 2)),
        vertex_oriented=True,
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 1e-4, 6

    fused = build_fused_system_rk4_trajectory(
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
    assert np.allclose(ys_fused, ys_generic, atol=1e-5)


def test_fused_cahn_hilliard_used_by_operator_in_f32():
    from pararealml_tpu import DiscreteInitialCondition

    jax.config.update("jax_enable_x64", False)
    try:
        cp = _cahn_hilliard_cp()
        np.random.seed(1)
        ic = DiscreteInitialCondition(
            cp,
            np.random.uniform(-0.5, 0.5, (17, 17, 2)),
            vertex_oriented=True,
        )
        ivp = InitialValueProblem(cp, (0.0, 5e-4), ic)
        fused_op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 1e-4
        )
        generic_op = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            1e-4,
            fused_kernels=False,
        )
        y_fused = fused_op.solve(ivp).discrete_y()
        y_generic = generic_op.solve(ivp).discrete_y()
        assert np.allclose(y_fused, y_generic, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", True)


def _navier_stokes_cp(re=500.0):
    from pararealml_tpu import (
        NavierStokesEquation,
        vectorize_bc_function,
    )

    mesh = Mesh([(-1.0, 1.0), (0.0, 2.0)], [0.125, 0.125])
    bcs = [
        (
            DirichletBoundaryCondition(
                vectorize_bc_function(
                    lambda x, t: [1.0, 0.1, None, None]
                ),
                is_static=True,
            ),
            DirichletBoundaryCondition(
                vectorize_bc_function(
                    lambda x, t: [0.0, 0.0, None, None]
                ),
                is_static=True,
            ),
        ),
        (
            DirichletBoundaryCondition(
                vectorize_bc_function(
                    lambda x, t: [0.0, 0.0, None, None]
                ),
                is_static=True,
            ),
        )
        * 2,
    ]
    return ConstrainedProblem(NavierStokesEquation(re), mesh, bcs)


def test_navier_stokes_applicability_gate():
    from pararealml_tpu.ops import (
        fused_navier_stokes_step_applicable,
        fused_system_step_applicable,
    )

    cp = _navier_stokes_cp()
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_navier_stokes_step_applicable(cp, RK4())
        assert fused_system_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_navier_stokes_matches_generic():
    from pararealml_tpu import ContinuousInitialCondition
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    cp = _navier_stokes_cp()
    ic = ContinuousInitialCondition(
        cp, lambda x: np.zeros((len(x), 4))
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.05, 5

    fused = build_fused_system_rk4_trajectory(
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
    # the Jacobi stream-function solve, velocity assignments, and
    # vorticity transport must all match the generic path
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_fused_navier_stokes_used_by_operator_in_f32():
    from pararealml_tpu import ContinuousInitialCondition

    jax.config.update("jax_enable_x64", False)
    try:
        cp = _navier_stokes_cp()
        ic = ContinuousInitialCondition(
            cp, lambda x: np.zeros((len(x), 4))
        )
        ivp = InitialValueProblem(cp, (0.0, 0.25), ic)
        fused_op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 0.05
        )
        generic_op = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            0.05,
            fused_kernels=False,
        )
        y_fused = fused_op.solve(ivp).discrete_y()
        y_generic = generic_op.solve(ivp).discrete_y()
        assert np.allclose(y_fused, y_generic, atol=1e-3)
        assert np.all(np.isfinite(y_fused))
    finally:
        jax.config.update("jax_enable_x64", True)


def test_system_end_kernel_matches_trajectory_final_state():
    from pararealml_tpu.ops import (
        build_fused_system_rk4_end,
        build_fused_system_rk4_trajectory,
    )

    cp = _wave_cp()
    y = np.asarray(_ic(cp).discrete_y_0(True), np.float32)
    d_t, steps = 0.001, 6

    trajectory = build_fused_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    end = build_fused_system_rk4_end(cp, d_t, steps, interpret=True)
    y_end = np.asarray(end(y))
    assert y_end.shape == y.shape
    np.testing.assert_array_equal(
        y_end, np.asarray(trajectory(y)[-1])
    )


def test_batched_system_end_kernel_matches_single_slice_calls():
    from pararealml_tpu.ops import build_fused_system_rk4_end

    cp = _burgers_cp()
    y = np.asarray(_ic(cp).discrete_y_0(True), np.float32)
    d_t, steps = 0.0005, 4
    batch = 3
    ys = np.stack([y * (0.5 + 0.25 * i) for i in range(batch)])

    end = build_fused_system_rk4_end(cp, d_t, steps, interpret=True)
    batched_end = build_fused_system_rk4_end(
        cp, d_t, steps, interpret=True, batch=batch
    )
    out = np.asarray(batched_end(ys))
    assert out.shape == ys.shape
    expected = np.stack(
        [np.asarray(end(ys[i])) for i in range(batch)]
    )
    np.testing.assert_array_equal(out, expected)


# -- polar meshes -----------------------------------------------------------
# the fused system kernels carry the polar metric terms of the generic
# differentiator (reference numerical_differentiator.py gradient /
# laplacian / divergence polar branches) for every family but
# Navier-Stokes


def _polar_cp(diff_eq, n_components, dirichlet=False):
    mesh = Mesh(
        [(2.5, 7.5), (0.0, 2 * np.pi)],
        [0.25, np.pi / 20.0],
        CoordinateSystem.POLAR,
    )
    if dirichlet:
        bcs = [
            (
                DirichletBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n_components)),
                    is_static=True,
                ),
            )
            * 2,
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n_components)),
                    is_static=True,
                ),
            )
            * 2,
        ]
    else:
        bcs = [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), n_components)),
                    is_static=True,
                ),
            )
            * 2
        ] * 2
    return ConstrainedProblem(diff_eq, mesh, bcs)


def _polar_ic(cp, means):
    return GaussianInitialCondition(
        cp,
        [(np.array([-5.0, 0.0]), 0.3 * np.eye(2))]
        * cp.differential_equation.y_dimension,
        means,
    )


def test_polar_applicability_gates():
    from pararealml_tpu import (
        BurgersEquation,
        CahnHilliardEquation,
        NavierStokesEquation,
        ShallowWaterEquation,
    )
    from pararealml_tpu.ops import (
        fused_navier_stokes_step_applicable,
        fused_shallow_water_step_applicable,
        fused_system_step_applicable,
    )

    jax.config.update("jax_enable_x64", False)
    try:
        for diff_eq, n in (
            (WaveEquation(2), 2),
            (BurgersEquation(2, 100.0), 2),
            (ShallowWaterEquation(0.5), 3),
            (CahnHilliardEquation(2), 2),
        ):
            assert fused_system_step_applicable(
                _polar_cp(diff_eq, n), RK4()
            )
        # the in-kernel Jacobi anti-Laplacian is Cartesian
        ns_cp = _polar_cp(NavierStokesEquation(), 4)
        assert not fused_navier_stokes_step_applicable(ns_cp, RK4())
        assert not fused_system_step_applicable(ns_cp, RK4())
        # no tiled polar variant: beyond-VMEM polar grids fall back to
        # the generic path
        big_mesh = Mesh(
            [(2.5, 7.5), (0.0, 2 * np.pi)],
            [5.0 / 430, 2 * np.pi / 430],
            CoordinateSystem.POLAR,
        )
        big_cp = ConstrainedProblem(
            ShallowWaterEquation(0.5),
            big_mesh,
            [
                (
                    NeumannBoundaryCondition(
                        lambda x, t: np.zeros((len(x), 3)),
                        is_static=True,
                    ),
                )
                * 2
            ]
            * 2,
        )
        assert not fused_shallow_water_step_applicable(big_cp, RK4())
        # other curvilinear systems stay on the generic path
        from pararealml_tpu import CoordinateSystem as CS

        mesh_3d = Mesh(
            [(2.5, 7.5), (0.0, 2 * np.pi), (0.0, 4.0)],
            [0.25, np.pi / 20.0, 0.25],
            CS.CYLINDRICAL,
        )
        cyl_cp = ConstrainedProblem(
            WaveEquation(3),
            mesh_3d,
            [
                (
                    NeumannBoundaryCondition(
                        lambda x, t: np.zeros((len(x), 2)),
                        is_static=True,
                    ),
                )
                * 2
            ]
            * 3,
        )
        assert not fused_system_step_applicable(cyl_cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def _polar_case(name):
    from pararealml_tpu import (
        BurgersEquation,
        CahnHilliardEquation,
        ShallowWaterEquation,
    )

    return {
        "wave": (WaveEquation(2), 2, [1.0, 0.0], 0.001),
        "burgers": (BurgersEquation(2, 100.0), 2, [0.5, 0.1], 0.001),
        "shallow_water": (
            ShallowWaterEquation(0.5),
            3,
            [1.0, 0.0, 0.0],
            0.0005,
        ),
        "cahn_hilliard": (
            CahnHilliardEquation(2),
            2,
            [0.5, 0.0],
            0.0005,
        ),
    }[name]


@pytest.mark.parametrize(
    "family", ["wave", "burgers", "shallow_water", "cahn_hilliard"]
)
def test_fused_polar_trajectory_matches_generic(family):
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    diff_eq, n, means, d_t = _polar_case(family)
    cp = _polar_cp(diff_eq, n)
    y = np.asarray(
        _polar_ic(cp, means).discrete_y_0(True), np.float32
    )
    steps = 6

    fused = build_fused_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_fused = np.asarray(fused(y))

    generic_fn, _ = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    ).trajectory_function(cp, (0.0, steps * d_t))
    ys_generic = np.asarray(generic_fn(y.astype(np.float64), 0.0))
    assert ys_fused.shape == ys_generic.shape
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_fused_polar_wave_dirichlet_matches_generic():
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    cp = _polar_cp(WaveEquation(2), 2, dirichlet=True)
    y = np.asarray(
        _polar_ic(cp, [1.0, 0.0]).discrete_y_0(True), np.float32
    )
    d_t, steps = 0.001, 6

    fused = build_fused_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_fused = np.asarray(fused(y))

    generic_fn, _ = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    ).trajectory_function(cp, (0.0, steps * d_t))
    ys_generic = np.asarray(generic_fn(y.astype(np.float64), 0.0))
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_polar_end_kernel_matches_trajectory_final_state():
    from pararealml_tpu.ops import (
        build_fused_system_rk4_end,
        build_fused_system_rk4_trajectory,
    )

    cp = _polar_cp(WaveEquation(2), 2)
    y = np.asarray(
        _polar_ic(cp, [1.0, 0.0]).discrete_y_0(True), np.float32
    )
    d_t, steps = 0.001, 6

    trajectory = build_fused_system_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    end = build_fused_system_rk4_end(cp, d_t, steps, interpret=True)
    y_end = np.asarray(end(y))
    assert y_end.shape == y.shape
    np.testing.assert_array_equal(
        y_end, np.asarray(trajectory(y)[-1])
    )


def test_fused_polar_wave_used_by_operator_in_f32():
    jax.config.update("jax_enable_x64", False)
    try:
        cp = _polar_cp(WaveEquation(2), 2)
        ivp = InitialValueProblem(
            cp, (0.0, 0.01), _polar_ic(cp, [1.0, 0.0])
        )
        fused_op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), 0.001
        )
        generic_op = FDMOperator(
            RK4(),
            ThreePointCentralDifferenceMethod(),
            0.001,
            fused_kernels=False,
        )
        y_fused = fused_op.solve(ivp).discrete_y()
        y_generic = generic_op.solve(ivp).discrete_y()
        assert np.allclose(y_fused, y_generic, atol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_fused_polar_uneven_spacing_matches_generic():
    # regression: d_x0 = 0.4 on r in [2.5, 7.5] gives 13 vertex rows
    # with an effective linspace spacing of 5/12 != 0.4; the kernel's
    # metric radii must match the generic path's linspace radii, not a
    # d_x0 reconstruction
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    mesh = Mesh(
        [(2.5, 7.5), (0.0, 2 * np.pi)],
        [0.4, np.pi / 20.0],
        CoordinateSystem.POLAR,
    )
    cp = ConstrainedProblem(
        WaveEquation(2),
        mesh,
        [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2
        ]
        * 2,
    )
    assert mesh.vertices_shape[0] == 13
    y = np.asarray(_polar_ic(cp, [1.0, 0.0]).discrete_y_0(True), np.float32)
    d_t, steps = 0.001, 6

    fused = build_fused_system_rk4_trajectory(cp, d_t, steps, interpret=True)
    ys_fused = np.asarray(fused(y))

    generic_fn, _ = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    ).trajectory_function(cp, (0.0, steps * d_t))
    ys_generic = np.asarray(generic_fn(y.astype(np.float64), 0.0))
    assert np.allclose(ys_fused, ys_generic, atol=1e-4)


def test_polar_origin_inclusive_not_applicable():
    # r_low == 0 puts 1/r = inf on the first row; the fused f32 kernel
    # cannot reproduce the generic path's nan/inf pattern, so the gate
    # must reject origin-inclusive polar meshes
    from pararealml_tpu.ops import fused_system_step_applicable

    jax.config.update("jax_enable_x64", False)
    try:
        mesh = Mesh(
            [(0.0, 5.0), (0.0, 2 * np.pi)],
            [0.25, np.pi / 20.0],
            CoordinateSystem.POLAR,
        )
        cp = ConstrainedProblem(
            WaveEquation(2),
            mesh,
            [
                (
                    NeumannBoundaryCondition(
                        lambda x, t: np.zeros((len(x), 2)),
                        is_static=True,
                    ),
                )
                * 2
            ]
            * 2,
        )
        assert not fused_system_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_beyond_vmem_polar_builder_raises():
    # calling the system trajectory builder directly with a beyond-VMEM
    # polar problem must raise instead of silently delegating to the
    # Cartesian-only tiled kernel
    from pararealml_tpu.ops import build_fused_system_rk4_trajectory

    big_mesh = Mesh(
        [(2.5, 7.5), (0.0, 2 * np.pi)],
        [5.0 / 430, 2 * np.pi / 430],
        CoordinateSystem.POLAR,
    )
    big_cp = ConstrainedProblem(
        WaveEquation(2),
        big_mesh,
        [
            (
                NeumannBoundaryCondition(
                    lambda x, t: np.zeros((len(x), 2)), is_static=True
                ),
            )
            * 2
        ]
        * 2,
    )
    with pytest.raises(ValueError, match="Cartesian"):
        build_fused_system_rk4_trajectory(big_cp, 0.001, 2)
