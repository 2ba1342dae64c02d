import jax
import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    DiffusionEquation,
    DirichletBoundaryCondition,
    GaussianInitialCondition,
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
    build_fused_diffusion_rk4_step,
    fused_diffusion_step_applicable,
)


def _bench_cp():
    mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [0.5, 0.5])
    bcs = [
        (
            DirichletBoundaryCondition(
                lambda x, t: np.full((len(x), 1), 1.5), is_static=True
            ),
        )
        * 2,
        (
            NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        )
        * 2,
    ]
    return ConstrainedProblem(DiffusionEquation(2), mesh, bcs)


def _neumann_cp(flux=0.5):
    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    bcs = [
        (
            NeumannBoundaryCondition(
                lambda x, t: np.full((len(x), 1), flux), is_static=True
            ),
        )
        * 2
    ] * 2
    return ConstrainedProblem(DiffusionEquation(2, 0.3), mesh, bcs)


def test_applicability_gate():
    cp = _bench_cp()
    # gated off under x64 (the test suite default)
    assert not fused_diffusion_step_applicable(cp, RK4())

    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_diffusion_step_applicable(cp, RK4())
        assert not fused_diffusion_step_applicable(
            cp, ForwardEulerMethod()
        )
        mesh = Mesh([(0.0, 1.0)], [0.5])
        bc = NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        )
        wave_cp = ConstrainedProblem(WaveEquation(1), mesh, [(bc, bc)])
        assert not fused_diffusion_step_applicable(wave_cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("cp_factory", [_bench_cp, _neumann_cp])
def test_fused_step_matches_generic_path(cp_factory):
    cp = cp_factory()
    ic = GaussianInitialCondition(
        cp,
        [(np.full(2, 2.0), np.eye(2))],
        [100.0],
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)

    d_t = 0.01
    fused = build_fused_diffusion_rk4_step(cp, d_t, interpret=True)

    generic_op = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    )
    generic_step = generic_op._build_step_function(
        cp, 0.0, 1, static_only=True
    )

    y_fused = y
    y_generic = y.astype(np.float64)
    for i in range(5):
        y_fused = np.asarray(fused(y_fused))
        y_generic = np.asarray(generic_step(y_generic, i, i * d_t))

    assert np.allclose(y_fused, y_generic, atol=1e-4, rtol=1e-4)
    # boundary conditions hold exactly on the fused path
    assert np.allclose(y_fused[0, :, 0], 1.5) or cp_factory is _neumann_cp


def test_fused_trajectory_matches_generic_path():
    from pararealml_tpu.ops import build_fused_diffusion_rk4_trajectory

    cp = _bench_cp()
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [100.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.01, 7

    fused_trajectory = build_fused_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_fused = np.asarray(fused_trajectory(y))

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
    assert np.allclose(ys_fused, ys_generic, atol=1e-4, rtol=1e-4)


def test_fused_trajectory_used_by_operator_in_f32():
    jax.config.update("jax_enable_x64", False)
    try:
        cp = _bench_cp()
        ic = GaussianInitialCondition(
            cp, [(np.full(2, 5.0), np.eye(2))], [100.0]
        )
        from pararealml_tpu import InitialValueProblem

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


def test_fused_convection_diffusion_matches_generic():
    from pararealml_tpu import ConvectionDiffusionEquation
    from pararealml_tpu.ops import build_fused_diffusion_rk4_trajectory

    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    bcs = [
        (
            DirichletBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        )
        * 2,
        (
            NeumannBoundaryCondition(
                lambda x, t: np.full((len(x), 1), 0.2), is_static=True
            ),
        )
        * 2,
    ]
    cp = ConstrainedProblem(
        ConvectionDiffusionEquation(2, [0.8, -0.4], 0.3), mesh, bcs
    )
    jax.config.update("jax_enable_x64", False)
    try:
        assert fused_diffusion_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)

    ic = GaussianInitialCondition(
        cp, [(np.full(2, 2.0), 0.5 * np.eye(2))], [10.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.01, 6

    fused_trajectory = build_fused_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    ys_fused = np.asarray(fused_trajectory(y))

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
    assert np.allclose(ys_fused, ys_generic, atol=1e-4, rtol=1e-4)


def test_applicability_gate_rejects_diffusion_subclass():
    # a subclass may override the symbolic equation system (e.g. add a
    # reaction term) that the fused kernel would silently drop
    from pararealml_tpu import DiffusionEquation as _DiffusionEquation

    class ReactionDiffusionEquation(_DiffusionEquation):
        pass

    mesh = Mesh([(0.0, 4.0), (0.0, 4.0)], [0.25, 0.25])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp = ConstrainedProblem(
        ReactionDiffusionEquation(2), mesh, [(bc, bc)] * 2
    )
    jax.config.update("jax_enable_x64", False)
    try:
        assert not fused_diffusion_step_applicable(cp, RK4())
    finally:
        jax.config.update("jax_enable_x64", True)


def test_end_kernel_matches_trajectory_final_state():
    from pararealml_tpu.ops import (
        build_fused_diffusion_rk4_end,
        build_fused_diffusion_rk4_trajectory,
    )

    cp = _bench_cp()
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [100.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.01, 7

    trajectory = build_fused_diffusion_rk4_trajectory(
        cp, d_t, steps, interpret=True
    )
    end = build_fused_diffusion_rk4_end(cp, d_t, steps, interpret=True)
    y_end = np.asarray(end(y))
    assert y_end.shape == y.shape
    # identical step code in both kernels: the final states match
    # exactly
    np.testing.assert_array_equal(
        y_end, np.asarray(trajectory(y)[-1])
    )


def test_batched_end_kernel_matches_single_slice_calls():
    from pararealml_tpu.ops import build_fused_diffusion_rk4_end

    cp = _bench_cp()
    ic = GaussianInitialCondition(
        cp, [(np.full(2, 5.0), np.eye(2))], [100.0]
    )
    y = np.asarray(ic.discrete_y_0(True), np.float32)
    d_t, steps = 0.01, 5
    batch = 3
    ys = np.stack([y * (0.5 + 0.25 * i) for i in range(batch)])

    end = build_fused_diffusion_rk4_end(cp, d_t, steps, interpret=True)
    batched_end = build_fused_diffusion_rk4_end(
        cp, d_t, steps, interpret=True, batch=batch
    )
    out = np.asarray(batched_end(ys))
    assert out.shape == ys.shape
    expected = np.stack(
        [np.asarray(end(ys[i])) for i in range(batch)]
    )
    np.testing.assert_array_equal(out, expected)


def test_end_kernel_not_built_beyond_vmem():
    from pararealml_tpu.ops import build_fused_diffusion_rk4_end

    mesh = Mesh([(0.0, 64.0), (0.0, 64.0)], [0.1, 0.1])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    cp = ConstrainedProblem(DiffusionEquation(2), mesh, [(bc, bc)] * 2)
    assert build_fused_diffusion_rk4_end(cp, 0.01, 3) is None
