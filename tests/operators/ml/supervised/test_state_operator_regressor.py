"""Tests for the closed-form state-operator ridge regressor.

Mirrors the reference's regressor test style (shape/protocol checks,
/root/reference/tests/operators/ml/supervised/
test_sklearn_keras_regressor.py) plus exact-recovery and Parareal
composition assertions only a closed-form affine fit can make.
"""
import numpy as np
import pytest

import pararealml_tpu as pml
from pararealml_tpu.operators.fdm import (
    RK4,
    FDMOperator,
    ThreePointCentralDifferenceMethod,
)
from pararealml_tpu.operators.ml.supervised import (
    ReducedQuadraticStateOperatorRegressor,
    StateOperatorRidgeRegressor,
    SupervisedMLOperator,
)
from pararealml_tpu.operators.parareal import PararealOperator


def _affine_layout_data(rng, state_size, n_points, n_samples, w, w0):
    """Synthetic data in the supervised per-point layout: every sample
    contributes ``n_points`` rows sharing the state columns."""
    states = rng.standard_normal((n_samples, state_size))
    next_states = states @ w.T + w0
    coords = rng.standard_normal((n_points, 2))
    y_dim = state_size // n_points
    x = np.concatenate(
        [
            np.repeat(states, n_points, axis=0),
            np.tile(coords, (n_samples, 1)),
        ],
        axis=1,
    )
    y = next_states.reshape(n_samples * n_points, y_dim)
    return x, y


def test_fit_recovers_affine_map():
    rng = np.random.default_rng(0)
    state_size, n_points = 12, 12
    w = rng.standard_normal((state_size, state_size))
    w0 = rng.standard_normal(state_size)
    x, y = _affine_layout_data(rng, state_size, n_points, 64, w, w0)

    model = StateOperatorRidgeRegressor(state_size, alpha=1e-12)
    model.fit(x, y)
    w_hat, w0_hat = model.state_map
    assert np.allclose(np.asarray(w_hat), w, atol=1e-4)
    assert np.allclose(np.asarray(w0_hat), w0, atol=1e-4)
    assert model.score(x, y) > 1.0 - 1e-9


def test_predict_matches_blockwise_map():
    rng = np.random.default_rng(1)
    state_size, n_points = 8, 4  # two y components per point
    w = rng.standard_normal((state_size, state_size))
    w0 = rng.standard_normal(state_size)
    x, y = _affine_layout_data(rng, state_size, n_points, 32, w, w0)
    model = StateOperatorRidgeRegressor(state_size, alpha=1e-12)
    model.fit(x, y)

    predictions = model.predict(x[: 2 * n_points])
    assert predictions.shape == (2 * n_points, 2)
    assert np.allclose(predictions, y[: 2 * n_points], atol=1e-4)


def test_unfitted_and_bad_shapes_raise():
    model = StateOperatorRidgeRegressor(4)
    with pytest.raises(ValueError, match="not fitted"):
        model.state_map
    with pytest.raises(ValueError, match="feature columns"):
        model.fit(np.zeros((4, 2)), np.zeros((4, 1)))
    with pytest.raises(ValueError, match="weights must be"):
        model.state_map = (np.zeros((3, 3)), np.zeros(4))


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    model = StateOperatorRidgeRegressor(6)
    model.state_map = (
        rng.standard_normal((6, 6)),
        rng.standard_normal(6),
    )
    path = str(tmp_path / "op.msgpack")
    model.save(path)
    loaded = StateOperatorRidgeRegressor(6)
    loaded.load(path)
    assert np.allclose(
        np.asarray(loaded.state_map[0]), np.asarray(model.state_map[0])
    )
    assert np.allclose(
        np.asarray(loaded.state_map[1]), np.asarray(model.state_map[1])
    )


def _diffusion_ivp(t_end):
    diff_eq = pml.DiffusionEquation(2, 0.25)
    mesh = pml.Mesh([(0.0, 2.0), (0.0, 2.0)], [0.25, 0.25])
    bcs = (
        (
            pml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
            pml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        ),
    ) * 2
    cp = pml.ConstrainedProblem(diff_eq, mesh, bcs)
    ic = pml.GaussianInitialCondition(
        cp, [(np.ones(2), np.eye(2) * 0.1)]
    )
    return pml.InitialValueProblem(cp, (0.0, t_end), ic)


def test_supervised_operator_with_ridge_model():
    """The full train -> solve flow of the reference's supervised
    operator (/root/reference/pararealml/operators/ml/supervised/
    supervised_ml_operator.py:286-357) with the ridge operator model:
    the fitted map reproduces the linear oracle's slice jumps almost
    exactly."""
    ivp = _diffusion_ivp(1.0)
    cp = ivp.constrained_problem
    n_y = int(np.prod(cp.y_shape(True)))
    oracle = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.01
    )
    sml = SupervisedMLOperator(0.25, True)
    np.random.seed(0)
    data = sml.generate_data(
        ivp,
        oracle,
        4,
        lambda t, y: y * np.random.uniform(0.9, 1.1, size=y.shape),
    )
    model = StateOperatorRidgeRegressor(n_y)
    train_mse, test_mse = sml.fit_model(model, data)
    assert train_mse < 1e-8
    # 16 state samples for an 81-dim map: held-out error is ridge-
    # regularized rather than interpolated, so it is small, not zero
    assert test_mse < 1e-3
    sml.model = model

    solution = sml.solve(ivp)
    oracle_solution = oracle.solve(ivp)
    sml_y = np.asarray(solution.discrete_y())
    oracle_y = np.asarray(oracle_solution.discrete_y())[24::25]
    assert sml_y.shape == oracle_y.shape
    # 16 training samples: the held-out map error compounds over the
    # 4-step auto-regressive roll-out but stays well under the solution
    # scale (~0.25)
    assert np.max(np.abs(sml_y - oracle_y)) < 1e-2


def test_quadratic_fit_recovers_subspace_quadratic_map():
    """A map that is quadratic within a low-dimensional subspace of the
    state is recovered to held-out-exactness: the POD basis finds the
    subspace and the triu features span the quadratic functions on it
    (any rotation of the basis spans the same function space)."""
    rng = np.random.default_rng(3)
    state_size, n_points, rank = 16, 16, 3
    subspace = np.linalg.qr(
        rng.standard_normal((state_size, rank))
    )[0]
    a = rng.standard_normal((state_size, state_size)) * 0.1
    n_quad = rank * (rank + 1) // 2
    b = rng.standard_normal((state_size, n_quad)) * 0.1
    c = rng.standard_normal(state_size) * 0.1
    rows, cols = np.triu_indices(rank)

    def oracle(states):
        z = states @ subspace
        quad = z[:, rows] * z[:, cols]
        return states @ a.T + quad @ b.T + c

    def layout(states):
        coords = rng.standard_normal((n_points, 2))
        x = np.concatenate(
            [
                np.repeat(states, n_points, axis=0),
                np.tile(coords, (len(states), 1)),
            ],
            axis=1,
        )
        y = oracle(states).reshape(len(states) * n_points, 1)
        return x, y

    train_states = (
        rng.standard_normal((128, rank)) @ subspace.T
    )
    x, y = layout(train_states)
    model = ReducedQuadraticStateOperatorRegressor(
        state_size, rank=rank, alpha=1e-12, dtype=np.float64
    )
    model.fit(x, y)

    held_out = rng.standard_normal((8, rank)) @ subspace.T
    x_test, y_test = layout(held_out)
    predictions = model.predict(x_test)
    assert np.allclose(predictions, y_test, atol=1e-6)

    # the jittable step map agrees with the sklearn-protocol surface
    import jax

    step = jax.jit(model.jax_step_map)
    stepped = np.asarray(step(held_out[0]))
    assert np.allclose(stepped, oracle(held_out[:1])[0], atol=1e-6)


def test_quadratic_unfitted_and_rank_errors():
    model = ReducedQuadraticStateOperatorRegressor(4, rank=2)
    with pytest.raises(ValueError, match="not fitted"):
        model.jax_step_map
    rng = np.random.default_rng(4)
    # 3 samples cannot support a rank-4 POD basis
    big_rank = ReducedQuadraticStateOperatorRegressor(4, rank=4)
    states = rng.standard_normal((3, 4))
    x = np.concatenate([states, np.zeros((3, 1))], axis=1)
    y = rng.standard_normal((3, 4))
    with pytest.raises(ValueError, match="rank"):
        big_rank.fit(x, y)


def test_quadratic_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    state_size, rank = 6, 2
    model = ReducedQuadraticStateOperatorRegressor(
        state_size, rank=rank, alpha=1e-10
    )
    states = rng.standard_normal((32, rank)) @ np.linalg.qr(
        rng.standard_normal((state_size, rank))
    )[0].T
    x = np.concatenate([states, np.ones((32, 1))], axis=1)
    y = states + 0.1 * states**2
    model.fit(x, y)
    path = str(tmp_path / "quad.msgpack")
    model.save(path)

    loaded = ReducedQuadraticStateOperatorRegressor(
        state_size, rank=rank
    )
    loaded.load(path)
    probe = states[:4]
    assert np.allclose(
        np.asarray(model._apply_states(probe)),
        np.asarray(loaded._apply_states(probe)),
        atol=1e-6,
    )


def _burgers_ivp(t_end):
    diff_eq = pml.BurgersEquation(1, 100)
    mesh = pml.Mesh([(0.0, 10.0)], [0.25])
    bcs = [
        (
            pml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        )
        * 2
    ]
    cp = pml.ConstrainedProblem(diff_eq, mesh, bcs)
    ic = pml.GaussianInitialCondition(
        cp, [(np.array([2.5]), np.array([[0.5]]))]
    )
    return pml.InitialValueProblem(cp, (0.0, t_end), ic)


def test_quadratic_model_beats_affine_on_burgers():
    """On a genuinely nonlinear slice jump (viscous Burgers advection)
    the affine fit has an irreducible model error; the reduced
    quadratic term removes most of it — the closed-form analogue of
    the reference training neural surrogates for nonlinear coarse
    operators (/root/reference/README.md:9)."""
    ivp = _burgers_ivp(2.0)
    cp = ivp.constrained_problem
    n_y = int(np.prod(cp.y_shape(True)))
    oracle = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.005
    )
    sml = SupervisedMLOperator(0.5, True)
    np.random.seed(0)
    data = sml.generate_data(
        ivp,
        oracle,
        20,
        lambda t, y: y * np.random.uniform(0.8, 1.2, size=y.shape),
    )

    affine = StateOperatorRidgeRegressor(n_y)
    _, affine_test_mse = sml.fit_model(affine, data)
    quadratic = ReducedQuadraticStateOperatorRegressor(n_y, rank=16)
    _, quad_test_mse = sml.fit_model(quadratic, data)
    # measured: affine ~3e-5, quadratic ~1e-6 (scratch validation run)
    assert quad_test_mse < 0.2 * affine_test_mse

    sml.model = quadratic
    solution = np.asarray(sml.solve(ivp).discrete_y())
    oracle_solution = np.asarray(oracle.solve(ivp).discrete_y())[
        99::100
    ]
    assert solution.shape == oracle_solution.shape
    # solution scale ~0.56; the 4-slice auto-regressive roll-out of
    # the surrogate stays ~1% of it (6.1e-3 measured on this config)
    assert np.max(np.abs(solution - oracle_solution)) < 8e-3


def test_parareal_with_ridge_coarse_converges_in_one_iteration():
    """Composed as the Parareal coarse operator, the near-exact affine
    surrogate converges immediately (the ML-accelerated-coarse
    composition the reference exists to study,
    /root/reference/README.md:9)."""
    import jax.numpy as jnp

    ivp = _diffusion_ivp(1.0)
    cp = ivp.constrained_problem
    n_y = int(np.prod(cp.y_shape(True)))
    f = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.0025
    )
    oracle = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), 0.0025
    )
    sml = SupervisedMLOperator(0.125, True)
    np.random.seed(0)
    data = sml.generate_data(
        ivp,
        oracle,
        4,
        lambda t, y: y * np.random.uniform(0.9, 1.1, size=y.shape),
    )
    model = StateOperatorRidgeRegressor(n_y)
    sml.fit_model(model, data)
    sml.model = model

    parareal = PararealOperator(
        f, sml, 0.01, num_time_slices=8, max_iterations=1
    )
    fine_solution = np.asarray(f.solve(ivp).discrete_y())
    parareal_solution = np.asarray(
        parareal.solve(ivp).discrete_y()
    )
    assert (
        float(
            jnp.max(
                jnp.abs(parareal_solution - fine_solution)
            )
        )
        < 5e-3
    )
