"""Tests for the closed-form affine-DeepONet branch solve."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pararealml_tpu.operators.ml import DeepONet, FNN, Standardized
from pararealml_tpu.operators.ml.supervised import (
    refine_affine_deeponet_branch,
)


def _affine_dataset(rng, n_states, n_points, n_b, y_dim):
    """Rows [state, trunk coords] grouped by state, targets from a
    ground-truth affine point-wise map of the state."""
    coords = rng.standard_normal((n_points, 2))
    states = rng.standard_normal((n_states, n_b))
    a = rng.standard_normal((n_points, y_dim, n_b)) / np.sqrt(n_b)
    b = rng.standard_normal((n_points, y_dim))
    x = np.concatenate(
        [
            np.repeat(states, n_points, axis=0),
            np.tile(coords, (n_states, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    y = (
        np.einsum("pok,sk->spo", a, states) + b[np.newaxis]
    ).reshape(n_states * n_points, y_dim).astype(np.float32)
    return x, y


def _build(n_b, rank, y_dim, standardized, x, y):
    inner = DeepONet(
        branch_net=FNN([rank], activation=lambda h: h),
        trunk_net=FNN([32, rank]),
        combiner_net=FNN([y_dim], activation=lambda h: h),
        branch_net_input_size=n_b,
    )
    module = (
        Standardized.from_data(inner, x, y) if standardized else inner
    )
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    return module, params


@pytest.mark.parametrize(
    # the un-standardized random-init trunk basis is badly
    # conditioned, so the damped projection trades a little fit bias
    # for float32-safe branch weights — hence the looser tolerance
    "standardized,mse_bound,atol",
    [(True, 1e-8, 1e-3), (False, 1e-4, 5e-2)],
)
def test_refinement_near_interpolates_affine_targets(
    standardized, mse_bound, atol
):
    """With full-rank trunk features, the closed-form branch solve must
    fit an affine target map to near machine precision WITHOUT any
    gradient training — the property the supervised-ML Parareal coarse
    surrogate leans on."""
    rng = np.random.default_rng(0)
    n_states, n_points, n_b, y_dim = 40, 12, 6, 1
    x, y = _affine_dataset(rng, n_states, n_points, n_b, y_dim)
    # rank >= n_points * y_dim so the trunk basis can span the targets
    module, params = _build(n_b, 16, y_dim, standardized, x, y)

    before = np.asarray(module.apply(params, x))
    mse_before = float(np.mean((before - y) ** 2))
    refined, mse = refine_affine_deeponet_branch(module, params, x, y)
    assert mse < mse_bound
    assert mse < mse_before
    after = np.asarray(module.apply(refined, x))
    np.testing.assert_allclose(after, y, atol=atol)


def test_refinement_multi_output():
    rng = np.random.default_rng(1)
    n_states, n_points, n_b, y_dim = 30, 8, 5, 2
    x, y = _affine_dataset(rng, n_states, n_points, n_b, y_dim)
    module, params = _build(n_b, 24, y_dim, True, x, y)
    refined, mse = refine_affine_deeponet_branch(module, params, x, y)
    assert mse < 1e-8


def test_refinement_rejects_nonlinear_branch():
    rng = np.random.default_rng(2)
    x, y = _affine_dataset(rng, 10, 6, 4, 1)
    inner = DeepONet(
        branch_net=FNN([8, 8]),  # two Dense layers: not linear
        trunk_net=FNN([8, 8]),
        combiner_net=FNN([1], activation=lambda h: h),
        branch_net_input_size=4,
    )
    params = inner.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    with pytest.raises(ValueError, match="branch"):
        refine_affine_deeponet_branch(inner, params, x, y)


def test_refinement_rejects_mismatched_trunk_blocks():
    rng = np.random.default_rng(3)
    x, y = _affine_dataset(rng, 10, 6, 4, 1)
    x_bad = x.copy()
    x_bad[7, -1] += 1.0  # different coords in the second state block
    module, params = _build(4, 8, 1, False, x, y)
    with pytest.raises(ValueError, match="trunk"):
        refine_affine_deeponet_branch(
            module, params, x_bad, y, n_points=6
        )
