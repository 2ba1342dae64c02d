import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pararealml_tpu import Constraint, apply_constraints_along_last_axis


def test_constraint_shape_mismatch_raises():
    with pytest.raises(ValueError):
        Constraint(np.zeros((2, 2)), np.zeros((2, 3), dtype=bool))


def test_constraint_apply():
    mask = np.array([[True, False], [False, True]])
    values = np.array([[5.0, 0.0], [0.0, 7.0]])
    constraint = Constraint(values, mask)

    out = np.asarray(constraint.apply(np.ones((2, 2))))
    assert np.array_equal(out, [[5.0, 1.0], [1.0, 7.0]])


def test_constraint_apply_broadcasts_over_leading_axes():
    mask = np.array([True, False, True])
    values = np.array([1.0, 0.0, 3.0])
    constraint = Constraint(values, mask)

    out = np.asarray(constraint.apply(np.zeros((4, 3))))
    assert out.shape == (4, 3)
    assert np.array_equal(out[2], [1.0, 0.0, 3.0])


def test_constraint_apply_incompatible_shape_raises():
    constraint = Constraint(np.zeros(3), np.ones(3, dtype=bool))
    with pytest.raises(ValueError):
        constraint.apply(np.zeros((4, 2)))


def test_constraint_multiply_and_add():
    mask = np.array([True, False])
    values = np.array([2.0, 0.0])
    constraint = Constraint(values, mask)

    out = np.asarray(
        constraint.multiply_and_add(
            np.array([10.0, 10.0]), -3.0, np.zeros(2)
        )
    )
    assert np.array_equal(out, [4.0, 0.0])


def test_constraint_from_nan_masked():
    constraint = Constraint.from_nan_masked(
        np.array([1.0, np.nan, 3.0])
    )
    assert np.array_equal(np.asarray(constraint.mask), [True, False, True])
    out = np.asarray(constraint.apply(np.full(3, -1.0)))
    assert np.array_equal(out, [1.0, -1.0, 3.0])


def test_constraint_is_jit_traceable():
    constraint = Constraint(
        np.array([5.0, 0.0]), np.array([True, False])
    )

    @jax.jit
    def f(c, x):
        return c.apply(x)

    out = np.asarray(f(constraint, jnp.zeros(2)))
    assert np.array_equal(out, [5.0, 0.0])


def test_constraint_pytree_roundtrip():
    constraint = Constraint(np.array([1.0]), np.array([True]))
    leaves, treedef = jax.tree_util.tree_flatten(constraint)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, Constraint)
    assert np.array_equal(np.asarray(rebuilt.values), [1.0])


def test_apply_constraints_along_last_axis_none_is_noop():
    x = np.ones((2, 3))
    assert np.array_equal(
        np.asarray(apply_constraints_along_last_axis(None, x)), x
    )


def test_apply_constraints_along_last_axis():
    mask = np.zeros((4, 2), dtype=bool)
    mask[0, 0] = mask[-1, 1] = True
    values = np.zeros((4, 2))
    values[0, 0] = 9.0
    values[-1, 1] = -9.0
    constraint = Constraint(values, mask)

    out = np.asarray(
        apply_constraints_along_last_axis(constraint, np.zeros((4, 2)))
    )
    assert out[0, 0] == 9.0 and out[-1, 1] == -9.0
    assert out.sum() == 0.0
