import jax
import jax.numpy as jnp
import numpy as np

from pararealml_tpu.operators.ml.physics_informed import DeepONet, FNN


def _net(branch_input_size=4, output_size=2):
    return DeepONet(
        branch_net=FNN([8, 6]),
        trunk_net=FNN([8, 6]),
        combiner_net=FNN([8, output_size]),
        branch_net_input_size=branch_input_size,
    )


def test_deeponet_output_shape():
    net = _net()
    inputs = jnp.ones((5, 4 + 3))  # 4 branch + 3 trunk features
    params = net.init(jax.random.PRNGKey(0), inputs)
    outputs = net.apply(params, inputs)
    assert outputs.shape == (5, 2)


def test_deeponet_combiner_sees_branch_trunk_product():
    # the combiner input is [b, t, b*t]: zeroing the branch input while
    # keeping the trunk fixed must change both the product and branch
    # terms, so outputs differ whenever branch weights are non-trivial
    net = _net()
    key = jax.random.PRNGKey(1)
    inputs = jax.random.normal(key, (7, 7))
    params = net.init(key, inputs)
    base = net.apply(params, inputs)
    zero_branch = inputs.at[:, :4].set(0.0)
    changed = net.apply(params, zero_branch)
    assert not np.allclose(np.asarray(base), np.asarray(changed))
    # trunk-only change likewise propagates
    zero_trunk = inputs.at[:, 4:].set(0.0)
    changed_trunk = net.apply(params, zero_trunk)
    assert not np.allclose(np.asarray(base), np.asarray(changed_trunk))


def test_deeponet_is_jit_and_vmap_compatible():
    net = _net(branch_input_size=3, output_size=1)
    inputs = jnp.ones((4, 5))
    params = net.init(jax.random.PRNGKey(2), inputs)
    jitted = jax.jit(lambda p, x: net.apply(p, x))
    assert jitted(params, inputs).shape == (4, 1)
    batched = jax.vmap(lambda x: net.apply(params, x))
    stacked = jnp.stack([inputs, inputs + 1.0])
    assert batched(stacked).shape == (2, 4, 1)


def test_deeponet_deterministic_init():
    net = _net()
    inputs = jnp.ones((2, 7))
    params_a = net.init(jax.random.PRNGKey(3), inputs)
    params_b = net.init(jax.random.PRNGKey(3), inputs)
    flat_a = jax.tree_util.tree_leaves(params_a)
    flat_b = jax.tree_util.tree_leaves(params_b)
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_a, flat_b)
    )
