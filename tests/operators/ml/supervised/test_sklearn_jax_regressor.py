import numpy as np
import pytest

from pararealml_tpu.operators.ml import FNN, SKLearnJaxRegressor


def _linear_data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (n, 3))
    w = np.array([[1.0, -2.0], [0.5, 0.0], [-1.0, 1.0]])
    y = x @ w + 0.1
    return x, y


def test_fit_predict_score():
    import optax

    x, y = _linear_data()
    model = SKLearnJaxRegressor(
        lambda: FNN([16, 2]),
        batch_size=128,
        epochs=200,
        verbose=0,
        optimizer=optax.adam(1e-2),
    )
    model.fit(x, y)
    prediction = model.predict(x)
    assert prediction.shape == y.shape
    assert model.score(x, y) > -5e-3
    assert len(model.history["loss"]) == 200
    assert model.history["loss"][-1] < model.history["loss"][0]


def test_validation_split_and_frequency():
    x, y = _linear_data()
    model = SKLearnJaxRegressor(
        lambda: FNN([8, 2]),
        batch_size=128,
        epochs=20,
        verbose=0,
        validation_split=0.25,
        validation_frequency=5,
    )
    model.fit(x, y)
    assert len(model.history["val_loss"]) == 4


def test_callbacks_invoked():
    x, y = _linear_data(64)
    seen = []
    model = SKLearnJaxRegressor(
        lambda: FNN([4, 2]),
        batch_size=32,
        epochs=3,
        verbose=0,
        callbacks=[lambda epoch, logs: seen.append(epoch)],
    )
    model.fit(x, y)
    assert seen == [0, 1, 2]


def test_batched_prediction():
    x, y = _linear_data(100)
    model = SKLearnJaxRegressor(
        lambda: FNN([4, 2]),
        batch_size=32,
        epochs=2,
        verbose=0,
        max_predict_batch_size=32,
    )
    model.fit(x, y)
    capped = model.predict(x)
    model.max_predict_batch_size = None
    uncapped = model.predict(x)
    assert np.allclose(capped, uncapped, atol=1e-6)


def test_get_set_params():
    def build(width=4):
        return FNN([width, 1])

    model = SKLearnJaxRegressor(build, epochs=5, width=8)
    params = model.get_params()
    assert params["epochs"] == 5
    assert params["width"] == 8

    model.set_params(epochs=10, width=16)
    assert model.epochs == 10
    assert model.build_args["width"] == 16
    with pytest.raises(ValueError):
        model.set_params(no_such_param=1)


def test_predict_before_fit_raises():
    model = SKLearnJaxRegressor(lambda: FNN([4, 1]))
    with pytest.raises(ValueError):
        model.predict(np.zeros((1, 3)))


def test_deeponet_end_to_end():
    from pararealml_tpu.operators.ml import DeepONet

    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (256, 4))  # 3 branch + 1 trunk features
    y = (x[:, :1] * x[:, 3:]) + x[:, 1:2]

    model = SKLearnJaxRegressor(
        lambda: DeepONet(
            branch_net=FNN([16, 8]),
            trunk_net=FNN([16, 8]),
            combiner_net=FNN([16, 1]),
            branch_net_input_size=3,
        ),
        batch_size=64,
        epochs=300,
        verbose=0,
    )
    model.fit(x, y)
    assert model.score(x, y) > -5e-2


def test_streaming_fit_matches_resident_quality():
    """An artificially tiny device budget forces the host-streaming fit
    path (shuffled shards per epoch); it must train to the same quality
    as the resident path (the counterpart of the reference's lazy
    tf.data GPU loading, sklearn_keras_regressor.py:109-166)."""
    import optax

    x, y = _linear_data()
    row_bytes = x[:1].nbytes + y[:1].nbytes

    def make(**kwargs):
        return SKLearnJaxRegressor(
            lambda: FNN([16, 2]),
            batch_size=64,
            epochs=200,
            verbose=0,
            optimizer=optax.adam(1e-2),
            **kwargs,
        )

    resident = make().fit(x, y)
    # budget of two batches' worth of rows -> 4 shards per epoch
    streaming = make(max_device_data_bytes=2 * 64 * row_bytes).fit(x, y)
    assert streaming.score(x, y) > -5e-3
    assert streaming.history["loss"][-1] < streaming.history["loss"][0]
    # both reach the same loss scale on this convex-ish problem
    assert (
        streaming.history["loss"][-1]
        < 10 * max(resident.history["loss"][-1], 1e-6)
    )


def test_streaming_budget_larger_than_data_stays_resident():
    import optax

    x, y = _linear_data(n=128)
    model = SKLearnJaxRegressor(
        lambda: FNN([8, 2]),
        batch_size=64,
        epochs=20,
        verbose=0,
        optimizer=optax.adam(1e-2),
        max_device_data_bytes=10 * (x.nbytes + y.nbytes),
    )
    model.fit(x, y)
    assert len(model.history["loss"]) == 20


def test_data_parallel_fit_matches_single_device():
    """Data-parallel training over the 8-device mesh is the same traced
    program with sharded batches and replicated parameters; with the
    same seed it must reproduce the single-device losses/predictions up
    to collective reduction reordering."""
    import optax
    from pararealml_tpu.utils.distributed import space_mesh

    x, y = _linear_data()

    def make(**kwargs):
        return SKLearnJaxRegressor(
            lambda: FNN([16, 2]),
            batch_size=128,
            epochs=50,
            verbose=0,
            optimizer=optax.adam(1e-2),
            seed=7,
            **kwargs,
        )

    single = make().fit(x, y)
    parallel = make(
        device_mesh=space_mesh(8, axis_names=("data",))
    ).fit(x, y)

    np.testing.assert_allclose(
        parallel.history["loss"], single.history["loss"], rtol=1e-4
    )
    np.testing.assert_allclose(
        parallel.predict(x), single.predict(x), rtol=0, atol=1e-5
    )


def test_data_parallel_streaming_fit():
    import optax
    from pararealml_tpu.utils.distributed import space_mesh

    x, y = _linear_data()
    row_bytes = x[:1].nbytes + y[:1].nbytes
    model = SKLearnJaxRegressor(
        lambda: FNN([16, 2]),
        batch_size=64,
        epochs=100,
        verbose=0,
        optimizer=optax.adam(1e-2),
        max_device_data_bytes=2 * 64 * row_bytes,
        device_mesh=space_mesh(8, axis_names=("data",)),
    )
    model.fit(x, y)
    assert model.score(x, y) > -5e-3
    assert model.history["loss"][-1] < model.history["loss"][0]


def test_data_parallel_indivisible_batch_rejected():
    from pararealml_tpu.utils.distributed import space_mesh

    x, y = _linear_data(n=128)
    model = SKLearnJaxRegressor(
        lambda: FNN([8, 2]),
        batch_size=100,
        epochs=1,
        verbose=0,
        device_mesh=space_mesh(8, axis_names=("data",)),
    )
    with pytest.raises(ValueError, match="divisible"):
        model.fit(x, y)


def test_sharded_predict_matches_host_batched():
    import jax
    import optax
    from pararealml_tpu.utils.distributed import space_mesh

    x, y = _linear_data()
    mesh = space_mesh(8, axis_names=("data",))
    model = SKLearnJaxRegressor(
        lambda: FNN([16, 2]),
        batch_size=128,
        epochs=30,
        verbose=0,
        optimizer=optax.adam(1e-2),
        device_mesh=mesh,
    )
    model.fit(x, y)

    sharded = model.predict(x)  # 512 rows divide 8 -> sharded
    uneven = model.predict(x[:510])  # falls back to one device
    np.testing.assert_allclose(uneven, sharded[:510], atol=1e-6)

    # a model fitted without the mesh can still predict sharded
    single = SKLearnJaxRegressor(
        lambda: FNN([16, 2]),
        batch_size=128,
        epochs=30,
        verbose=0,
        optimizer=optax.adam(1e-2),
        seed=0,
    )
    single.fit(x, y)
    expected = np.asarray(single.predict(x))
    single.device_mesh = mesh
    np.testing.assert_allclose(single.predict(x), expected, atol=1e-6)
    leaf = jax.tree_util.tree_leaves(single.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_predict_chunked_path():
    import optax
    from pararealml_tpu.utils.distributed import space_mesh

    x, y = _linear_data()
    model = SKLearnJaxRegressor(
        lambda: FNN([16, 2]),
        batch_size=128,
        epochs=30,
        verbose=0,
        optimizer=optax.adam(1e-2),
        device_mesh=space_mesh(8, axis_names=("data",)),
        max_predict_batch_size=128,
    )
    model.fit(x, y)
    chunked = model.predict(x)  # 512 rows -> 4 sharded chunks of 128
    model.max_predict_batch_size = None
    np.testing.assert_allclose(chunked, model.predict(x), atol=1e-6)
