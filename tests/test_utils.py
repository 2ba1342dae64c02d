import numpy as np

from pararealml_tpu.operators.ml import FNN, SKLearnJaxRegressor
from pararealml_tpu.utils.checkpoint import load_pytree, save_pytree
from pararealml_tpu.utils.rand import SEEDS, set_random_seed
from pararealml_tpu.utils.time import device_time, time


def test_seeds_pool():
    assert len(SEEDS) == 100
    assert len(set(SEEDS)) == 100


def test_set_random_seed_reproducibility():
    set_random_seed(SEEDS[0])
    first = np.random.rand(3)
    set_random_seed(SEEDS[0])
    second = np.random.rand(3)
    assert np.array_equal(first, second)


def test_time_decorator(capsys):
    value, runtime = time("named")(lambda x: x + 1)(1)
    assert value == 2
    assert runtime >= 0.0
    assert "named completed in" in capsys.readouterr().out


def test_device_time_decorator(capsys):
    import jax.numpy as jnp

    value, runtime = device_time()(lambda: jnp.ones(4).sum())()
    assert float(value) == 4.0
    assert runtime >= 0.0
    assert "completed in" in capsys.readouterr().out


def test_pytree_checkpoint_roundtrip(tmp_path):
    pytree = {"a": np.arange(3.0), "b": {"c": np.ones((2, 2))}}
    path = str(tmp_path / "ckpt" / "params.msgpack")
    save_pytree(path, pytree)
    restored = load_pytree(
        path, {"a": np.zeros(3), "b": {"c": np.zeros((2, 2))}}
    )
    assert np.array_equal(restored["a"], pytree["a"])
    assert np.array_equal(restored["b"]["c"], pytree["b"]["c"])


def test_regressor_save_load(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (64, 2))
    y = x @ np.array([[1.0], [2.0]])
    model = SKLearnJaxRegressor(
        lambda: FNN([8, 1]), batch_size=32, epochs=5, verbose=0
    )
    model.fit(x, y)
    prediction = model.predict(x)

    path = str(tmp_path / "model.msgpack")
    model.save(path)

    restored = SKLearnJaxRegressor(
        lambda: FNN([8, 1]), batch_size=32, epochs=5, verbose=0
    )
    restored.load(path, x)
    assert np.allclose(restored.predict(x), prediction, atol=1e-6)
