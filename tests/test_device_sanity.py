def test_backend_is_cpu_with_virtual_devices():
    import jax

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()
