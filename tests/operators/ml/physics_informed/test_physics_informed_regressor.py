import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    DiffusionEquation,
    LotkaVolterraEquation,
    Mesh,
    NeumannBoundaryCondition,
)
from pararealml_tpu.operators.ml.physics_informed import (
    DeepONet,
    FNN,
    PhysicsInformedRegressor,
)


def _ode_cp():
    return ConstrainedProblem(LotkaVolterraEquation(2.0, 1.0, 0.8, 1.0))


def _pde_cp():
    mesh = Mesh([(0.0, 1.0)], [0.25])
    bc = NeumannBoundaryCondition(
        lambda x, t: np.zeros((len(x), 1)), is_static=True
    )
    return ConstrainedProblem(DiffusionEquation(1, 0.2), mesh, [(bc, bc)])


def _model(branch_input_size, output_size):
    return DeepONet(
        branch_net=FNN([8, 4]),
        trunk_net=FNN([8, 4]),
        combiner_net=FNN([8, output_size]),
        branch_net_input_size=branch_input_size,
    )


def test_loss_weight_broadcasting():
    cp = _ode_cp()
    regressor = PhysicsInformedRegressor(
        _model(2, 2), cp, diff_eq_loss_weight=2.5
    )
    assert regressor.differential_equation_loss_weights == (2.5, 2.5)
    assert regressor.initial_condition_loss_weights == (1.0, 1.0)

    regressor = PhysicsInformedRegressor(
        _model(2, 2),
        cp,
        diff_eq_loss_weight=[1.0, 3.0],
        ic_loss_weight=[0.5, 0.25],
        bc_loss_weight=[2.0, 4.0],
    )
    assert regressor.differential_equation_loss_weights == (1.0, 3.0)
    assert regressor.initial_condition_loss_weights == (0.5, 0.25)
    assert regressor.boundary_condition_loss_weights == (2.0, 4.0)


def test_wrong_loss_weight_length():
    cp = _ode_cp()
    for kwargs in (
        {"diff_eq_loss_weight": [1.0]},
        {"ic_loss_weight": [1.0, 2.0, 3.0]},
        {"bc_loss_weight": [1.0]},
    ):
        with pytest.raises(ValueError):
            PhysicsInformedRegressor(_model(2, 2), cp, **kwargs)


def test_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    cp = _pde_cp()
    model = _model(5, 1)
    regressor = PhysicsInformedRegressor(model, cp)
    inputs = jnp.ones((3, 5 + 2))  # u (5 sensors) + t + x
    regressor.params = model.init(jax.random.PRNGKey(0), inputs)
    path = str(tmp_path / "regressor.msgpack")
    regressor.save(path)

    restored = PhysicsInformedRegressor(_model(5, 1), cp)
    restored.load(path)
    outputs = model.apply(regressor.params, inputs)
    restored_outputs = restored.model.apply(restored.params, inputs)
    assert np.allclose(
        np.asarray(outputs), np.asarray(restored_outputs)
    )
