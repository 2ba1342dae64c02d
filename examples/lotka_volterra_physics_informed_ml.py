# Reproduces the corresponding reference example's problem
# configuration
# (/root/reference/examples/lotka_volterra_physics_informed_ml.py) so
# results and tolerances are directly comparable.
import _common  # noqa: F401
import jax
import numpy as np
import optax

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.ml.physics_informed import *

diff_eq = LotkaVolterraEquation()
cp = ConstrainedProblem(diff_eq)
t_interval = (0.0, 2.0)

fdm = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.001)

sampler = UniformRandomCollocationPointSampler()
piml = PhysicsInformedMLOperator(sampler, 0.01, True)
training_y_0_functions = [
    lambda _, _y_0=y_0: np.array(_y_0)
    for y_0 in [
        [47.5, 22.5],
        [47.5, 25.0],
        [47.5, 27.5],
        [50.0, 22.5],
        [50.0, 25.0],
        [50.0, 27.5],
        [52.5, 22.5],
        [52.5, 25.0],
        [52.5, 27.5],
    ]
]
validation_y_0_functions = [
    lambda _, _y_0=y_0: np.array(_y_0)
    for y_0 in [[47.5, 22.5], [50.0, 25.0], [52.5, 27.5]]
]
piml.train(
    cp,
    t_interval,
    training_data_args=DataArgs(
        y_0_functions=training_y_0_functions,
        n_domain_points=200,
        n_batches=2,
        n_ic_repeats=2,
    ),
    validation_data_args=DataArgs(
        y_0_functions=validation_y_0_functions,
        n_domain_points=50,
        n_batches=1,
    ),
    model_args=ModelArgs(
        model=DeepONet(
            branch_net=FNN([50] * 6, activation=jax.nn.softplus),
            trunk_net=FNN([50] * 6, activation=jax.nn.softplus),
            combiner_net=FNN(
                [50, diff_eq.y_dimension],
                activation=jax.nn.softplus,
            ),
            branch_net_input_size=np.prod(
                cp.y_vertices_shape
            ).item(),
        ),
    ),
    optimization_args=OptimizationArgs(
        optimizer=optax.adam(
            optax.exponential_decay(1e-3, 100, 0.95)
        ),
        epochs=2000,
        verbose=0,
    ),
)

for y_0 in [(47.5, 27.5), (50.0, 25.0), (52.5, 22.5)]:
    ic = ContinuousInitialCondition(
        cp, lambda _, _y_0=y_0: np.array(_y_0)
    )
    ivp = InitialValueProblem(cp, t_interval, ic)

    fdm_solution = fdm.solve(ivp)
    for i, plot in enumerate(fdm_solution.generate_plots()):
        plot.save(
            "lv_fdm_{:.2f}_{:.2f}_{}".format(y_0[0], y_0[1], i)
        ).close()

    piml_solution = piml.solve(ivp)
    for i, plot in enumerate(piml_solution.generate_plots()):
        plot.save(
            "lv_pidon_{:.2f}_{:.2f}_{}".format(y_0[0], y_0[1], i)
        ).close()
