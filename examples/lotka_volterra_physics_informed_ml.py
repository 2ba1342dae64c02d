# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np
import optax

from pararealml_tpu import *
from pararealml_tpu.operators.ml.physics_informed import *

diff_eq = LotkaVolterraEquation(2.0, 0.04, 1.06, 0.02)
cp = ConstrainedProblem(diff_eq)
t_interval = (0.0, 2.0)

sampler = UniformRandomCollocationPointSampler()
piml = PhysicsInformedMLOperator(sampler, 0.01, True)
training_y_0_functions = [
    lambda _, _y_0=y_0: np.array(_y_0)
    for y_0 in [
        [47.5, 25.0],
        [47.5, 27.5],
        [50.0, 25.0],
        [50.0, 27.5],
        [52.5, 25.0],
        [52.5, 27.5],
    ]
]
piml.train(
    cp,
    t_interval,
    training_data_args=DataArgs(
        y_0_functions=training_y_0_functions,
        n_domain_points=200,
        n_batches=2,
        n_ic_repeats=100,
    ),
    model_args=ModelArgs(
        model=DeepONet(
            branch_net=FNN([50] * 6),
            trunk_net=FNN([50] * 6),
            combiner_net=FNN([diff_eq.y_dimension]),
            branch_net_input_size=diff_eq.y_dimension,
        ),
        ic_loss_weight=10.0,
    ),
    optimization_args=OptimizationArgs(
        optimizer=optax.adam(
            optax.exponential_decay(1e-3, 100, 0.95)
        ),
        epochs=800,
        verbose=0,
    ),
)

ic = ContinuousInitialCondition(cp, lambda _: np.array([50.0, 26.0]))
ivp = InitialValueProblem(cp, t_interval, ic)
solution = piml.solve(ivp)
for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"lotka_volterra_piml_{i}").close()
