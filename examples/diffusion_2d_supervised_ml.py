# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np
import optax

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.ml import FNN
from pararealml_tpu.operators.ml.supervised import *
from pararealml_tpu.utils.rand import SEEDS, set_random_seed

set_random_seed(SEEDS[0])

diff_eq = DiffusionEquation(2)
mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [1.0, 1.0])
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
    )
    * 2
] * 2
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp, [(np.array([5.0, 5.0]), np.eye(2))], [100.0]
)
ivp = InitialValueProblem(cp, (0.0, 5.0), ic)

fdm_op = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.005)

sml_op = SupervisedMLOperator(0.25, True)
model = SKLearnJaxRegressor(
    lambda: FNN([128, 128, diff_eq.y_dimension]),
    batch_size=1024,
    epochs=200,
    optimizer=optax.adam(2e-3),
    verbose=0,
)
train_score, test_score = sml_op.train(
    ivp,
    fdm_op,
    model,
    20,
    lambda t, y: y * np.random.uniform(0.9, 1.1, size=y.shape),
)
print("train MSE:", train_score, "test MSE:", test_score)

sml_sol = sml_op.solve(ivp)
for i, plot in enumerate(sml_sol.generate_plots()):
    plot.save(f"diffusion_2d_supervised_ml_{i}").close()
