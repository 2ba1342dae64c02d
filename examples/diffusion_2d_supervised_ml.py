# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/diffusion_2d_supervised_ml.py)
# so results and tolerances are directly comparable — including the
# GridSearchCV hyperparameter sweep over the sklearn-protocol
# regressor.
import _common  # noqa: F401
import numpy as np
from sklearn.model_selection import GridSearchCV

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
        DirichletBoundaryCondition(
            lambda x, t: np.full((len(x), 1), 1.5), is_static=True
        ),
        DirichletBoundaryCondition(
            lambda x, t: np.full((len(x), 1), 1.5), is_static=True
        ),
    ),
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
    ),
]
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp,
    [(np.array([5.0, 5.0]), np.array([[2.5, 0.0], [0.0, 2.5]]))],
    [100.0],
)
ivp = InitialValueProblem(cp, (0.0, 2.0), ic)

fdm_op = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.01)
fdm_sol = fdm_op.solve(ivp)
fdm_sol_y = fdm_sol.discrete_y(fdm_op.vertex_oriented)
v_min = np.min(fdm_sol_y)
v_max = np.max(fdm_sol_y)
for i, plot in enumerate(
    fdm_sol.generate_plots(v_min=v_min, v_max=v_max)
):
    plot.save(f"diffusion_fdm_{i}").close()


def build_model(hidden_layer_size: int):
    return FNN([hidden_layer_size, diff_eq.y_dimension])


sml_op = SupervisedMLOperator(0.5, fdm_op.vertex_oriented)
sml_op.train(
    ivp,
    fdm_op,
    GridSearchCV(
        SKLearnJaxRegressor(build_model, verbose=0),
        {
            "hidden_layer_size": [10, 50, 100],
            "epochs": [100, 200, 500],
        },
        cv=5,
        verbose=5,
    ),
    10,
    lambda t, y: y + np.random.normal(0.0, t / 3.0, size=y.shape),
)
sml_sol = sml_op.solve(ivp)

# the reference joblib-dumps its Keras wrapper; the Flax parameters
# persist through the regressor's native msgpack save instead
sml_op.model.best_estimator_.save("model.msgpack")

for i, plot in enumerate(
    sml_sol.generate_plots(v_min=v_min, v_max=v_max)
):
    plot.save(f"diffusion_ar_{i}").close()
