# Parareal with a trained supervised-ML coarse operator — the
# composition this framework family exists to study (the reference's
# README motivates Parareal with ML-accelerated coarse operators;
# /root/reference/README.md:9 and
# /root/reference/pararealml/operators/parareal/parareal_operator.py).
# The surrogate's inference runs inside the compiled shard_map Parareal
# program: one network evaluation per coarse slice jump instead of a
# whole coarse FDM sweep.
import _common  # noqa: F401
import numpy as np
import optax

from pararealml_tpu import *
from pararealml_tpu.operators.ml import DeepONet, FNN, Standardized
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.ml.supervised import *
from pararealml_tpu.operators.parareal import PararealOperator
from pararealml_tpu.utils.rand import SEEDS, set_random_seed
from pararealml_tpu.utils.time import device_time

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
    cp, [(np.full(2, 5.0), np.eye(2))], [100.0]
)
ivp = InitialValueProblem(cp, (0.0, 4.0), ic)

n_slices = 10
fine = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.001)

# the coarse operator: a DeepONet learning the solution jump over one
# whole time slice, trained on fine-solver trajectories of perturbed
# initial conditions. The linear branch over the flattened state makes
# the surrogate affine in the state, so its (constant) Jacobian tracks
# the true propagator and the Parareal iteration contracts stably — a
# plain per-vertex MLP stagnates here once iterates leave the training
# manifold. Standardized bakes the feature scaling into the module.
coarse_sml = SupervisedMLOperator(4.0 / n_slices, True)
data = coarse_sml.generate_data(
    ivp,
    fine,
    10,
    lambda t, y: y * np.random.uniform(0.9, 1.1, size=y.shape),
)
n_y = int(np.prod(cp.y_shape(True)))
model = SKLearnJaxRegressor(
    lambda: Standardized.from_data(
        DeepONet(
            branch_net=FNN([64], activation=lambda h: h),
            trunk_net=FNN([128, 128, 64]),
            combiner_net=FNN([1], activation=lambda h: h),
            branch_net_input_size=n_y,
        ),
        *data,
    ),
    batch_size=4096,
    epochs=200,
    optimizer=optax.adam(2e-3),
    verbose=0,
)
train_score, test_score = coarse_sml.fit_model(model, data)
print("coarse surrogate train MSE:", train_score, "test:", test_score)

parareal = PararealOperator(
    fine, coarse_sml, 0.0025, num_time_slices=n_slices
)

fine_solution, fine_seconds = device_time("fine")(fine.solve)(ivp)
parareal_solution, parareal_seconds = device_time("parareal+sml")(
    parareal.solve
)(ivp)

diff = fine_solution.diff([parareal_solution])
print("max abs diff vs fine:", np.max(np.abs(diff.differences[0])))
print(f"speedup vs sequential fine: {fine_seconds / parareal_seconds:.2f}x")

for i, plot in enumerate(parareal_solution.generate_plots()):
    plot.save(f"diffusion_2d_sml_parareal_{i}").close()
