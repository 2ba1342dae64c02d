# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np
from sklearn.ensemble import RandomForestRegressor

from pararealml_tpu import *
from pararealml_tpu.operators.ml.supervised import *
from pararealml_tpu.operators.ode import *
from pararealml_tpu.utils.rand import SEEDS, set_random_seed

set_random_seed(SEEDS[0])

diff_eq = LotkaVolterraEquation()
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(cp, lambda _: np.array([100.0, 15.0]))
ivp = InitialValueProblem(cp, (0.0, 10.0), ic)

ode_op = ODEOperator("DOP853", 1e-3)
ode_sol = ode_op.solve(ivp)
ode_sol_y = ode_sol.discrete_y()
v_min, v_max = np.min(ode_sol_y), np.max(ode_sol_y)
for i, plot in enumerate(
    ode_sol.generate_plots(v_min=v_min, v_max=v_max)
):
    plot.save(f"lotka_volterra_ode_{i}").close()

sml_op = SupervisedMLOperator(0.1, ode_op.vertex_oriented)
sml_op.train(
    ivp,
    ode_op,
    RandomForestRegressor(n_estimators=250, n_jobs=4),
    50,
    lambda t, y: y + np.random.normal(0.0, t / 99.0, size=y.shape),
    isolate_perturbations=True,
)
sml_sol = sml_op.solve(ivp)
for i, plot in enumerate(
    sml_sol.generate_plots(v_min=v_min, v_max=v_max)
):
    plot.save(f"lotka_volterra_ar_{i}").close()
