# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.ode import *

np.random.seed(0)
diff_eq = NBodyGravitationalEquation(2, [5e10, 5e12, 5e10])
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(
    cp,
    lambda _: np.array(
        [-10.0, 0.0, 0.0, 0.0, 10.0, 5.0] + [0.0, 2.0, 0.0, 0.0, -2.0, 1.0]
    ),
)
ivp = InitialValueProblem(cp, (0.0, 20.0), ic)

solver = ODEOperator("RK45", 1e-2)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"n_body_2d_ode_{i}").close()
