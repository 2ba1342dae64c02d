# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.ode import *

diff_eq = LorenzEquation()
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
ivp = InitialValueProblem(cp, (0.0, 50.0), ic)

solver = ODEOperator("DOP853", 1e-4)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(legend_location="upper right")
):
    plot.save(f"lorenz_ode_{i}").close()
