# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = SIREquation()
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(
    cp, lambda _: np.array([999.0, 1.0, 0.0])
)
ivp = InitialValueProblem(cp, (0.0, 160.0), ic)

solver = FDMOperator(
    ForwardEulerMethod(), ThreePointCentralDifferenceMethod(), 1e-4
)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(legend_location="center left")
):
    plot.save(f"sir_fdm_{i}").close()
