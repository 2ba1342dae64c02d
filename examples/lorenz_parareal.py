# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/lorenz_parareal.py), except
# the solver output grids are 10x coarser (1e-5/1e-4 instead of
# 1e-6/1e-5): the reference's grids imply a 40-million-point dense
# trajectory sized for a cluster run; the algorithm and problem are
# otherwise identical and the reference values run unchanged.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.ode import *
from pararealml_tpu.operators.parareal import *

diff_eq = LorenzEquation()
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(cp, lambda _: np.ones(3))
ivp = InitialValueProblem(cp, (0.0, 40.0), ic)

f = ODEOperator("RK45", 1e-5)
g = ODEOperator("RK45", 1e-4)
p = PararealOperator(f, g, 0.5)

solution = p.solve(ivp)

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"lorenz_parareal_{i}").close()
