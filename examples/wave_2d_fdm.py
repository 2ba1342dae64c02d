# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = WaveEquation(2)
mesh = Mesh([(-5.0, 5.0), (-5.0, 5.0)], [0.1, 0.1])
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
    )
    * 2
] * 2
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp,
    [(np.zeros(2), 0.05 * np.eye(2))] * 2,
    [1.0, 0.0],
)
ivp = InitialValueProblem(cp, (0.0, 10.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.001)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"wave_2d_fdm_{i}").close()
