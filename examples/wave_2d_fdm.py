# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/wave_2d_fdm.py) so results
# and tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = WaveEquation(2)
mesh = Mesh([(-5.0, 5.0), (-5.0, 5.0)], [0.1, 0.1])
bcs = [
    (
        DirichletBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
        DirichletBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
    )
] * 2
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp,
    [(np.array([0.0, 2.5]), np.array([[0.1, 0.0], [0.0, 0.1]]))] * 2,
    [3.0, 0.0],
)
ivp = InitialValueProblem(cp, (0.0, 20.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.01)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots(n_frames=20)):
    plot.save(f"wave_2d_fdm_{i}").close()
