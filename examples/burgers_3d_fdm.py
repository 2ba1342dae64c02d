# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = BurgersEquation(3, 200.0)
mesh = Mesh([(0.0, 5.0)] * 3, [0.25] * 3)
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 3)), is_static=True
        ),
    )
    * 2
] * 3
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp, [(np.full(3, 2.5), np.eye(3))] * 3
)
ivp = InitialValueProblem(cp, (0.0, 20.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.01)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots(n_frames=20)):
    plot.save(f"burgers_3d_fdm_{i}").close()
