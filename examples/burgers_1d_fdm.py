# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = BurgersEquation(1, 100)
mesh = Mesh([(0.0, 10.0)], [0.1])
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
    )
    * 2
]
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp, [(np.array([2.5]), np.array([[0.5]]))]
)
ivp = InitialValueProblem(cp, (0.0, 200.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.0025)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"burgers_1d_fdm_{i}").close()
