# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = ConvectionDiffusionEquation(2, [2.0, 1.0])
mesh = Mesh([(0.0, 50.0), (0.0, 50.0)], [0.5, 0.5])
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
    cp, [(np.array([12.5, 12.5]), np.eye(2))], [100.0]
)
ivp = InitialValueProblem(cp, (0.0, 30.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.01)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots(n_frames=20)):
    plot.save(f"convection_diffusion_2d_fdm_{i}").close()
