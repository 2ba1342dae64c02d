# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/shallow_water_fdm.py) so
# results and tolerances are directly comparable — including the
# partially-constrained Neumann conditions (only the water height's
# normal derivative is pinned).
import _common  # noqa: F401
import numpy as np
from matplotlib import cm

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = ShallowWaterEquation(0.5)
mesh = Mesh([(-5.0, 5.0), (0.0, 5.0)], [0.1, 0.1])
bcs = [
    (
        NeumannBoundaryCondition(
            vectorize_bc_function(lambda x, t: (0.0, None, None)),
            is_static=True,
        ),
        NeumannBoundaryCondition(
            vectorize_bc_function(lambda x, t: (0.0, None, None)),
            is_static=True,
        ),
    )
] * 2
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp,
    [(np.array([2.5, 1.25]), np.array([[0.25, 0.0], [0.0, 0.25]]))]
    * 3,
    [1.0, 0.0, 0.0],
)
ivp = InitialValueProblem(cp, (0.0, 20.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.0025)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(color_map=cm.ocean, n_frames=20)
):
    plot.save(f"shallow_water_fdm_{i}").close()
