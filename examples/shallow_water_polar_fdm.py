# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/shallow_water_polar_fdm.py)
# so results and tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np
from matplotlib import cm

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = ShallowWaterEquation(0.5)
mesh = Mesh(
    [(4.0, 11.0), (0.5 * np.pi, 1.5 * np.pi)],
    [0.2, np.pi / 50.0],
    CoordinateSystem.POLAR,
)
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
    [(np.array([-6.0, 6.0]), np.array([[0.25, 0.0], [0.0, 0.25]]))]
    * 3,
    [1.0, 0.0, 0.0],
)
ivp = InitialValueProblem(cp, (0.0, 10.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.0025)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(color_map=cm.ocean, n_frames=20)
):
    plot.save(f"shallow_water_polar_fdm_{i}").close()
