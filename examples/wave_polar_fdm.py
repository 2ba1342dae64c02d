# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/wave_polar_fdm.py) so
# results and tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np
from matplotlib import cm

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = WaveEquation(2)
mesh = Mesh(
    [(2.5, 7.5), (0.0, 2 * np.pi)],
    [0.1, np.pi / 100.0],
    CoordinateSystem.POLAR,
)
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
    )
] * 2
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp,
    [(np.array([-5.0, 0]), np.array([[0.1, 0.0], [0.0, 0.1]]))] * 2,
    [4.0, 0.0],
)
ivp = InitialValueProblem(cp, (0.0, 50.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.002)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(
        color_map=cm.coolwarm, equal_scale=True, n_frames=20
    )
):
    plot.save(f"wave_polar_fdm_{i}").close()
