# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/burgers_3d_fdm.py) so
# results and tolerances are directly comparable: the viscous Burgers
# system on a spherical-coordinate mesh.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = BurgersEquation(3, 100)
mesh = Mesh(
    [(1.0, 5.0), (0.0, 2.0 * np.pi), (0.25 * np.pi, 0.75 * np.pi)],
    [0.5, np.pi / 10.0, np.pi / 10.0],
    CoordinateSystem.SPHERICAL,
)
bcs = [
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 3)), is_static=True
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 3)), is_static=True
        ),
    )
] * 3
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = ContinuousInitialCondition(
    cp,
    lambda x: np.stack(
        [
            1.0 / x[:, 0] ** 2,
            np.zeros_like(x[:, 1]),
            np.zeros_like(x[:, 1]),
        ],
        axis=-1,
    ),
)
ivp = InitialValueProblem(cp, (0.0, 100.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.5)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(quiver_scale=0.1, n_frames=20)
):
    plot.save(f"burgers_3d_fdm_{i}").close()
