# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/wave_1d_fdm.py) so results
# and tolerances are directly comparable — including the dynamic
# (time-dependent) Dirichlet boundary condition driving the left end.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *

diff_eq = WaveEquation(1)
mesh = Mesh([(-10.0, 10.0)], [0.1])
bcs = [
    (
        DirichletBoundaryCondition(
            lambda x, t: np.concatenate(
                [
                    np.full((len(x), 1), np.sin(t)),
                    np.full((len(x), 1), np.cos(t)),
                ],
                axis=1,
            )
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 2)), is_static=True
        ),
    ),
]
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = ContinuousInitialCondition(cp, lambda x: np.zeros((len(x), 2)))
ivp = InitialValueProblem(cp, (0.0, 50.0), ic)

solver = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.005)
solution = solver.solve(ivp)

for i, plot in enumerate(
    solution.generate_plots(equal_scale=True, n_frames=20)
):
    plot.save(f"wave_1d_fdm_{i}").close()
