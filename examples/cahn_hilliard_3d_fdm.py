# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/cahn_hilliard_3d_fdm.py) so
# results and tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.fdm.numerical_differentiator import (
    slice_all_constraint_pairs,
)

np.random.seed(0)
gamma = 0.5
diff_eq = CahnHilliardEquation(3, gamma=gamma)
mesh = Mesh(
    [(1.0, 31.0), (1.0, 31.0), (1.0, 31.0)],
    [1.0, 1.0, 1.0],
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
] * 3
cp = ConstrainedProblem(diff_eq, mesh, bcs)

diff = ThreePointCentralDifferenceMethod()
y_0_0 = 0.05 * np.random.uniform(-1.0, 1.0, mesh.vertices_shape + (1,))
d_y_constraints = slice_all_constraint_pairs(
    cp.static_boundary_vertex_constraints.d_y, slice(0, 1)
)
y_0_1 = np.asarray(
    y_0_0**3
    - y_0_0
    - gamma * diff.laplacian(y_0_0, mesh, d_y_constraints)
)
ic = DiscreteInitialCondition(
    cp, np.concatenate([y_0_0, y_0_1], axis=-1), True
)
ivp = InitialValueProblem(cp, (0.0, 150.0), ic)

solver = FDMOperator(RK4(), diff, 0.05)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots(n_frames=20)):
    plot.save(f"cahn_hilliard_3d_fdm_{i}").close()
