# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.ode import *

np.random.seed(0)
n_planets = 5
masses = [np.random.uniform(5e4, 5e8) for _ in range(n_planets)]
initial_positions = 40 * np.random.rand(n_planets * 3) - 20.0
initial_velocities = 5 * np.random.rand(n_planets * 3)

diff_eq = NBodyGravitationalEquation(3, masses)
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(
    cp, lambda _: np.append(initial_positions, initial_velocities)
)
ivp = InitialValueProblem(cp, (0.0, 5.0), ic)

solver = ODEOperator("RK45", 1e-3)
solution = solver.solve(ivp)

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"n_body_3d_ode_{i}").close()
