# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.parareal import *
from pararealml_tpu.utils.time import device_time

np.random.seed(0)
n_planets = 10
masses = [np.random.uniform(5e4, 5e8) for _ in range(n_planets)]
initial_positions = 40 * np.random.rand(n_planets * 3) - 20.0
initial_velocities = 5 * np.random.rand(n_planets * 3)

diff_eq = NBodyGravitationalEquation(3, masses)
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(
    cp, lambda _: np.append(initial_positions, initial_velocities)
)
ivp = InitialValueProblem(cp, (0.0, 5.0), ic)

f = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 1e-3)
g = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 1e-2)
# the slice count defaults to the device count, but T=5.0 only splits
# into slice durations the operators' step sizes divide for certain
# counts (the reference example has the same constraint on its MPI
# world size); 10 slices work on any device count
p = PararealOperator(f, g, 0.5, num_time_slices=10)

f_solution, _ = device_time("n_body_fine")(f.solve)(ivp)
g_solution, _ = device_time("n_body_coarse")(g.solve)(ivp)
p_solution, _ = device_time("n_body_parareal")(p.solve)(ivp)

for name, solution in [
    ("n_body_fine", f_solution),
    ("n_body_coarse", g_solution),
    ("n_body_parareal", p_solution),
]:
    for i, plot in enumerate(solution.generate_plots()):
        plot.save(f"{name}_{i}").close()
