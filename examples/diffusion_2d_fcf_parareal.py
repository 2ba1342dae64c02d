# The diffusion_2d_parareal configuration solved with MGRIT-style FCF
# relaxation (relaxation="fcf"), which advances exactness two time
# slices per iteration instead of classic Parareal's one — a framework
# capability beyond the reference.
import _common  # noqa: F401
import numpy as np

from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.parareal import *
from pararealml_tpu.utils.time import device_time

diff_eq = DiffusionEquation(2)
mesh = Mesh([(0.0, 10.0), (0.0, 10.0)], [0.5, 0.5])
bcs = [
    (
        DirichletBoundaryCondition(
            lambda x, t: np.full((len(x), 1), 1.5), is_static=True
        ),
        DirichletBoundaryCondition(
            lambda x, t: np.full((len(x), 1), 1.5), is_static=True
        ),
    ),
    (
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.zeros((len(x), 1)), is_static=True
        ),
    ),
]
cp = ConstrainedProblem(diff_eq, mesh, bcs)
ic = GaussianInitialCondition(
    cp, [(np.array([5.0, 5.0]), np.eye(2))], [1000.0]
)
ivp = InitialValueProblem(cp, (0.0, 40.0), ic)

f = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.001)
g = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), 0.01)
classic = PararealOperator(f, g, 0.0025)
fcf = PararealOperator(f, g, 0.0025, relaxation="fcf")

fine_solution, _ = device_time("fine")(f.solve)(ivp)
classic_solution, _ = device_time("parareal (classic)")(classic.solve)(
    ivp
)
fcf_solution, _ = device_time("parareal (fcf)")(fcf.solve)(ivp)

fine_y = fine_solution.discrete_y()
print(
    "max |classic - fine|:",
    float(np.abs(classic_solution.discrete_y() - fine_y).max()),
)
print(
    "max |fcf - fine|:",
    float(np.abs(fcf_solution.discrete_y() - fine_y).max()),
)
