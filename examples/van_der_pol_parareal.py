# Reproduces the corresponding reference example's problem
# configuration (/root/reference/examples/) so results and
# tolerances are directly comparable.
import _common  # noqa: F401
from pararealml_tpu import *
from pararealml_tpu.operators.fdm import *
from pararealml_tpu.operators.parareal import *
from pararealml_tpu.utils.time import device_time

diff_eq = VanDerPolEquation()
cp = ConstrainedProblem(diff_eq)
ic = ContinuousInitialCondition(
    cp, vectorize_ic_function(lambda _: [1.0, 0.0])
)
ivp = InitialValueProblem(cp, (0.0, 20.0), ic)

f = FDMOperator(
    ForwardEulerMethod(), ThreePointCentralDifferenceMethod(), 1e-4
)
g = FDMOperator(
    ForwardEulerMethod(), ThreePointCentralDifferenceMethod(), 1e-3
)
p = PararealOperator(f, g, 1e-3)

device_time("fine")(f.solve)(ivp)
device_time("coarse")(g.solve)(ivp)
solution = device_time("parareal")(p.solve)(ivp)[0]

for i, plot in enumerate(solution.generate_plots()):
    plot.save(f"van_der_pol_parareal_{i}").close()
