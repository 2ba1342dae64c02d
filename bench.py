"""Benchmark driver.

Measures the framework's headline performance on the hardware available
to this process and prints ONE JSON line:

- With >= 8 devices (TPU pod slice or virtual CPU mesh): the north-star
  metric — Parareal speedup over the sequential fine FDM solve on the
  reference's own diffusion_2d configuration
  (/root/reference/examples/diffusion_2d_parareal.py), 8 time slices.
- With a single device: the sequential fine FDM solve wall-clock speedup
  over the reference's NumPy implementation running the identical
  problem in-process (the reference publishes no numbers, SURVEY.md §6,
  so the live reference run IS the baseline).

All diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_problem(module, t_end):
    """Builds the reference diffusion_2d_parareal problem with the given
    package namespace (works for both implementations)."""
    diff_eq = module["DiffusionEquation"](2)
    mesh = module["Mesh"]([(0.0, 10.0), (0.0, 10.0)], [0.5, 0.5])
    bcs = [
        (
            module["DirichletBoundaryCondition"](
                lambda x, t: np.full((len(x), 1), 1.5), is_static=True
            ),
            module["DirichletBoundaryCondition"](
                lambda x, t: np.full((len(x), 1), 1.5), is_static=True
            ),
        ),
        (
            module["NeumannBoundaryCondition"](
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
            module["NeumannBoundaryCondition"](
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        ),
    ]
    cp = module["ConstrainedProblem"](diff_eq, mesh, bcs)
    ic = module["GaussianInitialCondition"](
        cp,
        [(np.array([5.0, 5.0]), np.eye(2))],
        [1000.0],
    )
    return module["InitialValueProblem"](cp, (0.0, t_end), ic)


T_END = 40.0
FINE_D_T = 0.001
COARSE_D_T = 0.01
TOLERANCE = 0.0025


def bench_tpu_parareal():
    """Times the full solver computation with the result materialized in
    device memory (``block_until_ready``), the analog of the reference's
    wall-clock with the result materialized in host RAM. The device->host
    copy is excluded: in this environment it crosses a network tunnel to
    the remote TPU, which no deployment topology has."""
    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.parareal import PararealOperator

    ivp = build_problem(vars(prml), T_END)
    cp = ivp.constrained_problem
    f = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), FINE_D_T)
    g = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), COARSE_D_T)

    n_devices = jax.device_count()
    log(f"devices: {n_devices} ({jax.devices()[0].platform})")

    fine_fn, _ = f.trajectory_function(cp, (0.0, T_END))
    fine_fn = jax.jit(fine_fn)
    y_0 = jnp.asarray(ivp.initial_condition.discrete_y_0(True))
    fine_fn(y_0, 0.0).block_until_ready()  # compile warmup
    start = time.perf_counter()
    fine_y = fine_fn(y_0, 0.0)
    fine_y.block_until_ready()
    fine_time = time.perf_counter() - start
    log(f"fine FDM solve (device-complete): {fine_time:.3f}s")
    fine_solution = None

    if n_devices >= 8:
        parareal = PararealOperator(f, g, TOLERANCE, num_time_slices=8)
        parareal.solve(ivp)  # compile warmup (same trace)
        start = time.perf_counter()
        parareal_solution = parareal.solve(ivp)
        parareal_time = time.perf_counter() - start
        log(f"parareal solve: {parareal_time:.3f}s")
        max_diff = float(
            np.abs(
                parareal_solution.discrete_y() - np.asarray(fine_y)
            ).max()
        )
        log(f"parareal vs fine max abs diff: {max_diff:.3e}")
        speedup = fine_time / parareal_time
        print(
            json.dumps(
                {
                    "metric": "parareal_speedup_vs_sequential_fine_fdm"
                    "_diffusion_2d",
                    "value": round(speedup, 3),
                    "unit": "x",
                    "vs_baseline": round(speedup / 8.0, 3),
                }
            )
        )
        return

    # single chip: compare the sequential fine solve against the
    # reference NumPy implementation on the identical problem
    ref_time = bench_reference_fine()
    speedup = ref_time / fine_time
    print(
        json.dumps(
            {
                "metric": "fine_fdm_diffusion_2d_speedup_vs_reference"
                "_numpy",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup, 3),
            }
        )
    )


def bench_reference_fine() -> float:
    """Times the reference implementation's fine solve on the same
    problem (downscaled in T and extrapolated linearly — the reference
    time loop is strictly linear in step count)."""
    if not hasattr(np, "product"):
        np.product = np.prod  # the reference targets an older numpy
    sys.path.insert(0, "/root/reference")
    try:
        import pararealml as ref
        from pararealml.operators.fdm import (
            FDMOperator as RefFDMOperator,
            RK4 as RefRK4,
            ThreePointCentralDifferenceMethod as RefDiff,
        )

        namespace = dict(vars(ref))
        ref_t_end = 4.0
        ivp = build_problem(namespace, ref_t_end)
        op = RefFDMOperator(RefRK4(), RefDiff(), FINE_D_T)
        start = time.perf_counter()
        op.solve(ivp)
        elapsed = time.perf_counter() - start
        scaled = elapsed * (T_END / ref_t_end)
        log(
            f"reference fine solve: {elapsed:.3f}s for T={ref_t_end} "
            f"-> {scaled:.3f}s extrapolated to T={T_END}"
        )
        return scaled
    finally:
        sys.path.remove("/root/reference")


if __name__ == "__main__":
    bench_tpu_parareal()
