"""Benchmark driver.

Measures the framework's headline performance on the hardware available
to this process and prints ONE JSON line with the primary metric (plus
an ``extra`` object carrying the secondary figures):

- ``parareal_speedup_vs_fused_fine``: the north-star metric —
  Parareal speedup over this framework's FASTEST sequential fine
  solve (the fused Pallas kernel path) on the reference's own
  diffusion_2d problem (/root/reference/examples/
  diffusion_2d_parareal.py), tolerance-matched and verified against
  the fine trajectory. Two decompositions are measured and the faster
  one is the headline, with its slice count and coarse step recorded
  in the extras: the reference example's exact 8-slice configuration
  (usually the winner since the log-depth trajectory expansion) and a
  ``BEST_N_SLICES``-slice vmap-batched one — the slice count is
  decoupled from the device count in this framework, so the time axis
  parallelizes across vector lanes on one chip and across chips on a
  pod slice alike. Both individual figures always ride in the extras
  (``parareal_speedup_8_slices_reference_config``,
  ``parareal_speedup_best_tuned_config``;
  ``parareal_speedup_vs_generic_fine`` keeps the generic-path
  ratio of earlier rounds for comparability).
- ``extra.sml_coarse_parareal_*``: Parareal with a trained
  supervised-ML coarse operator (a DeepONet slice-jump surrogate) —
  the composition the reference exists to study
  (/root/reference/README.md:9-13) — speedup vs the fused sequential
  fine solve and max diff vs the fine trajectory.
- ``extra.fine_fdm_speedup_vs_reference_numpy``: the sequential fine
  FDM solve against the reference's NumPy implementation running the
  identical problem in-process (the reference publishes no numbers,
  SURVEY.md §6, so the live reference run IS the baseline).
- ``extra.large_grid_*``: a 641x641 configuration where compute
  dominates loop overhead — fused-tiled-kernel speedup over the
  generic XLA path (in f32 and bf16 HBM storage) and achieved HBM
  traffic vs the chip's peak.

Timing methodology: ``block_until_ready`` under-blocks through the
remote-TPU tunnel used in this environment (it acks enqueue, not
completion), so every measurement times to a *fetched scalar* — the
benched function is wrapped to return a reduction of its result, and
the wall clock stops when that scalar's value is on the host. The
tunnel's scalar round-trip latency is measured separately and
subtracted. All diagnostics go to stderr; stdout carries exactly one
JSON line.
"""

import json
import sys
import time

import numpy as np

V5E_HBM_PEAK_GB_S = 819.0  # v5e HBM bandwidth (public spec)
# v5e MXU peak (public spec: 197 TFLOP/s bf16; XLA's DEFAULT f32
# matmul precision on TPU runs one bf16 MXU pass, so it shares this
# peak) and the VPU vector-issue peak implied by the same clock
# (8x128-lane vregs x 4 ALUs x ~1.5 GHz, counting each vector op once;
# FMAs count two FLOPs but one issue slot)
V5E_MXU_BF16_PEAK_TFLOPS = 197.0
V5E_VPU_PEAK_TOPS = 6.1


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_problem(module, t_end, d_x=0.5, extent=10.0, d=1.0):
    """Builds the reference diffusion_2d_parareal problem with the given
    package namespace (works for both implementations)."""
    diff_eq = module["DiffusionEquation"](2, d)
    mesh = module["Mesh"](
        [(0.0, extent), (0.0, extent)], [d_x, d_x]
    )
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
        [(np.full(2, extent / 2.0), np.eye(2))],
        [1000.0],
    )
    return module["InitialValueProblem"](cp, (0.0, t_end), ic)


T_END = 40.0
FINE_D_T = 0.001
COARSE_D_T = 0.01
TOLERANCE = 0.0025
N_SLICES = 8
# the time axis is decoupled from the device count (slices are
# vmap-batched per device), so the slice count is a tunable; 100
# slices is the best measured many-slice decomposition on one chip.
# Since the affine doubling sweeps and log-depth trajectory expansion
# the reference's own 8-slice configuration usually edges it out
# (2.0 vs 2.3 ms at 64 timing windows) — the headline takes whichever
# measures faster
BEST_N_SLICES = 100
BEST_COARSE_D_T = 0.05


class DeviceTimer:
    """Times jitted device computations to a fetched scalar, minus the
    host<->device scalar round-trip."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        probe = jax.jit(lambda y: jnp.sum(y))
        z = jnp.ones((8, 128), jnp.float32)
        float(probe(z))
        samples = []
        for _ in range(5):
            start = time.perf_counter()
            float(probe(z))
            samples.append(time.perf_counter() - start)
        self.round_trip = min(samples)
        log(f"scalar round-trip: {self.round_trip * 1e3:.1f} ms")

    def time(self, fn, *args, reps: int = 3) -> float:
        """fn must return a scalar jax array; returns best-of wall time
        to the fetched value, round-trip subtracted."""
        float(fn(*args))  # warmup / compile
        best = float("inf")
        for _ in range(reps):
            start = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - start)
        return max(best - self.round_trip, 1e-9)

    def time_chained(self, trajectory_fn, y_0, windows: int) -> float:
        """Per-solve device time of ``trajectory_fn`` measured over
        ``windows`` back-to-back solves inside one program, so the
        host round-trip is amortized 1/windows (needed once a solve is
        faster than the tunnel's ~25 ms round-trip). Every window
        re-solves the original initial condition: the next window's
        input carries a data dependency on the previous window's output
        (scaled by 1e-38 — underflows to a no-op in f32) so XLA can
        neither collapse the windows nor overlap them.

        The round-trip estimate's error also divides by ``windows``:
        through this environment's tunnel the round-trip scatters by
        tens of ms between runs, so sub-5 ms solves need >= 32 windows
        for a stable per-solve figure (16-window measurements of a
        ~2 ms program scattered 0.8-1.9 ms)."""
        import jax
        import jax.numpy as jnp

        def run(y):
            def body(carry, _):
                last = trajectory_fn(carry)[-1]
                return y + 1e-38 * last, jnp.sum(last)

            _, sums = jax.lax.scan(body, y, None, length=windows)
            return jnp.sum(sums)

        return self.time(jax.jit(run), y_0) / windows


def bench_parareal(timer):
    """The Parareal-vs-sequential-fine headline on the reference's own
    diffusion_2d problem: its exact 8-slice operator configuration, and
    the best tolerance-matched configuration (100 vmap-batched slices
    with the coarse step at the diffusion CFL margin, fine sub-solves
    on the affine-propagator MXU path). Speedups are quoted against the
    framework's FASTEST sequential baseline — the fused-kernel fine
    solve — with the generic-path ratio kept as a secondary figure."""
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

    y_0 = jnp.asarray(ivp.initial_condition.discrete_y_0(True))

    # sequential fine solve on the generic XLA path (kept for
    # round-over-round comparability)
    generic_f = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), FINE_D_T,
        fused_kernels=False,
    )
    fine_fn, _ = generic_f.trajectory_function(cp, (0.0, T_END))
    fine_time = timer.time_chained(lambda y: fine_fn(y, 0.0), y_0, 4)
    log(f"sequential fine FDM solve (generic): {fine_time:.3f}s")

    # fused sequential fine solve: the fastest single-chip sequential
    # baseline and the denominator of every headline speedup
    fused_fn, _ = f.trajectory_function(cp, (0.0, T_END))
    fused_time = timer.time_chained(lambda y: fused_fn(y, 0.0), y_0, 4)
    log(f"sequential fine FDM solve (fused kernel): {fused_time:.3f}s")

    fine_full = jax.jit(fine_fn)

    def measure_parareal(n_slices, coarse_d_t, windows):
        g = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), coarse_d_t
        )
        parareal = PararealOperator(
            f, g, TOLERANCE, num_time_slices=n_slices
        )
        parareal_fn, _ = parareal.trajectory_function(cp, (0.0, T_END))

        def solve(y):
            return parareal_fn(y, jnp.asarray(0.0, y.dtype))

        # correctness: full trajectories compared on device
        diff_fn = jax.jit(
            lambda y: jnp.max(jnp.abs(solve(y) - fine_full(y, 0.0)))
        )
        max_diff = float(diff_fn(y_0))
        elapsed = timer.time_chained(solve, y_0, windows)
        log(
            f"parareal ({n_slices} slices, coarse d_t={coarse_d_t}, on "
            f"{jax.device_count()} device(s)): {elapsed * 1e3:.2f}ms -> "
            f"{fused_time / elapsed:.2f}x vs fused fine "
            f"({fine_time / elapsed:.2f}x vs generic); max diff vs "
            f"fine {max_diff:.3e}"
        )
        return elapsed, max_diff

    ref_time, ref_diff = measure_parareal(N_SLICES, COARSE_D_T, 32)
    best_time, best_diff = measure_parareal(
        BEST_N_SLICES, BEST_COARSE_D_T, 64
    )

    return {
        "speedup_vs_fused_fine": fused_time / best_time,
        "speedup_vs_generic_fine": fine_time / best_time,
        "best_n_slices": BEST_N_SLICES,
        "best_coarse_d_t": BEST_COARSE_D_T,
        "speedup_8_slices_reference_config": fused_time / ref_time,
        "fine_time_s": fine_time,
        "fused_fine_time_s": fused_time,
        "parareal_time_s": best_time,
        "parareal_time_8_slices_s": ref_time,
        "max_diff_vs_fine": best_diff,
        "max_diff_vs_fine_8_slices": ref_diff,
    }


SML_N_SLICES = 100
SML_MAX_ITERATIONS = 12
SML_RANK = 441
SML_PARAMS_PATH = "bench_assets/sml_coarse_diffusion_2d_r441.msgpack"
SML_RIDGE_PATH = "bench_assets/sml_ridge_diffusion_2d.msgpack"


def bench_sml_coarse_parareal(timer, fused_time):
    """Parareal with trained supervised-ML coarse operators — the
    composition the reference exists to study (README.md:9-13). Two
    surrogates of the coarse slice jump, trained on the same
    fine-solver trajectories of perturbed initial conditions:

    - the headline: a ``StateOperatorRidgeRegressor`` — a closed-form
      ridge fit of the full affine state-transition operator. The
      diffusion slice jump IS affine, so the fit is near-exact
      (slice-jump RMS ~1e-5) and Parareal converges in ONE iteration;
      inference is a single MXU matvec consumed directly by the
      log-depth affine-sweep machinery.
    - secondary: a DeepONet (linear branch over the flattened state,
      tanh trunk over mesh coordinates, linear combiner — affine in
      the state, so Parareal's affine-probe distills it onto the
      log-depth propagator sweep). Round 4's 128-wide trunk
      rank-bounded its slice-jump error near 5e-2 and cost ~8 Parareal
      iterations; the trunk now spans the state's full 441 dimensions,
      removing the rank floor so Adam can train the surrogate to
      convergence-grade accuracy.

    Trained parameters ride in committed assets so the benchmark
    measures inference composition, not training; delete the assets to
    retrain (DeepONet adds ~6 minutes, the ridge fit seconds plus data
    generation)."""
    import os

    import jax
    import jax.numpy as jnp
    import optax

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.ml import DeepONet, FNN, Standardized
    from pararealml_tpu.operators.ml.supervised import (
        SKLearnJaxRegressor,
        SupervisedMLOperator,
    )
    from pararealml_tpu.operators.parareal import PararealOperator
    from pararealml_tpu.utils.checkpoint import (
        load_pytree,
        save_pytree,
    )
    from pararealml_tpu.utils.rand import SEEDS, set_random_seed

    ivp = build_problem(vars(prml), T_END)
    cp = ivp.constrained_problem
    n_y = int(np.prod(cp.y_shape(True)))
    y_0 = jnp.asarray(ivp.initial_condition.discrete_y_0(True))

    f = FDMOperator(RK4(), ThreePointCentralDifferenceMethod(), FINE_D_T)
    fine_fn = jax.jit(
        f.trajectory_function(cp, (0.0, T_END), allow_fused=False)[0]
    )
    sml = SupervisedMLOperator(T_END / SML_N_SLICES, True)

    def build_module(stats):
        return Standardized(
            DeepONet(
                branch_net=FNN([SML_RANK], activation=lambda h: h),
                trunk_net=FNN([256, 256, SML_RANK]),
                combiner_net=FNN([1], activation=lambda h: h),
                branch_net_input_size=n_y,
            ),
            *stats,
        )

    asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), SML_PARAMS_PATH
    )
    model = SKLearnJaxRegressor(
        lambda: None,  # the module is built explicitly below
        batch_size=16384,
        epochs=800,
        optimizer=optax.adam(2e-3),
        verbose=0,
    )
    if os.path.exists(asset):
        template_module = build_module(
            ((0.0,) * (n_y + 2), (1.0,) * (n_y + 2), (0.0,), (1.0,))
        )
        template_params = template_module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n_y + 2))
        )
        template = {
            "params": template_params,
            "stats": tuple(
                jnp.zeros(s, jnp.float32) for s in (n_y + 2, n_y + 2, 1, 1)
            ),
        }
        saved = load_pytree(asset, template)
        stats = tuple(
            tuple(np.asarray(s).tolist()) for s in saved["stats"]
        )
        model.model = (build_module(stats), saved["params"])
        log("sml surrogate: loaded cached params")
    else:
        set_random_seed(SEEDS[0])
        start = time.perf_counter()
        data = sml.generate_data(
            ivp,
            f,
            12,
            lambda t, y: y * np.random.uniform(
                0.9, 1.1, size=y.shape
            ),
        )
        x_all, y_all = data
        stats_module = Standardized.from_data(FNN([1]), x_all, y_all)
        stats = (
            stats_module.x_mean,
            stats_module.x_std,
            stats_module.y_mean,
            stats_module.y_std,
        )
        model.build_fn = lambda: build_module(stats)
        train_score, test_score = sml.fit_model(model, data)
        # the branch and combiner are linear, so after Adam has shaped
        # the trunk features the branch has a closed-form ridge
        # solution — solve it (deeponet_refinement.py); without this
        # the full-width branch is barely trainable by SGD alone
        from pararealml_tpu.operators.ml.supervised import (
            refine_affine_deeponet_branch,
        )

        trained_module, trained_params = model.model
        # damping 1e-3 measured best on this problem (1e-6 -> MSE
        # 1.4e-2 from float32-unsafe weights; 1e-3 -> 6.7e-4): the
        # heavy damping is simultaneously the strongest regularizer
        # and keeps the solved branch weights small enough that the
        # float32 forward pass loses nothing
        refined_params, refined_mse = refine_affine_deeponet_branch(
            trained_module,
            trained_params,
            x_all,
            y_all,
            projection_damping=1e-3,
        )
        model.model = (trained_module, refined_params)
        log(
            f"sml surrogate: trained in "
            f"{time.perf_counter() - start:.0f}s "
            f"(MSE train {train_score:.2e} test {test_score:.2e}; "
            f"closed-form branch solve -> {refined_mse:.2e})"
        )
        os.makedirs(os.path.dirname(asset), exist_ok=True)
        save_pytree(
            asset,
            {
                "params": model.params,
                "stats": tuple(
                    jnp.asarray(s, jnp.float32) for s in stats
                ),
            },
        )
    sml.model = model

    # the headline: the closed-form ridge fit of the full affine
    # slice-jump operator, trained on the same kind of data
    from pararealml_tpu.operators.ml.supervised import (
        StateOperatorRidgeRegressor,
    )

    ridge_asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), SML_RIDGE_PATH
    )
    ridge_model = StateOperatorRidgeRegressor(n_y)
    ridge_sml = SupervisedMLOperator(T_END / SML_N_SLICES, True)
    if os.path.exists(ridge_asset):
        ridge_model.load(ridge_asset)
        log("sml ridge operator: loaded cached fit")
    else:
        set_random_seed(SEEDS[0])
        start = time.perf_counter()
        ridge_data = ridge_sml.generate_data(
            ivp,
            f,
            12,
            lambda t, y: y * np.random.uniform(
                0.9, 1.1, size=y.shape
            ),
        )
        train_mse, test_mse = ridge_sml.fit_model(
            ridge_model, ridge_data
        )
        log(
            f"sml ridge operator: fitted in "
            f"{time.perf_counter() - start:.0f}s "
            f"(MSE train {train_mse:.2e} test {test_mse:.2e})"
        )
        os.makedirs(os.path.dirname(ridge_asset), exist_ok=True)
        ridge_model.save(ridge_asset)
    ridge_sml.model = ridge_model

    def measure(coarse_operator, label, max_iterations):
        parareal = PararealOperator(
            f,
            coarse_operator,
            TOLERANCE,
            num_time_slices=SML_N_SLICES,
            max_iterations=max_iterations,
        )
        parareal_fn, _ = parareal.trajectory_function(
            cp, (0.0, T_END)
        )

        def solve(y):
            return parareal_fn(y, jnp.asarray(0.0, y.dtype))

        diff_fn = jax.jit(
            lambda y: jnp.max(jnp.abs(solve(y) - fine_fn(y, 0.0)))
        )
        max_diff = float(diff_fn(y_0))
        elapsed = timer.time_chained(solve, y_0, 32)
        log(
            f"{label} parareal ({SML_N_SLICES} slices, <= "
            f"{max_iterations} iterations): {elapsed * 1e3:.2f}ms -> "
            f"{fused_time / elapsed:.2f}x vs fused fine; max diff vs "
            f"fine {max_diff:.3e}"
        )
        return {
            "speedup_vs_fused_fine": fused_time / elapsed,
            "time_s": elapsed,
            "max_diff_vs_fine": max_diff,
        }

    ridge = measure(ridge_sml, "sml-ridge-coarse", SML_MAX_ITERATIONS)
    deeponet = measure(
        sml, "sml-deeponet-coarse", SML_MAX_ITERATIONS
    )
    ridge["deeponet"] = deeponet
    return ridge


BURGERS_T_END = 200.0
BURGERS_FINE_D_T = 0.0025
BURGERS_N_SLICES = 100
BURGERS_QUAD_RANK = 32
BURGERS_MAX_ITERATIONS = 12
SML_QUAD_PATH = "bench_assets/sml_quad_burgers_2d.msgpack"


def build_burgers_problem(t_end):
    """A 2D viscous Burgers problem (nonlinear advection) in the
    reference's burgers_1d configuration style
    (/root/reference/examples/burgers_1d_fdm.py: Re=100, zero-flux
    Neumann faces, Gaussian initial bump, T=200), lifted to the 2D
    fused-system kernel's grid."""
    import pararealml_tpu as prml

    diff_eq = prml.BurgersEquation(2, 100.0)
    mesh = prml.Mesh([(0.0, 5.0)] * 2, [0.25] * 2)
    bcs = [
        (
            prml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 2)), is_static=True
            ),
        )
        * 2
    ] * 2
    cp = prml.ConstrainedProblem(diff_eq, mesh, bcs)
    ic = prml.GaussianInitialCondition(
        cp,
        [(np.full(2, 2.5), 0.75 * np.eye(2))] * 2,
        [1.0, 0.5],
    )
    return prml.InitialValueProblem(cp, (0.0, t_end), ic)


def bench_nonlinear_sml(timer):
    """Parareal with a TRAINED NONLINEAR ML coarse operator on a
    NONLINEAR problem — the reference's stated purpose
    (/root/reference/README.md:9-13) beyond the affine-ridge shortcut
    that only exists because diffusion's slice jump is affine.

    Problem: 2D viscous Burgers (quadratic advection nonlinearity),
    fine-solved by the fused-system Pallas kernel. Coarse: a
    ``ReducedQuadraticStateOperatorRegressor`` slice-jump surrogate —
    closed-form ridge fit of a full-rank linear term plus a quadratic
    term in a POD-reduced subspace with a trust-region clamp
    (operators/ml/supervised/state_operator_regressor.py) — trained on
    fine trajectories of perturbed initial conditions exactly like the
    reference trains its Keras surrogates. Inference is two dense
    matmuls per slice jump riding the MXU; the fitted model ships as a
    committed asset so the bench measures the composition, not
    training (delete the asset to refit, ~3 minutes).

    Correctness is tolerance-matched against the fine trajectory
    (max diff reported); the headline is wall-clock speedup over the
    fused sequential fine solve of the same problem."""
    import os

    import jax
    import jax.numpy as jnp

    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.ml.supervised import (
        ReducedQuadraticStateOperatorRegressor,
        SupervisedMLOperator,
    )
    from pararealml_tpu.operators.parareal import PararealOperator
    from pararealml_tpu.utils.rand import SEEDS, set_random_seed

    ivp = build_burgers_problem(BURGERS_T_END)
    cp = ivp.constrained_problem
    n_y = int(np.prod(cp.y_shape(True)))
    y_0 = jnp.asarray(
        np.asarray(ivp.initial_condition.discrete_y_0(True), np.float32)
    )
    horizon = (0.0, BURGERS_T_END)

    f = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), BURGERS_FINE_D_T
    )
    fused_fn, _ = f.trajectory_function(cp, horizon)
    fused_time = timer.time_chained(lambda y: fused_fn(y, 0.0), y_0, 8)
    log(
        f"burgers 2d fused sequential fine ({BURGERS_T_END:g}s "
        f"horizon): {fused_time * 1e3:.2f}ms"
    )
    fine_full = jax.jit(fused_fn)

    sml = SupervisedMLOperator(BURGERS_T_END / BURGERS_N_SLICES, True)
    model = ReducedQuadraticStateOperatorRegressor(
        n_y, rank=BURGERS_QUAD_RANK
    )
    asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), SML_QUAD_PATH
    )
    if os.path.exists(asset):
        model.load(asset)
        log("burgers quad surrogate: loaded cached fit")
    else:
        set_random_seed(SEEDS[0])
        start = time.perf_counter()
        data = sml.generate_data(
            ivp,
            f,
            12,
            lambda t, y: y * np.random.uniform(0.9, 1.1, size=y.shape),
        )
        train_mse, test_mse = sml.fit_model(model, data)
        log(
            f"burgers quad surrogate: fitted in "
            f"{time.perf_counter() - start:.0f}s "
            f"(MSE train {train_mse:.2e} test {test_mse:.2e})"
        )
        os.makedirs(os.path.dirname(asset), exist_ok=True)
        model.save(asset)
    sml.model = model

    # two configurations, both tolerance-checked against the fine
    # trajectory: the ROBUST one iterates under the RMS termination
    # criterion with headroom (<= 12 corrections), and the ONE-SHOT one
    # exploits what the robust run demonstrates — this surrogate
    # converges in a single correction — to compile the
    # single-iteration "iteration"-materialized program (no while
    # loop, no separate final fine sweep). The one-shot figure is the
    # headline BECAUSE its reported max diff stays within tolerance;
    # if the surrogate were weaker the robust figure is the honest one
    results = {}
    for label, max_iterations in (
        ("robust", BURGERS_MAX_ITERATIONS),
        ("one_shot", 1),
    ):
        parareal = PararealOperator(
            f,
            sml,
            TOLERANCE,
            num_time_slices=BURGERS_N_SLICES,
            max_iterations=max_iterations,
            materialize="iteration",
        )
        parareal_fn, _ = parareal.trajectory_function(cp, horizon)

        def solve(y, parareal_fn=parareal_fn):
            return parareal_fn(y, jnp.asarray(0.0, y.dtype))

        diff_fn = jax.jit(
            lambda y: jnp.max(jnp.abs(solve(y) - fine_full(y, 0.0)))
        )
        max_diff = float(diff_fn(y_0))
        elapsed = timer.time_chained(solve, y_0, 32)
        log(
            f"burgers 2d quad-coarse parareal ({BURGERS_N_SLICES} "
            f"slices, {label}, <= {max_iterations} iterations): "
            f"{elapsed * 1e3:.2f}ms -> {fused_time / elapsed:.2f}x vs "
            f"fused fine; max diff vs fine {max_diff:.3e}"
        )
        results[label] = {
            "speedup_vs_fused_fine": fused_time / elapsed,
            "time_s": elapsed,
            "max_diff_vs_fine": max_diff,
        }
    headline = (
        results["one_shot"]
        if results["one_shot"]["max_diff_vs_fine"] <= 2 * TOLERANCE
        else results["robust"]
    )
    return {
        **headline,
        "robust_speedup_vs_fused_fine": results["robust"][
            "speedup_vs_fused_fine"
        ],
        "robust_max_diff_vs_fine": results["robust"][
            "max_diff_vs_fine"
        ],
        "fused_fine_time_s": fused_time,
        "n_time_slices": BURGERS_N_SLICES,
        "quad_rank": BURGERS_QUAD_RANK,
    }


def bench_pinn(timer):
    """Physics-informed (DeepONet) training and inference throughput on
    the reference's diffusion_1d_physics_informed_ml workload shape
    (/root/reference/examples/diffusion_1d_physics_informed_ml.py;
    training loop shape /root/reference/pararealml/operators/ml/
    physics_informed/physics_informed_ml_operator.py:139-246): 24
    initial-condition functions x 500 domain collocation points per
    epoch through an 8x50 branch/trunk DeepONet. Reports training
    epochs/s, domain-collocation-point residual evaluations/s, the
    final training loss after the measured window, and the jitted
    auto-regressive solve latency for the example's 500-step roll-out."""
    import jax
    import jax.numpy as jnp
    import optax

    import pararealml_tpu as prml
    from pararealml_tpu.operators.ml import DeepONet, FNN
    from pararealml_tpu.operators.ml.physics_informed import (
        DataArgs,
        ModelArgs,
        OptimizationArgs,
        PhysicsInformedMLOperator,
        UniformRandomCollocationPointSampler,
    )

    diff_eq = prml.DiffusionEquation(1, 0.2)
    mesh = prml.Mesh([(0.0, 1.0)], (0.1,))
    bcs = [
        (
            prml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), 1)), is_static=True
            ),
        )
        * 2
    ]
    cp = prml.ConstrainedProblem(diff_eq, mesh, bcs)
    t_interval = (0.0, 0.5)
    n_ic = 24
    n_domain = 500
    training_y_0_functions = [
        prml.MarginalBetaProductInitialCondition(
            cp, [[(p, p)]]
        ).y_0
        for p in np.linspace(1.2, 5.8, n_ic)
    ]
    piml = PhysicsInformedMLOperator(
        UniformRandomCollocationPointSampler(), 0.001, True
    )
    data_args = DataArgs(
        y_0_functions=training_y_0_functions,
        n_domain_points=n_domain,
        n_boundary_points=100,
        n_batches=1,
    )
    model_args = ModelArgs(
        model=DeepONet(
            branch_net=FNN([50] * 8),
            trunk_net=FNN([50] * 8),
            combiner_net=FNN([diff_eq.y_dimension]),
            branch_net_input_size=int(
                np.prod(cp.y_vertices_shape)
            ),
        ),
        ic_loss_weight=10.0,
    )
    optimizer = optax.adam(optax.exponential_decay(2e-3, 25, 0.98))

    # warmup: builds the dataset and compiles the epoch program
    piml.train(
        cp,
        t_interval,
        training_data_args=data_args,
        optimization_args=OptimizationArgs(
            optimizer=optimizer, epochs=2, verbose=0
        ),
        model_args=model_args,
    )
    epochs = 100
    start = time.perf_counter()
    history, _ = piml.train(
        cp,
        t_interval,
        training_data_args=data_args,
        optimization_args=OptimizationArgs(
            optimizer=optimizer, epochs=epochs, verbose=0
        ),
    )
    jnp.asarray(history["loss"][-1]).block_until_ready()
    train_elapsed = time.perf_counter() - start
    epochs_per_s = epochs / train_elapsed
    points_per_s = epochs_per_s * n_ic * n_domain
    final_loss = float(np.asarray(history["loss"][-1]))

    ic = prml.MarginalBetaProductInitialCondition(cp, [[(3.5, 3.5)]])
    ivp = prml.InitialValueProblem(cp, t_interval, ic)
    y_0 = jnp.asarray(ivp.initial_condition.discrete_y_0(True))
    solve_fn, _ = piml.trajectory_function(cp, t_interval)

    def solve(y):
        return solve_fn(y, jnp.asarray(0.0, y.dtype))

    solve_time = timer.time_chained(solve, y_0, 32)
    n_steps = round((t_interval[1] - t_interval[0]) / piml.d_t)
    log(
        f"pinn (diffusion_1d deeponet): {epochs_per_s:.1f} training "
        f"epochs/s ({points_per_s:.3g} domain-residual points/s, "
        f"loss {final_loss:.3e} after {epochs + 2} epochs), "
        f"{n_steps}-step solve {solve_time * 1e3:.2f}ms"
    )

    # the quality loop: a committed asset holds the reference-scale
    # training result (5000 epochs — the reference example's budget,
    # /root/reference/examples/diffusion_1d_physics_informed_ml.py:77,
    # regenerated by .scratch/train_pinn_asset.py); its converged loss
    # plus the trained model's max solution error vs an FDM fine solve
    # close the "throughput but no quality" gap
    quality = _pinn_quality(piml, cp, t_interval, model_args)

    return {
        "train_epochs_per_s": epochs_per_s,
        "train_domain_points_per_s": points_per_s,
        "train_loss": final_loss,
        "solve_time_s": solve_time,
        "solve_steps": n_steps,
        **quality,
    }


PINN_ASSET_PATH = "bench_assets/pinn_diffusion_1d.msgpack"


def _pinn_quality(piml, cp, t_interval, model_args):
    """Loads the 5000-epoch trained PINN asset and measures the
    converged model's worst solution error against the FDM fine solve
    (Crank-Nicolson d_t=1e-4, the reference example's oracle) over the
    example's three test initial conditions."""
    import os

    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        CrankNicolsonMethod,
        FDMOperator,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.ml.physics_informed import (
        PhysicsInformedRegressor,
    )
    from pararealml_tpu.utils.checkpoint import load_pytree

    asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), PINN_ASSET_PATH
    )
    if not os.path.exists(asset):
        log("pinn quality: no trained asset, skipping")
        return {}
    regressor = PhysicsInformedRegressor(
        model=model_args.model,
        cp=cp,
        ic_loss_weight=model_args.ic_loss_weight,
        vertex_oriented=True,
    )
    template = {
        "params": regressor.init_params(jax.random.PRNGKey(0)),
        "final_loss": jnp.zeros((), jnp.float32),
        "epochs": jnp.zeros((), jnp.int32),
    }
    saved = load_pytree(asset, template)
    regressor.params = saved["params"]
    piml.model = regressor
    final_loss = float(saved["final_loss"])
    epochs = int(saved["epochs"])

    fdm = FDMOperator(
        CrankNicolsonMethod(), ThreePointCentralDifferenceMethod(), 1e-4
    )
    max_err = 0.0
    for p in (2.0, 3.5, 5.0):
        ic = prml.MarginalBetaProductInitialCondition(cp, [[(p, p)]])
        ivp = prml.InitialValueProblem(cp, t_interval, ic)
        fdm_y = fdm.solve(ivp).discrete_y(True)
        piml_y = piml.solve(ivp).discrete_y(True)
        stride = len(fdm_y) // len(piml_y)
        max_err = max(
            max_err,
            float(np.max(np.abs(piml_y - fdm_y[stride - 1 :: stride]))),
        )
    log(
        f"pinn quality ({epochs}-epoch asset): final loss "
        f"{final_loss:.3e}, max solution err vs FDM fine {max_err:.3e}"
    )
    return {"final_loss": final_loss, "solution_max_err": max_err}


def bench_fcf(timer):
    """Classic vs FCF Parareal relaxation, iterations-to-tolerance and
    wall time, on a configuration where the correction schedule is the
    deciding factor: a Crank-Nicolson coarse operator at d_t = 0.5 —
    A-stable but badly inaccurate (its amplification of the grid's
    stiff modes approaches -1, so slice jumps carry large oscillatory
    errors). Measured on this config (f32): classic Parareal's
    corrections transiently AMPLIFY the oscillatory error (max diff
    grows past 1e3) and only the k = n exactness property rescues it
    at 8 iterations, while FCF's extra fine sweep damps each
    correction before the next coarse sweep and reaches tolerance in
    3. Two caveats the study makes explicit rather than hiding: with a
    strongly dissipative coarse operator (backward Euler at the same
    step) FCF stagnates below the termination threshold while still
    ~1.7 off the fine solution, and with an unstable coarse operator
    FCF's 2-slices-per-iteration exactness holds in f64 (converges in
    ONE iteration where classic needs 7) but is destroyed by amplified
    rounding in f32. Iteration counts are found by stepping
    ``max_iterations`` until the result stops changing (the compiled
    program early-exits on the shared RMS termination criterion)."""
    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        CrankNicolsonMethod,
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.operators.parareal import PararealOperator

    t_end = 4.0
    ivp = build_problem(vars(prml), t_end)
    cp = ivp.constrained_problem
    y_0 = jnp.asarray(ivp.initial_condition.discrete_y_0(True))
    f = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), FINE_D_T
    )
    g = FDMOperator(
        CrankNicolsonMethod(), ThreePointCentralDifferenceMethod(), 0.5
    )
    n_slices = 8
    tolerance = 0.01
    fine_fn = jax.jit(
        f.trajectory_function(cp, (0.0, t_end), allow_fused=False)[0]
    )
    fine_ref = fine_fn(y_0, 0.0)

    results = {}
    for relaxation in ("f", "fcf"):
        diffs = []
        for k in range(1, n_slices + 1):
            p = PararealOperator(
                f,
                g,
                tolerance,
                num_time_slices=n_slices,
                max_iterations=k,
                relaxation=relaxation,
            )
            fn, _ = p.trajectory_function(cp, (0.0, t_end))
            diffs.append(
                float(
                    jnp.max(
                        jnp.abs(
                            fn(y_0, jnp.asarray(0.0, y_0.dtype))
                            - fine_ref
                        )
                    )
                )
            )
            if len(diffs) > 1 and diffs[-1] == diffs[-2]:
                break
        converged_early = len(diffs) > 1 and diffs[-1] == diffs[-2]
        iterations = (
            len(diffs) - 1 if converged_early else len(diffs)
        )
        p = PararealOperator(
            f,
            g,
            tolerance,
            num_time_slices=n_slices,
            max_iterations=n_slices,
            relaxation=relaxation,
        )
        fn, _ = p.trajectory_function(cp, (0.0, t_end))

        def solve(y):
            return fn(y, jnp.asarray(0.0, y.dtype))

        elapsed = timer.time_chained(solve, y_0, 32)
        results[relaxation] = {
            "iterations_to_tolerance": iterations,
            "time_s": elapsed,
            "max_diff_vs_fine": diffs[-1],
        }
        log(
            f"fcf-study {relaxation}: converged in {iterations} "
            f"iterations, {elapsed * 1e3:.2f}ms, max diff "
            f"{diffs[-1]:.3e}"
        )
    return results


def measure_device_profile(fn, *args):
    """Captures a ``jax.profiler`` trace of one ``fn(*args)`` run and
    returns measured on-device stats: the Pallas kernel's device time
    (the longest custom-call event) and the trajectory-epilogue copy's
    device time and achieved HBM GB/s (its ``bytes_accessed`` comes
    from XLA's cost model of the fusion — a pure HBM stream, so its
    rate is a direct measurement of attainable bandwidth). Returns None
    when the environment yields no parseable trace."""
    import glob
    import gzip
    import json
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as directory:
            jax.profiler.start_trace(directory)
            try:
                float(fn(*args))
            finally:
                jax.profiler.stop_trace()
            paths = glob.glob(
                directory + "/**/*.trace.json.gz", recursive=True
            )
            if not paths:
                return None
            with gzip.open(paths[0]) as f:
                events = json.load(f).get("traceEvents", [])
    except Exception as error:
        log(f"profiler trace unavailable: {error!r}")
        return None

    kernel_s = 0.0
    epilogue_s = epilogue_bytes = 0.0
    for event in events:
        if event.get("ph") != "X":
            continue
        event_args = event.get("args") or {}
        duration_ps = float(event_args.get("device_duration_ps", 0))
        if duration_ps <= 0:
            continue
        if event_args.get("hlo_category") == "custom-call":
            kernel_s = max(kernel_s, duration_ps * 1e-12)
        bytes_accessed = float(event_args.get("bytes_accessed", 0))
        if (
            event_args.get("hlo_category") == "loop fusion"
            and bytes_accessed > epilogue_bytes
        ):
            epilogue_bytes = bytes_accessed
            epilogue_s = duration_ps * 1e-12
    if kernel_s == 0.0:
        return None
    return {
        "kernel_device_s": kernel_s,
        "epilogue_copy_s": epilogue_s,
        "epilogue_copy_gb_s": (
            epilogue_bytes / epilogue_s / 1e9 if epilogue_s else None
        ),
    }


def bench_large_grid(timer):
    """Fused kernel (f32 and bf16 trajectory storage) vs generic path
    at 641x641, with HBM traffic accounting.

    Since round 4 this grid takes the VMEM-resident kernel
    (ops/resident_diffusion.py): the state never round-trips through
    HBM, so the only DMA traffic is the per-step trajectory write and
    the kernel is bound by VPU compute, not bandwidth. Two bandwidth
    figures are reported: ``hbm_peak_fraction`` keeps round 3's
    streaming-kernel traffic model (halo'd read + state write + traj
    write per step) as the series-comparable EFFECTIVE bandwidth — the
    rate a streaming kernel would need to match the measured wall time
    — and ``actual_dma_*`` carries the honest traffic the resident
    kernel really moves. bf16 trajectory storage costs no wall time in
    this compute-bound regime (Mosaic has no sub-32-bit VPU rotates,
    so compute stays f32 either way); its value is the error: rounding
    only the stored snapshots collapses the round-3 accumulated bf16
    drift (2.3e-2) to a single rounding (~2e-3)."""
    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.ops.resident_diffusion import (
        make_resident_plan,
    )
    from pararealml_tpu.ops.tiled_diffusion import make_tile_plan

    n = 641
    # long enough that the work dwarfs the tunnel round-trip variance
    steps = 2000
    d_t = 1e-4
    ivp = build_problem(
        vars(prml), steps * d_t, d_x=10.0 / (n - 1), d=0.05
    )
    cp = ivp.constrained_problem
    y_0 = jnp.asarray(
        np.asarray(ivp.initial_condition.discrete_y_0(True), np.float32)
    )

    fused_op = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), d_t
    )
    bf16_op = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), d_t,
        kernel_storage_dtype=jnp.bfloat16,
    )
    generic_op = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), d_t,
        fused_kernels=False,
    )
    horizon = (0.0, steps * d_t)
    fused_fn, _ = fused_op.trajectory_function(cp, horizon)
    bf16_fn, _ = bf16_op.trajectory_function(cp, horizon)
    generic_fn, _ = generic_op.trajectory_function(cp, horizon)
    fused_scalar = jax.jit(lambda y: jnp.sum(fused_fn(y, 0.0)[-1]))
    bf16_scalar = jax.jit(lambda y: jnp.sum(bf16_fn(y, 0.0)[-1]))
    generic_scalar = jax.jit(lambda y: jnp.sum(generic_fn(y, 0.0)[-1]))

    # chained windows amortize the tunnel's noisy ~25-35 ms host
    # round-trip, which is the same order as the ~24 ms solve
    fused_time = timer.time_chained(
        lambda y: fused_fn(y, 0.0), y_0, 8
    )
    bf16_time = timer.time_chained(lambda y: bf16_fn(y, 0.0), y_0, 8)
    generic_time = timer.time(generic_scalar, y_0)
    bf16_err_fn = jax.jit(
        lambda y: jnp.max(jnp.abs(bf16_fn(y, 0.0)[-1] - fused_fn(y, 0.0)[-1]))
        / jnp.max(jnp.abs(fused_fn(y, 0.0)[-1]))
    )
    bf16_rel_err = float(bf16_err_fn(y_0))

    def modeled_gb_s(elapsed, sublane, bytes_per):
        plan = make_tile_plan(n, n, sublane)
        # round 3's streaming-kernel traffic model: halo'd read +
        # state write + traj write per step (the EFFECTIVE bandwidth a
        # streaming kernel would need to match this wall time)
        traffic = steps * n * n * bytes_per * (
            plan.tile_h / plan.block + 2.0
        )
        return traffic / elapsed / 1e9

    resident_plan = make_resident_plan(n, n)

    def actual_dma_gb_s(elapsed, bytes_per):
        # the resident kernel's real traffic: one padded-grid
        # trajectory write per step (plus one initial-state read)
        cells = (
            resident_plan.h_pad * resident_plan.w_pad
            if resident_plan is not None
            else n * n
        )
        return (steps + 1) * cells * bytes_per / elapsed / 1e9

    achieved_gb_s = modeled_gb_s(fused_time, 8, 4)
    bf16_gb_s = modeled_gb_s(bf16_time, 16, 2)
    actual_gb_s = actual_dma_gb_s(fused_time, 4)
    log(
        f"large grid {n}x{n}, {steps} steps (VMEM-resident kernel): "
        f"fused f32 {fused_time:.3f}s (effective "
        f"{achieved_gb_s:.0f} GB/s = "
        f"{achieved_gb_s / V5E_HBM_PEAK_GB_S:.1%} of v5e peak over the "
        "round-3 streaming traffic model; actual DMA "
        f"{actual_gb_s:.0f} GB/s - compute-bound), "
        f"bf16 snapshots {bf16_time:.3f}s "
        f"({fused_time / bf16_time:.2f}x over f32, last-step rel err "
        f"{bf16_rel_err:.1e}), generic {generic_time:.3f}s "
        f"-> {generic_time / fused_time:.2f}x"
    )

    # measured (profiler-trace) on-device figures alongside the model
    profile = measure_device_profile(fused_scalar, y_0)
    measured_kernel_gb_s = None
    measured_actual_dma_gb_s = None
    if profile is not None:
        plan = make_tile_plan(n, n, 8)
        kernel_traffic = steps * n * n * 4 * (
            plan.tile_h / plan.block + 2.0
        )
        measured_kernel_gb_s = (
            kernel_traffic / profile["kernel_device_s"] / 1e9
        )
        measured_actual_dma_gb_s = actual_dma_gb_s(
            profile["kernel_device_s"], 4
        )
        epilogue_gb_s = profile["epilogue_copy_gb_s"]
        # the round-3 wrapper reordering (reshape the contiguous kernel
        # output, slice last) eliminated the full-trajectory epilogue
        # copy for slice-consuming programs like this one, so the
        # largest remaining fusion should be a negligible sliver — call
        # it out either way
        significant = (
            epilogue_gb_s
            and profile["epilogue_copy_s"]
            > 0.05 * profile["kernel_device_s"]
        )
        epilogue_note = (
            f"trajectory epilogue copy "
            f"{profile['epilogue_copy_s'] * 1e3:.1f}ms at "
            f"{epilogue_gb_s:.0f} GB/s "
            f"({epilogue_gb_s / V5E_HBM_PEAK_GB_S:.0%} of peak - the "
            "attainable-HBM yardstick)"
            if significant
            else (
                "trajectory epilogue copy eliminated (largest "
                "non-kernel fusion "
                f"{profile['epilogue_copy_s'] * 1e3:.1f}ms)"
                if epilogue_gb_s
                else "no epilogue-copy event in trace"
            )
        )
        log(
            "large grid measured on-device: kernel "
            f"{profile['kernel_device_s'] * 1e3:.1f}ms "
            f"({measured_kernel_gb_s:.0f} GB/s over modeled traffic), "
            + epilogue_note
        )
    return {
        "fused_speedup_vs_generic": generic_time / fused_time,
        "achieved_hbm_gb_s": achieved_gb_s,
        "hbm_peak_fraction": achieved_gb_s / V5E_HBM_PEAK_GB_S,
        "actual_dma_gb_s": actual_gb_s,
        "actual_dma_peak_fraction": actual_gb_s / V5E_HBM_PEAK_GB_S,
        "kernel_regime": (
            "vmem_resident_compute_bound"
            if resident_plan is not None
            else "hbm_streaming"
        ),
        "measured_actual_dma_gb_s": measured_actual_dma_gb_s,
        "fused_time_s": fused_time,
        "bf16_time_s": bf16_time,
        "bf16_speedup_vs_f32": fused_time / bf16_time,
        "bf16_hbm_gb_s": bf16_gb_s,
        "bf16_rel_err_vs_f32": bf16_rel_err,
        "generic_time_s": generic_time,
        "measured_kernel_device_s": (
            profile["kernel_device_s"] if profile else None
        ),
        "measured_kernel_hbm_gb_s": measured_kernel_gb_s,
        "measured_epilogue_copy_s": (
            profile["epilogue_copy_s"] if profile else None
        ),
        "measured_epilogue_copy_gb_s": (
            profile["epilogue_copy_gb_s"] if profile else None
        ),
    }


def bench_streaming(timer):
    """The HBM-streaming tiled pipeline where bandwidth can actually
    bind: 2049x2049, past the VMEM-resident kernel's range
    (``make_resident_plan`` returns None), so every step round-trips
    the state through HBM (ops/tiled_diffusion.py).

    Measured v5e facts this section records (post ghost-fold):

    - f32 single-step pipeline moves its honest traffic (12 halo'd
      tile reads + state write + trajectory write per step) at ~500
      GB/s = ~62% of the chip's 819 GB/s peak while fully overlapping
      it under compute.
    - ``temporal_block=2`` halves the state stream at zero extra halo
      recompute (the 8-row f32 halo already covers two steps' stencil
      creep) and is the wall-clock champion; deeper blocks lose to
      halo recompute because the pipeline is VPU-bound, not DMA-bound.
    - bf16 storage does NOT pay wall-clock here (~1.03x): Mosaic has
      no sub-32-bit VPU rotates so compute stays f32 and compute is
      the binding resource. Its value at this scale is HBM *capacity*
      (a bf16 trajectory halves the footprint, doubling the horizon
      that fits) — the kernel docstring says exactly this.
    """
    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )
    from pararealml_tpu.ops.resident_diffusion import make_resident_plan
    from pararealml_tpu.ops.tiled_diffusion import (
        _MAX_TILE_ELEMS,
        _MAX_TILE_ELEMS_BLOCKED,
        make_tile_plan,
        resolve_temporal_block,
    )

    n = 2049
    steps = 192
    d_t = 1e-5
    ivp = build_problem(
        vars(prml), steps * d_t, d_x=10.0 / (n - 1), d=0.05
    )
    cp = ivp.constrained_problem
    assert make_resident_plan(n, n) is None  # truly streaming regime
    y_0 = jnp.asarray(
        np.asarray(ivp.initial_condition.discrete_y_0(True), np.float32)
    )
    horizon = (0.0, steps * d_t)

    def measure(**kwargs):
        op = FDMOperator(
            RK4(), ThreePointCentralDifferenceMethod(), d_t, **kwargs
        )
        fn, _ = op.trajectory_function(cp, horizon)
        elapsed = timer.time_chained(lambda y: fn(y, 0.0), y_0, 4)
        block = resolve_temporal_block(
            cp,
            steps,
            kwargs.get("kernel_temporal_block", 1),
            storage_dtype=kwargs.get("kernel_storage_dtype"),
            traj_dtype=kwargs.get("kernel_traj_dtype"),
        )
        storage = jnp.dtype(
            kwargs.get("kernel_storage_dtype") or jnp.float32
        )
        traj = jnp.dtype(
            (kwargs.get("kernel_traj_dtype") if block > 1 else None)
            or storage
        )
        f32 = jnp.dtype(jnp.float32)
        sublane = 8 if storage == f32 and traj == f32 else 16
        plan = make_tile_plan(
            n,
            n,
            sublane,
            block,
            max_tile_elems=(
                _MAX_TILE_ELEMS if block == 1 else _MAX_TILE_ELEMS_BLOCKED
            ),
        )
        # honest traffic: per residency every tile reads tile_h rows
        # and writes block rows of state (once per temporal block),
        # plus one trajectory snapshot write per step
        state_bytes = (
            (steps // block)
            * plan.n_tiles
            * (plan.tile_h + plan.block)
            * plan.w_pad
            * storage.itemsize
        )
        traj_bytes = steps * plan.h_traj * plan.w_pad * traj.itemsize
        gb_s = (state_bytes + traj_bytes) / elapsed / 1e9
        return elapsed, gb_s, fn

    f32_time, f32_gb_s, f32_fn = measure()
    blocked_time, blocked_gb_s, _ = measure(kernel_temporal_block=2)
    bf16_time, bf16_gb_s, bf16_fn = measure(
        kernel_storage_dtype=jnp.bfloat16, kernel_temporal_block=2
    )
    rel_err_fn = jax.jit(
        lambda y: jnp.max(
            jnp.abs(bf16_fn(y, 0.0)[-1] - f32_fn(y, 0.0)[-1])
        )
        / jnp.max(jnp.abs(f32_fn(y, 0.0)[-1]))
    )
    bf16_rel_err = float(rel_err_fn(y_0))
    log(
        f"streaming {n}x{n}, {steps} steps: f32 tb=1 {f32_time:.3f}s "
        f"({f32_gb_s:.0f} GB/s honest = "
        f"{f32_gb_s / V5E_HBM_PEAK_GB_S:.1%} of peak), f32 tb=2 "
        f"{blocked_time:.3f}s ({f32_time / blocked_time:.2f}x), bf16 "
        f"tb=2 {bf16_time:.3f}s ({blocked_time / bf16_time:.2f}x vs "
        f"f32 tb=2, rel err {bf16_rel_err:.1e}) - VPU-bound regime, "
        "bf16 trades no wall time and halves HBM footprint"
    )
    return {
        "grid": n,
        "steps": steps,
        "f32_time_s": f32_time,
        "f32_gb_s": f32_gb_s,
        "f32_peak_fraction": f32_gb_s / V5E_HBM_PEAK_GB_S,
        "blocked_time_s": blocked_time,
        "blocked_gb_s": blocked_gb_s,
        "blocked_speedup_vs_f32": f32_time / blocked_time,
        "bf16_time_s": bf16_time,
        "bf16_speedup_vs_f32_blocked": blocked_time / bf16_time,
        "bf16_rel_err": bf16_rel_err,
    }


def bench_roofline(timer, large, streaming):
    """FLOP/byte/MFU accounting for the hot kernels against the v5e
    peaks, so every "X-bound" claim in this file is falsifiable.

    - ``propagator``: the affine-propagator GEMM chain — a dependent
      sequence of ``(steps, state) @ (state, state)`` matmuls, the
      exact shape Parareal's log-depth trajectory expansion and
      affine coarse sweeps ride (ops/linear_propagator.py). MFU is
      quoted against the 197 TFLOP/s bf16 MXU peak (XLA's DEFAULT f32
      matmul precision is one bf16 pass, so f32 GEMMs share it).
    - ``resident``/``streaming``: the stencil trajectory kernels. The
      FLOP model counts the Horner-RK4 arithmetic actually executed
      per padded cell per step (4 stages x [2 fold muls + 3 neighbor
      adds + 1 tap scale + 1 center FMA(2) + 1 mask mul + 1 state
      add] = 40 FLOPs); the issue-slot model adds the 4 ``pltpu.roll``
      data movements per stage (56 slots) since rolls occupy the VPU
      without doing arithmetic. The verdict each round: which of
      VPU issue, HBM DMA, and loop latency binds.
    """
    import jax
    import jax.numpy as jnp

    chain = 64
    m, state = 40000, 441
    key = jax.random.PRNGKey(0)
    # near-identity propagator keeps the chain numerically tame
    w32 = (
        jnp.eye(state, dtype=jnp.float32)
        + 1e-4 * jax.random.normal(key, (state, state), jnp.float32)
    )
    a32 = jax.random.normal(key, (m, state), jnp.float32)

    def chain_fn(w):
        def run(a):
            def body(carry, _):
                return carry @ w, ()

            out, _ = jax.lax.scan(body, a, None, length=chain)
            return out

        return run

    # time_chained (16 solves inside one program) — a single ~5 ms
    # GEMM chain is smaller than this environment's host<->device
    # round-trip scatter, so one-shot timing is noise-dominated
    flops = 2.0 * m * state * state * chain
    t_f32 = timer.time_chained(chain_fn(w32), a32, 16)
    tflops_f32 = flops / t_f32 / 1e12
    t_bf16 = timer.time_chained(
        chain_fn(w32.astype(jnp.bfloat16)),
        a32.astype(jnp.bfloat16),
        16,
    )
    tflops_bf16 = flops / t_bf16 / 1e12
    mfu_f32 = tflops_f32 / V5E_MXU_BF16_PEAK_TFLOPS
    mfu_bf16 = tflops_bf16 / V5E_MXU_BF16_PEAK_TFLOPS
    log(
        f"roofline propagator GEMM chain ({m}x{state} @ "
        f"{state}x{state}, {chain} deep): f32-default "
        f"{tflops_f32:.1f} TFLOP/s (MFU {mfu_f32:.1%}), bf16 "
        f"{tflops_bf16:.1f} TFLOP/s (MFU {mfu_bf16:.1%}); "
        f"{state}-dim state pads to 512 so the layout ceiling is "
        f"{(state / 512) ** 2:.0%}"
    )

    flops_per_cell_step = 40.0
    slots_per_cell_step = 56.0

    def stencil_entry(label, cells, steps, elapsed, dma_bytes):
        tflops = cells * steps * flops_per_cell_step / elapsed / 1e12
        issue = cells * steps * slots_per_cell_step / elapsed / 1e12
        dma_gb_s = dma_bytes / elapsed / 1e9
        vpu_frac = issue / V5E_VPU_PEAK_TOPS
        hbm_frac = dma_gb_s / V5E_HBM_PEAK_GB_S
        us_per_step = elapsed / steps * 1e6
        verdict = (
            "vpu-issue-bound"
            if vpu_frac >= 2.0 * hbm_frac
            else ("hbm-bound" if hbm_frac >= 2.0 * vpu_frac else "mixed")
        )
        log(
            f"roofline {label}: {tflops:.2f} TFLOP/s arithmetic "
            f"({tflops / V5E_VPU_PEAK_TOPS:.0%} of VPU peak), "
            f"{issue:.2f} T issue-slots/s ({vpu_frac:.0%}), DMA "
            f"{dma_gb_s:.0f} GB/s ({hbm_frac:.0%}), "
            f"{us_per_step:.1f} us/step -> {verdict}"
        )
        return {
            "tflops": tflops,
            "vpu_issue_fraction": vpu_frac,
            "hbm_fraction": hbm_frac,
            "verdict": verdict,
        }

    from pararealml_tpu.ops.resident_diffusion import make_resident_plan
    from pararealml_tpu.ops.tiled_diffusion import make_tile_plan

    plan_641 = make_resident_plan(641, 641)
    resident = stencil_entry(
        "resident 641^2",
        plan_641.h_pad * plan_641.w_pad,
        2000,
        large["fused_time_s"],
        # resident kernel's only HBM traffic: one padded trajectory
        # write per step plus the initial read
        2001 * plan_641.h_pad * plan_641.w_pad * 4,
    )
    plan_2049 = make_tile_plan(2049, 2049, 8)
    streaming_entry = stencil_entry(
        "streaming 2049^2 (tb=1)",
        plan_2049.n_tiles * plan_2049.tile_h * plan_2049.w_pad,
        streaming["steps"],
        streaming["f32_time_s"],
        streaming["f32_gb_s"] * streaming["f32_time_s"] * 1e9,
    )
    return {
        "propagator_tflops_f32": tflops_f32,
        "propagator_mfu_f32": mfu_f32,
        "propagator_tflops_bf16": tflops_bf16,
        "propagator_mfu_bf16": mfu_bf16,
        "resident": resident,
        "streaming": streaming_entry,
    }


def bench_3d(timer):
    """Fused 3D kernel vs the generic path on a 21^3 Cartesian viscous
    Burgers configuration (the fused 3D kernels' benchmark problem;
    the burgers_3d example itself reproduces the reference's spherical
    configuration, which runs on the generic path)."""
    import jax
    import jax.numpy as jnp

    import pararealml_tpu as prml
    from pararealml_tpu.operators.fdm import (
        FDMOperator,
        RK4,
        ThreePointCentralDifferenceMethod,
    )

    n_comp, d_t, steps = 3, 0.01, 2000
    mesh = prml.Mesh([(0.0, 5.0)] * 3, [0.25] * 3)
    bcs = [
        (
            prml.NeumannBoundaryCondition(
                lambda x, t: np.zeros((len(x), n_comp)),
                is_static=True,
            ),
        )
        * 2
    ] * 3
    cp = prml.ConstrainedProblem(
        prml.BurgersEquation(3, 100.0), mesh, bcs
    )
    ic = prml.GaussianInitialCondition(
        cp,
        [(np.full(3, 2.5), 0.5 * np.eye(3))] * n_comp,
        [1.0, 0.0, 0.0],
    )
    y_0 = jnp.asarray(
        np.asarray(ic.discrete_y_0(True), np.float32)
    )
    horizon = (0.0, steps * d_t)
    fused_fn, _ = FDMOperator(
        RK4(), ThreePointCentralDifferenceMethod(), d_t
    ).trajectory_function(cp, horizon)
    generic_fn, _ = FDMOperator(
        RK4(),
        ThreePointCentralDifferenceMethod(),
        d_t,
        fused_kernels=False,
    ).trajectory_function(cp, horizon)
    fused_time = timer.time(
        jax.jit(lambda y: jnp.sum(fused_fn(y, 0.0)[-1])), y_0
    )
    generic_time = timer.time(
        jax.jit(lambda y: jnp.sum(generic_fn(y, 0.0)[-1])), y_0
    )
    log(
        f"burgers 3d 21^3, {steps} steps: fused {fused_time:.4f}s "
        f"generic {generic_time:.4f}s "
        f"-> {generic_time / fused_time:.2f}x"
    )
    return generic_time / fused_time


def bench_reference_fine() -> float:
    """Times the reference implementation's fine solve on the same
    problem at the FULL horizon (earlier rounds extrapolated linearly
    from T=4; a one-off full-length confirmation measured 21.6s vs the
    11.6s linear extrapolation — the reference's per-step cost grows
    with its t-keyed caches — so the full run is now measured
    directly)."""
    if not hasattr(np, "product"):
        np.product = np.prod  # the reference targets an older numpy
    sys.path.insert(0, "/root/reference")
    try:
        import pararealml as ref

        namespace = dict(vars(ref))
        from pararealml.operators.fdm import (
            FDMOperator as RefFDMOperator,
            RK4 as RefRK4,
            ThreePointCentralDifferenceMethod as RefDiff,
        )

        ivp = build_problem(namespace, T_END)
        op = RefFDMOperator(RefRK4(), RefDiff(), FINE_D_T)
        start = time.perf_counter()
        op.solve(ivp)
        elapsed = time.perf_counter() - start
        log(f"reference fine solve: {elapsed:.3f}s for T={T_END}")
        return elapsed
    except Exception as error:  # reference not mounted / incompatible
        log(f"reference benchmark unavailable: {error!r}")
        return float("nan")
    finally:
        sys.path.remove("/root/reference")


def main():
    # backend-init watchdog: the remote-TPU tunnel in this environment
    # can wedge, in which case jax.devices() blocks forever and no
    # result line would ever be recorded. If the backend is not up
    # within the timeout, emit a diagnostic JSON line (value 0, with
    # extra.error explaining why) so the failure is attributable,
    # then exit.
    import os
    import threading

    backend_ready = threading.Event()

    def watchdog():
        if backend_ready.wait(timeout=600.0):
            return
        print(
            json.dumps(
                {
                    "metric": (
                        "parareal_speedup_vs_fused_fine"
                        "_fdm_diffusion_2d"
                    ),
                    "value": 0.0,
                    "unit": "x",
                    "vs_baseline": 0.0,
                    "extra": {
                        "error": (
                            "TPU backend initialization timed out "
                            "after 600s (device tunnel unavailable); "
                            "no measurement was possible"
                        )
                    },
                }
            ),
            flush=True,
        )
        os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()

    import jax

    n_devices = jax.device_count()
    backend_ready.set()
    log(f"devices: {n_devices} ({jax.devices()[0].platform})")
    timer = DeviceTimer()

    parareal = bench_parareal(timer)
    sml = bench_sml_coarse_parareal(
        timer, parareal["fused_fine_time_s"]
    )
    nonlinear = bench_nonlinear_sml(timer)
    large = bench_large_grid(timer)
    streaming = bench_streaming(timer)
    roofline = bench_roofline(timer, large, streaming)
    burgers_3d = bench_3d(timer)
    pinn = bench_pinn(timer)
    fcf = bench_fcf(timer)
    ref_time = bench_reference_fine()

    extra = {
        "devices": n_devices,
        "n_time_slices": parareal["best_n_slices"],
        "coarse_d_t": parareal["best_coarse_d_t"],
        "fine_fdm_speedup_vs_reference_numpy": (
            round(ref_time / parareal["fine_time_s"], 3)
            if np.isfinite(ref_time)
            else None
        ),
        "sequential_fine_time_s": round(parareal["fine_time_s"], 4),
        "fused_sequential_fine_time_s": round(
            parareal["fused_fine_time_s"], 4
        ),
        "parareal_time_s": round(parareal["parareal_time_s"], 5),
        "parareal_max_diff_vs_fine": parareal["max_diff_vs_fine"],
        "parareal_speedup_vs_generic_fine": round(
            parareal["speedup_vs_generic_fine"], 3
        ),
        "parareal_speedup_8_slices_reference_config": round(
            parareal["speedup_8_slices_reference_config"], 3
        ),
        "sml_coarse_parareal_speedup": round(
            sml["speedup_vs_fused_fine"], 3
        ),
        "sml_coarse_parareal_time_s": round(sml["time_s"], 5),
        "sml_coarse_parareal_max_diff_vs_fine": sml[
            "max_diff_vs_fine"
        ],
        "sml_deeponet_parareal_speedup": round(
            sml["deeponet"]["speedup_vs_fused_fine"], 3
        ),
        "sml_deeponet_parareal_time_s": round(
            sml["deeponet"]["time_s"], 5
        ),
        "sml_deeponet_parareal_max_diff_vs_fine": sml["deeponet"][
            "max_diff_vs_fine"
        ],
        "sml_nonlinear_parareal_speedup": round(
            nonlinear["speedup_vs_fused_fine"], 3
        ),
        "sml_nonlinear_parareal_time_s": round(
            nonlinear["time_s"], 5
        ),
        "sml_nonlinear_parareal_max_diff_vs_fine": nonlinear[
            "max_diff_vs_fine"
        ],
        "sml_nonlinear_parareal_speedup_robust": round(
            nonlinear["robust_speedup_vs_fused_fine"], 3
        ),
        "sml_nonlinear_parareal_max_diff_robust": nonlinear[
            "robust_max_diff_vs_fine"
        ],
        "sml_nonlinear_fused_fine_time_s": round(
            nonlinear["fused_fine_time_s"], 5
        ),
        "sml_nonlinear_n_time_slices": nonlinear["n_time_slices"],
        "sml_nonlinear_quad_rank": nonlinear["quad_rank"],
        "large_grid_fused_speedup_vs_generic": round(
            large["fused_speedup_vs_generic"], 3
        ),
        "large_grid_achieved_hbm_gb_s": round(
            large["achieved_hbm_gb_s"], 1
        ),
        "large_grid_hbm_peak_fraction": round(
            large["hbm_peak_fraction"], 4
        ),
        "large_grid_actual_dma_gb_s": round(
            large["actual_dma_gb_s"], 1
        ),
        "large_grid_actual_dma_peak_fraction": round(
            large["actual_dma_peak_fraction"], 4
        ),
        "large_grid_kernel_regime": large["kernel_regime"],
        "large_grid_bf16_speedup_vs_f32": round(
            large["bf16_speedup_vs_f32"], 3
        ),
        "large_grid_bf16_hbm_gb_s": round(large["bf16_hbm_gb_s"], 1),
        "large_grid_bf16_rel_err_vs_f32": large["bf16_rel_err_vs_f32"],
        "large_grid_measured_kernel_device_s": (
            round(large["measured_kernel_device_s"], 4)
            if large["measured_kernel_device_s"]
            else None
        ),
        "large_grid_measured_kernel_hbm_gb_s": (
            round(large["measured_kernel_hbm_gb_s"], 1)
            if large["measured_kernel_hbm_gb_s"]
            else None
        ),
        "large_grid_measured_actual_dma_gb_s": (
            round(large["measured_actual_dma_gb_s"], 1)
            if large["measured_actual_dma_gb_s"]
            else None
        ),
        "large_grid_measured_epilogue_copy_gb_s": (
            round(large["measured_epilogue_copy_gb_s"], 1)
            if large["measured_epilogue_copy_gb_s"]
            else None
        ),
        "streaming_grid": streaming["grid"],
        "streaming_f32_time_s": round(streaming["f32_time_s"], 5),
        "streaming_f32_gb_s": round(streaming["f32_gb_s"], 1),
        "streaming_f32_peak_fraction": round(
            streaming["f32_peak_fraction"], 4
        ),
        "streaming_blocked_speedup_vs_f32": round(
            streaming["blocked_speedup_vs_f32"], 3
        ),
        "streaming_bf16_speedup_vs_f32_blocked": round(
            streaming["bf16_speedup_vs_f32_blocked"], 3
        ),
        "streaming_bf16_rel_err": streaming["bf16_rel_err"],
        "roofline_propagator_tflops_f32": round(
            roofline["propagator_tflops_f32"], 2
        ),
        "roofline_propagator_mfu_f32": round(
            roofline["propagator_mfu_f32"], 4
        ),
        "roofline_propagator_tflops_bf16": round(
            roofline["propagator_tflops_bf16"], 2
        ),
        "roofline_propagator_mfu_bf16": round(
            roofline["propagator_mfu_bf16"], 4
        ),
        "roofline_resident_tflops": round(
            roofline["resident"]["tflops"], 3
        ),
        "roofline_resident_vpu_issue_fraction": round(
            roofline["resident"]["vpu_issue_fraction"], 4
        ),
        "roofline_resident_hbm_fraction": round(
            roofline["resident"]["hbm_fraction"], 4
        ),
        "roofline_resident_verdict": roofline["resident"]["verdict"],
        "roofline_streaming_tflops": round(
            roofline["streaming"]["tflops"], 3
        ),
        "roofline_streaming_vpu_issue_fraction": round(
            roofline["streaming"]["vpu_issue_fraction"], 4
        ),
        "roofline_streaming_hbm_fraction": round(
            roofline["streaming"]["hbm_fraction"], 4
        ),
        "roofline_streaming_verdict": roofline["streaming"]["verdict"],
        "burgers_3d_fused_speedup_vs_generic": round(burgers_3d, 3),
        "pinn_train_epochs_per_s": round(
            pinn["train_epochs_per_s"], 2
        ),
        "pinn_train_domain_points_per_s": round(
            pinn["train_domain_points_per_s"], 1
        ),
        "pinn_train_loss": pinn["train_loss"],
        "pinn_solve_time_s": round(pinn["solve_time_s"], 5),
        "pinn_solve_steps": pinn["solve_steps"],
        "pinn_final_loss": pinn.get("final_loss"),
        "pinn_solution_max_err": pinn.get("solution_max_err"),
        "fcf_classic_iterations": fcf["f"][
            "iterations_to_tolerance"
        ],
        "fcf_classic_time_s": round(fcf["f"]["time_s"], 5),
        "fcf_fcf_iterations": fcf["fcf"]["iterations_to_tolerance"],
        "fcf_fcf_time_s": round(fcf["fcf"]["time_s"], 5),
    }
    # the headline is the faster of the two measured decompositions;
    # since the log-depth trajectory expansion, that is usually the
    # reference example's own 8-slice configuration — the winning
    # configuration is recorded in the extras either way, and both
    # individual figures ride alongside it
    best = parareal["speedup_vs_fused_fine"]
    reference_config = parareal["speedup_8_slices_reference_config"]
    if reference_config > best:
        speedup = reference_config
        extra["n_time_slices"] = N_SLICES
        extra["coarse_d_t"] = COARSE_D_T
        extra["parareal_time_s"] = round(
            parareal["parareal_time_8_slices_s"], 5
        )
        extra["parareal_max_diff_vs_fine"] = parareal[
            "max_diff_vs_fine_8_slices"
        ]
    else:
        speedup = best
    extra["parareal_speedup_best_tuned_config"] = round(best, 3)
    suffix = "" if n_devices >= BEST_N_SLICES else "_single_chip_vmap"
    print(
        json.dumps(
            {
                "metric": "parareal_speedup_vs_fused_fine"
                f"_fdm_diffusion_2d{suffix}",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / 8.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
