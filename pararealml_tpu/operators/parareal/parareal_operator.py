"""Parallel-in-time solving with the Parareal algorithm on a device mesh.

Capability match for /root/reference/pararealml/operators/parareal/
parareal_operator.py:13-197, re-architected for TPU. The reference runs
one MPI rank per time slice and exchanges dense corrections with
``Allgather``; here the whole algorithm — initial coarse sweep, parallel
fine solves, correction ``all_gather``, replicated serial corrective
sweep, masked early termination — is **one jitted ``shard_map`` program**
over a 1D ``time`` axis of a ``jax.sharding.Mesh``. The fine solves are
the only sharded (per-device) work; the coarse sweeps are replicated on
every device exactly like the reference replicates them on every rank
(no communication needed); the only collective is one ``all_gather`` of
the per-slice corrections per iteration, riding ICI.

Early termination inside jit uses the reference's criterion (the maximum
per-component RMS of the border-point updates dropping below the
tolerance, parareal_operator.py:53-100) as a convergence flag gating the
loop body through ``lax.cond``, so converged iterations cost nothing but
the branch.

Operators that cannot express their solve as a pure jittable trajectory
function (or callable termination conditions) fall back to a host-driven
implementation with identical semantics.

Beyond the reference, ``relaxation="fcf"`` selects MGRIT-style FCF
relaxation: corrections are computed from fine-propagated states, so
exactness advances two time slices per iteration for one extra (equally
parallel) fine solve plus ``n`` parallel per-slice coarse solves per
iteration — fewer sequential coarse sweeps on the critical path when
fine solves are cheap relative to the sweep. Note that FCF's per-slice
coarse solves run on the vmappable generic path when slices are batched
per device, so its per-iteration cost exceeds classic Parareal's by
more than the extra fine solve alone.
"""

from __future__ import annotations

import sys
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from pararealml_tpu.initial_condition import DiscreteInitialCondition
from pararealml_tpu.initial_value_problem import InitialValueProblem
from pararealml_tpu.operator import (
    JaxOperator,
    Operator,
    discretize_time_domain,
)
from pararealml_tpu.solution import Solution
from pararealml_tpu.utils.distributed import time_mesh

TerminationCondition = Union[
    float, Sequence[float], Callable[[np.ndarray, np.ndarray], bool]
]


def make_rms_termination(tolerances):
    """Builds the traceable border-update termination predicate shared
    by the compiled Parareal programs: per-component RMS of the border
    updates, reduced over space, maxed over slices, compared against
    the per-component tolerances (the reference's criterion,
    /root/reference/pararealml/operators/parareal/
    parareal_operator.py:187-188). ``None`` tolerances disable early
    termination."""

    def termination(old_ends, new_ends):
        if tolerances is None:
            return jnp.asarray(False)
        diff = new_ends - old_ends
        reduce_axes = tuple(range(1, diff.ndim - 1))
        rms = jnp.sqrt(jnp.mean(jnp.square(diff), axis=reduce_axes))
        max_rms = jnp.max(rms, axis=0)
        return jnp.all(max_rms < jnp.asarray(tolerances, diff.dtype))

    return termination


class PararealOperator(JaxOperator):
    """A parallel-in-time solver framework composing a fine and a coarse
    operator over the slices of the time domain."""

    # sub-solves may use parallel-in-time trajectory formulations
    # (affine propagator matmuls, ops/linear_propagator.py) only when
    # every termination tolerance exceeds this floor: the dense-matmul
    # formulation carries an ~1e-6-relative f32 rounding floor vs the
    # stencil steppers, so users demanding tighter agreement (tolerance
    # 0.0 / None means "iterate to exactness") keep bitwise-stencil
    # fine solves
    _TIME_PARALLEL_TOLERANCE_FLOOR = 1e-5

    # vmap-batched sub-solves ride otherwise-idle vector lanes nearly
    # for free on small grids (measured: 200 batched 21x21 fine solves
    # cost about one generic solve), so the generic path wins there;
    # past roughly 128x128 grid points a single generic step already
    # saturates the VPU, batching scales linearly with the batch size,
    # and the hand-fused kernels' measured 2.5-20x per-solve advantage
    # dominates even though the Pallas batch grid advances slices
    # sequentially
    _SEQUENTIAL_FUSED_MIN_GRID_POINTS = 128 * 128

    def __init__(
        self,
        f: Operator,
        g: Operator,
        termination_condition: Optional[TerminationCondition] = None,
        max_iterations: int = sys.maxsize,
        num_time_slices: Optional[int] = None,
        devices: Optional[Sequence] = None,
        relaxation: str = "f",
        materialize: str = "final",
    ):
        """
        :param f: the fine (accurate, expensive) operator
        :param g: the coarse (cheap) operator
        :param termination_condition: a scalar update tolerance, a
            per-component sequence of tolerances, or a predicate over the
            (old, new) border-point estimates; ``None`` disables early
            termination
        :param max_iterations: cap on the number of corrective iterations
        :param num_time_slices: number of time slices; defaults to the
            number of devices (the reference hard-wires this to the MPI
            world size, parareal_operator.py:113)
        :param devices: the devices forming the ``time`` mesh axis;
            defaults to all visible devices
        :param relaxation: ``"f"`` for classic Parareal (one fine
            relaxation per iteration, the reference's schedule) or
            ``"fcf"`` for MGRIT-style FCF relaxation — the correction
            for border ``j + 1`` is computed from the fine-propagated
            state ``F(u_{j-1})`` instead of ``u_j``, so exactness
            advances two slices per iteration at the cost of a second
            (equally parallel) fine solve plus ``n`` parallel
            per-slice coarse solves per iteration (which run on the
            generic, non-fused path when slices are vmap-batched per
            device). Beyond the reference, which only implements
            classic Parareal.
        :param materialize: when and from which borders the returned
            fine trajectories are computed. ``"final"`` (default) runs
            the corrective loop on slice END states only and expands
            the trajectories once after convergence from the FINAL
            borders — most accurate, but the expansion is an extra
            full fine sweep on the critical path. ``"iteration"``
            materializes each iteration's fine sweep as full
            trajectories (the reference's own schedule,
            /root/reference/pararealml/operators/parareal/
            parareal_operator.py:163-193: it keeps the last
            iteration's ``sub_ys`` and shifts them), so a run that
            converges in ``k`` iterations performs exactly ``k`` fine
            sweeps with no final expansion — the fastest choice
            whenever convergence takes only a few iterations and the
            fine operator has no cheap end-state shortcut. Both modes
            shift slice trajectories onto the corrected borders;
            ``"iteration"`` trajectories start from one correction
            earlier (exactly the reference's accuracy). Falls back to
            ``"final"`` semantics for FCF relaxation and for fine
            operators exposing an affine end map (where end states
            are nearly free and trajectory expansion is cheaper kept
            off the iteration path).
        """
        if relaxation not in ("f", "fcf"):
            raise ValueError(
                f"unsupported relaxation '{relaxation}'; expected 'f' "
                "or 'fcf'"
            )
        if materialize not in ("final", "iteration"):
            raise ValueError(
                f"unsupported materialize '{materialize}'; expected "
                "'final' or 'iteration'"
            )
        super().__init__(f.d_t, f.vertex_oriented)
        self._f = f
        self._g = g
        self._termination_condition = termination_condition
        self._max_iterations = max_iterations
        self._devices = list(devices) if devices is not None else None
        self._num_time_slices = num_time_slices
        self._relaxation = relaxation
        self._materialize = materialize
        self._compiled_cache = {}

    @property
    def f(self) -> Operator:
        """The fine operator."""
        return self._f

    @property
    def g(self) -> Operator:
        """The coarse operator."""
        return self._g

    @property
    def relaxation(self) -> str:
        """The relaxation scheme: ``"f"`` (classic Parareal) or
        ``"fcf"`` (MGRIT-style, two slices of exactness per
        iteration)."""
        return self._relaxation

    # -- termination -------------------------------------------------------

    def _tolerance_vector(self, y_dimension: int) -> Optional[np.ndarray]:
        condition = self._termination_condition
        if condition is None or callable(condition):
            return None
        if isinstance(condition, (int, float)):
            return np.full(y_dimension, float(condition))
        if len(condition) != y_dimension:
            raise ValueError(
                f"length of update tolerances ({len(condition)}) must "
                f"match number of y dimensions ({y_dimension})"
            )
        return np.asarray(condition, dtype=float)

    def _use_time_parallel_trajectories(self, cp, y_0=None) -> bool:
        """Whether sub-solves may use parallel-in-time trajectory
        formulations (propagator matmuls): only when the user's
        termination tolerances all exceed the formulations' rounding
        floor, so tolerance-0/None runs keep stencil-exact solves.

        The floor is ~relative to the state magnitude while the
        termination tolerances are absolute RMS values, so when the
        initial state is available the floor is scaled by its largest
        magnitude — a large-amplitude problem demanding an absolute
        tolerance the f32 matmul formulation cannot reach keeps the
        stencil path instead of iterating forever."""
        tolerances = self._tolerance_vector(
            cp.differential_equation.y_dimension
        )
        if tolerances is None:
            return False
        floor = self._TIME_PARALLEL_TOLERANCE_FLOOR
        if y_0 is not None:
            scale = float(np.max(np.abs(np.asarray(y_0))))
            if np.isfinite(scale):
                floor = floor * max(1.0, scale)
        return bool(np.all(tolerances > floor))

    def _prefer_sequential_fused(self, cp) -> bool:
        """Whether vmap-batched sub-solves should instead run hand-fused
        kernels sequentially over the slice batch (Pallas batch grids
        for end states, ``lax.map`` for the final trajectories) — the
        grid-size heuristic documented at
        ``_SEQUENTIAL_FUSED_MIN_GRID_POINTS``."""
        if not cp.differential_equation.x_dimension:
            return False
        return (
            int(np.prod(cp.mesh.vertices_shape))
            >= self._SEQUENTIAL_FUSED_MIN_GRID_POINTS
        )

    def _should_terminate(
        self, old_y_end_points: np.ndarray, new_y_end_points: np.ndarray
    ) -> bool:
        """Host-path termination check mirroring the reference
        criterion."""
        condition = self._termination_condition
        if condition is None:
            return False
        if callable(condition):
            return bool(condition(old_y_end_points, new_y_end_points))

        tolerances = self._tolerance_vector(old_y_end_points.shape[-1])
        diff = new_y_end_points - old_y_end_points
        reduce_axes = tuple(range(1, diff.ndim - 1))
        rms = np.sqrt(np.square(diff).mean(axis=reduce_axes))
        return bool(np.all(rms.max(axis=0) < tolerances))

    # -- solving -----------------------------------------------------------

    def solve(
        self, ivp: InitialValueProblem, parallel_enabled: bool = True
    ) -> Solution:
        if not parallel_enabled:
            return self._f.solve(ivp)

        cp = ivp.constrained_problem
        n = self._num_time_slices
        if n is None:
            n = (
                len(self._devices)
                if self._devices is not None
                else jax.device_count()
            )
        t_interval = ivp.t_interval
        slice_duration = (t_interval[1] - t_interval[0]) / n
        self._validate_step_sizes(slice_duration)

        if self._can_compile(cp, n):
            return self._solve_compiled(ivp, n, slice_duration)
        return self._solve_host(ivp, n, slice_duration)

    def tune_num_time_slices(
        self,
        ivp: InitialValueProblem,
        candidates: Optional[Sequence[int]] = None,
        repeats: int = 3,
    ) -> int:
        """Empirically picks (and sets) the fastest time-slice count.

        The optimal decomposition depends on the hardware (dispatch
        latency, device count, how well vmap-batched fine solves fill
        a chip), not just on the math, so each candidate's compiled
        program is timed on one full solve of ``ivp`` — ``repeats``
        times after a compile warm-up, keeping the best (minimum) wall
        time. The winner is stored as this operator's
        ``num_time_slices`` and returned. The reference cannot tune
        this at all: its slice count is hard-wired to the MPI world
        size (/root/reference/pararealml/operators/parareal/
        parareal_operator.py:113).

        :param ivp: the problem to tune on
        :param candidates: slice counts to try; each must divide the
            fine/coarse step grids and be a multiple of the device
            count. Defaults to ``device_count * (1, 2, 5, 10, 25)``
            where compatible with the time interval.
        :param repeats: timed solves per candidate (best-of)
        :return: the fastest slice count
        """
        import time as _time

        n_devices = (
            len(self._devices)
            if self._devices is not None
            else jax.device_count()
        )
        t_interval = ivp.t_interval
        span = t_interval[1] - t_interval[0]
        if candidates is None:
            candidates = []
            for factor in (1, 2, 5, 10, 25):
                n = n_devices * factor
                slice_duration = span / n
                try:
                    self._validate_step_sizes(slice_duration)
                except ValueError:
                    continue
                candidates.append(n)
            if not candidates:
                raise ValueError(
                    "no valid time-slice candidates for this "
                    "problem's step sizes"
                )
        else:
            # surface incompatible explicit candidates before any
            # timing work is spent; only compiled (device-multiple)
            # decompositions are comparable — the host fallback is a
            # different execution schedule entirely
            candidates = [int(n) for n in candidates]
            if not candidates:
                raise ValueError("candidates must not be empty")
            for n in candidates:
                if n <= 0 or n % n_devices:
                    raise ValueError(
                        f"candidate slice count ({n}) must be a "
                        f"positive multiple of the device count "
                        f"({n_devices})"
                    )
                self._validate_step_sizes(span / n)

        original = self._num_time_slices
        best_n, best_time = None, np.inf
        try:
            for n in candidates:
                self._num_time_slices = n
                # compile warm-up, then best-of-`repeats` wall times
                # to a fully materialized (host) trajectory
                self.solve(ivp)
                candidate_best = np.inf
                for _ in range(max(1, repeats)):
                    start = _time.perf_counter()
                    self.solve(ivp)
                    elapsed = _time.perf_counter() - start
                    candidate_best = min(candidate_best, elapsed)
                if candidate_best < best_time:
                    best_n, best_time = n, candidate_best
        finally:
            # restore on any exit (including KeyboardInterrupt); the
            # winner is assigned only after a completed sweep
            self._num_time_slices = original
        self._num_time_slices = best_n
        self._evict_losing_compiled(best_n)
        return best_n

    def _evict_losing_compiled(self, best_n: int) -> None:
        """Drops the losing tuner candidates' compiled programs (their
        executables and baked-in constants would otherwise stay pinned
        for the operator's lifetime). Subclasses with their own caches
        extend this."""
        for key in list(self._compiled_cache):
            if key[1] != best_n:
                del self._compiled_cache[key]

    def _can_compile(self, cp, n: int) -> bool:
        if callable(self._termination_condition):
            return False
        if not (
            isinstance(self._f, JaxOperator)
            and isinstance(self._g, JaxOperator)
        ):
            return False
        if self._has_dynamic_bcs(cp) and not (
            hasattr(self._f, "indexed_trajectory_function")
            and hasattr(self._g, "indexed_trajectory_function")
        ):
            # dynamic boundary conditions need operators that can
            # pre-evaluate constraints over the whole decomposed domain
            return False
        return n % self._mesh_device_count(n) == 0

    @staticmethod
    def _has_dynamic_bcs(cp) -> bool:
        return bool(
            cp.differential_equation.x_dimension
            and not cp.are_all_boundary_conditions_static
        )

    def _validate_step_sizes(self, slice_duration: float) -> None:
        for operator, name in ((self._f, "fine"), (self._g, "coarse")):
            steps = round(slice_duration / operator.d_t)
            if not np.isclose(
                slice_duration, operator.d_t * steps
            ) or steps == 0:
                raise ValueError(
                    f"{name} operator time step size ({operator.d_t}) "
                    "must be a divisor of sub-IVP time slice length "
                    f"({slice_duration})"
                )

    def _mesh_device_count(self, n: int) -> int:
        """The number of devices the ``time`` mesh axis spans: at most
        one per slice; when there are more slices than devices, each
        device batches ``n / devices`` fine solves through ``vmap``."""
        available = (
            len(self._devices)
            if self._devices is not None
            else jax.device_count()
        )
        return min(n, available)

    # -- compiled shard_map path -------------------------------------------

    def _solve_compiled(
        self, ivp: InitialValueProblem, n: int, slice_duration: float
    ) -> Solution:
        cp = ivp.constrained_problem
        vertex_oriented = self._vertex_oriented
        t_interval = ivp.t_interval

        y_0 = jnp.asarray(
            ivp.initial_condition.discrete_y_0(vertex_oriented)
        )
        dynamic = self._has_dynamic_bcs(cp)
        if dynamic:
            from pararealml_tpu.constraint import (
                apply_constraints_along_last_axis,
            )

            init_constraints = cp.create_y_vertex_constraints(
                cp.create_boundary_constraints(
                    True, t_interval[0]
                ).y
            )
            y_0 = apply_constraints_along_last_axis(
                init_constraints, y_0
            )

        program = self._compiled_program(
            cp,
            n,
            slice_duration,
            y_0,
            t_start=float(t_interval[0]) if dynamic else None,
        )
        y_fine = program(
            y_0, jnp.asarray(t_interval[0], y_0.dtype)
        )

        t = discretize_time_domain(t_interval, self._f.d_t)[1:]
        return Solution(
            ivp,
            t,
            np.asarray(y_fine),
            vertex_oriented=vertex_oriented,
            d_t=self._f.d_t,
        )

    def _compiled_program(
        self,
        cp,
        n: int,
        slice_duration: float,
        y_0,
        t_start: Optional[float] = None,
    ):
        """Returns the jitted ``(y_0, t_0) -> y_fine`` shard_map Parareal
        program, cached per problem/decomposition (the problem object is
        stored to pin its id against CPython address reuse).

        ``t_start`` is only set for dynamic-boundary-condition problems,
        whose constraints must be pre-evaluated host-side at absolute
        times (the program's traced ``t_0`` is then ignored).
        """
        cache_key = (
            id(cp),
            n,
            round(float(slice_duration), 12),
            str(jnp.result_type(y_0)),
            tuple(y_0.shape),
            round(t_start, 12) if t_start is not None else None,
        )
        entry = self._compiled_cache.get(cache_key)
        if entry is None or entry[0] is not cp:
            entry = (
                cp,
                self._build_compiled_program(
                    cp, n, slice_duration, y_0, t_start
                ),
            )
            self._compiled_cache[cache_key] = entry
        return entry[1]

    def _build_compiled_program(
        self, cp, n: int, slice_duration: float, y_0,
        t_start: Optional[float] = None,
    ):
        n_devices_for_build = self._mesh_device_count(n)
        needs_vmap = n // n_devices_for_build > 1
        delta = float(slice_duration)
        # across hosts the time-sharded output is not addressable from
        # any single process; replicate it like the reference's final
        # MPI Allgather
        replicate_output = jax.process_count() > 1

        if t_start is not None:
            # dynamic boundary conditions: slice-indexed trajectory
            # functions over constraints pre-evaluated on the whole
            # domain's half-step grid. Only the fine solves are vmapped
            # (batched per device), so only they need the
            # vmap-compatible generic path; coarse sweeps run in
            # scans and keep their fused kernels.
            fine_ifn = self._f.indexed_trajectory_function(
                cp, t_start, slice_duration, n,
                allow_fused=not needs_vmap,
            )
            coarse_ifn = self._g.indexed_trajectory_function(
                cp, t_start, slice_duration, n
            )
            coarse_ifn_vmappable = (
                coarse_ifn
                if not needs_vmap
                else self._g.indexed_trajectory_function(
                    cp, t_start, slice_duration, n, allow_fused=False
                )
            )

            def fine_call(y_start, slice_index, t_0):
                return fine_ifn(y_start, slice_index)

            def coarse_call(y_start, slice_index, t_0):
                return coarse_ifn(y_start, slice_index)

            def coarse_call_vmappable(y_start, slice_index, t_0):
                return coarse_ifn_vmappable(y_start, slice_index)

            # carry-only indexed ends (never stack per-step states)
            # where the operators expose them; dynamic-BC problems
            # have no fused kernels, so these are bit-identical to
            # "expand the trajectory, keep the last frame"
            def build_indexed_ends(operator):
                builder = getattr(
                    operator, "indexed_ends_function", None
                )
                if builder is None:
                    return None
                return builder(cp, t_start, slice_duration, n)

            fine_iends = build_indexed_ends(self._f)
            coarse_iends = build_indexed_ends(self._g)

            def coarse_end_call(y_start, slice_index, t_0):
                if coarse_iends is not None:
                    return coarse_iends(y_start, slice_index)
                return coarse_call(y_start, slice_index, t_0)[-1]

            def coarse_end_call_vmappable(y_start, slice_index, t_0):
                if coarse_iends is not None:
                    return coarse_iends(y_start, slice_index)
                return coarse_call_vmappable(
                    y_start, slice_index, t_0
                )[-1]

            def fine_end_call(y_start, slice_index, t_0):
                if fine_iends is not None:
                    return fine_iends(y_start, slice_index)
                return fine_call(y_start, slice_index, t_0)[-1]

            # fused batched/sequential/packed sub-solves apply only to
            # the static-BC branch below
            fine_ends_batched = None
            coarse_ends_batched = None
            fine_traj_sequential = None
            fine_traj_batched = None

        else:
            time_parallel = self._use_time_parallel_trajectories(
                cp, y_0
            )

            def build_trajectory(operator, allow_fused):
                # the sub-trajectory functions take the absolute slice
                # start time as a traced argument, so the interval here
                # only fixes the duration. ``time_parallel=True`` lets
                # operators use trajectory formulations built for
                # parallel-in-time composition (affine propagator
                # matmuls on linear problems), which are also freely
                # vmappable; it is gated on the termination tolerance
                # (see _TIME_PARALLEL_TOLERANCE_FLOOR).
                return operator.trajectory_function(
                    cp,
                    (0.0, slice_duration),
                    allow_fused=allow_fused,
                    time_parallel=time_parallel,
                )[0]

            # hand-fused Pallas kernels (DMA + scratch) do not support
            # vmap batching; when slices are batched per device, any
            # non-vmappable fine/coarse trajectory is rebuilt on the
            # generic path (trajectories tag themselves via the
            # ``vmappable`` attribute)
            fine_fn_fused = build_trajectory(self._f, allow_fused=True)
            fine_fn = fine_fn_fused
            if needs_vmap and not getattr(fine_fn, "vmappable", False):
                fine_fn = build_trajectory(self._f, allow_fused=False)
            coarse_fn = build_trajectory(self._g, allow_fused=True)
            coarse_fn_vmappable = (
                coarse_fn
                if not needs_vmap
                or getattr(coarse_fn, "vmappable", False)
                else build_trajectory(self._g, allow_fused=False)
            )

            def fine_call(y_start, slice_index, t_0):
                return fine_fn(y_start, t_0 + slice_index * delta)

            def coarse_call(y_start, slice_index, t_0):
                return coarse_fn(y_start, t_0 + slice_index * delta)

            def coarse_call_vmappable(y_start, slice_index, t_0):
                return coarse_fn_vmappable(
                    y_start, t_0 + slice_index * delta
                )

            # trajectories that expose an ``end_function`` (affine
            # propagators) let the sequential corrective sweep advance
            # a slice with one matvec instead of expanding and
            # discarding the slice's interior
            _end = getattr(coarse_fn, "end_function", None)
            _end_vmappable = getattr(
                coarse_fn_vmappable, "end_function", None
            )
            _fine_end = getattr(fine_fn, "end_function", None)

            # operators exposing an ``ends_function`` (FDMOperator)
            # replace "expand the slice trajectory, keep the last
            # frame" everywhere only end states are consumed: the
            # fused variants keep the state in VMEM for the whole
            # sub-solve with zero trajectory DMA, and the generic
            # variant is a carry-only scan that never stacks per-step
            # states. Affine-propagator ends still win outright
            # (O(log steps) matvecs).
            def build_ends(operator, batch=None, allow_fused=True):
                builder = getattr(operator, "ends_function", None)
                if builder is None:
                    return None
                return builder(
                    cp,
                    (0.0, slice_duration),
                    allow_fused=allow_fused,
                    batch=batch,
                )

            # when slices are vmap-batched, fine_end_call runs under
            # vmap, which cannot transform fused Pallas kernels — the
            # fused fine ends enter through the batched kernel below
            fine_ends_fn = (
                None
                if _fine_end is not None
                else build_ends(self._f, allow_fused=not needs_vmap)
            )
            coarse_ends_fn = (
                None if _end is not None else build_ends(self._g)
            )
            if (
                needs_vmap
                and coarse_ends_fn is not None
                and not getattr(coarse_ends_fn, "vmappable", False)
            ):
                coarse_ends_vmappable_fn = build_ends(
                    self._g, allow_fused=False
                )
            else:
                coarse_ends_vmappable_fn = coarse_ends_fn

            def fine_end_call(y_start, slice_index, t_0):
                if _fine_end is not None:
                    return _fine_end(y_start, t_0 + slice_index * delta)
                if fine_ends_fn is not None:
                    return fine_ends_fn(
                        y_start, t_0 + slice_index * delta
                    )
                return fine_call(y_start, slice_index, t_0)[-1]

            def coarse_end_call(y_start, slice_index, t_0):
                if _end is not None:
                    return _end(y_start, t_0 + slice_index * delta)
                if coarse_ends_fn is not None:
                    return coarse_ends_fn(
                        y_start, t_0 + slice_index * delta
                    )
                return coarse_call(y_start, slice_index, t_0)[-1]

            def coarse_end_call_vmappable(y_start, slice_index, t_0):
                if _end_vmappable is not None:
                    return _end_vmappable(
                        y_start, t_0 + slice_index * delta
                    )
                if coarse_ends_vmappable_fn is not None:
                    return coarse_ends_vmappable_fn(
                        y_start, t_0 + slice_index * delta
                    )
                return coarse_call_vmappable(
                    y_start, slice_index, t_0
                )[-1]

            # when slices are vmap-batched per device on a grid past
            # the lane-saturation threshold, run fused kernels
            # SEQUENTIALLY over the batch instead of vmapping the
            # generic path: batch=B builds the Pallas-grid batched end
            # kernel (bit-identical to B single calls — tested), and
            # the final trajectory materialization lax.maps the fused
            # trajectory kernel
            fine_ends_batched = None
            coarse_ends_batched = None
            fine_traj_sequential = None
            fine_traj_batched = None
            if needs_vmap and self._prefer_sequential_fused(cp):
                batch = n // n_devices_for_build
                if _fine_end is None:
                    cand = build_ends(self._f, batch=batch)
                    if cand is not None and getattr(
                        cand, "batched", False
                    ):
                        fine_ends_batched = cand
                if self._relaxation == "fcf" and _end_vmappable is None:
                    cand = build_ends(self._g, batch=batch)
                    if cand is not None and getattr(
                        cand, "batched", False
                    ):
                        coarse_ends_batched = cand
                if fine_fn is not fine_fn_fused:
                    # rebuilt generic above means the fused trajectory
                    # kernel exists and cannot be vmapped; lax.map it
                    fine_traj_sequential = fine_fn_fused
            elif (
                needs_vmap
                and _fine_end is None
                and getattr(self._f, "_fused_kernels", False)
                and hasattr(self._f, "_integrator")
            ):
                # grids BELOW the lane-saturation threshold: a single
                # slice fills a fraction of one VPU tile, so both the
                # vmapped generic path and the Pallas batch *grid*
                # waste the vector unit. The width-PACKED kernels run
                # the whole slice batch side by side along the lane
                # axis in one program (ops/packed_system.py), covering
                # the per-iteration ends and the final trajectory
                # materialization alike
                from pararealml_tpu.ops.packed_system import (
                    build_packed_system_rk4_ends,
                    build_packed_system_rk4_trajectory,
                    packed_system_applicable,
                )

                batch = n // n_devices_for_build
                if packed_system_applicable(
                    cp, self._f._integrator, batch
                ):
                    interpret = jax.default_backend() != "tpu"
                    fine_ends_batched = build_packed_system_rk4_ends(
                        cp,
                        self._f.d_t,
                        self._fine_steps(slice_duration),
                        batch,
                        interpret=interpret,
                    )
                    fine_traj_batched = (
                        build_packed_system_rk4_trajectory(
                            cp,
                            self._f.d_t,
                            self._fine_steps(slice_duration),
                            batch,
                            interpret=interpret,
                            # the fine operator's snapshot-precision
                            # knob carries over: rounding applies to
                            # the STORED frames only (the final border
                            # shift re-anchors slice ends on the
                            # full-precision corrected borders either
                            # way)
                            traj_dtype=self._f._kernel_traj_dtype,
                        )
                    )

        n_devices = self._mesh_device_count(n)
        slices_per_device = n // n_devices
        mesh = time_mesh(n_devices, devices=self._devices)

        # FCF advances exactness two slices per iteration, so all n
        # borders are exact after ceil(n / 2) iterations
        exact_after = (
            -(-n // 2) if self._relaxation == "fcf" else n
        )
        iterations = min(exact_after, self._max_iterations)
        tolerances = self._tolerance_vector(
            cp.differential_equation.y_dimension
        )

        y_shape = y_0.shape

        termination = make_rms_termination(tolerances)

        # an affine coarse propagator turns BOTH coarse sweeps into
        # log-depth parallel prefixes: the corrective recurrence
        # y_{j+1} = P y_j + (r + correction_j) (and the initial sweep,
        # its corrections-free special case) is a Hillis-Steele
        # doubling scan whose levels are single (n, dim) x (dim, dim)
        # MXU matmuls against precomputed P^(2^l) — ceil(log2(n))
        # dependent ops instead of n dependent per-slice coarse solves
        # on the iteration's serial critical path. The reference runs
        # this sweep strictly sequentially on every rank
        # (/root/reference/pararealml/operators/parareal/
        # parareal_operator.py:168-185).
        affine_sweep = None
        affine_batched_coarse_ends = None
        affine_coarse = getattr(coarse_fn, "affine_slice_map", None) \
            if t_start is None else None
        if affine_coarse is not None:
            from pararealml_tpu.ops.linear_propagator import (
                _PRECISION as _prec,
            )

            pt_slice, r_slice = affine_coarse
            dim = int(np.prod(y_shape))
            levels = (n - 1).bit_length()
            itemsize = np.dtype(pt_slice.dtype).itemsize
            # the doubling powers ride in the compiled program; cap
            # their footprint (beyond it the sequential sweep's n
            # matvecs are cheaper than staging hundreds of MB)
            if (levels + 2) * dim * dim * itemsize <= 128 * 2**20:
                pt_pows = [pt_slice]
                for _ in range(levels - 1):
                    pt_pows.append(
                        jnp.matmul(
                            pt_pows[-1], pt_pows[-1], precision=_prec
                        )
                    )

                def affine_sweep(i, y_borders, corrections):
                    yb = y_borders.reshape(n + 1, dim)
                    corr = corrections.reshape(n, dim)
                    mask = (jnp.arange(n) >= i)[:, jnp.newaxis]
                    # recurrence inputs: w_j = r + corr_j for j >= i
                    # (zero below i decouples frozen borders), seeded
                    # with P y_i at j == i so prefixes over [i, j]
                    # reproduce the sweep exactly
                    w = jnp.where(mask, r_slice + corr, 0.0)
                    y_i = jax.lax.dynamic_index_in_dim(
                        yb, i, 0, keepdims=False
                    )
                    w = w.at[i].add(
                        jnp.matmul(y_i, pt_slice, precision=_prec)
                    )
                    v = w
                    for level, ptl in enumerate(pt_pows):
                        shift = 1 << level
                        shifted = jnp.concatenate(
                            [
                                jnp.zeros((shift, dim), v.dtype),
                                v[:-shift],
                            ],
                            axis=0,
                        )
                        v = v + jnp.matmul(
                            shifted, ptl, precision=_prec
                        )
                    # v[j] = y_{j+1} for j >= i; frozen borders keep
                    # their values. The carried coarse ends are
                    # re-derived from the post-sweep borders with one
                    # batched matmul (frozen entries recompute to the
                    # same values — the map is deterministic)
                    new_borders = yb.at[1:].set(
                        jnp.where(mask, v, yb[1:])
                    )
                    new_coarse_ends = (
                        jnp.matmul(
                            new_borders[:-1], pt_slice, precision=_prec
                        )
                        + r_slice
                    )
                    return (
                        new_borders.reshape(y_borders.shape),
                        new_coarse_ends.reshape(corrections.shape),
                    )

                def affine_batched_coarse_ends(y_starts):
                    flat = y_starts.reshape(-1, dim)
                    ends = (
                        jnp.matmul(flat, pt_slice, precision=_prec)
                        + r_slice
                    )
                    return ends.reshape(y_starts.shape)

        if self._relaxation == "fcf":
            # FCF corrections are computed with the vmappable coarse
            # path; the sweeps must use the *same* propagator or its
            # fused-vs-generic rounding difference leaks into borders
            # the schedule treats as exact. With a batched fused coarse
            # end kernel in the corrections, the sweeps use the
            # UNBATCHED fused end kernel — bit-identical to the batched
            # one by construction (tested)
            coarse_end = (
                coarse_end_call
                if coarse_ends_batched is not None
                else coarse_end_call_vmappable
            )
        else:
            coarse_end = coarse_end_call

        fine_steps = self._fine_steps(slice_duration)
        if slices_per_device == 1:
            # one slice per device: no batching, so fused Pallas fine
            # solvers stay usable
            def batched_fine(y_starts, slice_indices, t_0):
                return fine_call(
                    y_starts[0], slice_indices[0], t_0
                )[jnp.newaxis]

            def batched_fine_ends(y_starts, slice_indices, t_0):
                return fine_end_call(
                    y_starts[0], slice_indices[0], t_0
                )[jnp.newaxis]

            def batched_coarse_ends(y_starts, slice_indices, t_0):
                if affine_batched_coarse_ends is not None:
                    # keep every coarse evaluation on the identical
                    # (P, r) matmul map the affine sweeps use
                    return affine_batched_coarse_ends(y_starts)
                return coarse_end_call_vmappable(
                    y_starts[0], slice_indices[0], t_0
                )[jnp.newaxis]

        else:

            def batched_fine(y_starts, slice_indices, t_0):
                if fine_traj_batched is not None:
                    # width-packed kernel: all slices' trajectories in
                    # one program (autonomous systems — start times are
                    # irrelevant under static boundary conditions)
                    return fine_traj_batched(y_starts)
                if fine_traj_sequential is not None:
                    # sequential fused trajectory solves beat
                    # lane-batched generic ones past the vmap-free
                    # regime (see _prefer_sequential_fused); lax.map
                    # keeps the Pallas kernel usable where vmap cannot
                    # transform it
                    return jax.lax.map(
                        lambda args: fine_traj_sequential(
                            args[0], t_0 + args[1] * delta
                        ),
                        (y_starts, slice_indices),
                    )
                return jax.vmap(fine_call, in_axes=(0, 0, None))(
                    y_starts, slice_indices, t_0
                )

            def batched_fine_ends(y_starts, slice_indices, t_0):
                if fine_ends_batched is not None:
                    # the fused families are autonomous systems — the
                    # batched end kernel ignores slice start times
                    return fine_ends_batched(y_starts)
                if fine_traj_sequential is not None:
                    # no end kernel (e.g. beyond-VMEM tiled grids), but
                    # a fused trajectory kernel exists: sequential
                    # fused solves still beat lane-batched generic ones
                    # past the saturation threshold
                    return jax.lax.map(
                        lambda args: fine_traj_sequential(
                            args[0], t_0 + args[1] * delta
                        )[-1],
                        (y_starts, slice_indices),
                    )
                return jax.vmap(
                    lambda y, j: fine_end_call(y, j, t_0),
                    in_axes=(0, 0),
                )(y_starts, slice_indices)

            def batched_coarse_ends(y_starts, slice_indices, t_0):
                if affine_batched_coarse_ends is not None:
                    # keep every coarse evaluation on the identical
                    # (P, r) matmul map the affine sweeps use
                    return affine_batched_coarse_ends(y_starts)
                if coarse_ends_batched is not None:
                    return coarse_ends_batched(y_starts)
                return jax.vmap(
                    lambda y, j: coarse_end_call_vmappable(y, j, t_0),
                    in_axes=(0, 0),
                )(y_starts, slice_indices)

        fcf = self._relaxation == "fcf"

        # classic relaxation with static boundary conditions: run the
        # initial coarse sweep as ONE whole-domain coarse trajectory
        # (the reference's own structure — a single g.solve(ivp),
        # parareal_operator.py:133-139) instead of a scan of n per-slice
        # solves, so fused multi-step kernels apply. A coarse operator
        # that exposes an affine end_function skips this: its per-slice
        # scan is O(n log steps) matvecs, far cheaper than expanding
        # (and discarding) the whole coarse interior, and it keeps the
        # initial sweep on the identical propagator the corrective
        # sweeps use. FCF always keeps the per-slice scan: its
        # corrections come from per-slice coarse solves and the sweeps
        # must match.
        coarse_whole_fn = None
        coarse_steps_per_slice = round(slice_duration / self._g.d_t)
        if (
            t_start is None
            and not fcf
            and getattr(coarse_fn, "end_function", None) is None
        ):
            coarse_whole_fn, coarse_whole_t = self._g.trajectory_function(
                cp,
                (0.0, n * slice_duration),
                allow_fused=True,
                time_parallel=self._use_time_parallel_trajectories(
                    cp, y_0
                ),
            )
            if len(coarse_whole_t) != coarse_steps_per_slice * n:
                # accumulated rounding made the whole-domain grid
                # disagree with n x per-slice steps; the strided
                # border extraction would silently mis-slice, so fall
                # back to the per-slice sweep
                coarse_whole_fn = None

        # "iteration" materialization (see __init__): classic
        # relaxation only, static start time, no affine fine shortcut
        # (whose end states are nearly free), and at least one
        # iteration guaranteed to run
        iteration_traj = (
            self._materialize == "iteration"
            and not fcf
            and t_start is None
            and _fine_end is None
            and iterations > 0
        )
        # statically-single-iteration runs on the packed kernel keep
        # the raw packed trajectory end to end (see the fast paths
        # below); with more iterations possible, deferring the unpack
        # pays nothing (it runs once either way) and costs fusion
        one_shot_raw = (
            iteration_traj
            and iterations == 1
            and fine_traj_batched is not None
            and hasattr(fine_traj_batched, "raw")
        )

        def program(y_init, t_0):
            device_index = jax.lax.axis_index("time")
            first_slice = device_index * slices_per_device
            local_slice_offsets = jnp.arange(slices_per_device)
            local_slice_indices = first_slice + local_slice_offsets

            # initial coarse sweep, replicated on every device
            if affine_sweep is not None:
                # corrections-free special case of the affine
                # corrective sweep: one log-depth doubling scan
                y_borders, coarse_ends = affine_sweep(
                    jnp.asarray(0, jnp.int32),
                    jnp.concatenate(
                        [
                            y_init[jnp.newaxis],
                            jnp.zeros((n,) + y_shape, y_init.dtype),
                        ]
                    ),
                    jnp.zeros((n,) + y_shape, y_init.dtype),
                )
            elif coarse_whole_fn is not None:
                coarse_ends = coarse_whole_fn(y_init, t_0)[
                    coarse_steps_per_slice - 1::coarse_steps_per_slice
                ]
            else:

                def sweep(y, j):
                    y_end = coarse_end(y, j, t_0)
                    return y_end, y_end

                _, coarse_ends = jax.lax.scan(
                    sweep, y_init, jnp.arange(n)
                )
            if affine_sweep is None:
                y_borders = jnp.concatenate(
                    [y_init[jnp.newaxis], coarse_ends]
                )

            def local_slice(array):
                return jax.lax.dynamic_slice_in_dim(
                    array, first_slice, slices_per_device, 0
                )

            # NOTE: the space-time GSPMD program
            # (space_time.py:_build_space_time_program) mirrors this
            # schedule; changes to the masks or sweep order must be
            # applied to both (cross-operator bit-identity tests in
            # tests/operators/parareal/test_space_time.py enforce it)
            def iteration(carry):
                # in "final" mode, corrections need only the fine
                # slice END states, so the loop never materializes
                # fine trajectories (affine-propagator fine solves
                # advance a slice in O(log steps) matvecs here) and
                # the full trajectories are expanded exactly once
                # after convergence. In "iteration" mode each
                # iteration's fine sweep IS a full trajectory solve
                # carried through the loop (the reference's schedule,
                # parareal_operator.py:163-193), so a k-iteration run
                # performs exactly k fine sweeps with no final
                # expansion
                if iteration_traj:
                    i, y_borders, coarse_ends, _, _ = carry
                    starts = local_slice(y_borders[:-1])
                    if one_shot_raw:
                        # single statically-known iteration with the
                        # packed kernel: keep the kernel's raw packed
                        # output so the final shift-add and unpacking
                        # transpose fuse into ONE pass over the
                        # trajectory
                        sub_y_fine = fine_traj_batched.raw(starts)
                        local_fine_ends = (
                            fine_traj_batched.unpack_last(
                                sub_y_fine, y_shape
                            )
                        )
                    else:
                        sub_y_fine = batched_fine(
                            starts, local_slice_indices, t_0
                        )
                        local_fine_ends = sub_y_fine[:, -1]
                else:
                    i, y_borders, coarse_ends, _ = carry
                    # this device's fine solves, batched through vmap
                    local_fine_ends = batched_fine_ends(
                        local_slice(y_borders[:-1]),
                        local_slice_indices,
                        t_0,
                    )
                if fcf:
                    # FCF relaxation: the first fine sweep above is
                    # the F-relaxation; correct border j + 1 from
                    # the fine-propagated state z_j = F(u_{j-1})
                    # (z_0 = u_0), advancing exactness two slices
                    # per iteration (MGRIT two-level FCF)
                    fine_ends = jax.lax.all_gather(
                        local_fine_ends, "time"
                    ).reshape((n,) + y_shape)
                    z = jnp.concatenate(
                        [y_borders[:1], fine_ends[:-1]]
                    )
                    local_corrections = batched_fine_ends(
                        local_slice(z), local_slice_indices, t_0
                    ) - batched_coarse_ends(
                        local_slice(z), local_slice_indices, t_0
                    )
                else:
                    local_corrections = (
                        local_fine_ends
                        - local_slice(coarse_ends)
                    )
                corrections = jax.lax.all_gather(
                    local_corrections, "time"
                ).reshape((n,) + y_shape)
                old_ends = y_borders[1:]

                def corrective_sweep(j, state):
                    y_borders, coarse_ends = state
                    re_predicted = coarse_end(y_borders[j], j, t_0)
                    # FCF corrections are computed from per-slice
                    # coarse solves, so the sweep must re-predict
                    # at j == i too — reusing the initial
                    # whole-domain sweep's value there would break
                    # the telescoping consistency under adaptive
                    # coarse operators
                    new_coarse_end = jnp.where(
                        (j > i) if not fcf else (j >= i),
                        re_predicted,
                        coarse_ends[j],
                    )
                    coarse_ends = coarse_ends.at[j].set(
                        new_coarse_end
                    )
                    updated_border = (
                        new_coarse_end + corrections[j]
                    )
                    y_borders = y_borders.at[j + 1].set(
                        jnp.where(
                            j >= i,
                            updated_border,
                            y_borders[j + 1],
                        )
                    )
                    return y_borders, coarse_ends

                # slices before the current iteration index are
                # already exact (standard Parareal property, and
                # the j-masks above make them no-ops), so the
                # sweep starts at i
                if affine_sweep is not None:
                    # affine coarse: the whole sweep is a log-depth
                    # doubling scan instead of n dependent solves.
                    # Border i + 1 comes out as P y_i + r + corr_i
                    # with the identical matmul the carried coarse
                    # end was computed with, so the classic
                    # keep-stale-at-j==i semantics (and exactness
                    # telescoping) are preserved bit-for-bit
                    y_borders, coarse_ends = affine_sweep(
                        i, y_borders, corrections
                    )
                else:
                    y_borders, coarse_ends = jax.lax.fori_loop(
                        i,
                        n,
                        corrective_sweep,
                        (y_borders, coarse_ends),
                    )
                converged = termination(old_ends, y_borders[1:])
                if iteration_traj:
                    return (
                        i + 1,
                        y_borders,
                        coarse_ends,
                        converged,
                        sub_y_fine,
                    )
                return (i + 1, y_borders, coarse_ends, converged)

            def keep_iterating(carry):
                i, _, _, converged = carry[:4]
                return jnp.logical_and(
                    i < iterations, jnp.logical_not(converged)
                )

            # early termination as the while condition: once the border
            # updates drop below the tolerance (the reference's
            # criterion and loop break, parareal_operator.py:187-188),
            # remaining iterations are never dispatched at all
            state = (
                jnp.asarray(0, jnp.int32),
                y_borders,
                coarse_ends,
                jnp.asarray(False),
            )
            if iteration_traj:
                # run the first iteration eagerly (its trajectory
                # input is dead, so no 100s-of-MB zero-fill is ever
                # materialized), then loop from iteration 2 on; the
                # while carry aliases the trajectory buffer in place
                first = iteration(
                    state
                    + (
                        jnp.zeros(
                            (slices_per_device, fine_steps)
                            + y_shape,
                            y_init.dtype,
                        ),
                    )
                )
                if iterations == 1:
                    # statically one iteration: the while would never
                    # run, but compiling it would still force the
                    # trajectory through a loop-carry buffer (an extra
                    # hundreds-of-MB copy) and break the fusion of the
                    # kernel output into the unpacking epilogue
                    _, y_borders, _, _, sub_y_fine = first
                else:
                    (
                        _,
                        y_borders,
                        _,
                        _,
                        sub_y_fine,
                    ) = jax.lax.while_loop(
                        keep_iterating, iteration, first
                    )
            else:
                _, y_borders, _, _ = jax.lax.while_loop(
                    keep_iterating, iteration, state
                )

                # materialize the fine trajectories once, from the
                # FINAL borders (at or above the accuracy of the
                # reference's last-iteration trajectories, which start
                # one correction earlier)
                sub_y_fine = batched_fine(
                    local_slice(y_borders[:-1]),
                    local_slice_indices,
                    t_0,
                )
            # shift onto the corrected borders for continuity — the
            # reference's final shift semantics
            if iteration_traj and one_shot_raw:
                # packed fast path: add the shift in PACKED layout so
                # it fuses with the unpacking transpose's read — one
                # pass over the trajectory instead of two
                ends = fine_traj_batched.unpack_last(
                    sub_y_fine, y_shape
                )
                shifts = local_slice(y_borders[1:]) - ends
                shifted = sub_y_fine + fine_traj_batched.pack_states(
                    shifts
                )
                local = fine_traj_batched.unpack(
                    shifted, y_shape
                ).reshape(
                    (slices_per_device * fine_steps,) + y_shape
                )
            else:
                shifts = (
                    local_slice(y_borders[1:]) - sub_y_fine[:, -1]
                )
                sub_y_fine = sub_y_fine + shifts[:, jnp.newaxis]
                local = sub_y_fine.reshape(
                    (slices_per_device * fine_steps,) + y_shape
                )
            if replicate_output:
                # multi-host: every process needs the full trajectory
                # host-side, mirroring the reference's final MPI
                # Allgather (parareal_operator.py:193)
                return jax.lax.all_gather(local, "time").reshape(
                    (n * fine_steps,) + y_shape
                )
            return local

        sharded_program = shard_map(
            program,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P() if replicate_output else P("time"),
            check_rep=False,
        )
        return jax.jit(sharded_program)

    def trajectory_function(
        self,
        cp,
        t_interval,
        allow_fused: bool = True,
        time_parallel: bool = False,
    ):
        """The whole Parareal solve as one jittable ``(y_0, t_0) -> ys``
        program over the device mesh, so Parareal composes into larger
        jit-compiled programs (the analog of the reference's
        operator-in-operator composition,
        /root/reference/pararealml/operators/parareal/
        parareal_operator.py:13-46; note that because the program is
        itself a ``shard_map``, it cannot be used as the fine or coarse
        operator *inside another* compiled Parareal — nesting works at
        the ``solve()`` level, where the inner Parareal runs its own
        program)."""
        n = self._num_time_slices
        if n is None:
            n = (
                len(self._devices)
                if self._devices is not None
                else jax.device_count()
            )
        if not self._can_compile(cp, n) or self._has_dynamic_bcs(cp):
            raise ValueError(
                "this Parareal configuration cannot be expressed as a "
                "single reusable compiled program (callable termination "
                "condition, non-jax operators, or dynamic boundary "
                "conditions, which depend on the absolute start time; "
                "use solve() for dynamic boundary conditions)"
            )
        slice_duration = (t_interval[1] - t_interval[0]) / n
        self._validate_step_sizes(slice_duration)
        vertex_oriented = self._vertex_oriented
        y_shape = tuple(cp.y_shape(vertex_oriented)) if (
            cp.differential_equation.x_dimension
        ) else (cp.differential_equation.y_dimension,)
        y_probe = jnp.zeros(y_shape)
        program = self._compiled_program(
            cp, n, slice_duration, y_probe
        )
        t = discretize_time_domain(t_interval, self._f.d_t)
        return program, t[1:]

    def _fine_steps(self, slice_duration: float) -> int:
        return round(slice_duration / self._f.d_t)

    # -- host fallback path ------------------------------------------------

    def _solve_host(
        self, ivp: InitialValueProblem, n: int, slice_duration: float
    ) -> Solution:
        """Sequential-execution Parareal with the reference's exact
        schedule (every slice's fine solve per iteration, corrective
        coarse re-predictions from slice ``i+1`` on)."""
        cp = ivp.constrained_problem
        vertex_oriented = self._vertex_oriented
        t_interval = ivp.t_interval
        border_times = np.linspace(
            t_interval[0], t_interval[1], n + 1
        )

        def sub_ivp(k: int, y_start: np.ndarray) -> InitialValueProblem:
            return InitialValueProblem(
                cp,
                (border_times[k], border_times[k + 1]),
                DiscreteInitialCondition(cp, y_start, vertex_oriented),
            )

        y_0 = ivp.initial_condition.discrete_y_0(vertex_oriented)
        coarse_solution = self._g.solve(ivp).discrete_y(vertex_oriented)
        coarse_step_indices = (
            np.rint(
                (border_times[1:] - t_interval[0]) / self._g.d_t
            ).astype(int)
            - 1
        )
        y_coarse_ends = coarse_solution[coarse_step_indices]
        y_borders = np.concatenate([y_0[np.newaxis], y_coarse_ends])

        def fine_solve(k, y_start):
            return self._f.solve(
                sub_ivp(k, y_start), False
            ).discrete_y(vertex_oriented)

        def coarse_end_solve(k, y_start):
            return self._g.solve(sub_ivp(k, y_start)).discrete_y(
                vertex_oriented
            )[-1]

        fcf = self._relaxation == "fcf"
        # FCF: all n borders are exact after ceil(n / 2) iterations
        exact_after = -(-n // 2) if fcf else n
        sub_trajectories = [None] * n
        with ThreadPoolExecutor(max_workers=n) as executor:
            for i in range(min(exact_after, self._max_iterations)):
                # all fine solves of an iteration are independent;
                # dispatch them concurrently (the reference's
                # equivalent path is always rank-parallel,
                # parareal_operator.py:163). The first solve of the
                # first iteration runs alone so the operator's compile
                # cache is warm before the fan-out (concurrent misses
                # would compile the same program n times).
                if i == 0:
                    sub_trajectories[0] = fine_solve(0, y_borders[0])
                    sub_trajectories[1:] = list(
                        executor.map(
                            fine_solve, range(1, n), y_borders[1:-1]
                        )
                    )
                else:
                    sub_trajectories = list(
                        executor.map(
                            fine_solve, range(n), y_borders[:-1]
                        )
                    )
                if fcf:
                    # FCF relaxation: correct border j + 1 from the
                    # fine-propagated z_j = F(u_{j-1}) (z_0 = u_0)
                    z = [y_borders[0]] + [
                        sub_trajectories[k][-1] for k in range(n - 1)
                    ]
                    sub_trajectories = list(
                        executor.map(fine_solve, range(n), z)
                    )
                    if i == 0:
                        # warm the per-slice coarse program once before
                        # the fan-out, mirroring the fine-solve warm-up
                        # (concurrent cold misses would compile the
                        # same program n times)
                        coarse_z_ends = [coarse_end_solve(0, z[0])]
                        coarse_z_ends += list(
                            executor.map(
                                coarse_end_solve, range(1, n), z[1:]
                            )
                        )
                    else:
                        coarse_z_ends = list(
                            executor.map(coarse_end_solve, range(n), z)
                        )
                    corrections = np.stack(
                        [
                            sub_trajectories[k][-1] - coarse_z_ends[k]
                            for k in range(n)
                        ]
                    )
                else:
                    corrections = np.stack(
                        [
                            sub_trajectories[k][-1] - y_coarse_ends[k]
                            for k in range(n)
                        ]
                    )

                old_ends = np.copy(y_borders[1:])
                for j in range(i, n):
                    if j > i or fcf:
                        # FCF corrections come from per-slice coarse
                        # solves; re-predict at j == i too so the sweep
                        # and the corrections use the same coarse
                        # propagator (adaptive operators differ between
                        # whole-domain and per-slice solves)
                        y_coarse_ends[j] = coarse_end_solve(
                            j, y_borders[j]
                        )
                    y_borders[j + 1] = (
                        y_coarse_ends[j] + corrections[j]
                    )

                if self._should_terminate(old_ends, y_borders[1:]):
                    break

        t = discretize_time_domain(t_interval, self._f.d_t)[1:]
        shifted = [
            trajectory + (y_borders[k + 1] - trajectory[-1])
            for k, trajectory in enumerate(sub_trajectories)
        ]
        y_fine = np.concatenate(shifted)
        return Solution(
            ivp,
            t,
            y_fine,
            vertex_oriented=vertex_oriented,
            d_t=self._f.d_t,
        )
