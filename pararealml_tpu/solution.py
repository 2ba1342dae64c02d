"""Solutions of initial value problems.

Capability match for /root/reference/pararealml/solution.py:25-336: holds
the discrete trajectory, supports spatial interpolation, orientation
resampling, cross-solution differencing at matching time points, and plot
generation. Trajectories live as host NumPy arrays (solvers transfer their
device output once); plotting imports are lazy so the solver path never
touches matplotlib.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Generator, List, NamedTuple, Optional, \
    Sequence, Set

import numpy as np

from pararealml_tpu.differential_equation import NBodyGravitationalEquation
from pararealml_tpu.initial_value_problem import InitialValueProblem

if TYPE_CHECKING:  # pragma: no cover
    from pararealml_tpu.plot import Plot


class Diffs(NamedTuple):
    """Differences between solutions at time points matching across all of
    them."""

    matching_time_points: np.ndarray
    differences: Sequence[np.ndarray]


class Solution:
    """A discrete solution of an IVP."""

    def __init__(
        self, ivp: InitialValueProblem,
        t_coordinates: np.ndarray, discrete_y: np.ndarray,
        vertex_oriented: Optional[bool] = None,
        d_t: Optional[float] = None,
    ):
        times = np.asarray(t_coordinates, dtype=float)
        trajectory = np.asarray(discrete_y, dtype=float)

        if times.ndim != 1:
            raise ValueError(
                f"t coordinates must be one-dimensional, got {times.ndim} "
                "dimensions"
            )
        if not times.size:
            raise ValueError("at least one t coordinate is required")
        problem = ivp.constrained_problem
        if problem.differential_equation.x_dimension \
                and vertex_oriented is None:
            raise ValueError(
                "PDE solutions require an explicit vertex orientation"
            )
        expected = (times.size,) + tuple(problem.y_shape(vertex_oriented))
        if trajectory.shape != expected:
            raise ValueError(
                f"solution shape {trajectory.shape} does not match the "
                f"expected {expected}"
            )

        self._problem = ivp
        self._times = times.copy()
        self._trajectory = trajectory.copy()
        self._on_vertices = vertex_oriented
        self._times.setflags(write=False)

        if d_t is None:
            d_t = float(times[1] - times[0]) if times.size > 1 else 0.0
        self._step = d_t

    @property
    def initial_value_problem(self) -> InitialValueProblem:
        """The solved IVP."""
        return self._problem

    @property
    def vertex_oriented(self) -> Optional[bool]:
        """Whether the solution is vertex or cell oriented (None for
        ODEs)."""
        return self._on_vertices

    @property
    def d_t(self) -> float:
        """The temporal step size of the solution."""
        return self._step

    @property
    def t_coordinates(self) -> np.ndarray:
        """The time coordinates of the solution."""
        return self._times

    def y(
        self, x: Optional[np.ndarray] = None,
        interpolation_method: str = "linear",
    ) -> np.ndarray:
        """The solution interpolated at spatial coordinates ``x`` at every
        time step.

        The interpolation runs on device (multilinear gather over the
        whole trajectory at once; see
        :func:`pararealml_tpu.interpolation.grid_interpolate`) rather
        than through a host SciPy call per query.
        """
        problem = self._problem.constrained_problem
        if not problem.differential_equation.x_dimension:
            return self._trajectory.copy()

        from pararealml_tpu.interpolation import grid_interpolate

        # carry the time axis through the blend as a trailing value
        # axis so one gather resamples the entire trajectory
        trajectory_last = np.moveaxis(self._trajectory, 0, -1)
        interpolated = grid_interpolate(
            trajectory_last,
            problem.mesh.axis_coordinates(self._on_vertices),
            np.asarray(x),
            method=interpolation_method,
        )
        return np.ascontiguousarray(
            np.moveaxis(np.asarray(interpolated), -1, 0)
        )

    def discrete_y(
        self, vertex_oriented: Optional[bool] = None,
        interpolation_method: str = "linear",
    ) -> np.ndarray:
        """The discrete solution resampled to the requested orientation."""
        if vertex_oriented is None:
            vertex_oriented = self._on_vertices

        problem = self._problem.constrained_problem
        same_grid = (
            vertex_oriented == self._on_vertices
            or not problem.differential_equation.x_dimension
        )
        if same_grid:
            return self._trajectory.copy()

        resampled = self.y(
            problem.mesh.all_index_coordinates(vertex_oriented),
            interpolation_method,
        )
        constraints = problem.static_y_vertex_constraints
        if vertex_oriented and constraints is not None:
            resampled = np.asarray(constraints.apply(resampled))
        return resampled

    def diff(
        self, solutions: Sequence["Solution"], atol: float = 1e-8
    ) -> Diffs:
        """Differences between this solution and the provided ones at every
        time point present (within ``atol``) in all of them."""
        if not solutions:
            raise ValueError("at least one solution to diff against is "
                             "required")

        all_time_points = [self._times] + [
            s.t_coordinates for s in solutions
        ]
        all_time_steps = [self._step] + [s.d_t for s in solutions]
        other_ys = [s.discrete_y(self._on_vertices) for s in solutions]

        sparsest = int(np.argmin([len(tp) for tp in all_time_points]))

        matching_times: List[float] = []
        all_diffs: List[List[np.ndarray]] = [[] for _ in solutions]

        for i, t in enumerate(all_time_points[sparsest]):
            indices = []
            for j, time_points in enumerate(all_time_points):
                if j == sparsest:
                    indices.append(i)
                    continue
                idx = int(round((t - time_points[0]) / all_time_steps[j]))
                if 0 <= idx < len(time_points) and np.isclose(
                    t, time_points[idx], atol=atol, rtol=0.0
                ):
                    indices.append(idx)
                else:
                    break
            else:
                matching_times.append(t)
                for j, y_other in enumerate(other_ys):
                    all_diffs[j].append(
                        y_other[indices[j + 1]]
                        - self._trajectory[indices[0]]
                    )

        return Diffs(
            np.array(matching_times),
            [np.array(d) for d in all_diffs],
        )

    def generate_plots(self, **kwargs) -> Generator["Plot", None, None]:
        """Yields every plot type applicable to the solved problem."""
        equation = self._problem.constrained_problem.differential_equation
        if equation.x_dimension == 0:
            yield from self._ode_plots(equation, **kwargs)
        elif equation.x_dimension <= 3:
            yield from self._pde_plots(equation, **kwargs)

    def _ode_plots(self, equation, **kwargs):
        from pararealml_tpu.plot import NBodyPlot, PhaseSpacePlot, TimePlot

        if isinstance(equation, NBodyGravitationalEquation):
            yield NBodyPlot(self._trajectory, equation, **kwargs)
            return
        yield TimePlot(self._trajectory, self._times, **kwargs)
        if equation.y_dimension in (2, 3):
            yield PhaseSpacePlot(self._trajectory, **kwargs)

    def _pde_plots(self, equation, **kwargs):
        from pararealml_tpu.plot import (
            ContourPlot,
            QuiverPlot,
            ScatterPlot,
            SpaceLinePlot,
            StreamPlot,
            SurfacePlot,
        )

        mesh = self._problem.constrained_problem.mesh
        spatial_dims = equation.x_dimension

        vector_indices: Set[int] = set()
        if spatial_dims > 1 and equation.all_vector_field_indices:
            for indices in equation.all_vector_field_indices:
                vector_indices.update(indices)
                field = self._trajectory[..., indices]
                yield QuiverPlot(field, mesh, self._on_vertices, **kwargs)
                if spatial_dims == 2:
                    yield StreamPlot(
                        field, mesh, self._on_vertices, **kwargs
                    )

        scalar_plot_types = {
            1: (SpaceLinePlot,),
            2: (ContourPlot, SurfacePlot),
            3: (ScatterPlot,),
        }[spatial_dims]
        for i in range(equation.y_dimension):
            if i in vector_indices:
                continue
            field = self._trajectory[..., i: i + 1]
            for plot_type in scalar_plot_types:
                yield plot_type(field, mesh, self._on_vertices, **kwargs)
