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
        self,
        ivp: InitialValueProblem,
        t_coordinates: np.ndarray,
        discrete_y: np.ndarray,
        vertex_oriented: Optional[bool] = None,
        d_t: Optional[float] = None,
    ):
        t_coordinates = np.asarray(t_coordinates, dtype=float)
        discrete_y = np.asarray(discrete_y, dtype=float)

        if t_coordinates.ndim != 1:
            raise ValueError(
                "number of t coordinate dimensions "
                f"({t_coordinates.ndim}) must be 1"
            )
        if len(t_coordinates) == 0:
            raise ValueError("length of t coordinates must be greater than 0")
        cp = ivp.constrained_problem
        if cp.differential_equation.x_dimension and vertex_oriented is None:
            raise ValueError(
                "vertex orientation must be defined for solutions to PDEs"
            )
        y_shape = cp.y_shape(vertex_oriented)
        if discrete_y.shape != (len(t_coordinates),) + tuple(y_shape):
            raise ValueError(
                "expected solution shape to be "
                f"{(len(t_coordinates),) + tuple(y_shape)} but got "
                f"{discrete_y.shape}"
            )

        self._ivp = ivp
        self._t_coordinates = np.copy(t_coordinates)
        self._discrete_y = np.copy(discrete_y)
        self._vertex_oriented = vertex_oriented
        self._t_coordinates.setflags(write=False)

        if d_t is None:
            d_t = (
                0.0
                if len(t_coordinates) == 1
                else float(t_coordinates[1] - t_coordinates[0])
            )
        self._d_t = d_t

    @property
    def initial_value_problem(self) -> InitialValueProblem:
        """The solved IVP."""
        return self._ivp

    @property
    def vertex_oriented(self) -> Optional[bool]:
        """Whether the solution is vertex or cell oriented (None for
        ODEs)."""
        return self._vertex_oriented

    @property
    def d_t(self) -> float:
        """The temporal step size of the solution."""
        return self._d_t

    @property
    def t_coordinates(self) -> np.ndarray:
        """The time coordinates of the solution."""
        return self._t_coordinates

    def y(
        self,
        x: Optional[np.ndarray] = None,
        interpolation_method: str = "linear",
    ) -> np.ndarray:
        """The solution interpolated at spatial coordinates ``x`` at every
        time step.

        The interpolation runs on device (multilinear gather over the
        whole trajectory at once; see
        :func:`pararealml_tpu.interpolation.grid_interpolate`) rather
        than through a host SciPy call per query.
        """
        cp = self._ivp.constrained_problem
        diff_eq = cp.differential_equation
        if not diff_eq.x_dimension:
            return np.copy(self._discrete_y)

        from pararealml_tpu.interpolation import grid_interpolate

        # carry the time axis through the blend as a trailing value
        # axis so one gather resamples the entire trajectory
        trajectory_last = np.moveaxis(self._discrete_y, 0, -1)
        interpolated = grid_interpolate(
            trajectory_last,
            cp.mesh.axis_coordinates(self._vertex_oriented),
            np.asarray(x),
            method=interpolation_method,
        )
        return np.ascontiguousarray(
            np.moveaxis(np.asarray(interpolated), -1, 0)
        )

    def discrete_y(
        self,
        vertex_oriented: Optional[bool] = None,
        interpolation_method: str = "linear",
    ) -> np.ndarray:
        """The discrete solution resampled to the requested orientation."""
        if vertex_oriented is None:
            vertex_oriented = self._vertex_oriented

        cp = self._ivp.constrained_problem
        if (
            not cp.differential_equation.x_dimension
            or self._vertex_oriented == vertex_oriented
        ):
            return np.copy(self._discrete_y)

        resampled = self.y(
            cp.mesh.all_index_coordinates(vertex_oriented),
            interpolation_method,
        )
        constraints = cp.static_y_vertex_constraints
        if vertex_oriented and constraints is not None:
            resampled = np.asarray(constraints.apply(resampled))
        return resampled

    def diff(
        self, solutions: Sequence["Solution"], atol: float = 1e-8
    ) -> Diffs:
        """Differences between this solution and the provided ones at every
        time point present (within ``atol``) in all of them."""
        if len(solutions) == 0:
            raise ValueError("length of solutions must be greater than 0")

        all_time_points = [self._t_coordinates] + [
            s.t_coordinates for s in solutions
        ]
        all_time_steps = [self._d_t] + [s.d_t for s in solutions]
        other_ys = [s.discrete_y(self._vertex_oriented) for s in solutions]

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
                        - self._discrete_y[indices[0]]
                    )

        return Diffs(
            np.array(matching_times),
            [np.array(d) for d in all_diffs],
        )

    def generate_plots(self, **kwargs) -> Generator["Plot", None, None]:
        """Yields every plot type applicable to the solved problem."""
        from pararealml_tpu.plot import (
            ContourPlot,
            NBodyPlot,
            PhaseSpacePlot,
            QuiverPlot,
            ScatterPlot,
            SpaceLinePlot,
            StreamPlot,
            SurfacePlot,
            TimePlot,
        )

        cp = self._ivp.constrained_problem
        diff_eq = cp.differential_equation

        if diff_eq.x_dimension > 3:
            return

        if diff_eq.x_dimension == 0:
            if isinstance(diff_eq, NBodyGravitationalEquation):
                yield NBodyPlot(self._discrete_y, diff_eq, **kwargs)
            else:
                yield TimePlot(
                    self._discrete_y, self._t_coordinates, **kwargs
                )
                if 2 <= diff_eq.y_dimension <= 3:
                    yield PhaseSpacePlot(self._discrete_y, **kwargs)
            return

        vector_indices: Set[int] = set()
        if diff_eq.x_dimension > 1 and diff_eq.all_vector_field_indices:
            for indices in diff_eq.all_vector_field_indices:
                vector_indices.update(indices)
                vector_field = self._discrete_y[..., indices]
                yield QuiverPlot(
                    vector_field, cp.mesh, self._vertex_oriented, **kwargs
                )
                if diff_eq.x_dimension == 2:
                    yield StreamPlot(
                        vector_field,
                        cp.mesh,
                        self._vertex_oriented,
                        **kwargs,
                    )

        for i in range(diff_eq.y_dimension):
            if i in vector_indices:
                continue
            scalar_field = self._discrete_y[..., i: i + 1]
            if diff_eq.x_dimension == 1:
                yield SpaceLinePlot(
                    scalar_field, cp.mesh, self._vertex_oriented, **kwargs
                )
            elif diff_eq.x_dimension == 2:
                yield ContourPlot(
                    scalar_field, cp.mesh, self._vertex_oriented, **kwargs
                )
                yield SurfacePlot(
                    scalar_field, cp.mesh, self._vertex_oriented, **kwargs
                )
            else:
                yield ScatterPlot(
                    scalar_field, cp.mesh, self._vertex_oriented, **kwargs
                )
