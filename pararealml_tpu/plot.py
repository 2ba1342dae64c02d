"""Visualization of solutions.

Capability match for /root/reference/pararealml/plot.py:24-1005: static and
animated matplotlib plots covering ODE systems (time series, phase space,
n-body animations) and 1D/2D/3D PDE solutions (line, contour, surface,
scatter, stream, and quiver plots), all curvilinear-mesh aware through
Cartesian coordinate-grid conversion. Everything here is host-side.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import matplotlib.pyplot as plt
import numpy as np
from matplotlib import cm
from matplotlib.animation import FuncAnimation
from matplotlib.cm import ScalarMappable
from matplotlib.colors import Colormap
from matplotlib.figure import Figure

from pararealml_tpu.differential_equation import NBodyGravitationalEquation
from pararealml_tpu.mesh import CoordinateSystem, Mesh


class Plot:
    """Base class for solution plots."""

    def __init__(self, figure: Figure):
        self._figure = figure

    def show(self) -> "Plot":
        """Displays the plot (and any other open figures)."""
        plt.show()
        return self

    def save(
        self, file_path: str, extension: str = "png", **kwargs
    ) -> "Plot":
        """Saves the plot as ``file_path.extension``."""
        self._figure.savefig(f"{file_path}.{extension}", **kwargs)
        return self

    def close(self):
        """Closes the underlying figure."""
        plt.close(self._figure)


class AnimatedPlot(Plot):
    """Base class for animated plots; subsamples the trajectory into
    ``n_frames`` evenly spaced frames."""

    def __init__(
        self,
        figure: Figure,
        init_func: Callable[[], None],
        update_func: Callable[[int], None],
        n_time_steps: int,
        n_frames: int,
        interval: int,
    ):
        super().__init__(figure)
        frames = np.linspace(0, n_time_steps - 1, n_frames, dtype=int)
        self._animation = FuncAnimation(
            figure,
            func=update_func,
            init_func=init_func,
            frames=frames,
            interval=interval,
        )

    def save(
        self, file_path: str, extension: str = "gif", **kwargs
    ) -> "Plot":
        self._animation.save(f"{file_path}.{extension}", **kwargs)
        return self

    @staticmethod
    def _check_pde_solution_shape(
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        expected_x_dims: Union[int, Tuple[int, int]],
        is_vector_field: bool,
    ):
        if isinstance(expected_x_dims, int):
            expected_x_dims = (expected_x_dims, expected_x_dims)
        if not expected_x_dims[0] <= mesh.dimensions <= expected_x_dims[1]:
            raise ValueError(
                f"mesh must be between {expected_x_dims[0]} and "
                f"{expected_x_dims[1]} dimensional"
            )
        if y.ndim != mesh.dimensions + 2:
            raise ValueError(
                f"number of y axes ({y.ndim}) must be two larger than mesh "
                f"dimensions ({mesh.dimensions})"
            )
        if y.shape[1:-1] != mesh.shape(vertex_oriented):
            raise ValueError(
                f"y shape {y.shape} must be compatible with mesh shape "
                f"{mesh.shape(vertex_oriented)}"
            )
        expected_components = mesh.dimensions if is_vector_field else 1
        if y.shape[-1] != expected_components:
            raise ValueError(
                f"number of y components ({y.shape[-1]}) must be "
                f"{expected_components}"
            )


class TimePlot(Plot):
    """y-against-t line plot for ODE solutions."""

    def __init__(
        self,
        y: np.ndarray,
        t: np.ndarray,
        legend_location: Optional[str] = None,
        **_,
    ):
        if y.ndim != 2:
            raise ValueError(f"number of y axes ({y.ndim}) must be 2")
        if t.ndim != 1:
            raise ValueError(f"number of t axes ({t.ndim}) must be 1")
        if y.shape[0] != t.shape[0]:
            raise ValueError(
                f"first axis of y ({y.shape[0]}) must match length of t "
                f"({t.shape[0]})"
            )

        fig, ax = plt.subplots()
        for i in range(y.shape[1]):
            ax.plot(t, y[:, i], label=f"y{i}")
        ax.set_xlabel("t")
        ax.set_ylabel("y")
        if legend_location is not None:
            ax.legend(loc=legend_location)
        fig.tight_layout()
        super().__init__(fig)


class PhaseSpacePlot(Plot):
    """2D/3D phase-space trajectory plot for ODE systems."""

    def __init__(self, y: np.ndarray, **_):
        if y.ndim != 2:
            raise ValueError(f"number of y axes ({y.ndim}) must be 2")
        if not 2 <= y.shape[1] <= 3:
            raise ValueError(
                f"number of y components ({y.shape[1]}) must be either "
                "2 or 3"
            )

        fig = plt.figure()
        if y.shape[1] == 2:
            ax = fig.add_subplot()
            ax.plot(y[:, 0], y[:, 1])
            ax.set_xlabel("y0")
            ax.set_ylabel("y1")
            ax.axis("equal")
        else:
            ax = fig.add_subplot(projection="3d")
            ax.plot3D(y[:, 0], y[:, 1], y[:, 2])
            ax.set_xlabel("y0")
            ax.set_ylabel("y1")
            ax.set_zlabel("y2")
            ax.set_box_aspect(tuple(np.ptp(y[:, i]) for i in range(3)))
        super().__init__(fig)


class NBodyPlot(AnimatedPlot):
    """Animated scatter plot of 2D/3D gravitational n-body solutions with
    mass-proportional markers and optional trajectory trails."""

    def __init__(
        self,
        y: np.ndarray,
        diff_eq: NBodyGravitationalEquation,
        n_frames: int = 100,
        interval: int = 100,
        color_map: Colormap = cm.cividis,
        smallest_marker_size: float = 10.0,
        draw_trajectory: bool = True,
        trajectory_line_style: str = ":",
        trajectory_line_width: float = 0.5,
        span_scaling_factor: float = 0.25,
        **_,
    ):
        if y.ndim != 2:
            raise ValueError(f"number of y axes ({y.ndim}) must be 2")
        if y.shape[1] != diff_eq.y_dimension:
            raise ValueError(
                f"number of y components ({y.shape[1]}) must match "
                "differential equation y dimension "
                f"({diff_eq.y_dimension})"
            )

        dims = diff_eq.spatial_dimension
        n_obj = diff_eq.n_objects
        n_pos = n_obj * dims

        # per-axis object coordinates over time: (T, n_obj) each
        axes_coords = [y[:, d:n_pos:dims] for d in range(dims)]
        limits = []
        for c in axes_coords:
            lo, hi = c.min(), c.max()
            pad = span_scaling_factor * (hi - lo)
            limits.append((lo - pad, hi + pad))

        masses = np.asarray(diff_eq.masses)
        scaled = (smallest_marker_size / masses.min()) * masses
        radii = np.cbrt(3.0 * scaled / (4.0 * np.pi))
        marker_sizes = np.pi * radii**2
        colors = color_map(np.linspace(0.0, 1.0, n_obj))

        self._scatter_plot = None
        self._line_plots: Optional[List] = None
        style = "dark_background"

        with plt.style.context(style):
            fig = plt.figure()
            ax = fig.add_subplot(projection="3d" if dims == 3 else None)

        def init_plot():
            with plt.style.context(style):
                ax.clear()
                first = [c[0, :] for c in axes_coords]
                scatter_kwargs = dict(s=marker_sizes, c=colors)
                if dims == 3:
                    scatter_kwargs["depthshade"] = False
                self._scatter_plot = ax.scatter(*first, **scatter_kwargs)

                if draw_trajectory:
                    self._line_plots = [
                        ax.plot(
                            *[c[:1, i] for c in axes_coords],
                            color=colors[i],
                            linestyle=trajectory_line_style,
                            linewidth=trajectory_line_width,
                        )[0]
                        for i in range(n_obj)
                    ]

                ax.set_xlabel("x")
                ax.set_ylabel("y")
                ax.set_xlim(*limits[0])
                ax.set_ylim(*limits[1])
                if dims == 2:
                    ax.axis("scaled")
                else:
                    ax.set_zlabel("z")
                    ax.set_zlim(*limits[2])
                    ax.set_box_aspect(
                        tuple(hi - lo for (lo, hi) in limits)
                    )
                    ax.set_facecolor("black")
                    for pane_axis in (ax.xaxis, ax.yaxis, ax.zaxis):
                        pane_axis.pane.fill = False
                    ax.grid(False)

        def update_plot(time_step: int):
            if dims == 2:
                self._scatter_plot.set_offsets(
                    np.stack(
                        [c[time_step, :] for c in axes_coords], axis=-1
                    )
                )
            else:
                self._scatter_plot._offsets3d = tuple(
                    c[time_step, :] for c in axes_coords
                )
            if draw_trajectory:
                for i, line in enumerate(self._line_plots):
                    line.set_xdata(axes_coords[0][: time_step + 1, i])
                    line.set_ydata(axes_coords[1][: time_step + 1, i])
                    if dims == 3:
                        line.set_3d_properties(
                            axes_coords[2][: time_step + 1, i]
                        )

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class SpaceLinePlot(AnimatedPlot):
    """Animated line plot for 1D PDE solutions."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        v_min: Optional[float] = None,
        v_max: Optional[float] = None,
        equal_scale: bool = False,
        **_,
    ):
        self._check_pde_solution_shape(y, mesh, vertex_oriented, 1, False)
        self._line_plot = None
        fig, ax = plt.subplots()

        def init_plot():
            ax.clear()
            (self._line_plot,) = ax.plot(
                mesh.coordinate_grids(vertex_oriented)[0], y[0, ..., 0]
            )
            ax.set_ylim(
                np.min(y) if v_min is None else v_min,
                np.max(y) if v_max is None else v_max,
            )
            ax.set_xlabel("x")
            ax.set_ylabel("y")
            if equal_scale:
                ax.axis("equal")

        def update_plot(time_step: int):
            self._line_plot.set_ydata(y[time_step, ..., 0])

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class ContourPlot(AnimatedPlot):
    """Animated filled contour plot for 2D PDE scalar fields."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        color_map: Colormap = cm.viridis,
        v_min: Optional[float] = None,
        v_max: Optional[float] = None,
        **_,
    ):
        self._check_pde_solution_shape(y, mesh, vertex_oriented, 2, False)

        grids = mesh.cartesian_coordinate_grids(vertex_oriented)
        v_min = np.min(y) if v_min is None else v_min
        v_max = np.max(y) if v_max is None else v_max
        self._contour_plot = None
        fig = plt.figure()

        def draw(ax, frame):
            return ax.contourf(
                *grids,
                y[frame, ..., 0],
                vmin=v_min,
                vmax=v_max,
                cmap=color_map,
            )

        def init_plot():
            fig.clear()
            ax = fig.add_subplot()
            self._contour_plot = draw(ax, 0)
            ax.set_xlabel("x0")
            ax.set_ylabel("x1")
            ax.axis("scaled")
            mappable = ScalarMappable(cmap=color_map)
            mappable.set_clim(v_min, v_max)
            fig.colorbar(mappable=mappable, ax=ax)

        def update_plot(time_step: int):
            ax = self._contour_plot.axes
            self._contour_plot.remove()
            self._contour_plot = draw(ax, time_step)

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class SurfacePlot(AnimatedPlot):
    """Animated 3D surface plot for 2D PDE scalar fields."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        color_map: Colormap = cm.viridis,
        v_min: Optional[float] = None,
        v_max: Optional[float] = None,
        equal_scale: bool = False,
        **_,
    ):
        self._check_pde_solution_shape(y, mesh, vertex_oriented, 2, False)

        grids = mesh.cartesian_coordinate_grids(vertex_oriented)
        v_min = np.min(y) if v_min is None else v_min
        v_max = np.max(y) if v_max is None else v_max

        x_0_ptp, x_1_ptp = np.ptp(grids[0]), np.ptp(grids[1])
        z_ptp = (v_max - v_min) if equal_scale else min(x_0_ptp, x_1_ptp)

        plot_kwargs = dict(
            vmin=v_min,
            vmax=v_max,
            rstride=1,
            cstride=1,
            linewidth=0,
            antialiased=False,
            cmap=color_map,
        )

        self._surface_plot = None
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")

        def init_plot():
            ax.clear()
            self._surface_plot = ax.plot_surface(
                *grids, y[0, ..., 0], **plot_kwargs
            )
            ax.set_xlabel("x0")
            ax.set_ylabel("x1")
            ax.set_zlabel("y")
            ax.set_zlim(v_min, v_max)
            ax.set_box_aspect((x_0_ptp, x_1_ptp, z_ptp))

        def update_plot(time_step: int):
            self._surface_plot.remove()
            self._surface_plot = ax.plot_surface(
                *grids, y[time_step, ..., 0], **plot_kwargs
            )

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class ScatterPlot(AnimatedPlot):
    """Animated 3D scatter plot for 3D PDE scalar fields."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        color_map: Colormap = cm.viridis,
        v_min: Optional[float] = None,
        v_max: Optional[float] = None,
        marker_shape: str = "o",
        marker_size: Union[float, np.ndarray] = 20.0,
        marker_opacity: float = 1.0,
        **_,
    ):
        self._check_pde_solution_shape(y, mesh, vertex_oriented, 3, False)

        grids = mesh.cartesian_coordinate_grids(vertex_oriented)
        mappable = ScalarMappable(cmap=color_map)
        mappable.set_clim(
            np.min(y) if v_min is None else v_min,
            np.max(y) if v_max is None else v_max,
        )

        self._scatter_plot = None
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")

        def init_plot():
            ax.clear()
            ax.set_xlabel("x0")
            ax.set_ylabel("x1")
            ax.set_zlabel("x2")
            ax.set_box_aspect(tuple(np.ptp(g) for g in grids))
            self._scatter_plot = ax.scatter(
                *grids,
                c=mappable.to_rgba(y[0, ..., 0].flatten()),
                marker=marker_shape,
                s=marker_size,
                alpha=marker_opacity,
            )

        def update_plot(time_step: int):
            self._scatter_plot.set_color(
                mappable.to_rgba(y[time_step, ..., 0].flatten())
            )

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class StreamPlot(AnimatedPlot):
    """Animated stream plot for 2D PDE vector fields (polar-aware)."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        color: str = "black",
        density: float = 1.0,
        **_,
    ):
        self._check_pde_solution_shape(y, mesh, vertex_oriented, 2, True)

        grids = mesh.coordinate_grids(vertex_oriented)
        self._stream_plot = None
        fig = plt.figure()

        if mesh.coordinate_system_type == CoordinateSystem.POLAR:
            (x_1_min, x_1_max), (x_0_min, x_0_max) = mesh.x_intervals
            x_1_min = 0
            x_0, x_1 = grids[1], grids[0]
            y_0, y_1 = y[..., 1], y[..., 0]
            ax = fig.add_subplot(projection="polar")
        else:
            (x_0_min, x_0_max), (x_1_min, x_1_max) = mesh.x_intervals
            x_0, x_1 = grids[0].T, grids[1].T
            y_0 = y[..., 0].transpose([0, 2, 1])
            y_1 = y[..., 1].transpose([0, 2, 1])
            ax = fig.add_subplot()

        def init_plot():
            ax.clear()
            self._stream_plot = ax.streamplot(
                x_0, x_1, y_0[0, ...], y_1[0, ...],
                color=color, density=density,
            )
            ax.set_xlim(x_0_min, x_0_max)
            ax.set_ylim(x_1_min, x_1_max)
            if mesh.coordinate_system_type == CoordinateSystem.CARTESIAN:
                ax.axis("scaled")
                ax.set_xlabel("x")
                ax.set_ylabel("y")

        def update_plot(time_step: int):
            for patch in list(ax.patches):
                patch.remove()
            self._stream_plot.lines.remove()
            self._stream_plot = ax.streamplot(
                x_0, x_1, y_0[time_step, ...], y_1[time_step, ...],
                color=color, density=density,
            )

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )


class QuiverPlot(AnimatedPlot):
    """Animated 2D/3D quiver plot for PDE vector fields; converts
    curvilinear components to Cartesian via the mesh's unit vectors."""

    def __init__(
        self,
        y: np.ndarray,
        mesh: Mesh,
        vertex_oriented: bool,
        n_frames: int = 100,
        interval: int = 100,
        normalize: bool = False,
        pivot: str = "middle",
        quiver_scale: float = 10.0,
        **_,
    ):
        self._check_pde_solution_shape(
            y, mesh, vertex_oriented, (2, 3), True
        )

        grids = mesh.cartesian_coordinate_grids(vertex_oriented)
        unit_vectors = mesh.unit_vector_grids(vertex_oriented)
        y_cartesian = sum(
            y[..., i: i + 1] * unit_vectors[i][np.newaxis, ...]
            for i in range(mesh.dimensions)
        )

        self._quiver_plot = None
        fig = plt.figure()

        if mesh.dimensions == 2:
            y_0 = np.array(y_cartesian[..., 0])
            y_1 = np.array(y_cartesian[..., 1])
            if normalize:
                magnitude = np.hypot(y_0, y_1)
                positive = magnitude > 0.0
                y_0[positive] /= magnitude[positive]
                y_1[positive] /= magnitude[positive]

            ax = fig.add_subplot()

            def init_plot():
                ax.clear()
                ax.set_xlabel("x")
                ax.set_ylabel("y")
                self._quiver_plot = ax.quiver(
                    *grids,
                    y_0[0, ...],
                    y_1[0, ...],
                    pivot=pivot,
                    angles="xy",
                    scale_units="xy",
                    scale=1.0 / quiver_scale,
                )
                ax.axis("scaled")

            def update_plot(time_step: int):
                self._quiver_plot.set_UVC(
                    y_0[time_step, ...], y_1[time_step, ...]
                )

        else:
            components = [
                y_cartesian[..., i] * quiver_scale for i in range(3)
            ]
            ax = fig.add_subplot(projection="3d")

            def init_plot():
                ax.clear()
                self._quiver_plot = ax.quiver(
                    *grids,
                    *[c[0, ...] for c in components],
                    pivot=pivot,
                    normalize=normalize,
                )
                ax.set_xlabel("x")
                ax.set_ylabel("y")
                ax.set_zlabel("z")
                ax.set_box_aspect(tuple(np.ptp(g) for g in grids))

            def update_plot(time_step: int):
                self._quiver_plot.remove()
                self._quiver_plot = ax.quiver(
                    *grids,
                    *[c[time_step, ...] for c in components],
                    pivot=pivot,
                    normalize=normalize,
                )

        super().__init__(
            fig, init_plot, update_plot, y.shape[0], n_frames, interval
        )
