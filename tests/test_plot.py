import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from pararealml_tpu import (
    ContourPlot,
    CoordinateSystem,
    Mesh,
    NBodyGravitationalEquation,
    NBodyPlot,
    PhaseSpacePlot,
    QuiverPlot,
    ScatterPlot,
    SpaceLinePlot,
    StreamPlot,
    SurfacePlot,
    TimePlot,
)


def test_time_plot(tmp_path):
    y = np.random.rand(10, 3)
    t = np.linspace(0.0, 1.0, 10)
    plot = TimePlot(y, t, legend_location="upper right")
    plot.save(str(tmp_path / "time_plot"))
    plot.close()
    assert (tmp_path / "time_plot.png").exists()

    with pytest.raises(ValueError):
        TimePlot(np.random.rand(10), t)
    with pytest.raises(ValueError):
        TimePlot(y, np.linspace(0.0, 1.0, 5))


def test_phase_space_plot(tmp_path):
    for components in (2, 3):
        plot = PhaseSpacePlot(np.random.rand(10, components))
        plot.save(str(tmp_path / f"phase_{components}"))
        plot.close()
        assert (tmp_path / f"phase_{components}.png").exists()

    with pytest.raises(ValueError):
        PhaseSpacePlot(np.random.rand(10, 4))


def test_n_body_plot(tmp_path):
    for dims in (2, 3):
        diff_eq = NBodyGravitationalEquation(dims, [1.0, 2.0])
        y = np.random.rand(5, diff_eq.y_dimension)
        plot = NBodyPlot(y, diff_eq, n_frames=2)
        plot.save(str(tmp_path / f"n_body_{dims}"))
        plot.close()
        assert (tmp_path / f"n_body_{dims}.gif").exists()

    with pytest.raises(ValueError):
        NBodyPlot(np.random.rand(5, 3), NBodyGravitationalEquation(
            2, [1.0, 2.0]
        ))


def test_space_line_plot(tmp_path):
    mesh = Mesh([(0.0, 1.0)], [0.25])
    y = np.random.rand(4, 5, 1)
    plot = SpaceLinePlot(y, mesh, True, n_frames=2)
    plot.save(str(tmp_path / "space_line"))
    plot.close()
    assert (tmp_path / "space_line.gif").exists()

    with pytest.raises(ValueError):
        SpaceLinePlot(np.random.rand(4, 6, 1), mesh, True)


def test_contour_and_surface_plots(tmp_path):
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    y = np.random.rand(3, 3, 3, 1)
    for name, cls in (("contour", ContourPlot), ("surface", SurfacePlot)):
        plot = cls(y, mesh, True, n_frames=2)
        plot.save(str(tmp_path / name))
        plot.close()
        assert (tmp_path / f"{name}.gif").exists()

    with pytest.raises(ValueError):
        ContourPlot(np.random.rand(3, 3, 3, 2), mesh, True)


def test_scatter_plot(tmp_path):
    mesh = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    y = np.random.rand(2, 3, 3, 3, 1)
    plot = ScatterPlot(y, mesh, True, n_frames=2)
    plot.save(str(tmp_path / "scatter"))
    plot.close()
    assert (tmp_path / "scatter.gif").exists()


def test_stream_plot_cartesian_and_polar(tmp_path):
    cartesian = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    y = np.random.rand(2, 5, 5, 2)
    plot = StreamPlot(y, cartesian, True, n_frames=2)
    plot.save(str(tmp_path / "stream"))
    plot.close()
    assert (tmp_path / "stream.gif").exists()

    polar = Mesh(
        [(0.5, 1.0), (0.0, 2.0 * np.pi)],
        [0.125, np.pi / 2.0],
        CoordinateSystem.POLAR,
    )
    y_polar = np.random.rand(2, 5, 5, 2)
    plot = StreamPlot(y_polar, polar, True, n_frames=2)
    plot.save(str(tmp_path / "stream_polar"))
    plot.close()
    assert (tmp_path / "stream_polar.gif").exists()


def test_quiver_plot_2d_and_3d(tmp_path):
    mesh_2d = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    plot = QuiverPlot(
        np.random.rand(2, 3, 3, 2), mesh_2d, True, n_frames=2,
        normalize=True,
    )
    plot.save(str(tmp_path / "quiver_2d"))
    plot.close()
    assert (tmp_path / "quiver_2d.gif").exists()

    mesh_3d = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    plot = QuiverPlot(
        np.random.rand(2, 3, 3, 3, 3), mesh_3d, True, n_frames=2
    )
    plot.save(str(tmp_path / "quiver_3d"))
    plot.close()
    assert (tmp_path / "quiver_3d.gif").exists()

    with pytest.raises(ValueError):
        QuiverPlot(np.random.rand(2, 3, 3, 1), mesh_2d, True)


def test_space_line_plot_validation():
    mesh_2d = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    with pytest.raises(ValueError):  # wrong x dimension
        SpaceLinePlot(np.random.rand(4, 3, 3, 1), mesh_2d, True)
    mesh = Mesh([(0.0, 1.0)], [0.25])
    with pytest.raises(ValueError):  # wrong y rank
        SpaceLinePlot(np.random.rand(4, 5), mesh, True)
    with pytest.raises(ValueError):  # wrong y dimension
        SpaceLinePlot(np.random.rand(4, 5, 2), mesh, True)


def test_contour_plot_validation():
    mesh_1d = Mesh([(0.0, 1.0)], [0.25])
    with pytest.raises(ValueError):  # wrong x dimension
        ContourPlot(np.random.rand(3, 5, 1), mesh_1d, True)
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    with pytest.raises(ValueError):  # wrong y rank
        ContourPlot(np.random.rand(3, 3, 3), mesh, True)
    with pytest.raises(ValueError):  # mismatched mesh shape
        ContourPlot(np.random.rand(3, 4, 4, 1), mesh, True)


def test_surface_plot_validation():
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    with pytest.raises(ValueError):
        SurfacePlot(np.random.rand(3, 3, 3, 2), mesh, True)
    with pytest.raises(ValueError):
        SurfacePlot(np.random.rand(3, 2, 2, 1), mesh, True)


def test_scatter_plot_validation():
    mesh_2d = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.5, 0.5])
    with pytest.raises(ValueError):  # wrong x dimension
        ScatterPlot(np.random.rand(2, 3, 3, 1), mesh_2d, True)
    mesh = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    with pytest.raises(ValueError):  # wrong y dimension
        ScatterPlot(np.random.rand(2, 3, 3, 3, 2), mesh, True)


def test_stream_plot_validation():
    mesh_3d = Mesh([(0.0, 1.0)] * 3, [0.5] * 3)
    with pytest.raises(ValueError):  # wrong x dimension
        StreamPlot(np.random.rand(2, 3, 3, 3, 3), mesh_3d, True)
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    with pytest.raises(ValueError):  # wrong y dimension (not a 2-field)
        StreamPlot(np.random.rand(2, 5, 5, 1), mesh, True)
    with pytest.raises(ValueError):  # mismatched mesh shape
        StreamPlot(np.random.rand(2, 4, 4, 2), mesh, True)


def test_spherical_quiver_plot(tmp_path):
    mesh = Mesh(
        [(0.5, 1.0), (0.0, np.pi), (0.1, np.pi / 2)],
        [0.25, np.pi / 2, np.pi / 8],
        CoordinateSystem.SPHERICAL,
    )
    y = np.random.rand(2, *mesh.vertices_shape, 3)
    plot = QuiverPlot(y, mesh, True, n_frames=2)
    plot.save(str(tmp_path / "quiver_spherical"))
    plot.close()
    assert (tmp_path / "quiver_spherical.gif").exists()


def test_cell_oriented_plots(tmp_path):
    mesh = Mesh([(0.0, 1.0), (0.0, 1.0)], [0.25, 0.25])
    y = np.random.rand(2, *mesh.cells_shape, 1)
    plot = ContourPlot(y, mesh, False, n_frames=2)
    plot.save(str(tmp_path / "contour_cells"))
    plot.close()
    assert (tmp_path / "contour_cells.gif").exists()


def test_animated_plot_frame_subsampling(tmp_path):
    mesh = Mesh([(0.0, 1.0)], [0.25])
    # 20 time steps rendered as 4 frames
    y = np.random.rand(20, 5, 1)
    plot = SpaceLinePlot(y, mesh, True, n_frames=4)
    plot.save(str(tmp_path / "subsampled"))
    plot.close()
    assert (tmp_path / "subsampled.gif").exists()


def test_phase_space_plot_rank_validation():
    with pytest.raises(ValueError):
        PhaseSpacePlot(np.random.rand(10))


def test_quiver_plot_validation():
    mesh = Mesh([(0.0, 1.0)] * 2, [0.5] * 2)
    good = np.random.rand(2, 3, 3, 2)
    # wrong vector dimension for the mesh
    with pytest.raises(ValueError):
        QuiverPlot(np.random.rand(2, 3, 3, 3), mesh, True)
    # mismatched spatial shape
    with pytest.raises(ValueError):
        QuiverPlot(np.random.rand(2, 4, 4, 2), mesh, True)
    # 1D meshes have no quiver representation
    with pytest.raises(ValueError):
        QuiverPlot(
            np.random.rand(2, 3, 1),
            Mesh([(0.0, 1.0)], [0.5]),
            True,
        )
    plot = QuiverPlot(good, mesh, True, n_frames=2)
    plot.close()
