"""Collocation point sampling.

Capability match for /root/reference/pararealml/operators/ml/
physics_informed/collocation_point_sampler.py:29-130: uniform random
sampling of (t, x) points from the space-time domain and from the 2*dim
boundary faces (counts multinomially split, face coordinate pinned to the
domain bound). Host-side NumPy; the samples feed the dataset builder.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import numpy as np

from pararealml_tpu.initial_value_problem import TemporalDomainInterval
from pararealml_tpu.mesh import Mesh


class CollocationPoints(NamedTuple):
    """Collocation points from a spatio-temporal domain."""

    t: np.ndarray
    x: Optional[np.ndarray]


class AxialBoundaryPoints(NamedTuple):
    """Collocation points from the lower and upper boundaries of one
    spatial axis."""

    lower_boundary_points: Optional[CollocationPoints]
    upper_boundary_points: Optional[CollocationPoints]


class CollocationPointSampler:
    """Base class for collocation point samplers."""

    def sample_domain_points(
        self,
        n_points: int,
        t_interval: TemporalDomainInterval,
        mesh: Optional[Mesh],
    ) -> CollocationPoints:
        """Samples ``n_points`` points from the space-time domain (time
        only for ODEs)."""
        raise NotImplementedError

    def sample_boundary_points(
        self, n_points: int, t_interval: TemporalDomainInterval, mesh: Mesh
    ) -> Sequence[AxialBoundaryPoints]:
        """Samples ``n_points`` points distributed over the boundary
        faces, organized per axis as lower/upper pairs."""
        raise NotImplementedError


class UniformRandomCollocationPointSampler(CollocationPointSampler):
    """Uniform random sampling over the domain and its boundaries."""

    def sample_domain_points(
        self,
        n_points: int,
        t_interval: TemporalDomainInterval,
        mesh: Optional[Mesh],
    ) -> CollocationPoints:
        if n_points <= 0:
            raise ValueError(
                f"number of domain points ({n_points}) must be greater "
                "than 0"
            )
        t = np.random.uniform(*t_interval, (n_points, 1))
        if mesh is None:
            return CollocationPoints(t, None)
        lower_bounds, upper_bounds = zip(*mesh.x_intervals)
        x = np.random.uniform(
            lower_bounds, upper_bounds, (n_points, mesh.dimensions)
        )
        return CollocationPoints(t, x)

    def sample_boundary_points(
        self, n_points: int, t_interval: TemporalDomainInterval, mesh: Mesh
    ) -> Sequence[AxialBoundaryPoints]:
        if n_points <= 0:
            raise ValueError(
                f"number of boundary points ({n_points}) must be "
                "greater than 0"
            )
        lower_bounds, upper_bounds = zip(*mesh.x_intervals)
        counts = np.random.multinomial(
            n_points,
            np.full(2 * mesh.dimensions, 0.5 / mesh.dimensions),
        )

        all_points = []
        for axis in range(mesh.dimensions):
            sides: List[Optional[CollocationPoints]] = []
            for side in range(2):
                n_samples = counts[2 * axis + side]
                if n_samples == 0:
                    sides.append(None)
                    continue
                t = np.random.uniform(*t_interval, (n_samples, 1))
                x = np.random.uniform(
                    lower_bounds,
                    upper_bounds,
                    (n_samples, mesh.dimensions),
                )
                x[:, axis] = mesh.x_intervals[axis][side]
                sides.append(CollocationPoints(t, x))
            all_points.append(AxialBoundaryPoints(*sides))
        return all_points
