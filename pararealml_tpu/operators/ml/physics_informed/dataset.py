"""Physics-informed training data.

Capability match for /root/reference/pararealml/operators/ml/
physics_informed/dataset.py:18-570: builds four arrays (initial-value
data, domain collocation points, initial collocation points, boundary
collocation points with NaN-masked condition values and the face axis)
and iterates over the Cartesian product of initial conditions and
collocation points in equal-size shuffled batches (strict divisibility,
``n_ic_repeats``).

All batches have static shapes by construction, so an epoch can be
exported as stacked arrays (:meth:`DatasetIterator.stacked_batches`) and
fed to a single jitted ``lax.scan`` training loop — one device dispatch
per epoch instead of the reference's per-batch generator feeding.
"""

from __future__ import annotations

import itertools
from typing import Generator, Iterable, NamedTuple, Optional, Sequence

import numpy as np

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.initial_condition import (
    VectorizedInitialConditionFunction,
)
from pararealml_tpu.initial_value_problem import TemporalDomainInterval
from pararealml_tpu.operators.ml.physics_informed.\
    collocation_point_sampler import CollocationPointSampler


class DomainBatch(NamedTuple):
    """A batch of (initial condition snapshot, domain point) pairs."""

    u: np.ndarray
    t: np.ndarray
    x: Optional[np.ndarray]


class InitialBatch(NamedTuple):
    """A batch of initial-condition collocation samples."""

    u: np.ndarray
    t: np.ndarray
    x: Optional[np.ndarray]
    y: np.ndarray


class BoundaryBatch(NamedTuple):
    """A batch of boundary collocation samples (NaN marks unconstrained
    condition values; ``axis`` is the boundary-normal axis)."""

    u: np.ndarray
    t: np.ndarray
    x: np.ndarray
    y: np.ndarray
    d_y_over_d_n: np.ndarray
    axis: np.ndarray


class Dataset:
    """Generator and container of physics-informed training data over
    variable initial conditions."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        t_interval: TemporalDomainInterval,
        y_0_functions: Iterable[VectorizedInitialConditionFunction],
        point_sampler: CollocationPointSampler,
        n_domain_points: int,
        n_boundary_points: int = 0,
        vertex_oriented: bool = False,
    ):
        x_dimension = cp.differential_equation.x_dimension
        if n_domain_points <= 0:
            raise ValueError(
                f"number of domain points ({n_domain_points}) must be "
                "greater than 0"
            )
        if n_boundary_points < 0:
            raise ValueError(
                f"number of boundary points ({n_boundary_points}) must "
                "be non-negative"
            )
        if not x_dimension and n_boundary_points:
            raise ValueError(
                "number of boundary points must be 0 for ODEs"
            )

        self._cp = cp
        self._t_interval = t_interval
        self._y_0_functions = y_0_functions
        self._point_sampler = point_sampler
        self._n_domain_points = n_domain_points
        self._n_boundary_points = n_boundary_points
        self._vertex_oriented = vertex_oriented

        self._initial_value_data = self._build_initial_value_data()
        self._domain_collocation_data = (
            self._build_domain_collocation_data()
        )
        self._initial_collocation_data = (
            self._build_initial_collocation_data()
        )
        self._boundary_collocation_data = (
            self._build_boundary_collocation_data()
        )

    @property
    def constrained_problem(self) -> ConstrainedProblem:
        """The constrained problem the dataset is built around."""
        return self._cp

    @property
    def initial_value_data(self) -> np.ndarray:
        """One row per initial condition function: its flattened values
        over the mesh points."""
        return self._initial_value_data

    @property
    def domain_collocation_data(self) -> np.ndarray:
        """Domain points; first column t, remaining columns x."""
        return self._domain_collocation_data

    @property
    def initial_collocation_data(self) -> np.ndarray:
        """Mesh points at t=0; first column t, remaining columns x."""
        return self._initial_collocation_data

    @property
    def boundary_collocation_data(self) -> Optional[np.ndarray]:
        """Boundary points: columns t, x, y conditions, normal-derivative
        conditions (NaN where unconstrained), and the face axis."""
        return self._boundary_collocation_data

    def get_iterator(
        self, n_batches: int, n_ic_repeats: int = 1, shuffle: bool = True
    ) -> "DatasetIterator":
        """An iterator over the Cartesian product of initial conditions
        and collocation points in ``n_batches`` equal batches."""
        return DatasetIterator(self, n_batches, n_ic_repeats, shuffle)

    # -- builders ----------------------------------------------------------

    def _build_initial_value_data(self) -> np.ndarray:
        if self._cp.differential_equation.x_dimension:
            x = self._cp.mesh.all_index_coordinates(
                self._vertex_oriented, flatten=True
            )
            data = np.vstack(
                [fn(x).flatten() for fn in self._y_0_functions]
            )
        else:
            data = np.array([fn(None) for fn in self._y_0_functions])
        data.setflags(write=False)
        return data

    def _build_domain_collocation_data(self) -> np.ndarray:
        points = self._point_sampler.sample_domain_points(
            self._n_domain_points, self._t_interval, self._cp.mesh
        )
        data = (
            np.concatenate((points.t, points.x), axis=1)
            if self._cp.differential_equation.x_dimension
            else points.t
        )
        data.setflags(write=False)
        return data

    def _build_initial_collocation_data(self) -> np.ndarray:
        if self._cp.differential_equation.x_dimension:
            x = self._cp.mesh.all_index_coordinates(
                self._vertex_oriented, flatten=True
            )
            data = np.hstack((np.zeros((len(x), 1)), x))
        else:
            data = np.zeros((1, 1))
        data.setflags(write=False)
        return data

    def _build_boundary_collocation_data(self) -> Optional[np.ndarray]:
        diff_eq = self._cp.differential_equation
        if not diff_eq.x_dimension:
            return None

        all_points = self._point_sampler.sample_boundary_points(
            self._n_boundary_points, self._t_interval, self._cp.mesh
        )

        rows = []
        for axis, (bc_pair, points_pair) in enumerate(
            zip(self._cp.boundary_conditions, all_points)
        ):
            for bc, points in zip(bc_pair, points_pair):
                if points is None:
                    continue
                n = len(points.t)
                nan_block = np.full((n, diff_eq.y_dimension), np.nan)
                y_values = nan_block.copy()
                d_y_values = nan_block.copy()
                for i in range(n):
                    if bc.has_y_condition:
                        y_values[i] = bc.y_condition(
                            points.x[i: i + 1], float(points.t[i, 0])
                        )[0]
                    if bc.has_d_y_condition:
                        d_y_values[i] = bc.d_y_condition(
                            points.x[i: i + 1], float(points.t[i, 0])
                        )[0]
                rows.append(
                    np.concatenate(
                        [
                            points.t,
                            points.x,
                            y_values,
                            d_y_values,
                            np.full((n, 1), float(axis)),
                        ],
                        axis=1,
                    )
                )

        data = np.concatenate(rows, axis=0)
        data.setflags(write=False)
        return data


class DatasetIterator:
    """Iterates over Cartesian-product batches of a :class:`Dataset`."""

    def __init__(
        self,
        dataset: Dataset,
        n_batches: int,
        n_ic_repeats: int = 1,
        shuffle: bool = True,
    ):
        self._dataset = dataset
        self._n_batches = n_batches
        self._n_ic_repeats = n_ic_repeats
        self._shuffle = shuffle

        iv_size = dataset.initial_value_data.shape[0]
        domain_size = dataset.domain_collocation_data.shape[0]
        initial_size = dataset.initial_collocation_data.shape[0]
        boundary_size = (
            0
            if dataset.boundary_collocation_data is None
            else dataset.boundary_collocation_data.shape[0]
        )

        self._total_domain_size = iv_size * domain_size
        self._total_initial_size = n_ic_repeats * iv_size * initial_size
        self._total_boundary_size = iv_size * boundary_size

        if (
            self._total_domain_size % n_batches
            or self._total_initial_size % n_batches
            or self._total_boundary_size % n_batches
        ):
            raise ValueError(
                "number of batches must be a common divisor of total "
                f"domain data size ({self._total_domain_size}), total "
                f"initial data size ({self._total_initial_size}), and "
                f"total boundary data size "
                f"({self._total_boundary_size})"
            )

        self._domain_batch_size = self._total_domain_size // n_batches
        self._initial_batch_size = self._total_initial_size // n_batches
        self._boundary_batch_size = self._total_boundary_size // n_batches

        self._domain_indices = self._cartesian_indices(
            iv_size, domain_size
        )
        self._initial_indices = np.tile(
            self._cartesian_indices(iv_size, initial_size),
            (n_ic_repeats, 1),
        )
        self._boundary_indices = (
            self._cartesian_indices(iv_size, boundary_size)
            if boundary_size
            else None
        )
        self._batch_index = 0

    def __len__(self) -> int:
        return self._n_batches

    def __iter__(self) -> "DatasetIterator":
        self._batch_index = 0
        if self._shuffle:
            np.random.shuffle(self._domain_indices)
            np.random.shuffle(self._initial_indices)
            if self._boundary_indices is not None:
                np.random.shuffle(self._boundary_indices)
        return self

    def __next__(self):
        if self._batch_index >= self._n_batches:
            raise StopIteration
        batch = self[self._batch_index]
        self._batch_index += 1
        return batch

    def __getitem__(self, index: int):
        return (
            self._domain_batch(index),
            self._initial_batch(index),
            self._boundary_batch(index),
        )

    @property
    def dataset(self) -> Dataset:
        """The dataset behind the iterator."""
        return self._dataset

    @property
    def domain_batch_size(self) -> int:
        """The per-batch number of domain samples."""
        return self._domain_batch_size

    @property
    def initial_batch_size(self) -> int:
        """The per-batch number of initial samples."""
        return self._initial_batch_size

    @property
    def boundary_batch_size(self) -> int:
        """The per-batch number of boundary samples."""
        return self._boundary_batch_size

    def to_infinite_generator(self) -> Generator:
        """A generator cycling over the (reshuffled) batches forever."""
        return (
            batch for _ in itertools.count(0) for batch in self
        )

    def device_epoch_inputs(self):
        """The dataset as device-resident arrays plus a jittable epoch
        builder — the input for whole-training-run compiled programs.

        Returns ``(data, epoch_batches)`` where ``data`` is a pytree of
        arrays (the four dataset tensors, pre-split into batch columns)
        and ``epoch_batches(data, key)`` reproduces
        :meth:`stacked_batches` — one (reshuffled) epoch of
        Cartesian-product batches with a leading ``n_batches`` axis —
        entirely on device. Shuffling draws a ``jax.random`` permutation
        of the Cartesian-product row order per epoch (the host path uses
        NumPy's global generator; the sample distribution is identical),
        so a training loop can ``lax.scan`` over per-epoch PRNG keys
        with zero host work and zero host->device data motion per epoch.
        """
        import jax
        import jax.numpy as jnp

        diff_eq = self._dataset.constrained_problem.differential_equation
        has_x = bool(diff_eq.x_dimension)
        n_batches = self._n_batches
        shuffle = self._shuffle
        iv_size = self._dataset.initial_value_data.shape[0]
        domain_size = self._dataset.domain_collocation_data.shape[0]
        initial_size = self._dataset.initial_collocation_data.shape[0]
        total_domain = self._total_domain_size
        total_initial = self._total_initial_size
        total_boundary = self._total_boundary_size
        y_dimension = diff_eq.y_dimension

        domain_collocation = self._dataset.domain_collocation_data
        initial_collocation = self._dataset.initial_collocation_data
        data = {
            "iv": jnp.asarray(self._dataset.initial_value_data),
            "domain_t": jnp.asarray(domain_collocation[:, :1]),
            "initial_t": jnp.asarray(initial_collocation[:, :1]),
        }
        if has_x:
            data["domain_x"] = jnp.asarray(domain_collocation[:, 1:])
            data["initial_x"] = jnp.asarray(initial_collocation[:, 1:])
        if total_boundary:
            boundary = self._dataset.boundary_collocation_data
            x_offset = 1
            y_offset = x_offset + diff_eq.x_dimension
            d_y_offset = y_offset + y_dimension
            axis_offset = d_y_offset + y_dimension
            data["boundary_t"] = jnp.asarray(boundary[:, :x_offset])
            data["boundary_x"] = jnp.asarray(
                boundary[:, x_offset:y_offset]
            )
            data["boundary_y"] = jnp.asarray(
                boundary[:, y_offset:d_y_offset]
            )
            data["boundary_d_y"] = jnp.asarray(
                boundary[:, d_y_offset:axis_offset]
            )
            data["boundary_axis"] = jnp.asarray(
                boundary[:, axis_offset].astype(np.int32)
            )
            boundary_size = boundary.shape[0]

        def batched_rows(key, total):
            rows = (
                jax.random.permutation(key, total)
                if shuffle
                else jnp.arange(total)
            )
            return rows.reshape(n_batches, total // n_batches)

        def epoch_batches(data, key):
            k_domain, k_initial, k_boundary = jax.random.split(key, 3)

            rows = batched_rows(k_domain, total_domain)
            domain = DomainBatch(
                data["iv"][rows // domain_size],
                data["domain_t"][rows % domain_size],
                data["domain_x"][rows % domain_size] if has_x else None,
            )

            rows = batched_rows(k_initial, total_initial)
            pair = rows % (iv_size * initial_size)
            iv_rows = pair // initial_size
            collocation_rows = pair % initial_size
            u = data["iv"][iv_rows]
            if has_x:
                iv_y = data["iv"].reshape(
                    iv_size, initial_size, y_dimension
                )
                initial = InitialBatch(
                    u,
                    data["initial_t"][collocation_rows],
                    data["initial_x"][collocation_rows],
                    iv_y[iv_rows, collocation_rows],
                )
            else:
                initial = InitialBatch(
                    u, data["initial_t"][collocation_rows], None, u
                )

            if not total_boundary:
                return domain, initial, None
            rows = batched_rows(k_boundary, total_boundary)
            collocation_rows = rows % boundary_size
            return (
                domain,
                initial,
                BoundaryBatch(
                    data["iv"][rows // boundary_size],
                    data["boundary_t"][collocation_rows],
                    data["boundary_x"][collocation_rows],
                    data["boundary_y"][collocation_rows],
                    data["boundary_d_y"][collocation_rows],
                    data["boundary_axis"][collocation_rows],
                ),
            )

        return data, epoch_batches

    def stacked_batches(self):
        """All batches of one (reshuffled) epoch stacked with a leading
        ``n_batches`` axis — the input for a jitted ``lax.scan`` over the
        epoch."""
        batches = list(self)
        domain = DomainBatch(
            *[
                None if batches[0][0][i] is None else np.stack(
                    [b[0][i] for b in batches]
                )
                for i in range(len(batches[0][0]))
            ]
        )
        initial = InitialBatch(
            *[
                None if batches[0][1][i] is None else np.stack(
                    [b[1][i] for b in batches]
                )
                for i in range(len(batches[0][1]))
            ]
        )
        if batches[0][2] is None:
            boundary = None
        else:
            boundary = BoundaryBatch(
                *[
                    np.stack([b[2][i] for b in batches])
                    for i in range(len(batches[0][2]))
                ]
            )
        return domain, initial, boundary

    # -- batch extraction --------------------------------------------------

    def _domain_batch(self, index: int) -> DomainBatch:
        start = index * self._domain_batch_size
        indices = self._domain_indices[
            start: start + self._domain_batch_size
        ]
        u = self._dataset.initial_value_data[indices[:, 0]]
        collocation = self._dataset.domain_collocation_data[
            indices[:, 1]
        ]
        has_x = self._dataset.constrained_problem.differential_equation\
            .x_dimension
        return DomainBatch(
            u.astype(np.float64),
            collocation[:, :1],
            collocation[:, 1:] if has_x else None,
        )

    def _initial_batch(self, index: int) -> InitialBatch:
        start = index * self._initial_batch_size
        indices = self._initial_indices[
            start: start + self._initial_batch_size
        ]
        iv_indices = indices[:, 0]
        collocation_indices = indices[:, 1]
        u = self._dataset.initial_value_data[iv_indices]
        collocation = self._dataset.initial_collocation_data[
            collocation_indices
        ]
        diff_eq = self._dataset.constrained_problem.differential_equation
        if diff_eq.x_dimension:
            x = collocation[:, 1:]
            y = u.reshape(
                (len(u), -1, diff_eq.y_dimension)
            )[np.arange(len(u)), collocation_indices, :]
        else:
            x = None
            y = u
        return InitialBatch(u, collocation[:, :1], x, y)

    def _boundary_batch(self, index: int) -> Optional[BoundaryBatch]:
        if self._boundary_batch_size == 0:
            return None
        start = index * self._boundary_batch_size
        indices = self._boundary_indices[
            start: start + self._boundary_batch_size
        ]
        u = self._dataset.initial_value_data[indices[:, 0]]
        collocation = self._dataset.boundary_collocation_data[
            indices[:, 1]
        ]
        diff_eq = self._dataset.constrained_problem.differential_equation
        x_offset = 1
        y_offset = x_offset + diff_eq.x_dimension
        d_y_offset = y_offset + diff_eq.y_dimension
        axis_offset = d_y_offset + diff_eq.y_dimension
        return BoundaryBatch(
            u,
            collocation[:, :x_offset],
            collocation[:, x_offset:y_offset],
            collocation[:, y_offset:d_y_offset],
            collocation[:, d_y_offset:axis_offset],
            collocation[:, axis_offset].astype(np.int32),
        )

    @staticmethod
    def _cartesian_indices(
        first_set_size: int, second_set_size: int
    ) -> np.ndarray:
        first = np.repeat(np.arange(first_set_size), second_set_size)
        second = np.tile(np.arange(second_set_size), first_set_size)
        return np.stack((first, second), axis=1)
