"""Tail-padded grids for spatial domain decomposition.

XLA's SPMD partitioner requires every sharded array dimension to be
divisible by the number of shards, while PDE grids almost always have
odd vertex counts (``extent / d_x + 1``). Rather than forcing users to
pick divisible grids — or forking the stencil math into a separate
``shard_map`` code path — the decomposed solve pads each sharded grid
axis at its *tail* with inert vertices and runs the ordinary compiled
program on the padded shapes.

Correctness rests on one invariant, enforced by
:class:`PaddedThreePointCentralDifferenceMethod`: every stencil
primitive applies the boundary conventions of the reference
discretization (zero halos for first derivatives, Neumann-synthesized
ghost vertices for second derivatives and Jacobi sweeps, constraint
overrides on boundary derivative values — see
/root/reference/pararealml/operators/fdm/numerical_differentiator.py:999-1242)
at the *real* upper boundary row via iota masks instead of at the array
face. Real vertices therefore never read pad vertices, the results at
real vertices are bit-identical to the unpadded program for arbitrarily
nested derivative expressions, and pad vertices are don't-care values
sliced off after the solve. All of it is plain element-wise/shift math,
so GSPMD partitions it with the same halo-exchange collectives as the
unpadded program. The reference has no counterpart — its parallelism is
time-only (MPI), with no spatial decomposition at all.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pararealml_tpu.constrained_problem import BoundaryConstraintPair
from pararealml_tpu.mesh import Mesh
from pararealml_tpu.operators.fdm.numerical_differentiator import (
    ThreePointCentralDifferenceMethod,
    _face,
    _inner_adjacent,
    _set_face,
    _shifted,
)


def resolve_spatial_partition(
    mesh, spec, x_dimension: int, forbidden_axes: Sequence[str] = ()
):
    """Expands a spatial ``PartitionSpec`` to one entry per grid axis
    and derives each axis's shard count from the mesh.

    Shared by ``FDMOperator``'s decomposed solve and the space-time
    Parareal so partition-entry handling cannot desynchronize between
    them. Returns ``(entries, shard_counts)``.
    """
    if len(spec) > x_dimension:
        raise ValueError(
            f"spatial partition {spec} names more axes than the "
            f"problem's {x_dimension} spatial dimensions"
        )
    entries = tuple(spec) + (None,) * (x_dimension - len(spec))
    shard_counts = []
    for entry in entries:
        if entry is None:
            shard_counts.append(1)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        count = 1
        for name in names:
            if name in forbidden_axes:
                raise ValueError(
                    f"the {name} axis cannot appear in the spatial "
                    "partition"
                )
            count *= mesh.shape[name]
        shard_counts.append(count)
    return entries, shard_counts


def padded_spatial_shape(
    real_shape: Sequence[int], shard_counts: Sequence[int]
) -> Tuple[int, ...]:
    """The smallest per-axis shape at or above ``real_shape`` where each
    axis is divisible by its shard count."""
    if len(real_shape) != len(shard_counts):
        raise ValueError(
            f"shard counts {tuple(shard_counts)} must cover all "
            f"{len(real_shape)} grid axes"
        )
    return tuple(
        -(-n // s) * s for n, s in zip(real_shape, shard_counts)
    )


def pad_spatial_tree(tree, real_shape, padded_shape):
    """Pads every array leaf of a constraint pytree with inert entries
    (zero values, ``False`` masks) along the grown spatial axes.

    Leaves are expected to span the spatial grid plus one trailing
    component axis, with boundary-pair faces carrying a collapsed
    (size-1) axis; leaves of any other rank are left untouched (scalar
    constraints broadcast unchanged).
    """
    real_shape = tuple(real_shape)
    padded_shape = tuple(padded_shape)
    ndim = len(real_shape) + 1

    def pad_leaf(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim != ndim:
            return leaf
        widths = []
        for axis, (n, m) in enumerate(zip(real_shape, padded_shape)):
            size = leaf.shape[axis]
            if size == n:
                widths.append((0, m - n))
            elif size in (1, m):
                widths.append((0, 0))
            else:
                raise ValueError(
                    f"constraint leaf axis {axis} has size {size}, "
                    f"expected {n} (real), {m} (padded) or 1 (face)"
                )
        widths.append((0, 0))
        if any(w != (0, 0) for w in widths):
            leaf = jnp.pad(leaf, widths)
        return leaf

    return jax.tree_util.tree_map(pad_leaf, tree)


def pad_state(y: jax.Array, real_shape, padded_shape) -> jax.Array:
    """Zero-pads the state's spatial axes from ``real_shape`` to
    ``padded_shape`` (trailing component axis untouched)."""
    widths = [
        (0, m - n) for n, m in zip(real_shape, padded_shape)
    ] + [(0, 0)]
    return jnp.pad(jnp.asarray(y), widths)


class PaddedThreePointCentralDifferenceMethod(
    ThreePointCentralDifferenceMethod
):
    """Three-point central differences on a tail-padded grid.

    Behaves exactly like :class:`ThreePointCentralDifferenceMethod` on a
    ``real_shape`` grid at every real vertex, while accepting arrays of
    ``padded_shape``: the upper-boundary conventions are applied at row
    ``real_shape[axis] - 1`` through iota-masked selects, pad vertices
    are zeroed before they can feed a stencil, and coordinate grids are
    edge-padded so curvilinear metric terms stay finite in the pad
    region. Lower boundaries coincide with the array face (padding is
    tail-only), so the inherited face logic applies there unchanged.
    """

    def __init__(
        self,
        real_shape: Sequence[int],
        padded_shape: Sequence[int],
        tol: float = 1e-3,
        max_iterations: int = 100_000,
    ):
        super().__init__(tol, max_iterations)
        self._real_shape = tuple(int(n) for n in real_shape)
        self._padded_shape = tuple(int(m) for m in padded_shape)
        if len(self._real_shape) != len(self._padded_shape):
            raise ValueError(
                f"real shape {self._real_shape} and padded shape "
                f"{self._padded_shape} must have the same rank"
            )
        if any(
            m < n
            for n, m in zip(self._real_shape, self._padded_shape)
        ):
            raise ValueError(
                f"padded shape {self._padded_shape} must be at least "
                f"the real shape {self._real_shape} along every axis"
            )

    # -- helpers -----------------------------------------------------------

    def _axis_iota(self, ndim: int, x_axis: int) -> jax.Array:
        shape = [1] * ndim
        shape[x_axis] = self._padded_shape[x_axis]
        return jnp.arange(self._padded_shape[x_axis]).reshape(shape)

    def _zero_axis_pads(self, y: jax.Array, x_axis: int) -> jax.Array:
        n = self._real_shape[x_axis]
        if self._padded_shape[x_axis] == n:
            return y
        return jnp.where(
            self._axis_iota(y.ndim, x_axis) < n, y, jnp.zeros((), y.dtype)
        )

    def zero_all_pads(self, y: jax.Array) -> jax.Array:
        """Zeroes every pad vertex of ``y`` (all grown axes)."""
        for axis, (n, m) in enumerate(
            zip(self._real_shape, self._padded_shape)
        ):
            if m != n:
                y = self._zero_axis_pads(y, axis)
        return y

    # -- overridden validation and geometry ---------------------------------

    def _check_shape(self, y: jax.Array, mesh: Mesh, name: str = "y"):
        if tuple(y.shape[:-1]) != self._padded_shape:
            raise ValueError(
                f"{name} shape up to second to last axis {y.shape[:-1]} "
                f"must match the padded grid shape {self._padded_shape}"
            )

    def _check_vector_field(self, y: jax.Array, mesh: Mesh):
        self._check_shape(y, mesh)
        if y.shape[-1] != mesh.dimensions:
            raise ValueError(
                f"y value vector length ({y.shape[-1]}) must match "
                f"number of x dimensions ({mesh.dimensions})"
            )

    def _grid(self, mesh: Mesh, axis: int) -> jax.Array:
        grid = mesh.device_coordinate_grids(True)[axis]
        widths = [
            (0, m - n)
            for n, m in zip(self._real_shape, self._padded_shape)
        ]
        if any(w != (0, 0) for w in widths):
            # edge values keep curvilinear metric divisions finite at
            # pad vertices (whose results are don't-care anyway)
            grid = jnp.pad(grid, widths, mode="edge")
        return grid[..., jnp.newaxis]

    # -- overridden stencil primitives --------------------------------------

    def _derivative(
        self,
        y: jax.Array,
        d_x: float,
        x_axis: int,
        constraint_pair: Optional[BoundaryConstraintPair],
    ) -> jax.Array:
        n = self._real_shape[x_axis]
        m = self._padded_shape[x_axis]
        if m == n:
            return super()._derivative(y, d_x, x_axis, constraint_pair)
        if n <= 2:
            raise ValueError(
                f"y must contain at least 3 points along x-axis ({x_axis})"
            )

        # with pad vertices zeroed, the central difference at the real
        # upper boundary row reads a zero — the same zero-halo
        # convention the unpadded face logic applies
        y0 = self._zero_axis_pads(y, x_axis)
        halo_shape = list(y.shape)
        halo_shape[x_axis] = 1
        halo = jnp.zeros(halo_shape, y.dtype)
        y_ext = jnp.concatenate([halo, y0, halo], axis=x_axis)
        derivative = (
            _shifted(y_ext, x_axis, 2, m) - _shifted(y_ext, x_axis, 0, m)
        ) / (2.0 * d_x)

        if constraint_pair is not None:
            if constraint_pair.lower is not None:
                face = _face(derivative, x_axis, 0)
                derivative = _set_face(
                    derivative,
                    x_axis,
                    0,
                    constraint_pair.lower.apply(face),
                )
            upper = constraint_pair.upper
            if upper is not None:
                at_boundary = self._axis_iota(y.ndim, x_axis) == n - 1
                derivative = jnp.where(
                    at_boundary & upper.mask, upper.values, derivative
                )
        return derivative

    def _extend_with_halos(
        self,
        y: jax.Array,
        x_axis: int,
        d_x: float,
        constraint_pair: Optional[BoundaryConstraintPair],
    ) -> jax.Array:
        n = self._real_shape[x_axis]
        m = self._padded_shape[x_axis]
        if m == n:
            return ThreePointCentralDifferenceMethod._extend_with_halos(
                y, x_axis, d_x, constraint_pair
            )

        y0 = self._zero_axis_pads(y, x_axis)

        lower_adjacent = _inner_adjacent(y0, x_axis, 0)
        lower_halo = jnp.zeros_like(lower_adjacent)
        if constraint_pair is not None and constraint_pair.lower is not None:
            lower_halo = constraint_pair.lower.multiply_and_add(
                lower_adjacent, -2.0 * d_x, lower_halo
            )

        # the Neumann ghost vertex of the real upper boundary sits at
        # the first pad row (index n): ghost = y[n - 2] + 2 d_x * value
        # where constrained, zero elsewhere — so the inherited central
        # stencils reproduce the unpadded face treatment exactly
        if constraint_pair is not None and constraint_pair.upper is not None:
            pad2_shape = list(y.shape)
            pad2_shape[x_axis] = 2
            shifted_down_2 = jnp.concatenate(
                [
                    jnp.zeros(pad2_shape, y.dtype),
                    jax.lax.slice_in_dim(y0, 0, m - 2, axis=x_axis),
                ],
                axis=x_axis,
            )
            upper = constraint_pair.upper
            ghost = jnp.where(
                upper.mask,
                shifted_down_2 + 2.0 * d_x * upper.values,
                jnp.zeros((), y.dtype),
            )
            y0 = jnp.where(
                self._axis_iota(y.ndim, x_axis) == n, ghost, y0
            )

        upper_halo_shape = list(y.shape)
        upper_halo_shape[x_axis] = 1
        upper_halo = jnp.zeros(upper_halo_shape, y.dtype)
        return jnp.concatenate(
            [lower_halo, y0, upper_halo], axis=x_axis
        )

    def _next_anti_laplacian_estimate(
        self, y_hat, laplacian, mesh, constraints
    ) -> jax.Array:
        estimate = super()._next_anti_laplacian_estimate(
            y_hat, laplacian, mesh, constraints
        )
        # pad vertices must not feed the Jacobi convergence norm
        return self.zero_all_pads(estimate)

    def anti_laplacian(
        self,
        laplacian,
        mesh,
        y_constraints,
        derivative_boundary_constraints=None,
        y_init=None,
    ) -> jax.Array:
        if y_init is not None:
            y_init = self.zero_all_pads(y_init)
        return super().anti_laplacian(
            self.zero_all_pads(laplacian),
            mesh,
            y_constraints,
            derivative_boundary_constraints,
            y_init,
        )
