"""Batch differential operators via JAX forward-mode autodiff.

Capability match for /root/reference/pararealml/operators/ml/
physics_informed/auto_differentiator.py:8-569: the full differential
operator suite (gradient, Hessian, divergence, curl, scalar/vector
Laplacian) over batched network outputs, with all polar / cylindrical /
spherical metric terms, and support for a per-sample differentiation axis
(used for boundary-normal derivatives).

Paradigm shift from the reference: TensorFlow's ``GradientTape`` records
ops imperatively and ``batch_jacobian`` computes the *full* Jacobian to
then gather one column (auto_differentiator.py:530-569). JAX is
functional, so every method here takes the *function* ``y_fn`` mapping
the batched inputs to the outputs, and each directional derivative is a
single ``jax.jvp`` with a basis-vector tangent — one forward pass per
requested axis instead of a full Jacobian, and trivially fusable by XLA.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from pararealml_tpu.mesh import CoordinateSystem

BatchFunction = Callable[[jax.Array], jax.Array]


class AutoDifferentiator:
    """Differential operators over batched function outputs.

    Every method takes the input batch ``x`` of shape ``(n, x_dimension)``
    and a function ``y_fn`` mapping such a batch to outputs of shape
    ``(n, y_components)``.
    """

    def batch_gradient(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        x_axis: Union[int, jax.Array],
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """The derivative of y with respect to the element of x selected
        by ``x_axis`` (an int, or an int array selecting a per-sample
        axis), with the coordinate system's metric scaling."""
        derivative = self._batch_derivative(x, y_fn, x_axis)
        cs = coordinate_system_type

        if cs == CoordinateSystem.CARTESIAN or not isinstance(
            x_axis, int
        ):
            if cs != CoordinateSystem.CARTESIAN:
                raise ValueError(
                    "per-sample axis gradients are only supported in "
                    "Cartesian coordinates"
                )
            return derivative

        r = x[:, :1]
        if cs == CoordinateSystem.SPHERICAL:
            if x_axis == 0:
                return derivative
            if x_axis == 1:
                return derivative / (r * jnp.sin(x[:, 2:]))
            return derivative / r
        if x_axis == 1:
            return derivative / r
        return derivative

    def batch_hessian(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        x_axis1: int,
        x_axis2: int,
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """One component of the Hessian of y with all curvilinear metric
        terms."""
        d2 = self._batch_second_derivative(x, y_fn, x_axis1, x_axis2)
        cs = coordinate_system_type
        if cs == CoordinateSystem.CARTESIAN:
            return d2

        d1 = lambda axis: self._batch_derivative(  # noqa: E731
            x, y_fn, axis
        )
        r = x[:, :1]
        axes = (x_axis1, x_axis2)

        if cs == CoordinateSystem.SPHERICAL:
            phi = x[:, 2:]
            sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
            if axes == (0, 0):
                return d2
            if axes == (1, 1):
                return (
                    d1(0)
                    + (d2 / sin_phi + cos_phi * d1(2)) / (r * sin_phi)
                ) / r
            if axes == (2, 2):
                return (d2 / r + d1(0)) / r
            if 0 in axes and 1 in axes:
                return (d2 - d1(1) / r) / (r * sin_phi)
            if 0 in axes and 2 in axes:
                return (d2 - d1(2) / r) / r
            return (sin_phi * d2 - cos_phi * d1(1)) / (r * sin_phi) ** 2

        # polar / cylindrical
        if 1 not in axes:
            return d2
        if axes == (1, 1):
            return (d2 / r + d1(0)) / r
        if 0 in axes:
            return (d2 - d1(1) / r) / r
        return d2 / r

    def batch_divergence(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """The divergence of the vector field y."""
        x_dimension = x.shape[1]
        y = y_fn(x)
        if y.shape[1] != x_dimension:
            raise ValueError(
                f"number of y dimensions ({y.shape[1]}) must match "
                f"number of x dimensions ({x_dimension})"
            )

        def component(i):
            return lambda x_: y_fn(x_)[:, i: i + 1]

        d = lambda i, axis: self._batch_derivative(  # noqa: E731
            x, component(i), axis
        )
        cs = coordinate_system_type
        if cs == CoordinateSystem.CARTESIAN:
            return sum(d(i, i) for i in range(x_dimension))

        r = x[:, :1]
        y_r = y[:, :1]
        if cs == CoordinateSystem.SPHERICAL:
            phi = x[:, 2:]
            return d(0, 0) + (
                d(2, 2)
                + 2.0 * y_r
                + (d(1, 1) + jnp.cos(phi) * y[:, 2:]) / jnp.sin(phi)
            ) / r

        divergence = d(0, 0) + (y_r + d(1, 1)) / r
        if cs == CoordinateSystem.POLAR:
            return divergence
        return divergence + d(2, 2)

    def batch_curl(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        curl_ind: int = 0,
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """The ``curl_ind``-th component of the curl of y."""
        x_dimension = x.shape[1]
        y = y_fn(x)
        if y.shape[1] != x_dimension:
            raise ValueError(
                f"number of y dimensions ({y.shape[1]}) must match "
                f"number of x dimensions ({x_dimension})"
            )
        if not 2 <= x_dimension <= 3:
            raise ValueError(
                f"number of x dimensions ({x_dimension}) must be 2 or 3"
            )
        if x_dimension == 2 and curl_ind != 0:
            raise ValueError(
                f"curl index ({curl_ind}) must be 0 for 2D curl"
            )
        if not 0 <= curl_ind < x_dimension:
            raise ValueError(
                f"curl index ({curl_ind}) must be non-negative and "
                f"less than number of x dimensions ({x_dimension})"
            )

        def component(i):
            return lambda x_: y_fn(x_)[:, i: i + 1]

        d = lambda i, axis: self._batch_derivative(  # noqa: E731
            x, component(i), axis
        )
        cs = coordinate_system_type
        if cs == CoordinateSystem.CARTESIAN:
            if x_dimension == 2 or curl_ind == 2:
                return d(1, 0) - d(0, 1)
            if curl_ind == 0:
                return d(2, 1) - d(1, 2)
            return d(0, 2) - d(2, 0)

        r = x[:, :1]
        y_theta = y[:, 1:2]
        if cs == CoordinateSystem.SPHERICAL:
            phi = x[:, 2:]
            sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
            if curl_ind == 0:
                return (
                    d(1, 2) + (cos_phi * y_theta - d(2, 1)) / sin_phi
                ) / r
            if curl_ind == 1:
                return d(2, 0) + (y[:, 2:] - d(0, 2)) / r
            return -d(1, 0) + (d(0, 1) / sin_phi - y_theta) / r

        if cs == CoordinateSystem.POLAR or curl_ind == 2:
            return d(1, 0) + (y_theta - d(0, 1)) / r
        if curl_ind == 0:
            return d(2, 1) / r - d(1, 2)
        return d(0, 2) - d(2, 0)

    def batch_laplacian(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """The element-wise scalar Laplacian of y."""
        cs = coordinate_system_type
        d1 = lambda axis: self._batch_derivative(  # noqa: E731
            x, y_fn, axis
        )
        d2 = lambda a1, a2: self._batch_second_derivative(  # noqa: E731
            x, y_fn, a1, a2
        )
        if cs == CoordinateSystem.CARTESIAN:
            return sum(d2(i, i) for i in range(x.shape[1]))

        r = x[:, :1]
        if cs == CoordinateSystem.SPHERICAL:
            phi = x[:, 2:]
            sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
            return d2(0, 0) + (
                2.0 * d1(0)
                + (
                    d2(2, 2)
                    + (cos_phi * d1(2) + d2(1, 1) / sin_phi) / sin_phi
                )
                / r
            ) / r

        laplacian = d2(0, 0) + (d2(1, 1) / r + d1(0)) / r
        if cs == CoordinateSystem.POLAR:
            return laplacian
        return laplacian + d2(2, 2)

    def batch_vector_laplacian(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        vector_laplacian_ind: int,
        coordinate_system_type: CoordinateSystem = (
            CoordinateSystem.CARTESIAN
        ),
    ) -> jax.Array:
        """One component of the vector Laplacian of the vector field y."""
        x_dimension = x.shape[1]
        y = y_fn(x)
        if y.shape[1] != x_dimension:
            raise ValueError(
                f"number of y dimensions ({y.shape[1]}) must match "
                f"number of x dimensions ({x_dimension})"
            )
        if not 0 <= vector_laplacian_ind < x_dimension:
            raise ValueError(
                f"vector Laplacian index ({vector_laplacian_ind}) must "
                "be non-negative and less than number of x dimensions "
                f"({x_dimension})"
            )

        ind = vector_laplacian_ind
        laplacian = self.batch_laplacian(
            x,
            lambda x_: y_fn(x_)[:, ind: ind + 1],
            coordinate_system_type,
        )
        cs = coordinate_system_type
        if cs == CoordinateSystem.CARTESIAN:
            return laplacian

        def component(i):
            return lambda x_: y_fn(x_)[:, i: i + 1]

        d = lambda i, axis: self._batch_derivative(  # noqa: E731
            x, component(i), axis
        )
        r = x[:, :1]
        y_r, y_theta = y[:, :1], y[:, 1:2]

        if cs == CoordinateSystem.SPHERICAL:
            phi = x[:, 2:]
            sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
            y_phi = y[:, 2:]
            if ind == 0:
                return laplacian - 2.0 * (
                    y_r + d(2, 2) + (cos_phi * y_phi + d(1, 1)) / sin_phi
                ) / r**2
            if ind == 1:
                return laplacian + 2.0 * (
                    d(0, 1)
                    + (cos_phi * d(2, 1) - y_theta / 2.0) / sin_phi
                ) / (sin_phi * r**2)
            return laplacian + 2.0 * (
                d(0, 2)
                - (y_phi / 2.0 + cos_phi * d(1, 1)) / sin_phi**2
            ) / r**2

        if ind == 0:
            return laplacian - (y_r + 2.0 * d(1, 1)) / r**2
        if ind == 1:
            return laplacian - (y_theta - 2.0 * d(0, 1)) / r**2
        return laplacian

    # -- primitives --------------------------------------------------------

    def _batch_derivative(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        x_axis: Union[int, jax.Array],
    ) -> jax.Array:
        """The derivative of y with respect to one element of x via a
        single forward-mode JVP with a basis-vector tangent. An int array
        ``x_axis`` selects a (possibly different) axis per sample."""
        if isinstance(x_axis, int):
            if not 0 <= x_axis < x.shape[-1]:
                raise ValueError(
                    f"x-axis ({x_axis}) must be non-negative and less "
                    f"than number of x dimensions ({x.shape[-1]})"
                )
            tangent = (
                jnp.zeros_like(x).at[:, x_axis].set(1.0)
                if x.ndim > 1
                else jnp.ones_like(x)
            )
        else:
            x_axis = jnp.asarray(x_axis)
            if x_axis.ndim != 1:
                raise ValueError("x-axis must be a 1 dimensional array")
            if x_axis.shape[0] != x.shape[0]:
                raise ValueError(
                    f"length of x-axis ({x_axis.shape[0]}) must match "
                    f"number of x instances ({x.shape[0]})"
                )
            tangent = jax.nn.one_hot(
                x_axis, x.shape[-1], dtype=x.dtype
            )

        _, derivative = jax.jvp(y_fn, (x,), (tangent,))
        return derivative

    def _batch_second_derivative(
        self,
        x: jax.Array,
        y_fn: BatchFunction,
        x_axis1: int,
        x_axis2: int,
    ) -> jax.Array:
        """Forward-over-forward second derivative."""
        return self._batch_derivative(
            x,
            lambda x_: self._batch_derivative(x_, y_fn, x_axis1),
            x_axis2,
        )
