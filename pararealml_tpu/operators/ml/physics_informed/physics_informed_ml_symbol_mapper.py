"""Symbol mapping to autodiff operations for physics-informed training.

Capability match for /root/reference/pararealml/operators/ml/
physics_informed/physics_informed_ml_symbol_mapper.py:13-129. The
reference's map argument carries taped tensors; the functional JAX
version carries the model forward ``y_fn(t, x)`` (closing over the
initial-condition snapshot and parameters) alongside the evaluated
``y_hat``, and each differential symbol maps to a
:class:`AutoDifferentiator` JVP of the appropriate component function.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Union

import jax
import numpy as np

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.operators.ml.physics_informed.auto_differentiator import (
    AutoDifferentiator,
)
from pararealml_tpu.operators.symbol_mapper import SymbolMapper


class PhysicsInformedMLSymbolMapArg(NamedTuple):
    """The argument to the physics-informed map functions."""

    auto_diff: AutoDifferentiator
    t: jax.Array
    x: Optional[jax.Array]
    y_fn: Callable[[jax.Array, Optional[jax.Array]], jax.Array]
    y_hat: jax.Array


PhysicsInformedMLSymbolMapFunction = Callable[
    [PhysicsInformedMLSymbolMapArg], jax.Array
]


class PhysicsInformedMLSymbolMapper(SymbolMapper):
    """Maps symbols to batched autodiff operations over the model."""

    def __init__(self, cp: ConstrainedProblem):
        diff_eq = cp.differential_equation
        super().__init__(diff_eq)
        self._coordinate_system_type = (
            cp.mesh.coordinate_system_type
            if diff_eq.x_dimension
            else None
        )

    @staticmethod
    def _component_fn(arg, components):
        return lambda x: arg.y_fn(arg.t, x)[:, components]

    def _components(self, y_indices, indices_contiguous):
        if indices_contiguous:
            return slice(y_indices[0], y_indices[-1] + 1)
        return list(y_indices)

    def t_map_function(self):
        return lambda arg: arg.t

    def y_map_function(self, y_ind: int):
        return lambda arg: arg.y_hat[:, y_ind: y_ind + 1]

    def x_map_function(self, x_axis: int):
        return lambda arg: arg.x[:, x_axis: x_axis + 1]

    def y_gradient_map_function(self, y_ind: int, x_axis: int):
        component = slice(y_ind, y_ind + 1)
        return lambda arg: arg.auto_diff.batch_gradient(
            arg.x,
            self._component_fn(arg, component),
            x_axis,
            self._coordinate_system_type,
        )

    def y_hessian_map_function(
        self, y_ind: int, x_axis1: int, x_axis2: int
    ):
        component = slice(y_ind, y_ind + 1)
        return lambda arg: arg.auto_diff.batch_hessian(
            arg.x,
            self._component_fn(arg, component),
            x_axis1,
            x_axis2,
            self._coordinate_system_type,
        )

    def y_divergence_map_function(
        self,
        y_indices: Sequence[int],
        indices_contiguous: Union[bool, np.bool_],
    ):
        components = self._components(y_indices, indices_contiguous)
        return lambda arg: arg.auto_diff.batch_divergence(
            arg.x,
            self._component_fn(arg, components),
            self._coordinate_system_type,
        )

    def y_curl_map_function(
        self,
        y_indices: Sequence[int],
        indices_contiguous: Union[bool, np.bool_],
        curl_ind: int,
    ):
        components = self._components(y_indices, indices_contiguous)
        return lambda arg: arg.auto_diff.batch_curl(
            arg.x,
            self._component_fn(arg, components),
            curl_ind,
            self._coordinate_system_type,
        )

    def y_laplacian_map_function(self, y_ind: int):
        component = slice(y_ind, y_ind + 1)
        return lambda arg: arg.auto_diff.batch_laplacian(
            arg.x,
            self._component_fn(arg, component),
            self._coordinate_system_type,
        )

    def y_vector_laplacian_map_function(
        self,
        y_indices: Sequence[int],
        indices_contiguous: Union[bool, np.bool_],
        vector_laplacian_ind: int,
    ):
        components = self._components(y_indices, indices_contiguous)
        return lambda arg: arg.auto_diff.batch_vector_laplacian(
            arg.x,
            self._component_fn(arg, components),
            vector_laplacian_ind,
            self._coordinate_system_type,
        )
