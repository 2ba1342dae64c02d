"""Initial conditions.

Capability match for /root/reference/pararealml/initial_condition.py:18-405:
discrete, constant, continuous, Gaussian, and marginal-Beta-product initial
conditions, with orientation resampling and automatic application of static
y constraints for vertex-oriented data. Resampling between orientations is
an on-device multilinear gather (pararealml_tpu.interpolation);
solvers receive plain arrays.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
from scipy.stats import beta as beta_dist
from scipy.stats import multivariate_normal

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.mesh import to_cartesian_coordinates

VectorizedInitialConditionFunction = Callable[
    [Optional[np.ndarray]], np.ndarray
]


class InitialCondition:
    """Base class for initial conditions."""

    def y_0(self, x: Optional[np.ndarray]) -> np.ndarray:
        """The initial value of y at the points ``x`` (``None`` for
        ODEs)."""
        raise NotImplementedError

    def discrete_y_0(
        self, vertex_oriented: Optional[bool] = None
    ) -> np.ndarray:
        """The initial values discretized on the vertices or cell centers
        of the mesh."""
        raise NotImplementedError


def _apply_static_y_constraints(cp: ConstrainedProblem, y: np.ndarray):
    constraint = cp.static_y_vertex_constraints
    if constraint is None:
        return y
    return np.asarray(constraint.apply(y))


class DiscreteInitialCondition(InitialCondition):
    """An initial condition given by an array over the mesh points."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        y_0: np.ndarray,
        vertex_oriented: Optional[bool] = None,
        interpolation_method: str = "linear",
    ):
        if cp.differential_equation.x_dimension and vertex_oriented is None:
            raise ValueError("vertex orientation must be defined for PDEs")
        y_0 = np.asarray(y_0, dtype=float)
        if y_0.shape != cp.y_shape(vertex_oriented):
            raise ValueError(
                f"discrete initial value shape {y_0.shape} must match "
                "constrained problem solution shape "
                f"{cp.y_shape(vertex_oriented)}"
            )

        self._cp = cp
        self._vertex_oriented = vertex_oriented
        self._interpolation_method = interpolation_method
        y_0 = np.copy(y_0)
        if vertex_oriented:
            y_0 = _apply_static_y_constraints(cp, y_0)
        self._y_0 = y_0

    def y_0(self, x: Optional[np.ndarray]) -> np.ndarray:
        if not self._cp.differential_equation.x_dimension:
            return np.copy(self._y_0)

        from pararealml_tpu.interpolation import grid_interpolate

        return np.asarray(
            grid_interpolate(
                self._y_0,
                self._cp.mesh.axis_coordinates(self._vertex_oriented),
                np.asarray(x),
                method=self._interpolation_method,
            )
        )

    def discrete_y_0(
        self, vertex_oriented: Optional[bool] = None
    ) -> np.ndarray:
        if vertex_oriented is None:
            vertex_oriented = self._vertex_oriented
        if (
            not self._cp.differential_equation.x_dimension
            or vertex_oriented == self._vertex_oriented
        ):
            return np.copy(self._y_0)

        resampled = self.y_0(
            self._cp.mesh.all_index_coordinates(vertex_oriented)
        )
        if vertex_oriented:
            resampled = _apply_static_y_constraints(self._cp, resampled)
        return resampled


class ConstantInitialCondition(DiscreteInitialCondition):
    """An initial condition constant in space per y component."""

    def __init__(self, cp: ConstrainedProblem, constant_y_0s: Sequence[float]):
        y_dim = cp.differential_equation.y_dimension
        if len(constant_y_0s) != y_dim:
            raise ValueError(
                f"length of constant y0 values ({len(constant_y_0s)}) must "
                f"match number of y components ({y_dim})"
            )
        y_0 = np.broadcast_to(
            np.array(constant_y_0s, dtype=float), cp.y_shape(True)
        ).copy()
        super().__init__(cp, y_0, True)


class ContinuousInitialCondition(InitialCondition):
    """An initial condition defined by a vectorized function of x."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        y_0_func: VectorizedInitialConditionFunction,
        multipliers: Optional[Sequence[float]] = None,
    ):
        diff_eq = cp.differential_equation
        if multipliers is not None:
            if len(multipliers) != diff_eq.y_dimension:
                raise ValueError(
                    f"length of multipliers ({len(multipliers)}) must "
                    "match number of y dimensions "
                    f"({diff_eq.y_dimension})"
                )
            self._multipliers = np.array(multipliers, dtype=float)
        else:
            self._multipliers = np.ones(diff_eq.y_dimension)

        self._cp = cp
        self._y_0_func = y_0_func
        self._discrete_y_0_vertices = self._discretize(True)
        self._discrete_y_0_cells = self._discretize(False)

    def y_0(self, x: Optional[np.ndarray]) -> np.ndarray:
        return np.multiply(self._y_0_func(x), self._multipliers)

    def discrete_y_0(
        self, vertex_oriented: Optional[bool] = None
    ) -> np.ndarray:
        return np.copy(
            self._discrete_y_0_vertices
            if vertex_oriented
            else self._discrete_y_0_cells
        )

    def _discretize(self, vertex_oriented: bool) -> np.ndarray:
        diff_eq = self._cp.differential_equation
        if not diff_eq.x_dimension:
            y_0 = np.asarray(self.y_0(None), dtype=float)
            if y_0.shape != self._cp.y_shape():
                raise ValueError(
                    "expected initial condition function output shape to "
                    f"be {self._cp.y_shape()} but got {y_0.shape}"
                )
            return y_0

        x = self._cp.mesh.all_index_coordinates(vertex_oriented, flatten=True)
        y_0 = np.asarray(self.y_0(x), dtype=float)
        if y_0.shape != (len(x), diff_eq.y_dimension):
            raise ValueError(
                "expected initial condition function output shape to be "
                f"{(len(x), diff_eq.y_dimension)} but got {y_0.shape}"
            )
        y_0 = y_0.reshape(self._cp.y_shape(vertex_oriented))
        if vertex_oriented:
            y_0 = _apply_static_y_constraints(self._cp, y_0)
        return y_0

    def _to_cartesian(self, x: np.ndarray) -> np.ndarray:
        cartesian = to_cartesian_coordinates(
            [x[:, i] for i in range(x.shape[1])],
            self._cp.mesh.coordinate_system_type,
        )
        return np.stack(cartesian, axis=-1)


class GaussianInitialCondition(ContinuousInitialCondition):
    """An initial condition given by multivariate Gaussian PDFs, one per y
    component, evaluated in Cartesian coordinates."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        means_and_covs: Sequence[Tuple[np.ndarray, np.ndarray]],
        multipliers: Optional[Sequence[float]] = None,
    ):
        diff_eq = cp.differential_equation
        if not diff_eq.x_dimension:
            raise ValueError("constrained problem must be a PDE")
        if len(means_and_covs) != diff_eq.y_dimension:
            raise ValueError(
                f"number of means and covariances ({len(means_and_covs)}) "
                "must match number of y dimensions "
                f"({diff_eq.y_dimension})"
            )
        x_dim = diff_eq.x_dimension
        for mean, cov in means_and_covs:
            if mean.shape != (x_dim,):
                raise ValueError(
                    f"expected mean shape to be {(x_dim,)} but got "
                    f"{mean.shape}"
                )
            if cov.shape != (x_dim, x_dim):
                raise ValueError(
                    f"expected covariance shape to be {(x_dim, x_dim)} but "
                    f"got {cov.shape}"
                )

        self._means_and_covs = deepcopy(means_and_covs)
        super().__init__(cp, self._gaussian_y_0, multipliers)

    def _gaussian_y_0(self, x: np.ndarray) -> np.ndarray:
        cartesian_x = self._to_cartesian(x)
        columns = [
            multivariate_normal.pdf(cartesian_x, mean=mean, cov=cov)
            for mean, cov in self._means_and_covs
        ]
        return np.stack(columns, axis=-1)


class MarginalBetaProductInitialCondition(ContinuousInitialCondition):
    """An initial condition given per y component by the product of
    per-axis Beta PDFs evaluated in Cartesian coordinates."""

    def __init__(
        self,
        cp: ConstrainedProblem,
        all_alphas_and_betas: Sequence[Sequence[Tuple[float, float]]],
        multipliers: Optional[Sequence[float]] = None,
    ):
        diff_eq = cp.differential_equation
        if len(all_alphas_and_betas) != diff_eq.y_dimension:
            raise ValueError(
                "number of alphas and betas sequences "
                f"({len(all_alphas_and_betas)}) must match the number of "
                f"y dimensions ({diff_eq.y_dimension})"
            )
        if any(
            len(params) != diff_eq.x_dimension
            for params in all_alphas_and_betas
        ):
            raise ValueError(
                "all sequences of alphas and betas must have same length "
                "as number of spatial dimensions "
                f"({diff_eq.x_dimension})"
            )

        self._all_alphas_and_betas = deepcopy(all_alphas_and_betas)
        super().__init__(cp, self._beta_y_0, multipliers)

    def _beta_y_0(self, x: np.ndarray) -> np.ndarray:
        cartesian_x = self._to_cartesian(x)
        columns = []
        for params in self._all_alphas_and_betas:
            pdfs = [
                beta_dist.pdf(cartesian_x[:, i], a, b)
                for i, (a, b) in enumerate(params)
            ]
            columns.append(np.prod(pdfs, axis=0))
        return np.stack(columns, axis=-1)


def vectorize_ic_function(
    ic_function: Callable[[Optional[Sequence[float]]], Sequence[float]]
) -> VectorizedInitialConditionFunction:
    """Lifts a single-point initial condition function to operate on an
    array of points."""

    def vectorized(x: Optional[np.ndarray]) -> np.ndarray:
        if x is None:
            return np.array(ic_function(None))
        return np.array([ic_function(point) for point in x])

    return vectorized
