"""The physics-informed loss around a Flax base model.

Capability match for /root/reference/pararealml/operators/ml/
physics_informed/physics_informed_regressor.py:18-420: a regressor whose
loss is the weighted sum of the mean squared differential-equation
residual (with per-LHS-type left-hand-side functions), the initial
condition error, and NaN-masked Dirichlet/Neumann boundary condition
errors, each tracked per y component.

Where the reference subclasses ``tf.keras.Model`` with taped
``train_step``s, this is a pure-functional loss: ``loss(params, batch)``
returns the scalar total and a metrics dict, and the operator jits the
whole epoch. The residual's time derivatives, Laplacians, and
boundary-normal derivatives are forward-mode JVPs of the model function.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from pararealml_tpu.constrained_problem import ConstrainedProblem
from pararealml_tpu.differential_equation import LHS
from pararealml_tpu.operators.ml.physics_informed.auto_differentiator import (
    AutoDifferentiator,
)
from pararealml_tpu.operators.ml.physics_informed.\
    physics_informed_ml_symbol_mapper import (
        PhysicsInformedMLSymbolMapArg,
        PhysicsInformedMLSymbolMapper,
    )


def _normalize_weights(weight, y_dimension: int, name: str):
    if isinstance(weight, (int, float)):
        return (float(weight),) * y_dimension
    weights = tuple(float(w) for w in weight)
    if len(weights) != y_dimension:
        raise ValueError(
            f"length of {name} ({len(weights)}) must match y dimension "
            f"({y_dimension})"
        )
    return weights


class PhysicsInformedRegressor:
    """A physics-informed regression model around a Flax base model that
    maps concatenated ``(u, t, x)`` rows to y."""

    def __init__(
        self,
        model: nn.Module,
        cp: ConstrainedProblem,
        diff_eq_loss_weight: Union[float, Sequence[float]] = 1.0,
        ic_loss_weight: Union[float, Sequence[float]] = 1.0,
        bc_loss_weight: Union[float, Sequence[float]] = 1.0,
        vertex_oriented: bool = False,
    ):
        diff_eq = cp.differential_equation
        y_dimension = diff_eq.y_dimension

        self._model = model
        self._cp = cp
        self._vertex_oriented = vertex_oriented
        self._diff_eq_loss_weights = _normalize_weights(
            diff_eq_loss_weight, y_dimension, "diff_eq_loss_weight"
        )
        self._ic_loss_weights = _normalize_weights(
            ic_loss_weight, y_dimension, "ic_loss_weight"
        )
        self._bc_loss_weights = _normalize_weights(
            bc_loss_weight, y_dimension, "bc_loss_weight"
        )

        self._symbol_mapper = PhysicsInformedMLSymbolMapper(cp)
        self._auto_diff = AutoDifferentiator()
        self._lhs_functions = self._create_lhs_functions()
        self._params = None

    # -- properties --------------------------------------------------------

    @property
    def model(self) -> nn.Module:
        """The base regression model."""
        return self._model

    @property
    def constrained_problem(self) -> ConstrainedProblem:
        """The constrained problem the model is built around."""
        return self._cp

    @property
    def differential_equation_loss_weights(self) -> Sequence[float]:
        """The per-component weights of the residual loss term."""
        return self._diff_eq_loss_weights

    @property
    def initial_condition_loss_weights(self) -> Sequence[float]:
        """The per-component weights of the IC loss term."""
        return self._ic_loss_weights

    @property
    def boundary_condition_loss_weights(self) -> Sequence[float]:
        """The per-component weights of the BC loss terms."""
        return self._bc_loss_weights

    @property
    def params(self):
        """The model parameters."""
        return self._params

    @params.setter
    def params(self, params):
        self._params = params

    # -- model application -------------------------------------------------

    def init_params(self, key: jax.Array):
        """Initializes (and stores) parameters for the base model using
        the input layout of this problem."""
        cp = self._cp
        diff_eq = cp.differential_equation
        u_size = int(
            jnp.prod(
                jnp.asarray(cp.y_shape(self._vertex_oriented))
            )
        )
        sample = jnp.zeros((1, u_size + 1 + diff_eq.x_dimension))
        self._params = self._model.init(key, sample)
        return self._params

    def apply(
        self,
        params,
        u: jax.Array,
        t: jax.Array,
        x: Optional[jax.Array],
    ) -> jax.Array:
        """Applies the base model to the concatenated inputs."""
        inputs = (
            jnp.concatenate([u, t], axis=1)
            if x is None
            else jnp.concatenate([u, t, x], axis=1)
        )
        return self._model.apply(params, inputs)

    def __call__(self, params, u, t, x) -> jax.Array:
        return self.apply(params, u, t, x)

    def save(self, path: str) -> None:
        """Saves the model parameters to ``path``."""
        if self._params is None:
            raise ValueError("model has no parameters")
        from pararealml_tpu.utils.checkpoint import save_pytree

        save_pytree(path, self._params)

    def load(self, path: str) -> None:
        """Restores parameters saved with :meth:`save`."""
        from pararealml_tpu.utils.checkpoint import load_pytree

        template = (
            self._params
            if self._params is not None
            else self.init_params(jax.random.PRNGKey(0))
        )
        self._params = load_pytree(path, template)

    # -- loss --------------------------------------------------------------

    def compute_batch_loss(
        self, params, domain_batch, initial_batch, boundary_batch
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """The weighted total physics-informed loss over one batch and
        the per-term metric values."""
        diff_eq = self._cp.differential_equation
        y_dimension = diff_eq.y_dimension

        diff_eq_loss = self._differential_equation_loss(
            params, domain_batch
        )
        ic_loss = self._initial_condition_loss(params, initial_batch)

        total = jnp.sum(
            jnp.asarray(self._diff_eq_loss_weights) * diff_eq_loss
        ) + jnp.sum(jnp.asarray(self._ic_loss_weights) * ic_loss)

        metrics = {
            "diff_eq_loss": diff_eq_loss,
            "ic_loss": ic_loss,
        }

        if diff_eq.x_dimension and boundary_batch is not None:
            dirichlet_loss, neumann_loss = (
                self._boundary_condition_loss(params, boundary_batch)
            )
            total = total + jnp.sum(
                jnp.asarray(self._bc_loss_weights)
                * (dirichlet_loss + neumann_loss)
            )
            metrics["dirichlet_bc_loss"] = dirichlet_loss
            metrics["neumann_bc_loss"] = neumann_loss
        else:
            zeros = jnp.zeros(y_dimension)
            metrics["dirichlet_bc_loss"] = zeros
            metrics["neumann_bc_loss"] = zeros

        metrics["loss"] = total
        return total, metrics

    def _create_lhs_functions(self):
        lhs_functions = []
        cs = (
            self._cp.mesh.coordinate_system_type
            if self._cp.differential_equation.x_dimension
            else None
        )
        for y_ind, lhs_type in enumerate(
            self._cp.differential_equation.symbolic_equation_system
            .lhs_types
        ):
            if lhs_type == LHS.D_Y_OVER_D_T:

                def d_y_over_d_t(arg, _i=y_ind):
                    return arg.auto_diff.batch_gradient(
                        arg.t,
                        lambda t: arg.y_fn(t, arg.x)[:, _i: _i + 1],
                        0,
                    )

                lhs_functions.append(d_y_over_d_t)
            elif lhs_type == LHS.Y:
                lhs_functions.append(
                    lambda arg, _i=y_ind: arg.y_hat[:, _i: _i + 1]
                )
            elif lhs_type == LHS.Y_LAPLACIAN:

                def y_laplacian(arg, _i=y_ind, _cs=cs):
                    return arg.auto_diff.batch_laplacian(
                        arg.x,
                        lambda x: arg.y_fn(arg.t, x)[:, _i: _i + 1],
                        _cs,
                    )

                lhs_functions.append(y_laplacian)
            else:
                raise ValueError(
                    f"unsupported left-hand side type ({lhs_type.name})"
                )
        return lhs_functions

    def _differential_equation_loss(
        self, params, domain_batch
    ) -> jax.Array:
        u, t, x = domain_batch.u, domain_batch.t, domain_batch.x

        def y_fn(t_arg, x_arg):
            return self.apply(params, u, t_arg, x_arg)

        y_hat = y_fn(t, x)
        arg = PhysicsInformedMLSymbolMapArg(
            self._auto_diff, t, x, y_fn, y_hat
        )
        rhs = self._symbol_mapper.map(arg)
        residual = jnp.concatenate(
            [
                self._lhs_functions[i](arg)
                - jnp.broadcast_to(
                    jnp.asarray(rhs[i], y_hat.dtype),
                    (y_hat.shape[0], 1),
                )
                for i in range(len(rhs))
            ],
            axis=1,
        )
        return jnp.mean(jnp.square(residual), axis=0)

    def _initial_condition_loss(self, params, initial_batch) -> jax.Array:
        y_hat = self.apply(
            params, initial_batch.u, initial_batch.t, initial_batch.x
        )
        return jnp.mean(
            jnp.square(y_hat - initial_batch.y), axis=0
        )

    def _boundary_condition_loss(
        self, params, boundary_batch
    ) -> Tuple[jax.Array, jax.Array]:
        u, t, x = boundary_batch.u, boundary_batch.t, boundary_batch.x
        y = boundary_batch.y
        d_y_over_d_n = boundary_batch.d_y_over_d_n
        axes = boundary_batch.axis

        def y_fn(x_arg):
            return self.apply(params, u, t, x_arg)

        y_hat = y_fn(x)
        d_y_over_d_n_hat = self._auto_diff.batch_gradient(
            x, y_fn, jnp.asarray(axes)
        )

        dirichlet_error = jnp.where(
            jnp.isnan(y), jnp.zeros_like(y), y_hat - y
        )
        neumann_error = jnp.where(
            jnp.isnan(d_y_over_d_n),
            jnp.zeros_like(d_y_over_d_n),
            d_y_over_d_n_hat - d_y_over_d_n,
        )
        return (
            jnp.mean(jnp.square(dirichlet_error), axis=0),
            jnp.mean(jnp.square(neumann_error), axis=0),
        )
