"""Closed-form ridge regression of the full state-transition operator.

The reference's supervised-ML operator accepts any scikit-learn-protocol
regressor (/root/reference/pararealml/operators/ml/supervised/
supervised_ml_operator.py:238-284 calls plain ``fit``/``predict``/
``score``; its Keras wrapper exists to give neural nets that protocol,
sklearn_keras_regressor.py:13-214). This module supplies the protocol's
classical baseline as a first-class TPU-native model: a ridge
least-squares fit of the affine map ``y_{t+d_t} = W y_t + w0`` over the
*whole flattened state*.

Why it earns its keep here rather than in scikit-learn: the reference's
per-mesh-point input layout (supervised_ml_operator.py:359-379 — every
row carries the full flattened state plus one point's coordinates, and
predicts that point's value) makes a shared per-row linear model rank-1
in the state; a DeepONet's trunk breaks that symmetry but bounds the
map's rank by its feature width. This regressor instead reconstructs
the state pairs from the layout and fits the full-rank operator in one
normal-equations solve — for linear PDEs (diffusion et al.) the true
slice-jump map IS affine, so the fit is exact up to data conditioning,
and inference is a single ``(state, state)`` matvec that rides the MXU.
Composed as a Parareal coarse operator, the affine map is consumed
directly by the log-depth doubling-scan machinery
(:mod:`pararealml_tpu.ops.linear_propagator`), keeping the entire
coarse sweep on the matmul path.

The model is time-invariant by construction: any time/step-size feature
column in the layout is ignored, matching the auto-regressive
``SupervisedMLOperator`` mode whose step map does not depend on t.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from sklearn.base import BaseEstimator, RegressorMixin


class StateOperatorRidgeRegressor(RegressorMixin, BaseEstimator):
    """Scikit-learn-protocol ridge regression of the affine state map.

    :param state_size: the flattened solution size (the number of
        leading feature columns carrying the state in the supervised
        input layout)
    :param alpha: the ridge regularization strength, scaled by the
        number of state samples at fit time
    :param dtype: the dtype of the fitted operator used at inference
    """

    # SupervisedMLOperator.fit_model splits over whole state samples
    # instead of individual rows for models carrying this tag, keeping
    # the per-state row blocks this regressor reconstructs contiguous
    requires_state_blocks = True

    def __init__(
        self,
        state_size: int,
        alpha: float = 1e-7,
        dtype=jnp.float32,
    ):
        self.state_size = state_size
        self.alpha = alpha
        self.dtype = dtype
        self._weights: Optional[jnp.ndarray] = None
        self._intercept: Optional[jnp.ndarray] = None

    # -- fitted-operator surface -------------------------------------------

    @property
    def state_map(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The fitted ``(W, w0)`` of ``y' = W y + w0`` over the
        flattened state."""
        if self._weights is None:
            raise ValueError("regressor is not fitted")
        return self._weights, self._intercept

    @state_map.setter
    def state_map(self, value: Tuple[jnp.ndarray, jnp.ndarray]):
        weights, intercept = value
        weights = jnp.asarray(weights, self.dtype)
        intercept = jnp.asarray(intercept, self.dtype)
        if weights.shape != (self.state_size, self.state_size):
            raise ValueError(
                f"weights must be {(self.state_size,) * 2}, got "
                f"{weights.shape}"
            )
        if intercept.shape != (self.state_size,):
            raise ValueError(
                f"intercept must be ({self.state_size},), got "
                f"{intercept.shape}"
            )
        self._weights = weights
        self._intercept = intercept

    # -- layout handling ----------------------------------------------------

    def _to_state_pairs(
        self, x: np.ndarray, y: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Reconstructs ``(states, next_states)`` from the per-point
        supervised layout: rows arrive in blocks that share the same
        flattened state in the first ``state_size`` columns and carry
        one mesh point's target values each."""
        x = np.asarray(x)
        y = np.asarray(y)
        if x.ndim != 2 or x.shape[1] < self.state_size:
            raise ValueError(
                "inputs must be 2D with at least "
                f"{self.state_size} feature columns"
            )
        y = y.reshape(len(x), -1)
        y_dimension = y.shape[1]
        block = self.state_size // y_dimension
        if (
            block * y_dimension != self.state_size
            or len(x) % block != 0
        ):
            raise ValueError(
                "row count is not a whole number of state blocks"
            )
        states = x[::block, : self.state_size]
        next_states = y.reshape(-1, self.state_size)
        return states, next_states

    # -- sklearn protocol ---------------------------------------------------

    def fit(
        self, x: np.ndarray, y: np.ndarray
    ) -> "StateOperatorRidgeRegressor":
        states, next_states = self._to_state_pairs(x, y)
        n_samples = len(states)
        design = np.concatenate(
            [states, np.ones((n_samples, 1))], axis=1
        ).astype(np.float64)
        targets = next_states.astype(np.float64)
        gram = design.T @ design
        gram[np.diag_indices_from(gram)] += self.alpha * n_samples
        solution = np.linalg.solve(gram, design.T @ targets)
        self.state_map = (
            solution[:-1].T,
            solution[-1],
        )
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Per-row predictions for inputs in the supervised layout
        (each block of rows sharing a state yields that state's
        predicted next values, one mesh point per row)."""
        weights, intercept = self.state_map
        x = np.asarray(x)
        n_rows = len(x)
        # block size from the layout: every state column block repeats
        # for each of its mesh points; infer the per-state row count
        # from the first repetition boundary
        block = 1
        while block < n_rows and np.array_equal(
            x[block, : self.state_size], x[0, : self.state_size]
        ):
            block += 1
        if n_rows % block != 0:
            raise ValueError(
                "row count is not a whole number of state blocks"
            )
        states = jnp.asarray(
            x[::block, : self.state_size], self.dtype
        )
        predictions = states @ weights.T + intercept
        return np.asarray(predictions).reshape(n_rows, -1)

    def score(self, x: np.ndarray, y: np.ndarray) -> float:
        y = np.asarray(y).reshape(len(x), -1)
        predictions = self.predict(x)
        residual = float(np.sum((y - predictions) ** 2))
        total = float(np.sum((y - np.mean(y, axis=0)) ** 2))
        return 1.0 - residual / total if total else 1.0

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        from pararealml_tpu.utils.checkpoint import save_pytree

        save_pytree(
            path,
            {"weights": self._weights, "intercept": self._intercept},
        )

    def load(self, path: str) -> None:
        from pararealml_tpu.utils.checkpoint import load_pytree

        template = {
            "weights": jnp.zeros(
                (self.state_size, self.state_size), self.dtype
            ),
            "intercept": jnp.zeros((self.state_size,), self.dtype),
        }
        saved = load_pytree(path, template)
        self.state_map = (saved["weights"], saved["intercept"])
