"""Model parameter persistence.

The reference has no built-in checkpointing (SURVEY.md §5) — model
persistence is implicit through Keras. Here trained parameters (any JAX
pytree) serialize to a single msgpack file via ``flax.serialization``,
and the ML regressors expose ``save``/``load`` built on these helpers.
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_pytree(path: str, pytree) -> None:
    """Serializes a pytree of arrays to ``path`` (msgpack)."""
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    host_pytree = jax.device_get(pytree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_pytree))


def load_pytree(path: str, like):
    """Restores a pytree saved with :func:`save_pytree`; ``like`` is a
    template pytree with the target structure (e.g. freshly initialized
    parameters)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())
