"""Reproducibility utilities.

Capability match for /root/reference/pararealml/utils/rand.py:7-120: a
fixed pool of 100 seeds and a one-call global seeding function. The seed
values are generated deterministically here (rather than hard-coded) and
the seeding additionally returns a ``jax.random`` key, since JAX RNG is
explicit-key based.
"""

from __future__ import annotations

import os
import random
from typing import List

import jax
import numpy as np

# A fixed pool of 100 seeds for repeatable experiment sweeps.
SEEDS: List[int] = [
    int(seed)
    for seed in np.random.default_rng(20260816).integers(
        0, 2**30, size=100
    )
]


def set_random_seed(seed: int) -> jax.Array:
    """Seeds every host-side random source (``PYTHONHASHSEED``,
    ``random``, NumPy) and returns a ``jax.random`` PRNG key derived from
    the same seed for device-side randomness."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
