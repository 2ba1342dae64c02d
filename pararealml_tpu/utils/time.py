"""Timing utilities.

Capability match for /root/reference/pararealml/utils/time.py:8-71. The
reference's ``@mpi_time`` barriers MPI ranks around the call; the
device-aware variant here instead synchronizes with the asynchronous XLA
dispatch queue — it blocks until every pending device computation in the
returned value (and, before starting, a device sync point) has finished,
so the measured wall-clock covers the actual device work rather than
just the host-side dispatch.
"""

from __future__ import annotations

import functools
from timeit import default_timer as timer
from typing import Any, Callable, Optional, Tuple

import jax


def time(function_name: Optional[str] = None) -> Callable:
    """Wraps a function to print and return its wall-clock runtime
    alongside its value: ``wrapped(*args) -> (value, runtime)``."""

    def _provider(function: Callable, name: Optional[str]) -> Callable:
        if name is None:
            name = f"{function.__name__!r}"

        @functools.wraps(function)
        def _wrapper(*args: Any, **kwargs: Any) -> Tuple[Any, float]:
            start_time = timer()
            value = function(*args, **kwargs)
            run_time = timer() - start_time
            print(f"{name} completed in {run_time}s")
            return value, run_time

        return _wrapper

    return lambda function: _provider(function, function_name)


def device_time(function_name: Optional[str] = None) -> Callable:
    """Like :func:`time` but synchronized with the device: waits for all
    in-flight device work before starting the clock and blocks on every
    device array in the return value before stopping it (the analog of
    the reference's barrier-fenced ``@mpi_time``)."""

    def _provider(function: Callable, name: Optional[str]) -> Callable:
        if name is None:
            name = f"{function.__name__!r}"

        @functools.wraps(function)
        def _wrapper(*args: Any, **kwargs: Any) -> Tuple[Any, float]:
            # fence: flush any asynchronous work already dispatched
            jax.block_until_ready(
                jax.device_put(0.0)
            )
            start_time = timer()
            value = function(*args, **kwargs)
            jax.block_until_ready(
                [
                    leaf
                    for leaf in jax.tree_util.tree_leaves(value)
                    if isinstance(leaf, jax.Array)
                ]
            )
            run_time = timer() - start_time
            if jax.process_index() == 0:
                print(f"{name} completed in {run_time}s")
            return value, run_time

        return _wrapper

    return lambda function: _provider(function, function_name)


# The closest analog to the reference's MPI-barrier timing in a
# single-controller JAX program is device-synchronized timing.
mesh_time = device_time
