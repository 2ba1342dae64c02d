"""Regenerates the vendored reference-parity fixtures.

Run where the reference implementation is mounted (/root/reference):

    python tests/fixtures/generate_reference_fixtures.py

Writes ``reference_trajectories.npz``: one full FDM trajectory per
built-in equation family (the exact cases in tests/parity_cases.py)
plus the five integrators' single-step outputs, all computed by the
REFERENCE implementation. tests/test_vendored_parity.py compares this
package against these arrays in environments without the mount (CI),
so differential parity coverage never disappears with the reference.
"""

import os
import sys

import numpy as np

REFERENCE_PATH = "/root/reference"
REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)


def main():
    if not hasattr(np, "product"):
        np.product = np.prod  # the reference targets an older numpy
    sys.path.insert(0, REFERENCE_PATH)
    sys.path.insert(0, REPO_ROOT)
    import pararealml as ref
    import pararealml.operators.fdm as ref_fdm

    from tests.parity_cases import equation_cases, solve_fdm_trajectory

    arrays = {}
    for name, case in equation_cases().items():
        arrays[f"trajectory_{name}"] = solve_fdm_trajectory(
            vars(ref), vars(ref_fdm), case
        )
        print(name, arrays[f"trajectory_{name}"].shape)

    rng = np.random.default_rng(3)
    y = rng.standard_normal((9, 2))
    decay = np.array([0.8, 1.3])
    for integrator_name in (
        "ForwardEulerMethod",
        "ExplicitMidpointMethod",
        "RK4",
        "BackwardEulerMethod",
        "CrankNicolsonMethod",
    ):
        out = getattr(ref_fdm, integrator_name)().integral(
            y,
            0.0,
            0.01,
            lambda t, y_value: -decay * y_value + 0.5,
            lambda _: None,
        )
        arrays[f"integral_{integrator_name}"] = np.asarray(
            out, np.float64
        )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "reference_trajectories.npz",
    )
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
