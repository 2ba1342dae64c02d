"""Differential parity against VENDORED reference outputs.

tests/fixtures/reference_trajectories.npz holds full FDM trajectories
(one per built-in equation family) and single-step integrator outputs
computed by the reference implementation
(regenerate: python tests/fixtures/generate_reference_fixtures.py with
/root/reference mounted). These tests compare this package against
those arrays, so the differential-parity coverage of
tests/test_reference_parity.py survives in environments without the
reference mount (CI). A live-mount test over there asserts the fixtures
are themselves current.
"""

import os

import numpy as np
import pytest

from tests.parity_cases import equation_cases, solve_fdm_trajectory

_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "reference_trajectories.npz",
)

_EQUATION_TOLERANCES = {
    # iterative stream-function anti-Laplacian on both sides
    "navier_stokes": 1e-6,
}


@pytest.fixture(scope="module")
def fixtures():
    if not os.path.exists(_FIXTURE_PATH):
        pytest.skip("vendored parity fixtures not generated")
    with np.load(_FIXTURE_PATH) as data:
        yield {key: data[key] for key in data.files}


@pytest.mark.parametrize("case_name", sorted(equation_cases()))
def test_fdm_trajectory_matches_vendored_reference(
    fixtures, case_name
):
    import pararealml_tpu as mine
    import pararealml_tpu.operators.fdm as mine_fdm

    expected = fixtures[f"trajectory_{case_name}"]
    actual = solve_fdm_trajectory(
        vars(mine), vars(mine_fdm), equation_cases()[case_name]
    )
    assert actual.shape == expected.shape
    atol = _EQUATION_TOLERANCES.get(case_name, 1e-9)
    scale = max(1.0, float(np.abs(expected).max()))
    assert np.allclose(actual, expected, atol=atol * scale), (
        f"{case_name}: max diff "
        f"{float(np.abs(actual - expected).max()):.3e}"
    )


@pytest.mark.parametrize(
    "integrator_name",
    [
        "ForwardEulerMethod",
        "ExplicitMidpointMethod",
        "RK4",
        "BackwardEulerMethod",
        "CrankNicolsonMethod",
    ],
)
def test_integrator_matches_vendored_reference(
    fixtures, integrator_name
):
    import pararealml_tpu.operators.fdm as mine_fdm

    rng = np.random.default_rng(3)
    y = rng.standard_normal((9, 2))
    decay = np.array([0.8, 1.3])
    actual = np.asarray(
        getattr(mine_fdm, integrator_name)().integral(
            y,
            0.01,
            lambda offset, y_value: -decay * y_value + 0.5,
            lambda _: None,
        )
    )
    expected = fixtures[f"integral_{integrator_name}"]
    atol = (
        1e-12
        if integrator_name
        in ("ForwardEulerMethod", "ExplicitMidpointMethod", "RK4")
        else 1e-7
    )
    assert np.allclose(actual, expected, atol=atol)
