import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    ContinuousInitialCondition,
    InitialValueProblem,
    LotkaVolterraEquation,
)


def _make_ivp(exact_y=None):
    cp = ConstrainedProblem(LotkaVolterraEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.array([10.0, 5.0]))
    return InitialValueProblem(cp, (0.0, 2.0), ic, exact_y)


def test_invalid_time_interval():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    ic = ContinuousInitialCondition(cp, lambda _: np.array([1.0, 1.0]))
    with pytest.raises(ValueError):
        InitialValueProblem(cp, (1.0, 0.0), ic)


def test_properties():
    ivp = _make_ivp()
    assert ivp.t_interval == (0.0, 2.0)
    assert not ivp.has_exact_solution
    with pytest.raises(RuntimeError):
        ivp.exact_y(1.0)


def test_exact_solution():
    ivp = _make_ivp(lambda _ivp, t, x: np.array([t, 2.0 * t]))
    assert ivp.has_exact_solution
    assert np.array_equal(ivp.exact_y(2.0), [2.0, 4.0])
