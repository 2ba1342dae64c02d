import numpy as np
import pytest

from pararealml_tpu.operator import Operator, discretize_time_domain


def test_operator_validates_d_t():
    class Dummy(Operator):
        def solve(self, ivp, parallel_enabled=True):
            raise NotImplementedError

    with pytest.raises(ValueError):
        Dummy(0.0, None)
    op = Dummy(0.5, True)
    assert op.d_t == 0.5
    assert op.vertex_oriented


def test_discretize_time_domain():
    t = discretize_time_domain((0.0, 1.0), 0.25)
    assert np.allclose(t, [0.0, 0.25, 0.5, 0.75, 1.0])

    t = discretize_time_domain((2.0, 3.0), 0.5)
    assert np.allclose(t, [2.0, 2.5, 3.0])

    # rounds to the nearest whole number of steps
    t = discretize_time_domain((0.0, 1.01), 0.25)
    assert len(t) == 5
