import numpy as np
import pytest

from pararealml_tpu import (
    ConstrainedProblem,
    DiffusionEquation,
    DirichletBoundaryCondition,
    LotkaVolterraEquation,
    Mesh,
    NeumannBoundaryCondition,
)
from pararealml_tpu.operators.ml.physics_informed import (
    Dataset,
    UniformRandomCollocationPointSampler,
)

SAMPLER = UniformRandomCollocationPointSampler()


def _pde_cp():
    mesh = Mesh([(0.0, 1.0)], [0.5])
    bc_pair = (
        DirichletBoundaryCondition(
            lambda x, t: np.ones((len(x), 1)), is_static=True
        ),
        NeumannBoundaryCondition(
            lambda x, t: np.full((len(x), 1), 2.0), is_static=True
        ),
    )
    return ConstrainedProblem(DiffusionEquation(1), mesh, [bc_pair])


def test_dataset_validation():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    with pytest.raises(ValueError):
        Dataset(cp, (0.0, 1.0), [lambda _: np.zeros(2)], SAMPLER, 0)
    with pytest.raises(ValueError):
        Dataset(
            cp,
            (0.0, 1.0),
            [lambda _: np.zeros(2)],
            SAMPLER,
            10,
            n_boundary_points=-1,
        )
    with pytest.raises(ValueError):
        Dataset(
            cp,
            (0.0, 1.0),
            [lambda _: np.zeros(2)],
            SAMPLER,
            10,
            n_boundary_points=5,
        )


def test_ode_dataset_arrays():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    dataset = Dataset(
        cp,
        (0.0, 2.0),
        [lambda _: np.array([1.0, 2.0]), lambda _: np.array([3.0, 4.0])],
        SAMPLER,
        10,
    )
    assert dataset.initial_value_data.shape == (2, 2)
    assert dataset.domain_collocation_data.shape == (10, 1)
    assert dataset.initial_collocation_data.shape == (1, 1)
    assert dataset.boundary_collocation_data is None
    assert np.all(dataset.domain_collocation_data >= 0.0)
    assert np.all(dataset.domain_collocation_data <= 2.0)


def test_pde_dataset_arrays():
    np.random.seed(0)
    cp = _pde_cp()
    dataset = Dataset(
        cp,
        (0.0, 1.0),
        [lambda x: np.sin(x)],
        SAMPLER,
        20,
        n_boundary_points=8,
        vertex_oriented=True,
    )
    assert dataset.initial_value_data.shape == (1, 3)
    assert dataset.domain_collocation_data.shape == (20, 2)
    assert dataset.initial_collocation_data.shape == (3, 2)
    boundary = dataset.boundary_collocation_data
    # columns: t, x, y, d_y/d_n, axis
    assert boundary.shape == (8, 5)
    assert set(np.unique(boundary[:, 1])) <= {0.0, 1.0}
    # lower boundary has Dirichlet (y=1, d_y NaN); upper has Neumann
    lower = boundary[boundary[:, 1] == 0.0]
    upper = boundary[boundary[:, 1] == 1.0]
    if len(lower):
        assert np.all(lower[:, 2] == 1.0)
        assert np.all(np.isnan(lower[:, 3]))
    if len(upper):
        assert np.all(np.isnan(upper[:, 2]))
        assert np.all(upper[:, 3] == 2.0)


def test_iterator_batch_divisibility():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    dataset = Dataset(
        cp, (0.0, 1.0), [lambda _: np.zeros(2)], SAMPLER, 10
    )
    with pytest.raises(ValueError):
        dataset.get_iterator(3)


def test_iterator_cartesian_product():
    np.random.seed(0)
    cp = ConstrainedProblem(LotkaVolterraEquation())
    ic_functions = [
        lambda _: np.array([1.0, 1.0]),
        lambda _: np.array([2.0, 2.0]),
    ]
    dataset = Dataset(cp, (0.0, 1.0), ic_functions, SAMPLER, 6)
    iterator = dataset.get_iterator(n_batches=2, shuffle=False)

    batches = list(iterator)
    assert len(batches) == 2
    domain_batches = [b[0] for b in batches]
    assert all(b.u.shape == (6, 2) for b in domain_batches)
    assert all(b.t.shape == (6, 1) for b in domain_batches)
    assert all(b.x is None for b in domain_batches)
    # 2 ICs x 6 domain points = 12 pairs total
    all_u = np.concatenate([b.u for b in domain_batches])
    assert (all_u[:, 0] == 1.0).sum() == 6
    assert (all_u[:, 0] == 2.0).sum() == 6


def test_iterator_n_ic_repeats():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    dataset = Dataset(
        cp, (0.0, 1.0), [lambda _: np.zeros(2)], SAMPLER, 4
    )
    iterator = dataset.get_iterator(
        n_batches=2, n_ic_repeats=4, shuffle=False
    )
    assert iterator.initial_batch_size == 2


def test_stacked_batches_shapes():
    np.random.seed(0)
    cp = _pde_cp()
    dataset = Dataset(
        cp,
        (0.0, 1.0),
        [lambda x: np.zeros_like(x)],
        SAMPLER,
        9,
        n_boundary_points=6,
        vertex_oriented=True,
    )
    iterator = dataset.get_iterator(n_batches=3)
    domain, initial, boundary = iterator.stacked_batches()
    assert domain.u.shape == (3, 3, 3)
    assert domain.t.shape == (3, 3, 1)
    assert domain.x.shape == (3, 3, 1)
    assert initial.u.shape == (3, 1, 3)
    assert boundary.u.shape == (3, 2, 3)
    assert boundary.axis.shape == (3, 2)


def test_infinite_generator_cycles():
    cp = ConstrainedProblem(LotkaVolterraEquation())
    dataset = Dataset(
        cp, (0.0, 1.0), [lambda _: np.zeros(2)], SAMPLER, 4
    )
    generator = dataset.get_iterator(
        2, n_ic_repeats=2
    ).to_infinite_generator()
    for _ in range(6):
        batch = next(generator)
        assert batch[0].u.shape == (2, 2)
