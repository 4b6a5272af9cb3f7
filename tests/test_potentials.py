"""Synthetic potentials: batched-callable contract, exact sampling, and
gradient finiteness (the `potentials` sibling package surface —
reference ``nfmc/sample.py:17,65-66,285-286``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfmc_tpu.potentials import (
    DiagonalGaussian,
    DiagonalGaussian1,
    DoubleWell,
    FullRankGaussian,
    Funnel,
    GaussianMixture,
    Rosenbrock,
    StandardGaussian,
    as_potential,
)
from nfmc_tpu.utils import value_and_batched_grad


def _all_potentials():
    chol = np.linalg.cholesky(np.array([[2.0, 0.5], [0.5, 1.0]]))
    return [
        StandardGaussian((3,)),
        DiagonalGaussian(mu=np.zeros(3), sigma=np.array([1.0, 2.0, 3.0])),
        DiagonalGaussian1(n_dim=4),
        FullRankGaussian(mu=np.zeros(2), chol=chol),
        Funnel(n_dim=4),
        Rosenbrock(n_dim=4),
        GaussianMixture(np.array([[-2.0, 0.0], [2.0, 0.0]], dtype=np.float32)),
        DoubleWell((3,)),
    ]


@pytest.mark.parametrize("pot", _all_potentials(), ids=lambda p: type(p).__name__)
def test_batched_contract_and_grads(pot):
    x = jax.random.normal(jax.random.key(0), (7, *pot.event_shape))
    u = pot(x)
    assert u.shape == (7,)
    assert np.isfinite(np.asarray(u)).all()
    _, g = value_and_batched_grad(pot)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize(
    "pot",
    [p for p in _all_potentials() if type(p).__name__ not in ("Rosenbrock", "DoubleWell")],
    ids=lambda p: type(p).__name__,
)
def test_exact_sampler_moments(pot):
    x = np.asarray(pot.sample((20000,), key=jax.random.key(1)))
    assert x.shape == (20000, *pot.event_shape)
    assert np.isfinite(x).all()
    if type(pot).__name__ == "GaussianMixture":
        # equal-weight symmetric modes: mean is the average of the means
        assert np.allclose(x.mean(0), pot.means.mean(0), atol=0.35)
        return
    if hasattr(pot, "mean"):
        assert np.allclose(x.mean(0), np.asarray(pot.mean), atol=0.35)
    if hasattr(pot, "second_moment") and type(pot).__name__ != "Funnel":
        assert np.allclose((x**2).mean(0), np.asarray(pot.second_moment), rtol=0.1, atol=0.1)


def test_as_potential_wraps_callable():
    pot = as_potential(lambda x: 0.5 * jnp.sum(x**2, axis=-1), event_shape=(3,))
    assert pot.event_shape == (3,)
    u = pot(jnp.ones((4, 3)))
    assert u.shape == (4,)
