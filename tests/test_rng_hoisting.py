"""Chunk-level RNG hoisting (driver precompute): the hoisted path must use the
same random stream as the in-scan derivation — results equal to float32
rounding (the two compiled graphs may fuse arithmetic differently, so exact
bit equality is not guaranteed, but every draw is identical)."""
import jax
import numpy as np
import pytest

from nfmc_tpu.samplers.mcmc import HMC, MALA, MH, ULA
from nfmc_tpu.samplers.nfmc import JumpHMC, JumpMALA

from tests.util import standard_gaussian_potential


X0 = np.asarray(jax.random.normal(jax.random.key(0), (16, 5)))


@pytest.mark.parametrize("cls", [MALA, MH, HMC, ULA])
def test_mcmc_hoisted_matches_inscan(cls):
    a = cls((5,), standard_gaussian_potential)
    a.params.n_iterations = 12
    b = cls((5,), standard_gaussian_potential)
    b.params.n_iterations = 12
    b.rng_hoist_element_limit = 0  # force the in-scan fallback
    oa = a.sample(X0, show_progress=False, seed=3)
    ob = b.sample(X0, show_progress=False, seed=3)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)
    assert (
        abs(oa.statistics.n_accepted_trajectories - ob.statistics.n_accepted_trajectories)
        <= 1
    )


@pytest.mark.parametrize("cls", [JumpMALA, JumpHMC])
def test_jump_inner_hoisted_matches_inscan(cls):
    def build(limit):
        s = cls((5,), standard_gaussian_potential)
        s.params.n_iterations = 6
        s.inner_sampler.params.n_iterations = 3
        s.inner_sampler.rng_hoist_element_limit = limit
        return s

    oa = build(1 << 27).sample(X0, show_progress=False, seed=4)
    ob = build(0).sample(X0, show_progress=False, seed=4)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)


def test_draws_match_step_derivation():
    """The draws fn replicates the step's in-scan key derivation exactly
    (checked at the raw-draw level, where bit equality does hold)."""
    import jax.numpy as jnp

    s = MALA((5,), standard_gaussian_potential)
    key = jax.random.key(11)
    noise, log_u = s.make_draws()(key, 16)
    k_noise, k_accept = jax.random.split(key)
    assert np.array_equal(np.asarray(noise), np.asarray(jax.random.normal(k_noise, (16, 5))))
    assert np.array_equal(
        np.asarray(log_u), np.asarray(jnp.log(jax.random.uniform(k_accept, (16,))))
    )
