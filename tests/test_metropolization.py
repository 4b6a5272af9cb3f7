"""Directional sanity of the MH acceptance log-ratio (mirrors reference
``test/test_metropolization.py``)."""
import jax.numpy as jnp

from nfmc_tpu.utils import metropolis_acceptance_log_ratio


def test_higher_target_prime_increases_ratio():
    base = metropolis_acceptance_log_ratio(-1.0, -1.0, 0.0, 0.0)
    better = metropolis_acceptance_log_ratio(-1.0, -0.5, 0.0, 0.0)
    worse = metropolis_acceptance_log_ratio(-1.0, -2.0, 0.0, 0.0)
    assert better > base > worse


def test_proposal_correction_direction():
    # Easier-to-propose x' must be penalized.
    sym = metropolis_acceptance_log_ratio(-1.0, -1.0, -3.0, -3.0)
    asym = metropolis_acceptance_log_ratio(-1.0, -1.0, -3.0, -1.0)
    assert asym < sym


def test_batched():
    lr = metropolis_acceptance_log_ratio(
        jnp.zeros(4), jnp.ones(4), jnp.zeros(4), jnp.zeros(4)
    )
    assert lr.shape == (4,)
    assert jnp.allclose(lr, 1.0)
