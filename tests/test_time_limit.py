"""Time-limit semantics: huge n_iterations with a small limit must terminate.

The reference skips both of these as "May not terminate"
(``test/test_time_limit.py:10,25``); the chunked-scan driver honors them
deterministically, so they run here."""
import time

import jax

from nfmc_tpu.samplers.mcmc import MH
from nfmc_tpu.samplers.nfmc import FixedIMH, IMHKernel

from tests.util import small_flow, standard_gaussian_potential


def test_time_limit_mcmc():
    sampler = MH(event_shape=(3,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 1_000_000
    sampler.params.store_samples = False
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    t0 = time.time()
    out = sampler.sample(x0, show_progress=False, time_limit_seconds=1.0)
    assert time.time() - t0 < 30.0  # compile + a handful of chunks
    assert out.statistics.n_attempted_trajectories < 1_000_000 * 4


def test_time_limit_imh():
    sampler = FixedIMH(
        event_shape=(3,), target=standard_gaussian_potential,
        kernel=IMHKernel((3,), flow=small_flow((3,))),
    )
    sampler.params.n_iterations = 1_000_000
    sampler.params.store_samples = False
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    t0 = time.time()
    sampler.sample(x0, show_progress=False, time_limit_seconds=1.0)
    assert time.time() - t0 < 60.0
