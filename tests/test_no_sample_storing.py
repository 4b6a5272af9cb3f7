"""store_samples=False contract: samples None, last_sample kept.

Mirrors reference ``test/test_no_sample_storing.py`` (jump strategies skipped
for warmup there too)."""
import jax
import numpy as np
import pytest

from nfmc_tpu import create_sampler, get_supported_samplers

from tests.util import fast_fit_kwargs, standard_gaussian_potential

N_CHAINS, EVENT_SHAPE = 6, (4,)


def _sampler(strategy):
    param_kwargs = {"store_samples": False, "n_iterations": 2, "n_warmup_iterations": 2}
    if strategy in ("dlmc", "tess") or strategy.startswith("jump"):
        param_kwargs["flow_fit_kwargs"] = fast_fit_kwargs()
    s = create_sampler(
        target=standard_gaussian_potential,
        event_shape=EVENT_SHAPE,
        strategy=strategy,
        param_kwargs=param_kwargs,
        negative_log_likelihood=standard_gaussian_potential,
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
    )
    if hasattr(s, "params") and hasattr(s.params, "warmup_fit_kwargs"):
        s.params.warmup_fit_kwargs = {"n_epochs": 2, "n_samples": 8, "lr": 0.05}
    if strategy.startswith("jump"):
        s.inner_sampler.params.n_iterations = 2
    return s


@pytest.mark.parametrize("strategy", get_supported_samplers())
def test_warmup(strategy):
    if "jump" in strategy or strategy == "adaptive_imh":
        pytest.skip("same skip as reference (jump) / adaptive_imh forces storing")
    sampler = _sampler(strategy)
    x0 = jax.random.normal(jax.random.key(1), (N_CHAINS, *EVENT_SHAPE))
    out = sampler.warmup(x0, show_progress=False, time_limit_seconds=20.0)
    assert out.samples is None
    assert out.running_samples.last_sample is not None
    assert out.running_samples.last_sample.shape == (N_CHAINS, *EVENT_SHAPE)


@pytest.mark.parametrize("strategy", get_supported_samplers())
def test_sampling(strategy):
    if strategy == "adaptive_imh":
        pytest.skip("adaptive IMH forces store_samples=True (reference ``imh.py:109-113``)")
    sampler = _sampler(strategy)
    x0 = jax.random.normal(jax.random.key(1), (N_CHAINS, *EVENT_SHAPE))
    out = sampler.sample(x0, show_progress=False, time_limit_seconds=20.0)
    assert out.samples is None
    assert out.running_samples.last_sample is not None
    assert out.running_samples.last_sample.shape == (N_CHAINS, *EVENT_SHAPE)
