"""Streaming-moment API across samplers (mirrors reference
``test/test_moment_estimation.py``) + numerical moment-accuracy checks the
reference lacks (SURVEY.md section 4 implications)."""
import jax
import numpy as np
import pytest

from nfmc_tpu import create_sampler, get_supported_samplers, sample
from nfmc_tpu.potentials import DiagonalGaussian1
from nfmc_tpu.samplers.mcmc import HMC, MALA

from tests.util import fast_fit_kwargs, standard_gaussian_potential

N_DIM = 20


@pytest.mark.parametrize("sampler_class", [HMC, MALA])
def test_running_moment_shapes(sampler_class):
    sampler = sampler_class(event_shape=(N_DIM,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 3
    x0 = jax.random.normal(jax.random.key(0), (4, N_DIM))
    out = sampler.sample(x0, show_progress=False)
    assert out.statistics.running_first_moment.shape == (N_DIM,)
    assert out.statistics.running_second_moment.shape == (N_DIM,)
    assert np.isfinite(out.statistics.running_first_moment).all()
    assert np.isfinite(out.statistics.running_second_moment).all()


@pytest.mark.parametrize("strategy", get_supported_samplers())
def test_moment_api_full_sweep(strategy):
    target = DiagonalGaussian1(n_dim=10)
    out = sample(
        target,
        strategy=strategy,
        n_chains=4,
        n_iterations=2,
        negative_log_likelihood=target,
        flow_kwargs={"n_layers": 2, "hidden_size": 16},
        param_kwargs=(
            {"flow_fit_kwargs": fast_fit_kwargs()}
            if strategy in ("dlmc", "tess") or strategy.startswith("jump")
            else None
        ),
        inner_param_kwargs=(
            {"n_iterations": 2} if strategy.startswith("jump") else None
        ),
        show_progress=False,
    )
    for stat in (out.mean, out.variance, out.second_moment):
        assert stat.shape == (10,)
        assert np.isfinite(stat).all()


def test_hmc_moment_accuracy():
    """Tuned HMC must recover a scaled Gaussian's moments (new vs reference)."""
    import jax.numpy as jnp

    sigma = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)

    def target(x):
        z = x / jnp.asarray(sigma)[None]
        return 0.5 * jnp.sum(z * z, axis=-1)

    sampler = HMC(event_shape=(4,), target=target)
    x0 = jax.random.normal(jax.random.key(3), (64, 4)) * sigma
    sampler.params.n_warmup_iterations = 200
    sampler.warmup(x0, show_progress=False)
    sampler.params.n_iterations = 500
    sampler.params.store_samples = False
    out = sampler.sample(x0, show_progress=False)
    est_sigma = np.sqrt(out.variance)
    assert np.all(np.abs(est_sigma - sigma) / sigma < 0.25), est_sigma
    assert np.all(np.abs(out.mean) / sigma < 0.25), out.mean


def test_neutra_funnel_quality():
    """End-to-end quality on a hard geometry: NeuTra-HMC on a 5-d funnel
    recovers the scale parameter's std (truth 3.0) without divergences —
    regression test for the flow-fit lr fix (lr=0.05 diverged and gave
    v-std > 20 with a divergence every iteration)."""
    import nfmc_tpu
    from nfmc_tpu.potentials import Funnel

    nfmc_tpu.set_seed(7)
    target = Funnel(n_dim=5, scale=3.0)
    out = nfmc_tpu.sample(
        target, strategy="neutra_hmc", flow='realnvp%{"n_layers": 4}',
        n_chains=64, n_iterations=300, warmup=True, show_progress=False,
        param_kwargs={"warmup_fit_kwargs": {
            "lr": 0.01, "n_epochs": 1500, "n_samples": 128,
            "early_stopping": True, "early_stopping_threshold": 500,
            "keep_best_weights": True,
        }},
    )
    v_std = float(np.sqrt(np.asarray(out.variance))[0])
    assert 2.0 < v_std < 4.0, v_std
    assert out.statistics.n_divergences < 30
