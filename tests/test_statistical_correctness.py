"""Statistical correctness battery: posterior-moment recovery per strategy.

The reference test matrix only smoke-checks shapes/finiteness (SURVEY.md
section 4); BASELINE.md's north star additionally demands moment estimates
within statistical tolerance. Each strategy here runs on a 5-d anisotropic
diagonal Gaussian (sigma 1..3) with warmup and must recover the per-dimension
standard deviation. Tolerances are loose (15-25%) — these catch wrong-density
bugs (bad log-det signs, broken accept ratios, stale caches), not estimator
noise."""
import jax
import numpy as np
import pytest

import nfmc_tpu
from nfmc_tpu.potentials import DiagonalGaussian

SIGMA = np.linspace(1.0, 3.0, 5).astype(np.float32)
TARGET = DiagonalGaussian(mu=np.zeros(5), sigma=SIGMA)


def _run(strategy, n_iterations=400, n_chains=64, warmup=True, rtol=0.15, **kwargs):
    nfmc_tpu.set_seed(0)
    out = nfmc_tpu.sample(
        TARGET, strategy=strategy, n_chains=n_chains, n_iterations=n_iterations,
        warmup=warmup, show_progress=False, seed=3,
        flow_kwargs={"n_layers": 2, "hidden_size": 32},
        **kwargs,
    )
    assert np.isfinite(np.asarray(out.samples)).all()
    sig = np.sqrt(np.asarray(out.variance))
    np.testing.assert_allclose(sig, SIGMA, rtol=rtol)
    mean = np.asarray(out.mean)
    assert np.all(np.abs(mean) <= rtol * SIGMA), f"mean {mean} exceeds {rtol}*sigma"


@pytest.mark.parametrize("strategy", ["mala", "hmc", "mh", "nuts", "chees_hmc", "aies"])
def test_mcmc_recovers_sigma(strategy):
    _run(strategy)


def test_ess_recovers_sigma():
    # ESS decomposition: implicit prior N(0, I), likelihood = U - prior term
    import jax.numpy as jnp

    def nll(x):
        return TARGET(x) - 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)

    _run("ess", negative_log_likelihood=nll, rtol=0.2)


def test_imh_recovers_sigma():
    # warmup reverse-KL fit makes the proposal usable; IMH then corrects it
    _run("imh", rtol=0.2)


@pytest.mark.parametrize("strategy", ["jump_mala", "jump_hmc", "jump_chees"])
def test_jump_recovers_sigma(strategy):
    _run(strategy, n_iterations=200, rtol=0.2)


def test_neutra_hmc_recovers_sigma():
    _run("neutra_hmc", n_iterations=300, rtol=0.2)


def test_tess_recovers_sigma():
    _run(
        "tess", negative_log_likelihood=TARGET, n_iterations=400, rtol=0.25,
        param_kwargs={"flow_fit_kwargs": {"n_epochs": 20, "lr": 5e-3}},
    )


def test_dlmc_recovers_sigma():
    _run(
        "dlmc", negative_log_likelihood=TARGET, n_iterations=150, rtol=0.25,
        warmup=False,
        param_kwargs={"flow_fit_kwargs": {"n_epochs": 10, "lr": 5e-3}},
    )


def test_hmc_step_jitter_preserves_stationary_distribution():
    """r4: per-chain step jitter (eps * (1 + U(-j, j)), drawn independently
    of the state) must leave the target invariant — the accept ratio uses
    the SAME jittered step for the forward and reversed trajectory, so
    detailed balance holds per chain. Guards the dense family's
    anti-resonance jitter."""
    _run("hmc", param_kwargs={"step_jitter": 0.3})


def test_dense_strategies_recover_sigma():
    """Front-door posterior recovery for the dense-metric supersets on the
    standard anisotropic target (the correlated-target win is benched; this
    guards plain correctness through warmup adaptation + shrinkage)."""
    _run("dense_hmc")
    _run("dense_mala", n_iterations=800, rtol=0.2)
