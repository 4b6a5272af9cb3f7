"""Warmup output contracts per sampler family (mirrors reference
``test/test_warmup.py``; the ESS/JumpESS cases the reference skips as "Not
implemented" are skipped here for the same parity reason)."""
import jax
import numpy as np
import pytest

from nfmc_tpu.core.sampler import NFMCKernel
from nfmc_tpu.samplers.mcmc import HMC, MALA, MH, RandomWalk, UHMC, ULA
from nfmc_tpu.samplers.nfmc import (
    AdaptiveIMH,
    FixedIMH,
    IMHKernel,
    JumpHMC,
    JumpMALA,
    JumpMH,
    JumpUHMC,
    JumpULA,
    NeuTraHMC,
)

from tests.util import fast_fit_kwargs, small_flow, standard_gaussian_potential

N_DIM, N_CHAINS = 5, 3


def _x0():
    return jax.random.normal(jax.random.key(1), (N_CHAINS, N_DIM))


@pytest.mark.parametrize("sampler_class", [MALA, MH, UHMC, HMC, ULA, RandomWalk])
def test_warmup_mcmc(sampler_class):
    n_iterations = 7
    sampler = sampler_class(event_shape=(N_DIM,), target=standard_gaussian_potential)
    sampler.params.n_warmup_iterations = n_iterations
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (n_iterations, N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()


@pytest.mark.parametrize("sampler_class", [JumpMH, JumpULA, JumpHMC, JumpUHMC, JumpMALA])
def test_warmup_jump_nfmc(sampler_class):
    sampler = sampler_class(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        kernel=NFMCKernel((N_DIM,), flow=small_flow((N_DIM,))),
    )
    sampler.params.flow_fit_kwargs = fast_fit_kwargs()
    sampler.inner_sampler.params.n_warmup_iterations = 4
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape[1:] == (N_CHAINS, N_DIM)
    assert warmup_output.samples.ndim == 3
    assert np.isfinite(warmup_output.samples).all()


@pytest.mark.parametrize("sampler_class", [AdaptiveIMH, FixedIMH])
def test_warmup_imh(sampler_class):
    sampler = sampler_class(
        event_shape=(N_DIM,), target=standard_gaussian_potential,
        kernel=IMHKernel((N_DIM,), flow=small_flow((N_DIM,))),
    )
    sampler.params.warmup_fit_kwargs = {"n_epochs": 3, "n_samples": 8, "lr": 0.05}
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (1, N_CHAINS, N_DIM)
    assert np.isfinite(warmup_output.samples).all()


def test_warmup_neutra():
    sampler = NeuTraHMC(event_shape=(N_DIM,), target=standard_gaussian_potential)
    sampler.kernel.flow = small_flow((N_DIM,))
    sampler.params.warmup_fit_kwargs = {"n_epochs": 3, "n_samples": 8, "lr": 0.05}
    sampler.params.n_warmup_iterations = 4
    warmup_output = sampler.warmup(_x0(), show_progress=False)
    assert warmup_output.samples.shape == (
        sampler.inner_sampler.params.n_warmup_iterations, N_CHAINS, N_DIM
    )
    assert np.isfinite(warmup_output.samples).all()


def test_warmup_tunes_kernel():
    """Beyond the reference: warmup must actually adapt the kernel state."""
    sampler = HMC(event_shape=(N_DIM,), target=standard_gaussian_potential)
    step_before = sampler.kernel.step_size
    sampler.params.n_warmup_iterations = 50
    sampler.warmup(jax.random.normal(jax.random.key(2), (8, N_DIM)), show_progress=False)
    assert sampler.kernel.step_size != step_before
    assert not np.allclose(sampler.kernel.inv_mass_diag, np.ones(N_DIM))
