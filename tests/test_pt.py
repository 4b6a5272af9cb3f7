"""Parallel tempering (superset sampler — the reference has no tempering).

Covers the contracts the rest of the suite checks per sampler (shapes,
finiteness, warmup adaptation, determinism, counters) plus the capability
test that motivates PT: mode traversal on a well-separated bimodal target
where single-temperature MALA provably stays stuck.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfmc_tpu
from nfmc_tpu.samplers.mcmc import MALA, PTHMC, PTMALA, PTRWMH, PTKernel, PTParameters

EVENT_SHAPE = (2,)
SEP = 4.0
SIGMA = 0.5


def bimodal_potential(x):
    """Equal mixture of N(+mu, sigma^2 I) and N(-mu, sigma^2 I), mu = (SEP, 0).
    The barrier at the origin is ~SEP^2 / (2 sigma^2) = 32 nats."""
    mu = jnp.zeros(x.shape[-1]).at[0].set(SEP)
    a = -0.5 * jnp.sum((x - mu) ** 2, axis=-1) / SIGMA**2
    b = -0.5 * jnp.sum((x + mu) ** 2, axis=-1) / SIGMA**2
    return -jax.nn.logsumexp(jnp.stack([a, b], axis=-1), axis=-1)


def gaussian_potential(x):
    return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)


@pytest.mark.parametrize("strategy", ["pt_mala", "pt_mh", "pt_hmc"])
def test_front_door_shapes(strategy):
    out = nfmc_tpu.sample(
        gaussian_potential, event_shape=(5,), strategy=strategy,
        n_chains=8, n_iterations=20, show_progress=False, seed=0,
    )
    assert out.samples.shape == (20, 8, 5)
    assert np.isfinite(out.samples).all()
    assert np.isfinite(out.mean).all()
    assert 0.0 <= out.statistics.acceptance_rate <= 1.0


@pytest.mark.parametrize("cls", [PTMALA, PTRWMH, PTHMC])
def test_swap_counter_contract(cls):
    """Even sweeps activate ceil((T-1)/2) edges, odd sweeps floor((T-1)/2);
    attempted swaps count C chains per active edge per iteration."""
    T, C, n_iters = 6, 7, 10
    s = cls(EVENT_SHAPE, gaussian_potential,
            kernel=PTKernel(event_size=2, n_temps=T))
    s.params.n_iterations = n_iters
    out = s.sample(jnp.zeros((C, *EVENT_SHAPE)), show_progress=False, seed=1)
    even_edges = (T - 1 + 1) // 2  # pairs (0,1),(2,3),(4,5) -> 3
    odd_edges = (T - 1) // 2  # pairs (1,2),(3,4) -> 2
    n_even = (n_iters + 1) // 2  # iteration counter starts at 0 (even)
    n_odd = n_iters // 2
    expected = C * (even_edges * n_even + odd_edges * n_odd)
    assert out.statistics.n_attempted_swaps == expected
    assert 0 <= out.statistics.n_accepted_swaps <= expected
    # per-edge rates synced onto the kernel
    assert out.kernel.swap_acceptance_rates.shape == (T - 1,)


def test_warmup_adapts_steps_and_ladder():
    s = PTMALA(EVENT_SHAPE, gaussian_potential,
               kernel=PTKernel(event_size=2, n_temps=6))
    betas0 = s.kernel.betas.copy()
    steps0 = s.kernel.step_sizes.copy()
    s.params.n_warmup_iterations = 200
    out = s.warmup(jax.random.normal(jax.random.key(0), (16, *EVENT_SHAPE)),
                   show_progress=False, seed=2)
    assert out.samples.shape == (200, 16, *EVENT_SHAPE)
    assert not np.allclose(s.kernel.step_sizes, steps0)
    # interior ladder rungs moved (endpoints anchored)
    assert np.isclose(s.kernel.betas[0], 1.0)
    assert np.isclose(s.kernel.betas[-1], betas0[-1], rtol=1e-5)
    assert not np.allclose(s.kernel.betas[1:-1], betas0[1:-1])
    # ladder stays a valid descending sequence
    assert np.all(np.diff(s.kernel.betas) < 0)


def test_cold_chain_moment_recovery():
    """Cold-rung moments on a diagonal Gaussian (sigma 1..3)."""
    sigmas = jnp.asarray([1.0, 2.0, 3.0])

    def target(x):
        return 0.5 * jnp.sum((x / sigmas) ** 2, axis=-1)

    s = PTMALA((3,), target, kernel=PTKernel(event_size=3, n_temps=4))
    s.params.n_warmup_iterations = 300
    s.params.n_iterations = 1500
    x0 = jax.random.normal(jax.random.key(3), (64, 3)) * sigmas
    s.warmup(x0, show_progress=False, seed=4)
    out = s.sample(x0, show_progress=False, seed=5)
    assert np.max(np.abs(out.mean)) < 0.35
    assert np.allclose(np.asarray(out.variance), np.asarray(sigmas) ** 2,
                       rtol=0.35)


@pytest.mark.parametrize("cls", [PTMALA, PTRWMH])
def test_bimodal_mode_traversal(cls):
    """The capability PT exists for: all chains start in the +mode of a
    32-nat-barrier bimodal target; the cold chain must populate BOTH modes.
    Single-temperature MALA from the same start provably stays stuck."""
    C = 16
    x0 = jnp.zeros((C, *EVENT_SHAPE)).at[:, 0].set(SEP)

    s = cls(EVENT_SHAPE, bimodal_potential,
            kernel=PTKernel(event_size=2, n_temps=8, beta_min=0.01))
    s.params.n_warmup_iterations = 300
    s.params.n_iterations = 800
    s.warmup(x0, show_progress=False, seed=6)
    out = s.sample(x0, show_progress=False, seed=7)
    frac_neg = float(np.mean(np.asarray(out.samples)[..., 0] < 0))
    assert 0.2 < frac_neg < 0.8, f"cold chain failed to traverse: {frac_neg}"
    # symmetric mixture: overall mean near 0 despite one-mode start
    assert abs(float(out.mean[0])) < 1.5

    # control: plain MALA cannot cross the barrier
    m = MALA(EVENT_SHAPE, bimodal_potential)
    m.params.n_iterations = 800
    m_out = m.sample(x0, show_progress=False, seed=7)
    m_frac_neg = float(np.mean(np.asarray(m_out.samples)[..., 0] < 0))
    assert m_frac_neg < 0.02


def test_pt_hmc_counter_contract_and_moments():
    """PTHMC reports the reference HMC trajectory contract per rung
    ((2L+2)*T*C calls, 2L*T*C grads per iteration, ``hmc.py:122-125``) and
    recovers cold-chain moments."""
    T, C, L, n_iters = 4, 32, 5, 400
    sigmas = jnp.asarray([1.0, 2.0])

    def target(x):
        return 0.5 * jnp.sum((x / sigmas) ** 2, axis=-1)

    s = PTHMC((2,), target,
              kernel=PTKernel(event_size=2, n_temps=T, n_leapfrog_steps=L,
                              step_size=0.25))
    s.params.n_warmup_iterations = 200
    s.params.n_iterations = n_iters
    x0 = jax.random.normal(jax.random.key(8), (C, 2)) * sigmas
    s.warmup(x0, show_progress=False, seed=8)
    out = s.sample(x0, show_progress=False, seed=9)
    assert out.statistics.n_target_calls == n_iters * (2 * L + 2) * T * C
    assert out.statistics.n_target_gradient_calls == n_iters * 2 * L * T * C
    assert np.max(np.abs(out.mean)) < 0.3
    assert np.allclose(np.asarray(out.variance), np.asarray(sigmas) ** 2, rtol=0.35)


def test_pt_hmc_bimodal_mode_traversal():
    """HMC rungs traverse the 32-nat barrier like the other moves (fewer
    outer iterations needed: each iteration is an L-leapfrog trajectory)."""
    C = 16
    x0 = jnp.zeros((C, *EVENT_SHAPE)).at[:, 0].set(SEP)
    s = PTHMC(EVENT_SHAPE, bimodal_potential,
              kernel=PTKernel(event_size=2, n_temps=8, beta_min=0.01,
                              n_leapfrog_steps=5, step_size=0.1))
    s.params.n_warmup_iterations = 200
    s.params.n_iterations = 400
    s.warmup(x0, show_progress=False, seed=10)
    out = s.sample(x0, show_progress=False, seed=11)
    frac_neg = float(np.mean(np.asarray(out.samples)[..., 0] < 0))
    assert 0.2 < frac_neg < 0.8, f"cold chain failed to traverse: {frac_neg}"


def test_determinism():
    s1 = PTMALA(EVENT_SHAPE, gaussian_potential,
                kernel=PTKernel(event_size=2, n_temps=4))
    s2 = PTMALA(EVENT_SHAPE, gaussian_potential,
                kernel=PTKernel(event_size=2, n_temps=4))
    for s in (s1, s2):
        s.params.n_iterations = 30
    x0 = jax.random.normal(jax.random.key(8), (6, *EVENT_SHAPE))
    o1 = s1.sample(x0, show_progress=False, seed=9)
    o2 = s2.sample(x0, show_progress=False, seed=9)
    np.testing.assert_array_equal(np.asarray(o1.samples), np.asarray(o2.samples))


def test_explicit_betas_and_single_rung():
    # explicit ladder
    s = PTMALA(EVENT_SHAPE, gaussian_potential,
               kernel=PTKernel(event_size=2, betas=np.array([1.0, 0.5, 0.1])))
    assert s.kernel.n_temps == 3
    s.params.n_iterations = 10
    out = s.sample(jnp.zeros((4, *EVENT_SHAPE)), show_progress=False, seed=10)
    assert out.samples.shape == (10, 4, *EVENT_SHAPE)
    # degenerate single-rung ladder reduces to plain MALA (no swaps)
    s1 = PTMALA(EVENT_SHAPE, gaussian_potential,
                kernel=PTKernel(event_size=2, n_temps=1))
    s1.params.n_iterations = 10
    out1 = s1.sample(jnp.zeros((4, *EVENT_SHAPE)), show_progress=False, seed=11)
    assert out1.statistics.n_attempted_swaps == 0
    assert np.isfinite(out1.samples).all()

    # invalid ladders are rejected
    with pytest.raises(ValueError):
        PTKernel(event_size=2, betas=np.array([0.9, 0.5]))
    with pytest.raises(ValueError):
        PTKernel(event_size=2, betas=np.array([1.0, 0.5, 0.6]))
