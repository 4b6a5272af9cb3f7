"""ChEES-HMC (cross-chain adaptive trajectory length) — superset sampler tests.

The reference has no trajectory-length adaptation (fixed ``n_leapfrog_steps``,
``nfmc/algorithms/sampling/mcmc/hmc.py:13``); these are correctness/unit tests
in the style SURVEY.md section 4 prescribes for rebuild supersets: shapes and
the dynamic counter contract, warmup adaptation of step size / trajectory
length / mass matrix, posterior recovery after adaptation, RNG-hoisting
parity, and front-door reachability.
"""
import jax
import numpy as np

import nfmc_tpu
from nfmc_tpu.samplers.mcmc import CheesHMC

from tests.util import standard_gaussian_potential

X0 = np.asarray(jax.random.normal(jax.random.key(0), (32, 5)))


def test_shapes_finiteness_dynamic_counters():
    s = CheesHMC((5,), standard_gaussian_potential)
    s.params.n_iterations = 20
    out = s.sample(X0, show_progress=False, seed=1)
    samples = np.asarray(out.samples)
    assert samples.shape == (20, 32, 5)
    assert np.isfinite(samples).all()
    st = out.statistics
    # dynamic L rides StepInfo: calls = 2LB + 2B, grads = 2LB per iteration,
    # so calls - grads == 2B * iters exactly, whatever trajectory was run
    assert st.n_target_calls - st.n_target_gradient_calls == 2 * 32 * 20
    assert st.n_target_gradient_calls >= 2 * 32 * 20  # L >= 1
    assert 0.0 <= float(st.acceptance_rate) <= 1.0


def test_warmup_adapts_all_three():
    target = standard_gaussian_potential
    s = CheesHMC((5,), target)
    s.params.n_warmup_iterations = 200
    t_before = s.kernel.trajectory_length
    step_before = s.kernel.step_size
    x0 = np.asarray(jax.random.normal(jax.random.key(2), (128, 5)))
    s.warmup(x0, show_progress=False, seed=2)
    assert s.kernel.trajectory_length != t_before
    assert s.kernel.step_size != step_before
    assert not np.allclose(s.kernel.inv_mass_diag, np.ones(5))
    # on N(0, I) the optimal integration time is ~pi/2; the adapted T should
    # leave the one-step cold start far behind
    assert s.kernel.trajectory_length > 0.5


def test_posterior_recovery_front_door():
    sigma = np.arange(1, 6).astype(np.float32)

    def target(x):
        import jax.numpy as jnp

        return 0.5 * jnp.sum((x.reshape(x.shape[0], -1) / sigma) ** 2, axis=-1)

    nfmc_tpu.set_seed(3)
    out = nfmc_tpu.sample(target, event_shape=(5,), strategy="chees_hmc",
                          n_chains=128, n_iterations=400,
                          n_warmup_iterations=300, warmup=True,
                          show_progress=False)
    got = np.sqrt(np.asarray(out.variance))
    assert np.all(np.abs(got - sigma) / sigma < 0.15), got


def test_hoisted_matches_inscan():
    def build(limit):
        s = CheesHMC((5,), standard_gaussian_potential)
        s.params.n_iterations = 12
        s.rng_hoist_element_limit = limit
        return s

    oa = build(1 << 27).sample(X0, show_progress=False, seed=5)
    ob = build(0).sample(X0, show_progress=False, seed=5)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)


def test_registry_lists_chees():
    assert "chees_hmc" in nfmc_tpu.get_supported_samplers()


def test_jump_chees_interleaving_law():
    from nfmc_tpu.samplers.nfmc import JumpChEES

    s = JumpChEES((5,), standard_gaussian_potential)
    s.params.n_iterations = 4
    s.inner_sampler.params.n_iterations = 3
    out = s.sample(X0[:8], show_progress=False, seed=6)
    samples = np.asarray(out.samples)
    assert samples.shape == (4 * (3 + 1), 8, 5)
    assert np.isfinite(samples).all()
    assert out.statistics.n_attempted_jumps == 4 * 8
    # dynamic inner counters must survive the fused runner: ChEES reports
    # 2LB grads per inner iteration (L >= 1) through StepInfo
    assert out.statistics.n_target_gradient_calls >= 2 * 8 * 4 * 3
    # and calls = grads + 2B per inner iteration + jump accounting
    assert out.statistics.n_target_calls > out.statistics.n_target_gradient_calls


def test_jump_chees_front_door():
    nfmc_tpu.set_seed(4)
    out = nfmc_tpu.sample(standard_gaussian_potential, event_shape=(5,),
                          strategy="jump_chees", n_chains=8, n_iterations=3,
                          flow_kwargs={"n_layers": 2, "hidden_size": 16},
                          show_progress=False)
    samples = np.asarray(out.samples)
    assert samples.shape == (3 * (5 + 1), 8, 5)  # jump_hmc-style inner-5 default
    assert np.isfinite(samples).all()


def test_neutra_chees_front_door():
    nfmc_tpu.set_seed(7)
    out = nfmc_tpu.sample(standard_gaussian_potential, event_shape=(5,),
                          strategy="neutra_chees", n_chains=8, n_iterations=5,
                          flow_kwargs={"n_layers": 2, "hidden_size": 16},
                          param_kwargs={"warmup_fit_kwargs": {"n_epochs": 10, "lr": 0.005, "n_samples": 32}},
                          show_progress=False)
    samples = np.asarray(out.samples)
    assert samples.shape == (5, 8, 5)  # stored draws are latent (NeuTra docs);
    # data_transform feeds only the moment accumulators
    assert np.isfinite(samples).all()
    assert out.statistics.n_target_gradient_calls > 0  # dynamic channel
