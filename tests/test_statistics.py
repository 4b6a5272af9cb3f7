"""Counter contract (SURVEY.md section 2.8), streaming expectations, and
sample-store semantics (thinning / max_samples)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfmc_tpu.core.samples import MCMCSamples
from nfmc_tpu.core.statistics import MCMCExpectation, MCMCStatistics
from nfmc_tpu.samplers.mcmc import ESS, HMC, MALA, MH, UHMC, ULA

from tests.util import standard_gaussian_potential

N_ITER, N_CHAINS, D = 3, 4, 5


def _run(sampler):
    sampler.params.n_iterations = N_ITER
    x0 = jax.random.normal(jax.random.key(0), (N_CHAINS, D))
    return sampler.sample(x0, show_progress=False)


@pytest.mark.parametrize(
    "cls,calls,grads",
    [
        (MH, 2 * N_CHAINS, 0),
        (MALA, 2 * N_CHAINS, 2 * N_CHAINS),
        (ULA, N_CHAINS, N_CHAINS),
        (HMC, 2 * 20 * N_CHAINS + 2 * N_CHAINS, 2 * 20 * N_CHAINS),
        (UHMC, 2 * 20 * N_CHAINS, 2 * 20 * N_CHAINS),
    ],
)
def test_counter_contract(cls, calls, grads):
    out = _run(cls(event_shape=(D,), target=standard_gaussian_potential))
    assert out.statistics.n_target_calls == N_ITER * calls
    assert out.statistics.n_target_gradient_calls == N_ITER * grads
    assert out.statistics.n_attempted_trajectories == N_ITER * N_CHAINS


def test_ess_counter_contract():
    s = ESS(event_shape=(D,), target=standard_gaussian_potential,
            negative_log_likelihood=standard_gaussian_potential)
    out = _run(s)
    assert out.statistics.n_target_calls == N_ITER * (5 + 1) * N_CHAINS
    assert out.statistics.n_target_gradient_calls == 0
    assert out.statistics.acceptance_rate == 1.0  # all-accept hack parity


def test_expectation_streaming_matches_batch():
    rng = np.random.default_rng(0)
    exp = MCMCExpectation((3,), f=lambda v: v)
    chunks = [rng.normal(size=(2, 4, 3)), rng.normal(size=(5, 4, 3)), rng.normal(size=(1, 4, 3))]
    for c in chunks:
        exp.update(c)
    full = np.concatenate(chunks, axis=0)
    assert np.allclose(exp.as_tensor(), full.mean(axis=(0, 1)), atol=1e-12)


def test_expectation_from_sums_matches_batch():
    rng = np.random.default_rng(0)
    exp = MCMCExpectation((3,), f=lambda v: v)
    data = rng.normal(size=(7, 4, 3))
    exp.update_from_sums(data.sum(axis=(0, 1)), 28)
    assert np.allclose(exp.as_tensor(), data.mean(axis=(0, 1)), atol=1e-12)


def test_samples_thinning():
    store = MCMCSamples((2,), thinning=3)
    for i in range(10):
        store.add(np.full((1, 4, 2), i))
    assert store.n_samples == 4  # indices 0, 3, 6, 9
    assert np.all(store.as_tensor()[:, 0, 0] == [0, 3, 6, 9])


def test_samples_max_samples():
    store = MCMCSamples((2,), max_samples=3)
    block = np.arange(10)[:, None, None] * np.ones((10, 4, 2))
    store.add(block)
    assert store.n_samples == 3
    assert np.all(store.as_tensor()[:, 0, 0] == [7, 8, 9])
    assert np.all(store.last_sample == block[-1])


def test_samples_block_vs_single_equivalence():
    a = MCMCSamples((2,), thinning=2)
    b = MCMCSamples((2,), thinning=2)
    data = np.random.default_rng(0).normal(size=(9, 3, 2))
    a.add(data)
    for row in data:
        b.add(row)
    assert np.allclose(a.as_tensor(), b.as_tensor())
    assert np.allclose(a.last_sample, b.last_sample)


def test_empty_store_getitem_raises():
    # Regression (round-3 review): [-1] on a never-added store must raise,
    # not silently return last_sample=None.
    import pytest

    for on_device in (False, True):
        store = MCMCSamples((3,), on_device=on_device)
        with pytest.raises(IndexError):
            store[-1]
        with pytest.raises(IndexError):
            store[0]


def test_no_store_last_sample_shortcut():
    # store_samples=False: [-1] returns the live final state (feature used by
    # consumers that only need the end of the chain).
    store = MCMCSamples((2,), store_samples=False)
    block = np.arange(6, dtype=np.float64).reshape(3, 1, 2)
    store.add(block)
    assert store.n_samples == 0
    assert np.all(store[-1] == block[-1])


def test_empty_output_samples_is_none():
    # Regression (round-3 review): zero stored draws (time limit before the
    # first chunk) must yield samples=None, not np.stack([]) ValueError.
    from nfmc_tpu.core.output import MCMCOutput

    out = MCMCOutput((3,), store_samples=True)
    assert out.samples is None
    import pytest

    with pytest.raises(ValueError, match="empty run"):
        out.resample(4)


def test_thinning_one_device_store_appends_block_unchanged():
    # thinning=1 device mode must keep the block (no gather copy) and still
    # index correctly across blocks.
    store = MCMCSamples((2,), on_device=True)
    data = np.random.default_rng(1).normal(size=(5, 3, 2))
    store.add(data[:3])
    store.add(data[3:])
    assert np.allclose(np.asarray(store.as_tensor()), data)
    assert np.allclose(np.asarray(store[2]), data[2])
    assert np.allclose(np.asarray(store[-1]), data[-1])


def test_acceptance_rate_nan_when_no_attempts():
    stats = MCMCStatistics((2,))
    assert np.isnan(stats.acceptance_rate)


def test_determinism_same_seed():
    s1 = MALA(event_shape=(D,), target=standard_gaussian_potential)
    s1.params.n_iterations = 4
    x0 = jax.random.normal(jax.random.key(0), (N_CHAINS, D))
    out1 = s1.sample(x0, show_progress=False, seed=123)
    s2 = MALA(event_shape=(D,), target=standard_gaussian_potential)
    s2.params.n_iterations = 4
    out2 = s2.sample(x0, show_progress=False, seed=123)
    assert np.allclose(out1.samples, out2.samples)


def test_front_door_seed_reproducible_with_flow():
    """Regression: sample(seed=...) must pin the FLOW INIT too — registry
    flows previously drew init params from the advancing global stream."""
    import nfmc_tpu

    def run():
        return nfmc_tpu.sample(
            standard_gaussian_potential, event_shape=(3,), strategy="imh",
            flow='realnvp%{"n_layers": 2, "hidden_size": 16}',
            n_chains=8, n_iterations=5, show_progress=False, seed=11,
        )

    out1, out2 = run(), run()
    assert np.allclose(np.asarray(out1.samples), np.asarray(out2.samples))


def test_front_door_warmup_zero_iterations():
    """Regression: warmup=True with nothing stored must fall back to x0, not
    crash on np.stack of an empty list."""
    import nfmc_tpu

    out = nfmc_tpu.sample(
        standard_gaussian_potential, event_shape=(3,), strategy="mala",
        n_chains=8, n_iterations=4, n_warmup_iterations=0,
        warmup=True, show_progress=False, seed=12,
    )
    assert np.isfinite(np.asarray(out.samples)).all()


def test_fit_shuffle_false_smoke():
    from nfmc_tpu.flows import Flow, RealNVP

    flow = Flow(RealNVP((3,), n_layers=2, hidden_size=16), seed=0)
    data = np.asarray(jax.random.normal(jax.random.key(1), (256, 3)))
    flow.fit(data, n_epochs=3, lr=5e-3, shuffle=False, seed=2)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(flow.params))


def test_imh_counter_contract():
    """FixedIMH: 2B target calls/iter, 0 grads (reference ``imh.py:244``)."""
    from nfmc_tpu.samplers.nfmc import FixedIMH

    s = FixedIMH(event_shape=(D,), target=standard_gaussian_potential)
    out = _run(s)
    assert out.statistics.n_target_calls == N_ITER * 2 * N_CHAINS
    assert out.statistics.n_target_gradient_calls == 0


def test_adaptive_imh_counter_quirk():
    """AdaptiveIMH logs the accept-step evals as *gradient* calls —
    reference-bug parity (``imh.py:146``, SURVEY.md section 2.8)."""
    from nfmc_tpu.samplers.nfmc import AdaptiveIMH

    s = AdaptiveIMH(event_shape=(D,), target=standard_gaussian_potential)
    out = _run(s)  # the adaptation refit is hardcoded 1-epoch (reference parity)
    assert out.statistics.n_target_gradient_calls == N_ITER * 2 * N_CHAINS
    assert out.statistics.n_target_calls == 0


def test_jump_counter_contract():
    """Jump: inner counters x inner_n plus 2B calls and B attempted jumps per
    outer iteration (reference ``jump.py:214-216,236-239``)."""
    from nfmc_tpu.samplers.mcmc.langevin import LangevinParameters
    from nfmc_tpu.samplers.nfmc import JumpMALA

    inner_n = 2
    s = JumpMALA(event_shape=(D,), target=standard_gaussian_potential,
                 inner_params=LangevinParameters(n_iterations=inner_n))
    out = _run(s)
    st = out.statistics
    assert st.n_target_calls == N_ITER * (inner_n * 2 * N_CHAINS + 2 * N_CHAINS)
    assert st.n_target_gradient_calls == N_ITER * inner_n * 2 * N_CHAINS
    assert st.n_attempted_jumps == N_ITER * N_CHAINS
    assert st.n_attempted_trajectories == N_ITER * inner_n * N_CHAINS


def test_dlmc_counter_contract():
    """DLMC: B calls+grads at init, then B (drift, +grad) + 2B (accept) calls
    per iteration (reference ``dlmc.py:63-66,90-93,109-113``)."""
    from nfmc_tpu.samplers.nfmc import DLMC

    s = DLMC(event_shape=(D,), target=standard_gaussian_potential,
             negative_log_likelihood=standard_gaussian_potential)
    s.params.flow_fit_kwargs = dict(n_epochs=1)
    out = _run(s)
    st = out.statistics
    assert st.n_target_calls == N_CHAINS + N_ITER * 3 * N_CHAINS
    assert st.n_target_gradient_calls == N_CHAINS + N_ITER * N_CHAINS


def test_output_summary():
    """summary() renders a per-dimension table with ESS/R-hat and counters."""
    import nfmc_tpu
    from tests.conftest import standard_gaussian_potential

    nfmc_tpu.set_seed(0)
    out = nfmc_tpu.sample(standard_gaussian_potential, event_shape=(4,),
                          strategy="mala", n_chains=16, n_iterations=50,
                          show_progress=False)
    text = out.summary(max_dims=3)
    assert "r_hat" in text and "ess" in text
    assert "... (1 more dimensions)" in text
    assert "accept" in text and "divergences" in text


def test_running_variance_clamped_nonnegative():
    """E[x^2]-E[x]^2 cancellation on near-constant large-magnitude dims must
    not return negative variance (downstream sqrt; round-3 review fix)."""
    from nfmc_tpu.core.statistics import MCMCStatistics

    st = MCMCStatistics((2,))
    x = 1e4 * np.ones((64, 2), dtype=np.float32)
    x[:, 1] += np.linspace(-5e-1, 5e-1, 64).astype(np.float32)
    for i in range(4):
        st.expectations.update(jnp.asarray(x + 0.03 * i))
    var = np.asarray(st.running_variance)
    assert (var >= 0.0).all()


def test_subclass_counters_keyword_only():
    """Positional calls valid on the base class must not silently repurpose
    the first slots as jump/swap counters (round-3 review fix)."""
    from nfmc_tpu.core.statistics import JumpNFMCStatistics, PTStatistics

    for cls in (JumpNFMCStatistics, PTStatistics):
        st = cls((2,))
        with pytest.raises(TypeError):
            st.update_counters(3, 4)
        st.update_counters(n_accepted_trajectories=3, n_attempted_trajectories=4)
        assert st.n_accepted_trajectories == 3
