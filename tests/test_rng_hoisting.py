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


def test_ess_hoisted_matches_inscan():
    from nfmc_tpu.samplers.mcmc import ESS

    def build():
        s = ESS((5,), standard_gaussian_potential,
                negative_log_likelihood=standard_gaussian_potential)
        s.params.n_iterations = 10
        return s

    a = build()
    b = build()
    b.rng_hoist_element_limit = 0
    oa = a.sample(X0, show_progress=False, seed=6)
    ob = b.sample(X0, show_progress=False, seed=6)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)


def test_tess_step_hoisted_matches_inscan():
    from nfmc_tpu.flows import Flow, RealNVP
    from nfmc_tpu.samplers.nfmc.tess import make_tess_step

    flow = Flow(RealNVP((4,), n_layers=2, hidden_size=16), seed=0)
    tess_init, tess_step, tess_draws = make_tess_step(
        flow, standard_gaussian_potential, (4,), max_iterations=5, chol=None
    )
    u = jax.random.normal(jax.random.key(1), (8, 4))
    lp, x = tess_init(flow.params, u)
    key = jax.random.key(2)
    r1 = tess_step(flow.params, u, lp, x, key)
    r2 = tess_step(flow.params, u, lp, x, key, draws=tess_draws(key, (8,)))
    for a, b in zip(r1, r2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_jump_accepts_legacy_prngkey():
    """Regression: the fused runner's hoisted inner-key reshape must preserve
    the trailing key-data dims of legacy uint32 PRNGKeys."""
    s = JumpMALA((5,), standard_gaussian_potential)
    s.params.n_iterations = 3
    s.inner_sampler.params.n_iterations = 2
    out = s.sample(X0, show_progress=False, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.samples)).all()


def test_ess_cov_mutation_rebuilds_driver():
    """Regression: make_draws bakes chol-ness into the cached driver; mutating
    kernel.cov between runs must rebuild it (value-tokenized config)."""
    from nfmc_tpu.samplers.mcmc import ESS

    s = ESS((4,), standard_gaussian_potential,
            negative_log_likelihood=standard_gaussian_potential)
    s.params.n_iterations = 4
    x0 = np.asarray(jax.random.normal(jax.random.key(5), (8, 4)))
    out1 = s.sample(x0, show_progress=False, seed=1)
    s.kernel.cov = np.eye(4, dtype=np.float32) * 2.0
    out2 = s.sample(x0, show_progress=False, seed=1)
    assert np.isfinite(np.asarray(out2.samples)).all()


def test_tess_hoisted_matches_inscan():
    from nfmc_tpu.samplers.nfmc import TESS

    def build(limit):
        s = TESS((4,), standard_gaussian_potential,
                 negative_log_likelihood=standard_gaussian_potential)
        s.params.n_iterations = 6
        s.rng_hoist_element_limit = limit
        return s

    x0 = np.asarray(jax.random.normal(jax.random.key(6), (8, 4)))
    oa = build(1 << 27).sample(x0, show_progress=False, seed=2)
    ob = build(0).sample(x0, show_progress=False, seed=2)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)


def test_fixed_imh_hoisted_matches_inscan():
    from nfmc_tpu.samplers.nfmc import FixedIMH

    def build(limit):
        s = FixedIMH((4,), standard_gaussian_potential)
        s.params.n_iterations = 8
        s.rng_hoist_element_limit = limit
        return s

    x0 = np.asarray(jax.random.normal(jax.random.key(7), (8, 4)))
    oa = build(1 << 27).sample(x0, show_progress=False, seed=3)
    ob = build(0).sample(x0, show_progress=False, seed=3)
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


def test_jump_proposal_hoist_limit_independent_of_inner():
    """ADVICE round 1: the jump proposal precompute is gated by the jump
    sampler's OWN rng_hoist_element_limit — zeroing the inner limit must not
    disable it, and zeroing the jump limit routes through the in-scan
    jump_step fallback with identical results (same key derivation)."""

    def build(jump_limit, inner_limit):
        s = JumpMALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 6
        s.inner_sampler.params.n_iterations = 3
        s.rng_hoist_element_limit = jump_limit
        s.inner_sampler.rng_hoist_element_limit = inner_limit
        return s

    full = build(1 << 27, 1 << 27).sample(X0, show_progress=False, seed=9)
    no_jump_hoist = build(0, 1 << 27).sample(X0, show_progress=False, seed=9)
    no_hoist = build(0, 0).sample(X0, show_progress=False, seed=9)
    assert np.allclose(np.asarray(full.samples), np.asarray(no_jump_hoist.samples), atol=1e-5)
    assert np.allclose(np.asarray(full.samples), np.asarray(no_hoist.samples), atol=1e-5)


def test_jump_fused_unroll_matches_default():
    """``fused_unroll_inner/outer`` are pure scheduling hints: any unroll
    factor must reproduce the default (unroll=1) chain bit-for-bit — the
    scan body and its key derivations are untouched, XLA just emits more
    copies of it per loop iteration."""

    def build(ui, uo):
        s = JumpMALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 9
        s.inner_sampler.params.n_iterations = 3
        s.params.fused_unroll_inner = ui
        s.params.fused_unroll_outer = uo
        return s

    base = build(1, 1).sample(X0, show_progress=False, seed=12)
    unrolled = build(3, 4).sample(X0, show_progress=False, seed=12)
    assert np.allclose(
        np.asarray(base.samples), np.asarray(unrolled.samples), atol=1e-5
    )
    assert (
        base.statistics.n_accepted_jumps == unrolled.statistics.n_accepted_jumps
    )


def test_mcmc_scan_unroll_matches_default():
    """MCMCParameters.scan_unroll is a pure scheduling hint on the core
    driver's chunked scan — unrolled results must match unroll=1 (measured
    neutral on v5e-via-tunnel; the knob exists for other hardware)."""
    a = MALA((5,), standard_gaussian_potential)
    a.params.n_iterations = 12
    b = MALA((5,), standard_gaussian_potential)
    b.params.n_iterations = 12
    b.params.scan_unroll = 4
    oa = a.sample(X0, show_progress=False, seed=13)
    ob = b.sample(X0, show_progress=False, seed=13)
    assert np.allclose(np.asarray(oa.samples), np.asarray(ob.samples), atol=1e-5)
