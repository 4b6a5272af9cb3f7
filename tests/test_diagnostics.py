"""On-device diagnostics: ESS + split R-hat sanity."""
import jax
import numpy as np
import pytest

from nfmc_tpu.diagnostics import effective_sample_size, potential_scale_reduction, summarize


def test_ess_iid_close_to_n():
    x = jax.random.normal(jax.random.key(0), (512, 4, 3))
    ess = np.asarray(effective_sample_size(x))
    # iid draws: ESS per dim ~ n_draws * n_chains
    assert np.all(ess > 0.5 * 512 * 4)
    assert np.all(ess < 1.6 * 512 * 4)


def test_ess_correlated_much_smaller():
    key = jax.random.key(1)
    n, c, d = 512, 4, 2
    eps = jax.random.normal(key, (n, c, d))
    # AR(1) with phi=0.95 -> ESS ratio ~ (1-phi)/(1+phi) ~ 0.026
    import jax.numpy as jnp

    def body(carry, e):
        x = 0.95 * carry + e
        return x, x

    _, x = jax.lax.scan(body, jnp.zeros((c, d)), eps)
    ess = np.asarray(effective_sample_size(x))
    assert np.all(ess < 0.2 * n * c)


def test_rhat_mixed_chains_near_one():
    x = jax.random.normal(jax.random.key(2), (256, 8, 3))
    rhat = np.asarray(potential_scale_reduction(x))
    assert np.all(np.abs(rhat - 1.0) < 0.1)


def test_rhat_detects_unmixed_chains():
    x = np.array(jax.random.normal(jax.random.key(3), (256, 4, 2)), copy=True)
    x[:, 0] += 10.0  # one chain stuck elsewhere
    rhat = np.asarray(potential_scale_reduction(x))
    assert np.all(rhat > 1.5)


def test_summarize_scalars():
    s = summarize(jax.random.normal(jax.random.key(4), (128, 4, 5)))
    assert set(s) == {"ess_mean", "ess_min", "rhat_max"}
    assert all(np.isfinite(v) for v in s.values())


def test_on_device_sample_store_matches_host():
    from nfmc_tpu.samplers.mcmc import MALA

    from tests.util import standard_gaussian_potential

    x0 = jax.random.normal(jax.random.key(0), (6, 3))
    a = MALA(event_shape=(3,), target=standard_gaussian_potential)
    a.params.n_iterations = 5
    out_host = a.sample(x0, show_progress=False, seed=11)

    b = MALA(event_shape=(3,), target=standard_gaussian_potential)
    b.params.n_iterations = 5
    b.params.store_samples_on_device = True
    out_dev = b.sample(x0, show_progress=False, seed=11)

    assert np.allclose(out_host.samples, np.asarray(out_dev.samples), atol=1e-6)
    assert np.allclose(
        out_host.running_samples.last_sample,
        np.asarray(out_dev.running_samples.last_sample),
    )


def test_output_diagnostics_convenience():
    """MCMCOutput.effective_sample_size / potential_scale_reduction."""
    import jax

    from nfmc_tpu.samplers.mcmc import MALA

    from tests.util import standard_gaussian_potential

    sampler = MALA(event_shape=(4,), target=standard_gaussian_potential)
    sampler.params.n_iterations = 60
    out = sampler.sample(jax.random.normal(jax.random.key(0), (8, 4)), show_progress=False)
    ess = np.asarray(out.effective_sample_size())
    rhat = np.asarray(out.potential_scale_reduction())
    assert ess.shape == (4,) and (ess > 0).all()
    assert rhat.shape == (4,) and np.isfinite(rhat).all()


def test_ess_geyer_pairing_not_fooled_by_antithetic_mix():
    """Round-3 review fix: pairing autocorrelations at odd offsets
    (rho1+rho2, rho3+rho4, ...) loses Geyer's positivity guarantee — a
    chain mixing a fast antithetic mode with a slow positive one gets its
    first pair negative, truncating the whole positive tail and reporting
    ESS near n*c where the true value is less than half that. Geyer pairing
    Gamma_m = rho_{2m} + rho_{2m+1} keeps the tail."""
    import jax.numpy as jnp

    n, c = 4096, 8
    key = jax.random.key(2)
    k1, k2 = jax.random.split(key)

    def ar(phi, eps):
        def body(carry, e):
            x = phi * carry + e
            return x, x
        _, x = jax.lax.scan(body, jnp.zeros(eps.shape[1:]), eps)
        return x

    fast = ar(-0.5, jax.random.normal(k1, (n, c, 1)))
    slow = ar(0.9, jax.random.normal(k2, (n, c, 1)))
    # variance mix: mostly the antithetic mode, a heavy slow tail
    x = np.sqrt(0.88) * np.asarray(fast) / np.std(np.asarray(fast)) + \
        np.sqrt(0.12) * np.asarray(slow) / np.std(np.asarray(slow))
    ess = float(np.asarray(effective_sample_size(jnp.asarray(x)))[0])
    # true tau ~ 1 + 2*sum(0.88*(-0.5)^t + 0.12*0.9^t) ~ 2.6 -> ESS ~ n*c/2.6
    assert ess < 0.55 * n * c, ess  # broken pairing reported ~0.84 * n * c
    assert ess > 0.2 * n * c, ess


def test_ess_stuck_chain_reports_zero():
    """Round-3 review fix: a zero-variance (never-moved) chain must report
    ESS 0, not maximal ESS (eager) or FFT-roundoff junk (jit)."""
    import jax.numpy as jnp

    x = jnp.ones((1000, 2, 1)) * 3.0
    ess = np.asarray(effective_sample_size(x))
    assert ess[0] == 0.0, ess
    # mixed case: one stuck chain among healthy ones only loses its share
    healthy = jax.random.normal(jax.random.key(7), (1000, 3, 1))
    mixed = jnp.concatenate([healthy, jnp.full((1000, 1, 1), 3.0)], axis=1)
    ess_mixed = float(np.asarray(effective_sample_size(mixed))[0])
    ess_healthy = float(np.asarray(effective_sample_size(healthy))[0])
    assert abs(ess_mixed - ess_healthy) < 0.25 * ess_healthy


def test_rhat_needs_four_draws():
    import pytest

    with pytest.raises(ValueError, match="at least 4 draws"):
        potential_scale_reduction(jax.random.normal(jax.random.key(0), (3, 4, 2)))


def test_rhat_stuck_chains():
    """All chains stuck at the same point -> 1.0; at different points -> inf."""
    import jax.numpy as jnp

    same = jnp.full((64, 4, 1), 2.0)
    assert np.asarray(potential_scale_reduction(same))[0] == 1.0
    apart = jnp.tile(jnp.arange(4.0)[None, :, None], (64, 1, 1))
    assert np.isinf(np.asarray(potential_scale_reduction(apart))[0])


def test_summarize_windows_long_histories():
    """The public entries window to max_window draws so the TPU FFT compile
    blow-up at nfft >= 64k can't be reached; the windowed estimate
    extrapolates linearly in n."""
    x = jax.random.normal(jax.random.key(5), (4096, 2, 1))
    full = float(np.asarray(effective_sample_size(x, max_window=None))[0])
    windowed = float(np.asarray(effective_sample_size(x, max_window=1024))[0])
    assert abs(windowed - full) < 0.35 * full
    s = summarize(x, max_window=1024)
    assert np.isfinite(s["ess_mean"]) and s["rhat_max"] is not None


def test_summarize_tiny_run_rhat_none():
    s = summarize(jax.random.normal(jax.random.key(6), (2, 4, 3)))
    assert s["rhat_max"] is None
    assert np.isfinite(s["ess_mean"])


def test_output_ess_forwards_window_args():
    """MCMCOutput.effective_sample_size must pass max_window/dim_slab through
    (an outer slice + inner default re-window double-extrapolated and ignored
    larger windows; round-3 review fix)."""
    import numpy as np

    from nfmc_tpu.core.output import MCMCOutput

    rng = np.random.default_rng(0)
    out = MCMCOutput((3,))
    for _ in range(40):
        out.running_samples.add(rng.standard_normal((1, 8, 3)).astype(np.float32))
    # window smaller than history: factor = n / window
    ess_w, factor = out.effective_sample_size(max_window=10, return_extrapolation=True)
    assert factor == pytest.approx(4.0)
    # full history: no extrapolation
    ess_full, f2 = out.effective_sample_size(max_window=None, return_extrapolation=True)
    assert f2 == 1.0
    assert ess_w.shape == ess_full.shape == (3,)


def test_summary_short_run_degrades():
    """< 4 stored draws: summary() prints r_hat as n/a instead of raising
    (round-3 review fix)."""
    import numpy as np

    from nfmc_tpu.core.output import MCMCOutput

    out = MCMCOutput((2,))
    out.running_samples.add(np.zeros((2, 4, 2), dtype=np.float32) + np.arange(2).reshape(2, 1, 1))
    out.statistics.expectations.update(np.zeros((4, 2)))
    s = out.summary()
    assert "n/a" in s and "draws: 2 x 4" in s
