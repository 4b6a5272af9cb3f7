"""Deferred collect-mode sample fetches (r5, VERDICT r4 item 1).

Pipelined host-storage runs accumulate device blocks and fetch ONCE at run
end instead of a blocking D2H per chunk. The deferral changes only WHEN the
rows cross the host link, never which rows or their order — these tests pin
bit-identical results against the per-chunk path (forced via the footprint
limit), and that thinning/max_samples/last_sample semantics survive.
"""
import jax
import numpy as np
import pytest

import nfmc_tpu.core.driver as driver_mod
from nfmc_tpu.core.output import MCMCOutput
from nfmc_tpu.samplers.mcmc import MALA
from nfmc_tpu.samplers.nfmc import JumpMALA


def _U(x):
    return 0.5 * (x.reshape(x.shape[0], -1) ** 2).sum(-1)


def _run_mala(n_iterations, seed=3, n_chains=8, d=3):
    s = MALA((d,), _U)
    s.params.n_iterations = n_iterations
    x0 = jax.random.normal(jax.random.key(0), (n_chains, d))
    return s.sample(x0, show_progress=False, seed=seed)


def test_deferred_rows_bit_identical_to_per_chunk_path(monkeypatch):
    """Same seed, same chunk schedule — the deferral must only change fetch
    timing. Forcing the limit to 0 disables deferral without touching the
    schedule (the limit is not part of the single-chunk caps)."""
    n = 5000  # > SINGLE_CHUNK_ITER_LIMIT: multi-chunk pipelined run
    a = _run_mala(n)
    monkeypatch.setattr(driver_mod, "SAMPLE_DEFER_ELEMENT_LIMIT", 0)
    b = _run_mala(n)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    np.testing.assert_array_equal(
        np.asarray(a.running_samples.last_sample),
        np.asarray(b.running_samples.last_sample),
    )


def test_deferred_store_thinning_and_max_samples():
    """Feeding the whole run as one end-of-run block must keep the thinning
    phase (seen_samples-based) and the max_samples ring identical to
    per-iteration feeding."""
    from nfmc_tpu.core.samples import MCMCSamples
    from nfmc_tpu.core.statistics import MCMCStatistics
    from nfmc_tpu.core.driver import ChunkedScanDriver, StepInfo

    d, n_chains, n = 2, 4, 2000

    def make_step(tuning):
        def step(x, kstate, key):
            x2 = x + 1.0  # deterministic: row i is x0 + (i+1)
            info = StepInfo(
                n_accepted=jax.numpy.zeros((), jax.numpy.int32),
                diverged=jax.numpy.zeros((), jax.numpy.int32),
            )
            return x2, kstate, info

        return step

    def run(thinning, max_samples):
        drv = ChunkedScanDriver((d,), make_step)
        samples = MCMCSamples((d,), thinning=thinning, max_samples=max_samples)
        stats = MCMCStatistics((d,))
        x0 = jax.numpy.zeros((n_chains, d))
        drv.run(x0, None, jax.random.key(0), n, stats=stats, samples=samples)
        return samples

    for thinning, max_samples in ((3, None), (1, 100), (7, 50)):
        got = run(thinning, max_samples)
        kept = [i for i in range(n) if i % thinning == 0]
        if max_samples is not None:
            kept = kept[-max_samples:]
        assert got.n_samples == len(kept)
        # row value = iteration index + 1 in every coordinate
        first = np.asarray(got[0])
        assert np.all(first == kept[0] + 1), (first[0], kept[0])
        last = np.asarray(got[got.n_samples - 1])
        assert np.all(last == kept[-1] + 1)
        # last_sample is the final STATE regardless of thinning
        assert np.all(np.asarray(got.last_sample) == n)


def test_jump_fused_deferred_matches_per_chunk(monkeypatch):
    n_chains, d = 6, 3
    x0 = jax.random.normal(jax.random.key(1), (n_chains, d))

    def run():
        s = JumpMALA((d,), _U)
        s.params.fit_nf = False
        s.params.n_iterations = 40
        s.inner_sampler.params.n_iterations = 3
        return s.sample(x0, show_progress=False, seed=5)

    a = run()
    monkeypatch.setattr(driver_mod, "SAMPLE_DEFER_ELEMENT_LIMIT", 0)
    b = run()
    assert np.asarray(a.samples).shape == (40 * 4, n_chains, d)
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))


def test_sync_mode_unaffected_by_deferral_limit():
    """Time-limited (sync) runs stream per chunk regardless — the deferral
    guard requires the pipelined mode."""
    s = MALA((3,), _U)
    s.params.n_iterations = 10**6
    x0 = jax.random.normal(jax.random.key(0), (4, 3))
    out = s.sample(x0, show_progress=False, seed=1, time_limit_seconds=0.5)
    assert np.asarray(out.samples).shape[0] >= 1
    assert np.isfinite(np.asarray(out.samples)).all()
