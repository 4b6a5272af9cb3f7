"""Unit tests for the chain-permutation two-sample machinery
(:mod:`nfmc_tpu.validation`). The statistical calibration (A/A false-alarm
rate, injected-bias power) lives in the slow-marked reference-parity suite;
these pin the mechanics."""
import numpy as np
import pytest

from nfmc_tpu.validation import chain_permutation_test, per_dim_ess


def _iid_stack(T, C, d, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return scale * rng.standard_normal((T, C, d))


def test_differing_chain_lengths_run_and_accept():
    """T_a != T_b: ceil-based striding gives unequal per-chain point counts;
    the energy statistic must truncate both stacks to a common count instead
    of indexing past the concatenated point matrix (round-3 review fix)."""
    a = _iid_stack(1000, 12, 3, seed=0)
    b = _iid_stack(100, 12, 3, seed=1)
    r = chain_permutation_test(a, b, n_perm=50)
    assert r["ks_p_value"] > 0.01 and r["energy_p_value"] > 0.01
    # and the transposed length order
    r2 = chain_permutation_test(b, a, n_perm=50)
    assert r2["energy_p_value"] > 0.01


@pytest.mark.parametrize("tb", [64, 100, 256])
def test_odd_length_pairs_no_crash(tb):
    a = _iid_stack(37, 6, 2, seed=2)
    b = _iid_stack(tb, 9, 2, seed=3)  # differing chain counts too
    r = chain_permutation_test(a, b, n_perm=20)
    assert 0.0 < r["energy_p_value"] <= 1.0
    assert r["n_chains"] == [6, 9]


def test_detects_scale_mismatch():
    a = _iid_stack(200, 16, 3, seed=4)
    b = _iid_stack(200, 16, 3, seed=5, scale=1.8)
    r = chain_permutation_test(a, b, n_perm=100)
    assert r["ks_p_value"] <= 0.02 and r["energy_p_value"] <= 0.02
    assert not r["ok"]


def test_per_dim_ess_iid_near_total():
    draws = _iid_stack(500, 8, 4, seed=6)
    ess = per_dim_ess(draws)
    assert ess.shape == (4,)
    assert np.all(ess > 0.25 * 500 * 8)


def test_per_dim_ess_mirrors_device_estimator():
    """per_dim_ess must be the SAME estimator as
    nfmc_tpu.diagnostics.effective_sample_size (biased per-chain autocov,
    per-chain Geyer pairing, per-chain tau floor, summed), so bench A/B
    ESS/s figures are comparable to the headline's device-computed ESS.
    Exercise a heterogeneous stack (one near-constant 'stuck' chain) where
    a chain-averaged-rho variant diverges by large factors."""
    import jax.numpy as jnp

    from nfmc_tpu.diagnostics import effective_sample_size

    rng = np.random.default_rng(7)
    T, C, d = 400, 6, 3
    # AR(1) chains with per-chain mixing speeds + one stuck chain
    phis = np.array([0.0, 0.3, 0.6, 0.9, 0.97, 0.999])
    draws = np.empty((T, C, d))
    x = rng.normal(size=(C, d))
    for t in range(T):
        x = phis[:, None] * x + np.sqrt(1 - phis[:, None] ** 2) * rng.normal(size=(C, d))
        draws[t] = x
    host = per_dim_ess(draws)
    device = np.asarray(effective_sample_size(jnp.asarray(draws, jnp.float32)))
    np.testing.assert_allclose(host, device, rtol=2e-3)


def test_ks_exact_under_unequal_lengths():
    """T_a != T_b leaves unequal strided per-chain lengths; the KS path must
    truncate to a common length so chain labels stay exchangeable (round-3
    review fix). Null calibration: p_ks should be ~Uniform(0,1), so across
    repeats the rejection rate at a loose alpha must sit near alpha."""
    alpha = 0.25
    n_rep = 24
    rej = 0
    for s in range(n_rep):
        a = _iid_stack(300, 8, 2, seed=100 + 2 * s)
        b = _iid_stack(256, 8, 2, seed=101 + 2 * s)
        r = chain_permutation_test(a, b, n_perm=60)
        rej += r["ks_p_value"] <= alpha
    # binomial(24, 0.25): P(X >= 12) ~ 0.008, P(X = 0) ~ 1e-3
    assert 1 <= rej <= 11, f"KS null rejection rate {rej}/{n_rep} at alpha={alpha}"
