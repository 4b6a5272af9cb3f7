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
