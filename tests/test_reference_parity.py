"""Direct A/B against the ACTUAL reference implementation.

The reference (``/root/reference``) executes here through the from-scratch
dependency shim in ``tools/reference_shim`` (torchflows/potentials surface —
SURVEY.md §2.9). Each test runs the reference's own ``sample()`` and ours on
an identical diagonal-Gaussian target with matched kernel configs and
chains initialized exactly in stationarity, then applies the exact
chain-permutation two-sample test (:mod:`nfmc_tpu.validation`): max-over-dims
pooled KS + energy distance, null formed by permuting chain labels (valid
under arbitrary within-chain autocorrelation — VERDICT r2 item 6).

Calibration evidence: reference-vs-reference (A/A) runs pass at these
settings; an injected ``0.2 * sigma`` mean shift is rejected at p=0.005.

Skipped when ``/root/reference`` is absent.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from run_reference import (  # noqa: E402
    reference_available,
    run_reference,
    run_ours_matched,
)

from nfmc_tpu.validation import mcmc_two_sample_report  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="/root/reference not present"),
]

SIGMA = np.linspace(1.0, 3.0, 5)
ALPHA = 0.01


def _ab(strategy, n_iterations=1000, **kw):
    ref = run_reference(strategy, SIGMA, n_chains=32,
                        n_iterations=n_iterations, seed=0,
                        x0_from_target=True, **kw)
    ours = run_ours_matched(strategy, SIGMA, n_chains=32,
                            n_iterations=n_iterations, seed=2,
                            x0_from_target=True, **kw)
    report = mcmc_two_sample_report(ref["draws"], ours["draws"], alpha=ALPHA)
    assert report["ok"], (
        f"{strategy}: distribution mismatch vs the reference "
        f"(ks={report['ks_max']}, ks_p={report['ks_p_value']}, "
        f"energy_p={report['energy_p_value']})"
    )
    # acceptance rates must also agree — same kernel, same tuning state
    assert abs(ref["accept_rate"] - ours["accept_rate"]) < 0.05, (
        ref["accept_rate"], ours["accept_rate"])


def test_mala_matches_reference_distribution():
    _ab("mala")


def test_mh_matches_reference_distribution():
    _ab("mh")


def test_ula_matches_reference_distribution():
    # unadjusted: both sides carry the SAME discretization bias, so their
    # stationary laws must still agree with each other
    _ab("ula")


def test_hmc_matches_reference_distribution():
    _ab("hmc")


def test_imh_matches_reference_distribution():
    _ab("imh")


def test_jump_mala_matches_reference_distribution():
    _ab("jump_mala", inner_iterations=5)


def test_permutation_test_detects_injected_bias():
    """Power guard: a 0.2-sigma mean shift on one side must be rejected —
    otherwise the A/B tests above prove nothing."""
    ref = run_reference("mala", SIGMA, n_chains=32, n_iterations=1000,
                        seed=0, x0_from_target=True)
    ours = run_ours_matched("mala", SIGMA, n_chains=32, n_iterations=1000,
                            seed=2, x0_from_target=True)
    biased = ours["draws"] + 0.2 * SIGMA
    report = mcmc_two_sample_report(ref["draws"], biased, alpha=ALPHA)
    assert not report["ok"]
