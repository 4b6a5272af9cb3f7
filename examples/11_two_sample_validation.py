"""Distribution-level validation of samplers with nfmc_tpu.validation.

The chain-permutation two-sample test gives exact p-values under arbitrary
within-chain autocorrelation by treating whole CHAINS as the exchangeable
unit. Its scope (see nfmc_tpu/validation.py): the SAME algorithm under
matched configs on two implementations or seeds — the A/B situation the repo
itself uses to validate against the reference implementation in
tests/test_reference_parity.py. (Comparing different algorithms that share
only the stationary marginal violates chain exchangeability — use the
moment-recovery tests for that.)

Run (CPU is fine): python examples/11_two_sample_validation.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import jax
import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import DiagonalGaussian
from nfmc_tpu.validation import mcmc_two_sample_report

target = DiagonalGaussian(mu=np.zeros(5), sigma=np.linspace(1.0, 3.0, 5))
# start every chain exactly in stationarity so the comparison measures
# kernel bias, not burn-in transients
x0 = jax.random.normal(jax.random.key(0), (32, 5)) * np.linspace(1.0, 3.0, 5)


def draws(strategy, seed, **kw):
    out = nfmc_tpu.sample(
        target, strategy=strategy, n_chains=32, n_iterations=800, x0=x0,
        warmup=False, show_progress=False, seed=seed, flow="None", **kw,
    )
    return np.asarray(out.samples)


# 1) A/A: the same sampler under two seeds -> same chain law, test passes.
#    (This is the shape of a real implementation A/B: same algorithm,
#    matched config, different RNG streams.)
mala1 = draws("mala", 1)  # reused below — same seed/config is bit-identical
report = mcmc_two_sample_report(mala1, draws("mala", 2))
print(f"mala A/A    : ok={report['ok']}  ks_p={report['ks_p_value']}  "
      f"energy_p={report['energy_p_value']}")
assert report["ok"], "A/A of the same sampler rejected — that's a bug"

# 2) Biased variant: ULA at a coarse step is UNADJUSTED — its discretization
#    bias shifts the stationary law, and the test must reject it.
ula = draws("ula", 3, kernel_kwargs={"step_size": 0.8})
report = mcmc_two_sample_report(mala1, ula)
print(f"mala vs ula : ok={report['ok']}  ks_p={report['ks_p_value']}  "
      f"energy_p={report['energy_p_value']}  (expected rejection)")
assert not report["ok"], "coarse-step ULA bias went undetected"

print("validation example passed")
