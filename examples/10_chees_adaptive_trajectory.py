"""ChEES-HMC vs fixed-length HMC on a badly scale-spread Gaussian.

HMC's trajectory length is its awkward knob: the reference (like most
libraries) fixes ``n_leapfrog_steps = 20`` and leaves it to the user. On a
target whose widest direction has sigma ~ 30, the optimal integration time is
~ (pi/2) * 30, so 20 tuned-step leapfrogs barely rotate the slow coordinate
and the chain random-walks it. ChEES-HMC (Hoffman et al. 2021) adapts the
trajectory length from CROSS-CHAIN statistics — exactly the information a
vectorized TPU run has for free — and every chain shares the adapted,
jittered length, so there is no NUTS-style per-chain work imbalance.

The comparison metric is ESS per 1000 target-gradient evaluations: hardware-
independent, and gradient evals are where the work is (both samplers also
report identical reference-contract counters).

Run: python examples/10_chees_adaptive_trajectory.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.diagnostics import effective_sample_size
from nfmc_tpu.potentials import DiagonalGaussian

D, CHAINS, WARM, ITERS = 16, 64, 300, 600


def main():
    sigma = np.logspace(0, np.log10(30.0), D).astype(np.float32)
    target = DiagonalGaussian(np.zeros(D, dtype=np.float32), sigma)

    results = {}
    for strategy in ("chees_hmc", "hmc"):
        nfmc_tpu.set_seed(0)
        out = nfmc_tpu.sample(target, event_shape=(D,), strategy=strategy,
                              n_chains=CHAINS, n_iterations=ITERS,
                              n_warmup_iterations=WARM, warmup=True,
                              show_progress=False)
        draws = np.asarray(out.samples)
        # ESS of the slowest (widest) coordinate — the one trajectory length
        # is supposed to buy
        ess_slow = float(np.asarray(effective_sample_size(draws[..., -1:])).sum())
        grads = int(out.statistics.n_target_gradient_calls)
        sig_err = np.max(np.abs(np.sqrt(np.asarray(out.variance)) - sigma) / sigma)
        results[strategy] = (ess_slow, grads, sig_err)
        print(f"{strategy}:")
        print(f"  tuned kernel:  {out.kernel}")
        print(f"  slow-coordinate ESS per 1000 grads: {1000 * ess_slow / grads:.2f}")
        print(f"  max sigma relative error: {sig_err:.3f}")

    gain = (results["chees_hmc"][0] / results["chees_hmc"][1]) / (
        results["hmc"][0] / results["hmc"][1]
    )
    print(f"ChEES gradient-efficiency gain on the slow coordinate: {gain:.1f}x")


if __name__ == "__main__":
    main()
