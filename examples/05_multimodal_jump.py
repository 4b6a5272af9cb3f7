"""Why NFMC: flow jumps cross modes that local MCMC cannot.

A well-separated 2-component Gaussian mixture traps MALA in whichever mode a
chain starts in; jump_MALA interleaves MALA trajectories with flow-proposed
independence jumps, so chains teleport between modes and the mode weights
come out right.

Run: python examples/05_multimodal_jump.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import GaussianMixture

nfmc_tpu.set_seed(11)
d = 10
means = np.zeros((2, d), dtype=np.float32)
means[0, 0], means[1, 0] = -5.0, 5.0  # two modes, 10 sigma apart
target = GaussianMixture(means, sigma=1.0)

# Start 80% of chains in the negative mode, 20% in the positive one. Local
# MCMC preserves whatever imbalance the initialization had (chains cannot
# cross 10 sigma of no-man's-land); the MH-corrected flow jumps restore the
# true 50/50 weights even though the warmup flow inherits the 80/20 skew.
rng = np.random.default_rng(0)
x0 = means[np.where(np.arange(100) < 80, 0, 1)] + rng.normal(size=(100, d)).astype(np.float32)

common = dict(
    n_chains=100, n_iterations=300, x0=x0, warmup=True, show_progress=False,
    inner_param_kwargs={"n_iterations": 5},
    flow_kwargs={"n_layers": 4},
)


def mode_balance(samples):
    """Fraction of draws in the positive mode (truth: 0.5)."""
    tail = np.asarray(samples)[len(samples) // 2 :]
    return float((tail[..., 0] > 0).mean())


out_mala = nfmc_tpu.sample(target, strategy="mala", **{k: v for k, v in common.items() if k != "inner_param_kwargs" and k != "flow_kwargs"})
out_jump = nfmc_tpu.sample(target, strategy="jump_mala", **common)

print(f"MALA      positive-mode fraction: {mode_balance(out_mala.samples):.2f} (stuck where chains started)")
print(f"jump_MALA positive-mode fraction: {mode_balance(out_jump.samples):.2f} (truth 0.50)")
print(f"jump acceptance: {out_jump.statistics.jump_acceptance_rate:.2f}")
