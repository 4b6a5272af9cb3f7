"""Applied targets: a Bayesian logistic-regression posterior and a phi^4
lattice field theory with matrix-shaped events.

Run: python examples/06_applied_targets.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import BayesianLogisticRegression, Phi4Lattice

nfmc_tpu.set_seed(7)

# ---- 1. Logistic-regression posterior (sonar-sized synthetic data) ---------
pot = BayesianLogisticRegression.synthetic(n=200, d=24, seed=0)
sampler = nfmc_tpu.create_sampler(pot, strategy="mala")
sampler.params.n_warmup_iterations = 200
sampler.params.n_iterations = 500

x0 = np.random.default_rng(1).standard_normal((64, *pot.event_shape)).astype(np.float32) * 0.1
warm = sampler.warmup(x0, show_progress=False, seed=2)
out = sampler.sample(np.asarray(warm.samples)[-1], show_progress=False, seed=3)

beta = np.asarray(out.mean)
logits = pot.X @ beta[:-1] + beta[-1]
train_acc = float(((logits > 0) == (pot.y > 0)).mean())
print(f"logreg: tuned step={sampler.kernel.step_size:.4f}  "
      f"acceptance={float(out.statistics.acceptance_rate):.2f}  train acc={train_acc:.2f}")

# ---- 2. phi^4 lattice: flow-jump sampling of an (L, L) field ---------------
lat = Phi4Lattice(L=8, kappa=0.25, lam=0.022)
out = nfmc_tpu.sample(
    lat,
    strategy="jump_hmc",
    flow="realnvp",
    n_chains=32,
    n_iterations=100,
    warmup=True,
    show_progress=False,
)
phi = np.asarray(out.samples)  # (draws, chains, 8, 8)
mag = phi.mean(axis=(-1, -2))  # per-configuration magnetization
print(f"phi4: {phi.shape[0]} stored draws, |m| mean={np.abs(mag).mean():.3f}, "
      f"jump acceptance={float(out.statistics.jump_acceptance_rate):.2f}")
