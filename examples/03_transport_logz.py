"""Normalizing-constant estimation with the transport layer (AIS/AFT/PMC).

Estimates log Z between a standard-normal prior and a narrow Gaussian target
(truth: d * log sigma). The reference ships AFT/CRAFT/SNF/NS broken and lists
PMC as future work (SURVEY.md section 2.7); these are working TPU-native
implementations.

Run: python examples/03_transport_logz.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

from nfmc_tpu.potentials import DiagonalGaussian, StandardGaussian
from nfmc_tpu.transport import pmc
from nfmc_tpu.transport.ais import ais_base

d = 10
prior = StandardGaussian((d,))
target = DiagonalGaussian(mu=np.full(d, 2.0), sigma=np.full(d, 0.5))
true_log_z = d * np.log(0.5)

# Annealed importance sampling (fixed linear ladder)
import jax
x0 = np.asarray(prior.sample((512,), key=jax.random.key(0)))
_, log_w = ais_base(x0, prior, target, n_steps=32, n_mcmc_steps=3, step_size=0.05, seed=0)
ais_est = float(jax.scipy.special.logsumexp(log_w) - np.log(512))

# Preconditioned Monte Carlo (adaptive ladder + flow-preconditioned moves)
out = pmc(prior, target, 'realnvp%{"n_layers": 2, "hidden_size": 32}',
          n_particles=512, seed=0)

print(f"true log Z:        {true_log_z:.3f}")
print(f"AIS estimate:      {ais_est:.3f}")
print(f"PMC estimate:      {out['log_Z']:.3f}  "
      f"({len(out['beta_trace']) - 1} adaptive levels, "
      f"mean acceptance {out['acceptance_trace'].mean():.2f})")
