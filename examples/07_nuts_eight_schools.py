"""Native multi-chain NUTS on the Eight Schools posterior.

Round-2 capabilities: ``strategy="nuts"`` (the reference's NUTS is a broken
single-chain Pyro shim it never dispatches; ours is a native iterative
multinomial NUTS with dual-averaging warmup, vectorized over chains and
compiled into the chunked scan driver) and the Eight Schools hierarchical
target (non-centered parameterization: x = (mu, log_tau, z_1..z_8)).

Run: python examples/07_nuts_eight_schools.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import EightSchools

pot = EightSchools()
nfmc_tpu.set_seed(0)

out = nfmc_tpu.sample(
    pot,
    strategy="nuts",
    n_chains=64,
    n_iterations=500,
    n_warmup_iterations=300,
    warmup=True,
    show_progress=True,
    seed=1,
)

s = np.asarray(out.samples)
half = s[len(s) // 2:]
mu = half[:, :, 0]
tau = np.exp(half[:, :, 1])
print(f"posterior mu:  {mu.mean():.2f} +- {mu.std():.2f}   (pooled MLE ~7.7, shrunk by the N(0,100) prior)")
print(f"posterior tau: {tau.mean():.2f} (median {np.median(tau):.2f})   (weakly identified; LogNormal prior favors small tau)")
print(f"acceptance statistic: {out.statistics.acceptance_rate:.3f}")
print(f"target grads: {out.statistics.n_target_gradient_calls:,} "
      f"({out.statistics.grads_per_second:,.0f}/s)")

# split-Rhat on the second half as a convergence check (on-device
# diagnostics; the first half still carries post-warmup transients)
from nfmc_tpu.diagnostics import potential_scale_reduction

rhat = np.asarray(potential_scale_reduction(half.reshape(len(half), half.shape[1], -1)))
print(f"max split-Rhat over 10 dims: {rhat.max():.3f}")

# ESS warmup is also new in round 2: elliptical slice sampling with an
# adapted ellipse (exact prior correction keeps the posterior unchanged)
import jax.numpy as jnp

sigma = np.linspace(1.0, 3.0, 5).astype(np.float32)


def nll(x):
    return 0.5 * jnp.sum((x.reshape(x.shape[0], -1) / sigma) ** 2, axis=-1)


out2 = nfmc_tpu.sample(
    nll, event_shape=(5,), strategy="ess", negative_log_likelihood=nll,
    n_chains=64, n_iterations=400, warmup=True, show_progress=False, seed=3,
)
post_var = 1.0 / (1.0 + 1.0 / sigma**2)
print("\nESS with adapted ellipse: var", np.round(np.asarray(out2.variance), 3),
      "\n           analytic:     ", np.round(post_var, 3))
