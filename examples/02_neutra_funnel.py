"""NeuTra-HMC on Neal's funnel: the flow reparameterizes away the geometry.

The funnel's neck defeats plain HMC (one step size cannot fit both regimes);
NeuTra learns a RealNVP map with reverse-KL warmup and runs HMC in the
flow's latent space — gradients differentiate through the flow inverse inside
the compiled scan (the reference's hottest path, SURVEY.md section 3.4).

Run: python examples/02_neutra_funnel.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import Funnel

nfmc_tpu.set_seed(7)
target = Funnel(n_dim=10, scale=3.0)

out = nfmc_tpu.sample(
    target,
    strategy="neutra_hmc",
    flow='realnvp%{"n_layers": 6}',
    n_chains=128,
    n_iterations=500,
    warmup=True,           # reverse-KL variational fit + inner HMC tuning
    # Shorter fit than the 50k-epoch default (plenty for a 10-d funnel), and
    # a demo of plumbing warmup kwargs through the one-call API.
    param_kwargs={
        "warmup_fit_kwargs": {
            "lr": 0.01, "n_epochs": 3000, "n_samples": 256,
            "early_stopping": True, "early_stopping_threshold": 1000,
            "keep_best_weights": True,
        }
    },
    show_progress=True,
)

# Statistics are mapped back to data space via the flow inverse.
v_std = float(np.sqrt(np.asarray(out.variance))[0])
print(f"funnel scale parameter v: std = {v_std:.2f} (truth 3.0)")
print(out.statistics)
