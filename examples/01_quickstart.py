"""Quickstart: one-call sampling with any strategy (reference README parity).

Run: python examples/01_quickstart.py
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import numpy as np

import nfmc_tpu
from nfmc_tpu.potentials import DiagonalGaussian

nfmc_tpu.set_seed(42)

# Target = negative unnormalized log-density, batched: (n_chains, *event) -> (n_chains,)
target = DiagonalGaussian(mu=np.zeros(25), sigma=np.linspace(1.0, 5.0, 25))

out = nfmc_tpu.sample(
    target,
    strategy="jump_mala",      # see nfmc_tpu.get_supported_samplers()
    flow='realnvp%{"n_layers": 4}',  # registry name + JSON-kwargs DSL
    n_chains=100,
    n_iterations=500,
    inner_param_kwargs={"n_iterations": 5},
    warmup=True,
    show_progress=True,
)

print("samples:", out.samples.shape)  # (n_iter * (inner+1), chains, 25)
print("posterior std (should approach 1..5):")
print(np.round(np.sqrt(np.asarray(out.variance)), 2))
print(out.statistics)
print()
print(out.summary(max_dims=5))  # Stan-style table: mean/sd/90% interval/ESS/R-hat
