"""Parallel tempering on a well-separated bimodal target.

A 32-nat energy barrier separates two Gaussian modes; every chain starts in
the right mode. Single-temperature MALA never crosses; the replica-exchange
ladder (8 rungs, fused into one batched scan step) traverses freely — the
same multimodal problem the flow-jump samplers solve, without training a
flow. Run: python examples/08_parallel_tempering.py  (CPU or TPU)
"""
import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))  # repo-root import without pip install

import jax
import jax.numpy as jnp
import numpy as np

import nfmc_tpu
from nfmc_tpu.samplers.mcmc import MALA, PTMALA, PTKernel

SEP, SIGMA, D, CHAINS = 4.0, 0.5, 2, 64


def bimodal(x):
    mu = jnp.zeros(x.shape[-1]).at[0].set(SEP)
    a = -0.5 * jnp.sum((x - mu) ** 2, axis=-1) / SIGMA**2
    b = -0.5 * jnp.sum((x + mu) ** 2, axis=-1) / SIGMA**2
    return -jax.nn.logsumexp(jnp.stack([a, b], axis=-1), axis=-1)


def frac_left(out):
    return float(np.mean(np.asarray(out.samples)[..., 0] < 0))


def main():
    nfmc_tpu.set_seed(0)
    x0 = jnp.zeros((CHAINS, D)).at[:, 0].set(SEP)  # all chains in the + mode

    pt = PTMALA((D,), bimodal, kernel=PTKernel(event_size=D, n_temps=8, beta_min=0.01))
    pt.params.n_warmup_iterations = 400
    pt.params.n_iterations = 1000
    pt.warmup(x0, show_progress=False)
    out = pt.sample(x0, show_progress=False)
    print(f"PT-MALA:  fraction of cold draws in the unseen (-) mode: {frac_left(out):.2f}"
          f"  (truth 0.50)")
    print(f"          swap acceptance: {out.statistics.swap_acceptance_rate:.2f}; "
          f"adapted ladder betas: {np.round(out.kernel.betas, 3)}")
    print(f"          E[x0] = {float(out.mean[0]):+.2f} (truth 0.00)")

    mala = MALA((D,), bimodal)
    mala.params.n_iterations = 1000
    m_out = mala.sample(x0, show_progress=False)
    print(f"MALA:     fraction in the (-) mode: {frac_left(m_out):.2f}  (stuck)"
          f"  E[x0] = {float(m_out.mean[0]):+.2f}")

    # Also reachable from the one-call front door:
    out2 = nfmc_tpu.sample(bimodal, event_shape=(D,), strategy="pt_mala",
                           n_chains=CHAINS, n_iterations=500, warmup=True,
                           x0=x0, show_progress=False, seed=1)
    print(f"front door pt_mala: (-) mode fraction {frac_left(out2):.2f}")


if __name__ == "__main__":
    main()
