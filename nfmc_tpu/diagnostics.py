"""Convergence diagnostics computed on device: effective sample size + R-hat.

The reference has no diagnostics subsystem (SURVEY.md section 5); these run
as jitted JAX so multi-megabyte chain histories never cross the host link —
only the reduced scalars do.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _autocov_fft(x: jax.Array) -> jax.Array:
    """Biased autocovariance along axis 0; x: (n, ...) mean-centered."""
    n = x.shape[0]
    nfft = 1 << int(np.ceil(np.log2(max(2 * n, 2))))
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n].real
    return acov / n


@jax.jit
def effective_sample_size(samples: jax.Array) -> jax.Array:
    """Per-dimension ESS summed over chains via Geyer's initial positive
    sequence. ``samples: (n_draws, n_chains, d)`` -> ``(d,)``.

    Vectorized: pair sums ``P_t = rho_{2t+1} + rho_{2t+2}`` are kept while the
    running prefix of pairs stays positive (cumulative-product mask), which is
    exactly the sequential early-break of the classic estimator.
    """
    n, c, d = samples.shape
    x = samples - jnp.mean(samples, axis=0, keepdims=True)
    acov = _autocov_fft(x)  # (n, c, d), biased
    rho = acov / jnp.maximum(acov[0:1], 1e-30)
    n_pairs = (n - 1) // 2
    pairs = rho[1 : 1 + 2 * n_pairs].reshape(n_pairs, 2, c, d).sum(axis=1)
    keep = jnp.cumprod(pairs > 0.0, axis=0)
    tail = jnp.sum(pairs * keep, axis=0)  # (c, d)
    ess = n / (1.0 + 2.0 * jnp.maximum(tail, 0.0))
    return jnp.sum(ess, axis=0)  # (d,)


@jax.jit
def potential_scale_reduction(samples: jax.Array) -> jax.Array:
    """Split-R-hat (Gelman-Rubin) per dimension; ``(n, c, d) -> (d,)``."""
    n, c, d = samples.shape
    half = n // 2
    split = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # (half, 2c, d)
    m = split.shape[1]
    chain_mean = jnp.mean(split, axis=0)  # (m, d)
    chain_var = jnp.var(split, axis=0, ddof=1)
    b = half * jnp.var(chain_mean, axis=0, ddof=1)
    w = jnp.mean(chain_var, axis=0)
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def summarize(samples) -> dict:
    """Host-friendly summary: mean ESS, min ESS, max R-hat (scalars only)."""
    samples = jnp.asarray(samples)
    flat = samples.reshape(samples.shape[0], samples.shape[1], -1)
    ess = effective_sample_size(flat)
    rhat = potential_scale_reduction(flat)
    return {
        "ess_mean": float(jnp.mean(ess)),
        "ess_min": float(jnp.min(ess)),
        "rhat_max": float(jnp.max(rhat)),
    }
