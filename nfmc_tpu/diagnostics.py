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

    Vectorized with Geyer's pairing ``Gamma_m = rho_{2m} + rho_{2m+1}``
    (``Gamma_0 = 1 + rho_1``): for reversible chains every ``Gamma_m`` is
    positive until the noise floor, which is what makes the
    keep-while-positive truncation (cumulative-product mask = the sequential
    early-break) sound. Pairing at odd offsets ``rho_{2m+1} + rho_{2m+2}``
    instead loses that guarantee — a chain mixing a fast antithetic mode
    with a slow positive one gets its FIRST pair negative, truncating the
    whole positive tail and overestimating ESS >2x (round-3 review fix).
    ``tau = -1 + 2 * sum(kept Gamma)`` is floored at 1 (conservative: never
    credits super-efficiency from antithetic autocorrelation).
    """
    n, c, d = samples.shape
    x = samples - jnp.mean(samples, axis=0, keepdims=True)
    acov = _autocov_fft(x)  # (n, c, d), biased
    rho = acov / jnp.maximum(acov[0:1], 1e-30)
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, c, d).sum(axis=1)
    keep = jnp.cumprod(pairs > 0.0, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(pairs * keep, axis=0)  # (c, d)
    ess = n / jnp.maximum(tau, 1.0)
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
