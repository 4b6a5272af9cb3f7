"""Convergence diagnostics computed on device: effective sample size + R-hat.

The reference has no diagnostics subsystem (SURVEY.md section 5); these run
as jitted JAX so multi-megabyte chain histories never cross the host link —
only the reduced scalars do.

TPU constraint: the autocovariance FFT compiles in minutes at nfft >= 64k
(CLAUDE.md), so the public entry points window long histories to
``max_window`` trailing draws (extrapolating linearly in n, exactly like
``MCMCOutput.effective_sample_size``) and process the event dimension in
``dim_slab`` slabs to bound the FFT pad-buffer footprint.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Relative variance floor: a (chain, dim) whose lag-0 autocovariance is below
# this fraction of its mean-square value is a stuck/constant chain — formally
# undefined autocorrelation, and in practice backend FFT roundoff junk that
# made the result depend on the platform (eager CPU reported maximal ESS,
# XLA's FFT noise reported ~2). Well above f32 FFT roundoff (~1e-14 relative)
# and far below any variance a f32 chain can meaningfully resolve.
_ZERO_VAR_REL = 1e-10


def _autocov_fft(x: jax.Array) -> jax.Array:
    """Biased autocovariance along axis 0; x: (n, ...) mean-centered."""
    n = x.shape[0]
    nfft = 1 << int(np.ceil(np.log2(max(2 * n, 2))))
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n].real
    return acov / n


@jax.jit
def _ess_kernel(samples: jax.Array) -> jax.Array:
    """Raw per-dimension ESS summed over chains; ``(n, c, d) -> (d,)``.

    Geyer initial positive sequence, vectorized with the pairing
    ``Gamma_m = rho_{2m} + rho_{2m+1}`` (``Gamma_0 = 1 + rho_1``): for
    reversible chains every ``Gamma_m`` is positive until the noise floor,
    which is what makes the keep-while-positive truncation
    (cumulative-product mask = the sequential early-break) sound. Pairing at
    odd offsets ``rho_{2m+1} + rho_{2m+2}`` instead loses that guarantee — a
    chain mixing a fast antithetic mode with a slow positive one gets its
    FIRST pair negative, truncating the whole positive tail and
    overestimating ESS >2x (round-3 review fix).
    ``tau = -1 + 2 * sum(kept Gamma)`` is floored at 1 (conservative: never
    credits super-efficiency from antithetic autocorrelation).

    Stuck (zero-variance) chains contribute ESS 0 — their autocorrelation is
    undefined and the old 1e-30 absolute floor reported them as perfectly
    mixed (round-3 review fix).
    """
    n, c, d = samples.shape
    x = samples - jnp.mean(samples, axis=0, keepdims=True)
    acov = _autocov_fft(x)  # (n, c, d), biased
    var0 = acov[0]  # (c, d)
    msq = jnp.mean(samples * samples, axis=0)  # (c, d) scale reference
    valid = var0 > _ZERO_VAR_REL * (msq + 1e-30)
    rho = acov / jnp.where(valid, var0, 1.0)[None]
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, c, d).sum(axis=1)
    keep = jnp.cumprod(pairs > 0.0, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(pairs * keep, axis=0)  # (c, d)
    ess = jnp.where(valid, n / jnp.maximum(tau, 1.0), 0.0)
    return jnp.sum(ess, axis=0)  # (d,)


def effective_sample_size(
    samples: jax.Array, max_window: int = 8192, dim_slab: int = 25
) -> jax.Array:
    """Per-dimension ESS summed over chains; ``(n_draws, n_chains, d) -> (d,)``.

    Histories longer than ``max_window`` are estimated on the trailing window
    and extrapolated linearly in the draw count (fair when the
    autocorrelation time is well under the window; same contract as
    ``MCMCOutput.effective_sample_size``), and the event dimension runs in
    ``dim_slab`` slabs — both bound the TPU FFT compile blow-up at
    nfft >= 64k. Pass ``max_window=None`` / ``dim_slab=None`` to force one
    raw full-history computation.
    """
    samples = jnp.asarray(samples)
    n, _, d = samples.shape
    window = samples if max_window is None else samples[-min(max_window, n):]
    slab = d if dim_slab is None else dim_slab
    parts = [
        _ess_kernel(window[..., i : i + slab]) for i in range(0, d, slab)
    ]
    factor = n / window.shape[0]
    return jnp.concatenate(parts) * factor


@jax.jit
def potential_scale_reduction(samples: jax.Array) -> jax.Array:
    """Split-R-hat (Gelman-Rubin) per dimension; ``(n, c, d) -> (d,)``.

    Requires ``n >= 4`` draws (each split half needs >= 2 for a ddof=1
    variance); raises at trace time otherwise instead of returning NaN.
    Zero-variance (stuck) chains: all chains stuck at the same point report
    1.0 (trivially "converged", loudly visible via ESS 0); chains stuck at
    DIFFERENT points report +inf.
    """
    n, c, d = samples.shape
    if n < 4:
        raise ValueError(
            f"split-R-hat needs at least 4 draws, got {n} — run longer or "
            "skip R-hat on smoke runs"
        )
    half = n // 2
    split = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # (half, 2c, d)
    chain_mean = jnp.mean(split, axis=0)  # (m, d)
    chain_var = jnp.var(split, axis=0, ddof=1)
    b = half * jnp.var(chain_mean, axis=0, ddof=1)
    w = jnp.mean(chain_var, axis=0)
    var_plus = (half - 1) / half * w + b / half
    scale = jnp.mean(split * split, axis=(0, 1))  # (d,) relative reference
    tiny = _ZERO_VAR_REL * (scale + 1e-30)
    return jnp.where(
        w > tiny,
        jnp.sqrt(var_plus / jnp.maximum(w, 1e-30)),
        jnp.where(b > tiny, jnp.inf, 1.0),
    )


def summarize(samples, max_window: int = 8192, dim_slab: int = 25) -> dict:
    """Host-friendly summary: mean ESS, min ESS, max R-hat (scalars only).

    Windows/slabs the ESS like :func:`effective_sample_size`; R-hat runs on
    the same trailing window (it is FFT-free but the window keeps the device
    working set bounded) and is ``None`` for runs under 4 draws.
    """
    samples = jnp.asarray(samples)
    flat = samples.reshape(samples.shape[0], samples.shape[1], -1)
    ess = effective_sample_size(flat, max_window=max_window, dim_slab=dim_slab)
    window = flat[-min(max_window, flat.shape[0]):]
    rhat_max = (
        float(jnp.max(potential_scale_reduction(window)))
        if window.shape[0] >= 4
        else None
    )
    return {
        "ess_mean": float(jnp.mean(ess)),
        "ess_min": float(jnp.min(ess)),
        "rhat_max": rhat_max,
    }
