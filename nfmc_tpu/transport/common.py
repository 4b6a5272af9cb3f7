"""Shared transport machinery: tempered potentials, MALA correction sweeps,
multinomial resampling, ESS — all jitted with the inverse temperature as a
traced scalar so every annealing level reuses one compiled step.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils import value_and_batched_grad


def tempered(prior_potential: Callable, target_potential: Callable):
    """u(x, lam) = (1-lam) * prior + lam * target.

    Endpoint-safe for hard-support potentials: at ``lam = 0`` (or 1) a
    ``U = +inf`` value on the switched-OFF side would give ``0 * inf = NaN``
    and poison the first annealing level of every SMC/AIS loop (they all
    start at ``lam_prev = 0``); the zero-weight side is masked out instead,
    so ``u(x, 0) = prior`` and ``u(x, 1) = target`` exactly.
    """

    def u(x, lam):
        up = prior_potential(x)
        ut = target_potential(x)
        a = jnp.where(lam < 1.0, (1.0 - lam) * up, 0.0)
        b = jnp.where(lam > 0.0, lam * ut, 0.0)
        return a + b

    return u


def log_ess(log_w: jax.Array) -> jax.Array:
    """log ESS of normalized or unnormalized log-weights."""
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return -jax.scipy.special.logsumexp(2.0 * log_w)


def systematic_resample(key, log_w, n: int):
    """Systematic (low-variance) resampling indices from log-weights: one
    uniform offset, n evenly-spaced points through the weight CDF."""
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cdf = jnp.cumsum(w)
    u = (jax.random.uniform(key, ()) + jnp.arange(n, dtype=w.dtype)) / n
    return jnp.searchsorted(cdf, u, side="left").clip(0, log_w.shape[0] - 1)


def multinomial_resample(key, log_w, n: int):
    """Multinomial resampling indices from log-weights."""
    return jax.random.categorical(key, log_w, shape=(n,))


def make_mala_sweep(u_tempered: Callable, n_steps: int = 5, step_size: float = 0.05):
    """Jitted MALA correction sweep at inverse temperature ``lam``.

    Returns ``sweep(x, lam, key) -> x'`` — the MCMC correction used between
    annealing levels (reference AFT intends ``mh``/``hmc`` here but crashes,
    ``annealed_flow_transport.py:120-128``).
    """

    def one_step(x, lam, key):
        u_and_grad = value_and_batched_grad(lambda v: u_tempered(v, lam))
        k_noise, k_acc = jax.random.split(key)
        u_x, g_x = u_and_grad(x)
        noise = jax.random.normal(k_noise, x.shape)
        x_prime = x - step_size * g_x + jnp.sqrt(2.0 * step_size) * noise
        u_xp, g_xp = u_and_grad(x_prime)

        def qpot(a, b, g):
            term = (a - b + step_size * g).reshape(a.shape[0], -1)
            return jnp.sum(term * term, axis=-1) / (4.0 * step_size)

        log_alpha = (-u_xp) - (-u_x) + (-qpot(x, x_prime, g_xp)) - (-qpot(x_prime, x, g_x))
        # accept-guard semantics as the samplers' (utils.unevaluable_current_
        # mask): a current state with U = +inf or NaN has an unevaluable
        # gradient, so qpot makes log_alpha NaN and a blanket isfinite veto
        # froze the particle at a zero-density state for every sweep of
        # every level — force-move it to any evaluable proposal instead
        # (its density under pi_lam is zero, so the stationary law is
        # unaffected). U = -inf currents keep log_alpha = -inf (stay at the
        # singularity, correct). Non-finite PROPOSALS always reject.
        cur_bad = jnp.isnan(u_x) | (u_x == jnp.inf)
        prop_ok = jnp.isfinite(u_xp) & jnp.all(
            jnp.isfinite(x_prime.reshape(x_prime.shape[0], -1)), axis=-1)
        log_alpha = jnp.where(cur_bad, jnp.inf, log_alpha)
        log_alpha = jnp.where(prop_ok, log_alpha, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, log_alpha.shape)) < log_alpha
        mask = accept.reshape(accept.shape + (1,) * (x.ndim - 1))
        return jnp.where(mask, x_prime, x)

    def sweep(x, lam, key):
        def body(x, k):
            return one_step(x, lam, k), None

        x, _ = jax.lax.scan(body, x, jax.random.split(key, n_steps))
        return x

    return sweep
