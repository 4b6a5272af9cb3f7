"""Annealed Importance Sampling (Neal 2001).

The reference imports ``nfmc.mcmc.ais`` which does not exist
(``flow_annealed_bootstrap.py:4``); this is the real component: a jitted
geometric-schedule AIS with MALA transitions, importance weights
``log_w = sum_k [u_{k-1}(x_k) - u_k(x_k)]`` accumulated on device.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .common import make_mala_sweep, tempered


def anneal_chain(u: Callable, sweep: Callable, n_steps: int):
    """The AIS annealing loop as a traceable core: ``(x0, key) -> (x, log_w)``
    over a linear schedule with weight increments
    ``log_w += u(x, lam_prev) - u(x, lam_next)`` followed by an MCMC sweep at
    the new level. Shared by :func:`make_ais` and FAB's bootstrap round (which
    anneals toward the params-dependent alpha=2 target)."""

    def run(x0, key):
        lambdas = jnp.linspace(0.0, 1.0, n_steps + 1)

        def body(carry, inputs):
            x, log_w = carry
            lam_prev, lam_next, k = inputs
            log_w = log_w + u(x, lam_prev) - u(x, lam_next)
            # out-of-support at BOTH levels gives inf - inf = NaN; the
            # particle's weight is genuinely zero — pin it to -inf so one
            # such particle cannot NaN every logsumexp-based log-Z estimate
            log_w = jnp.where(jnp.isnan(log_w), -jnp.inf, log_w)
            x = sweep(x, lam_next, k)
            return (x, log_w), None

        keys = jax.random.split(key, n_steps)
        (x, log_w), _ = jax.lax.scan(
            body,
            (x0, jnp.zeros(x0.shape[0])),
            (lambdas[:-1], lambdas[1:], keys),
        )
        return x, log_w

    return run


def make_ais(prior_potential: Callable, target_potential: Callable,
             n_steps: int = 10, n_mcmc_steps: int = 3, step_size: float = 0.05):
    """Returns jitted ``ais(x0, key) -> (x, log_w)`` where ``x0 ~ prior``."""
    u = tempered(prior_potential, target_potential)
    sweep = make_mala_sweep(u, n_steps=n_mcmc_steps, step_size=step_size)
    return jax.jit(anneal_chain(u, sweep, n_steps))


def ais_base(x0, prior_potential, target_potential, n_steps: int = 10,
             n_mcmc_steps: int = 3, step_size: float = 0.05, key=None, seed=None):
    """Convenience one-shot form (reference-style signature)."""
    from ..core.rng import resolve_key

    run = make_ais(prior_potential, target_potential, n_steps, n_mcmc_steps, step_size)
    return run(jnp.asarray(x0, dtype=jnp.float32), resolve_key(key, seed))
