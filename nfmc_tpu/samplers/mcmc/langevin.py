"""Langevin Monte Carlo (MALA / ULA).

Parity with reference ``nfmc/algorithms/sampling/mcmc/langevin.py``:

* step-size default ``event_size ** (-1/3)`` (``langevin.py:17-18``);
* drift ``-tau / m^2 * grad U`` and noise ``sqrt(2 tau) / m * xi`` with
  ``m = inv_mass_diag`` (``langevin.py:74-76``);
* MALA adjustment via the proposal potential
  ``||x' - x + tau a grad U||^2_{a^{-1}} / (4 tau)`` with ``a = 1/m^2``
  (``langevin.py:31-42,87-106``);
* counters: B calls + B grads per iteration, doubled when adjusted
  (``langevin.py:116-120``).

TPU-native: ``U`` and ``grad U`` evaluate in one fused reverse-mode pass for
the entire chain batch (``value_and_batched_grad``) rather than a per-call
torch autograd graph; divergence = non-finite detection instead of
``except ValueError`` (``langevin.py:111-114``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils import (
    event_size_of,
    flatten_event,
    metropolis_acceptance_log_ratio,
    value_and_batched_grad,
)
from .base import MetropolisKernel, MetropolisParameters, MetropolisSampler


@dataclass
class LangevinKernel(MetropolisKernel):
    step_size: Optional[float] = None

    def __post_init__(self):
        if self.step_size is None:
            self.step_size = self.event_size ** (-1.0 / 3.0)
        super().__post_init__()


@dataclass
class LangevinParameters(MetropolisParameters):
    pass


def proposal_potential(x_prime_flat, x_flat, grad_u_x_flat, a_diag, tau):
    """Langevin proposal potential q(x'|x); reference ``langevin.py:31-42``."""
    term = x_prime_flat - x_flat + tau * a_diag[None] * grad_u_x_flat
    return jnp.sum(term * (1.0 / a_diag[None]) * term, axis=-1) / (4.0 * tau)


class Langevin(MetropolisSampler):
    """TPU-native optimization: the potential and gradient at the current
    state are carried in the scan state and updated through the accept mask,
    so each iteration evaluates the target once (at the proposal) instead of
    twice — a 2x reduction on expensive targets. Reported counters keep the
    reference contract (SURVEY.md section 2.8)."""

    def __init__(self, event_shape, target, kernel: Optional[LangevinKernel] = None,
                 params: Optional[LangevinParameters] = None):
        if kernel is None:
            kernel = LangevinKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = LangevinParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "LMC"

    def _augment_state(self, mstate, x0):
        u0, g0 = value_and_batched_grad(self.target)(x0)
        return (mstate, u0, g0)

    # ---- metric hooks (overridden by the dense-metric superset, dense.py) ----
    def _drift_noise(self, mstate, g_flat, noise_flat):
        """Langevin move increment: ``-tau A grad U + sqrt(2 tau) sqrt(A) xi``
        with the diagonal preconditioner ``A = 1/m^2`` (reference
        ``langevin.py:74-76``)."""
        tau = mstate.step_size
        inv_mass = mstate.inv_mass_diag
        return (
            -tau / (inv_mass[None] ** 2) * g_flat
            + jnp.sqrt(2.0 * tau) / inv_mass[None] * noise_flat
        )

    def _proposal_potential(self, mstate, x_prime_flat, x_flat, grad_u_x_flat):
        a_diag = 1.0 / mstate.inv_mass_diag**2
        return proposal_potential(
            x_prime_flat, x_flat, grad_u_x_flat, a_diag, mstate.step_size
        )

    def make_draws(self):
        """Per-iteration randomness, hoistable per chunk (bit-identical to the
        in-scan derivation in ``_make_step``)."""
        event_shape = self.event_shape
        adjustment = self.params.adjustment

        def draws(key, n_chains):
            k_noise, k_accept = jax.random.split(key)
            noise = jax.random.normal(k_noise, (n_chains, *event_shape))
            if adjustment:
                log_u = jnp.log(jax.random.uniform(k_accept, (n_chains,)))
            else:
                log_u = jnp.zeros((n_chains,), dtype=jnp.float32)
            return noise, log_u

        return draws

    def _make_step(self, tuning: bool):
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    def _make_step_aux(self, tuning: bool):
        from ...core.driver import StepInfo

        target = self.target
        event_shape = self.event_shape
        event_ndim = len(event_shape)
        adjustment = self.params.adjustment
        u_and_grad = value_and_batched_grad(target)
        update_kernel = self.make_update_kernel()

        drift_noise = self._drift_noise
        prop_potential = self._proposal_potential

        def step(x, state, key, aux):
            mstate, u_x, g_x = state
            n_chains = x.shape[0]
            noise, log_u = aux

            g_flat = flatten_event(g_x, event_shape)
            x_flat = flatten_event(x, event_shape)
            xp_flat = x_flat + drift_noise(mstate, g_flat, flatten_event(noise, event_shape))
            x_prime = xp_flat.reshape(x.shape)
            finite_prop = jnp.all(jnp.isfinite(xp_flat), axis=-1)

            u_xp, g_xp = u_and_grad(x_prime)
            if adjustment:
                gp_flat = flatten_event(g_xp, event_shape)
                log_ratio = metropolis_acceptance_log_ratio(
                    log_prob_target_curr=-u_x,
                    log_prob_target_prime=-u_xp,
                    log_prob_proposal_curr=-prop_potential(mstate, x_flat, xp_flat, gp_flat),
                    log_prob_proposal_prime=-prop_potential(mstate, xp_flat, x_flat, g_flat),
                )
                mask = (log_u < log_ratio) & finite_prop & jnp.isfinite(u_xp)
            else:
                mask = finite_prop & jnp.isfinite(u_xp)
            # Divergence = non-finite proposal OR non-finite potential at the
            # proposal (Stan convention; superset of the reference's
            # except-ValueError detection at ``langevin.py:111-114``).
            diverged = (~jnp.all(finite_prop & jnp.isfinite(u_xp))).astype(jnp.int32)

            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            u_new = jnp.where(mask, u_xp, u_x)
            g_new = jnp.where(bmask, g_xp, g_x)
            if tuning:
                mstate = update_kernel(mstate, x_new, mask)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=diverged,
            )
            return x_new, (mstate, u_new, g_new), info

        return step

    def make_propose(self):
        target = self.target
        event_shape = self.event_shape
        adjustment = self.params.adjustment
        u_and_grad = value_and_batched_grad(target)

        drift_noise = self._drift_noise
        prop_potential = self._proposal_potential

        def propose(x, mstate, key):
            n_chains = x.shape[0]
            k_noise, k_accept = jax.random.split(key)
            noise = jax.random.normal(k_noise, x.shape)

            u_x, grad_u_x = u_and_grad(x)
            g_flat = flatten_event(grad_u_x, event_shape)
            x_flat = flatten_event(x, event_shape)
            xp_flat = x_flat + drift_noise(mstate, g_flat, flatten_event(noise, event_shape))
            x_prime = xp_flat.reshape(x.shape)

            finite_prop = jnp.all(jnp.isfinite(xp_flat), axis=-1)
            # Both branches evaluate U(x') and guard on its finiteness —
            # identical semantics to the live carried-gradient step
            # (_make_step_aux): ULA refuses moves into non-finite-potential
            # states and counts them as divergences.
            u_xp, grad_u_xp = u_and_grad(x_prime)
            if adjustment:
                gp_flat = flatten_event(grad_u_xp, event_shape)
                log_ratio = metropolis_acceptance_log_ratio(
                    log_prob_target_curr=-u_x,
                    log_prob_target_prime=-u_xp,
                    log_prob_proposal_curr=-prop_potential(mstate, x_flat, xp_flat, gp_flat),
                    log_prob_proposal_prime=-prop_potential(mstate, xp_flat, x_flat, g_flat),
                )
                log_u = jnp.log(jax.random.uniform(k_accept, (n_chains,)))
                # Guard on u_xp too: a -inf proposal potential would make
                # log_ratio = +inf and accept a state that freezes the chain.
                finite_prop = finite_prop & jnp.isfinite(u_xp)
                mask = (log_u < log_ratio) & finite_prop
            else:
                finite_prop = finite_prop & jnp.isfinite(u_xp)
                mask = finite_prop
            diverged = (~jnp.all(finite_prop)).astype(jnp.int32)
            return x_prime, mask, diverged

        return propose

    def calls_per_iter(self, n_chains: int) -> int:
        return 2 * n_chains if self.params.adjustment else n_chains

    def grads_per_iter(self, n_chains: int) -> int:
        return 2 * n_chains if self.params.adjustment else n_chains


class MALA(Langevin):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.params.adjustment = True

    @property
    def name(self):
        return "MALA"


class ULA(Langevin):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.params.adjustment = False

    @property
    def name(self):
        return "ULA"
