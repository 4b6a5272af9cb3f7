"""Random-walk Metropolis-Hastings.

Parity with reference ``nfmc/algorithms/sampling/mcmc/mh.py``: proposal
``x' = x + randn * inv_mass_diag`` (the scale is ``inv_mass_diag`` directly,
``mh.py:51-54``), MH-adjusted (``MH``) or always-accept (``RandomWalk``);
``MHParameters`` pins ``tune_step_size=False``, ``tune_inv_mass_diag=True``,
``imd_adjustment=1e-5`` (``mh.py:20-25``). Counters: 2B target calls per
iteration when adjusted, 0 gradients (``mh.py:68-72``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils import event_size_of, metropolis_acceptance_log_ratio
from .base import MetropolisKernel, MetropolisParameters, MetropolisSampler


@dataclass
class MHKernel(MetropolisKernel):
    pass


@dataclass
class MHParameters(MetropolisParameters):
    imd_adjustment: float = 1e-5

    def __post_init__(self):
        super().__post_init__()
        self.tune_step_size = False
        self.tune_inv_mass_diag = True


class MH(MetropolisSampler):
    def __init__(self, event_shape, target, kernel: Optional[MHKernel] = None,
                 params: Optional[MHParameters] = None):
        if kernel is None:
            kernel = MHKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = MHParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "MH"

    def make_draws(self):
        """Raw proposal normals + accept uniforms (the inv_mass_diag scale is
        state-dependent and stays in the step); hoistable per chunk with
        bit-identical results to the in-scan derivation."""
        event_size = self.kernel.event_size
        adjustment = self.params.adjustment

        def draws(key, n_chains):
            k_noise, k_accept = jax.random.split(key)
            noise = jax.random.normal(k_noise, (n_chains, event_size))
            if adjustment:
                log_u = jnp.log(jax.random.uniform(k_accept, (n_chains,)))
            else:
                log_u = jnp.zeros((n_chains,), dtype=jnp.float32)
            return noise, log_u

        return draws

    def make_propose_aux(self):
        target = self.target
        adjustment = self.params.adjustment

        def propose(x, mstate, aux):
            n_chains = x.shape[0]
            noise, log_u = aux
            x_prime = x + (noise * mstate.inv_mass_diag).reshape(x.shape)

            finite_prop = jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
            if adjustment:
                # Same accept guard as the live carried-potential step
                # (_make_step_aux): a non-finite U(x') is a rejected
                # divergence, never an accept via log_ratio=+inf.
                u_prime = target(x_prime)
                log_ratio = metropolis_acceptance_log_ratio(
                    -target(x), -u_prime, 0.0, 0.0
                )
                finite_prop = finite_prop & jnp.isfinite(u_prime)
                mask = (log_u < log_ratio) & finite_prop
            else:
                mask = finite_prop
            diverged = (~jnp.all(finite_prop)).astype(jnp.int32)
            return x_prime, mask, diverged

        return propose

    def make_propose(self):
        propose_aux = self.make_propose_aux()
        draws = self.make_draws()

        def propose(x, mstate, key):
            return propose_aux(x, mstate, draws(key, x.shape[0]))

        return propose

    def _augment_state(self, mstate, x0):
        if not self.params.adjustment:
            return mstate
        return (mstate, self.target(x0))

    def _make_step(self, tuning: bool):
        if not self.params.adjustment:
            return super()._make_step(tuning)
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    def _make_step_aux(self, tuning: bool):
        """Carried-potential step (cf. Langevin/IMH/ESS/TESS): when adjusted,
        U(x) rides in the scan state and only the proposal is evaluated each
        iteration; reported counters keep the reference's 2B contract."""
        if not self.params.adjustment:
            return super()._make_step_aux(tuning)

        from ...core.driver import StepInfo

        target = self.target
        event_ndim = len(self.event_shape)
        update_kernel = self.make_update_kernel()

        def step(x, state, key, aux):
            mstate, u_x = state
            n_chains = x.shape[0]
            noise, log_u = aux
            x_prime = x + (noise * mstate.inv_mass_diag).reshape(x.shape)

            finite_prop = jnp.all(jnp.isfinite(x_prime.reshape(n_chains, -1)), axis=-1)
            u_prime = target(x_prime)
            log_ratio = metropolis_acceptance_log_ratio(-u_x, -u_prime, 0.0, 0.0)
            finite_prop = finite_prop & jnp.isfinite(u_prime)
            mask = (log_u < log_ratio) & finite_prop

            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, x_prime, x)
            u_new = jnp.where(mask, u_prime, u_x)
            if tuning:
                mstate = update_kernel(mstate, x_new, mask)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=(~jnp.all(finite_prop)).astype(jnp.int32),
            )
            return x_new, (mstate, u_new), info

        return step

    def calls_per_iter(self, n_chains: int) -> int:
        return 2 * n_chains if self.params.adjustment else 0

    def grads_per_iter(self, n_chains: int) -> int:
        return 0


class RandomWalk(MH):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.params.adjustment = False
