"""Hamiltonian Monte Carlo (adjusted HMC / unadjusted UHMC).

Parity with reference ``nfmc/algorithms/sampling/mcmc/hmc.py``:

* ``n_leapfrog_steps = 20`` default (``hmc.py:13``);
* leapfrog with diagonal inverse-mass preconditioning (``hmc.py:26-37,51-77``);
* momentum init ``randn / sqrt(inv_mass_diag)`` (``hmc.py:100``);
* MH accept on the Hamiltonian ``U + 0.5 p^T M^{-1} p`` (``hmc.py:103-113``);
* counter contract: ``2 L B`` calls and grads (+``2B`` calls when adjusted;
  ``hmc.py:122-125``).

TPU-native notes. The reference evaluates the gradient twice per leapfrog
step (B-A-B with a fresh autograd pass in each B half-kick, ``hmc.py:61-77``);
the trailing half-kick of step j and the leading half-kick of step j+1 use the
*same* position, so this implementation computes each gradient once and
carries it through a ``lax.fori_loop`` — numerically identical trajectories
with half the gradient work (L+1 instead of 2L passes). The reported
``n_target_gradient_calls`` keeps the reference's 2LB contract (SURVEY.md
section 2.8) so throughput counters stay comparable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils import batched_grad, event_size_of, flatten_event, sum_except_batch
from .base import MetropolisKernel, MetropolisParameters, MetropolisSampler


@dataclass
class HMCKernel(MetropolisKernel):
    n_leapfrog_steps: int = 20

    def __repr__(self):
        import math
        import numpy as np

        return (
            f"log step: {math.log(self.step_size):.2f}, "
            f"leapfrogs: {self.n_leapfrog_steps}, "
            f"mass norm: {float(np.max(np.abs(self.inv_mass_diag))):.2f}"
        )


@dataclass
class HMCParameters(MetropolisParameters):
    # Per-chain step-size jitter fraction: each iteration scales eps by
    # (1 + U(-j, j)). 0 (default) = reference parity (``hmc.py:61-77`` uses a
    # fixed step). Nonzero breaks leapfrog resonance: with near-commensurate
    # oscillation frequencies a FIXED L*eps leaves some directions rotating
    # by ~2 pi k per trajectory and never decorrelating — the dense-metric
    # family (whose adapted metric has Wishart noise in its eigenvalues)
    # defaults this to 0.2, which recovered isotropic-target worst-direction
    # ESS (measured r4, see bench dense_metric.iso_parity_ratio).
    step_jitter: float = 0.0


class HMC(MetropolisSampler):
    def __init__(self, event_shape, target, kernel: Optional[HMCKernel] = None,
                 params: Optional[HMCParameters] = None):
        if kernel is None:
            kernel = HMCKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = HMCParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "HMC"

    def _static_config(self):
        return super()._static_config() + (
            self.kernel.n_leapfrog_steps,
            getattr(self.params, "step_jitter", 0.0),
        )

    def make_draws(self):
        """Raw momentum normals + accept uniforms (the 1/sqrt(inv_mass) scale
        is state-dependent and applies in the step); hoistable per chunk with
        bit-identical results to the in-scan derivation."""
        event_size = self.kernel.event_size
        adjustment = self.params.adjustment
        jitter = float(getattr(self.params, "step_jitter", 0.0))

        def draws(key, n_chains):
            # jitter=0 keeps the 2-way split: the default (reference-parity)
            # seeded stream is unchanged from pre-jitter revisions
            if jitter > 0.0:
                k_mom, k_accept, k_jit = jax.random.split(key, 3)
                eps_scale = 1.0 + jax.random.uniform(
                    k_jit, (n_chains,), minval=-jitter, maxval=jitter
                )
            else:
                k_mom, k_accept = jax.random.split(key)
                eps_scale = jnp.ones((n_chains,), dtype=jnp.float32)
            p_raw = jax.random.normal(k_mom, (n_chains, event_size))
            if adjustment:
                log_u = jnp.log(jax.random.uniform(k_accept, (n_chains,)))
            else:
                log_u = jnp.zeros((n_chains,), dtype=jnp.float32)
            return p_raw, log_u, eps_scale

        return draws

    def make_propose(self):
        propose_aux = self.make_propose_aux()
        draws = self.make_draws()

        def propose(x, mstate, key):
            return propose_aux(x, mstate, draws(key, x.shape[0]))

        return propose

    # ---- metric hooks (overridden by the dense-metric superset, dense.py) ----
    def _jitter_frac(self, mstate):
        """State-dependent multiplier on the step jitter (1 = params value
        as-is; the dense superset scales by its adapted metric-noise
        fraction so an evidence-collapsed scalar metric runs jitter-free)."""
        return 1.0

    def _momentum(self, mstate, p_raw):
        """Map raw normals (B, event_size) -> momenta p ~ N(0, M), flat."""
        return p_raw / jnp.sqrt(mstate.inv_mass_diag)[None]

    def _precondition(self, mstate, v):
        """Apply M^{-1} to an event-shaped batch (the leapfrog drift map)."""
        v_flat = flatten_event(v, self.event_shape)
        return (v_flat * mstate.inv_mass_diag[None]).reshape(v.shape)

    def _kinetic(self, mstate, p):
        """0.5 p^T M^{-1} p per chain (event-shaped p)."""
        return 0.5 * sum_except_batch(self._precondition(mstate, p) * p, self.event_shape)

    def make_propose_aux(self):
        return self._build_propose_aux(
            self._momentum, self._precondition, self._kinetic, self._jitter_frac
        )

    def _build_propose_aux(self, momentum, precond, kinetic, jitter_frac):
        """Propose closure parameterized by the metric hooks — the dense
        superset builds TWO (dense + scalar fast path) and branches per
        iteration with ``lax.cond`` so the dense matmuls never execute when
        the adapted metric has collapsed to a scalar."""
        target = self.target
        event_shape = self.event_shape
        adjustment = self.params.adjustment
        n_leapfrog = self.kernel.n_leapfrog_steps
        grad_u = batched_grad(target)

        def propose(x, mstate, aux):
            n_chains = x.shape[0]
            p_raw, log_u, eps_scale = aux
            # per-chain step (jitter; detailed balance holds per chain since
            # the scale is drawn independently of the state); the dense
            # superset modulates the jitter by its adapted noise fraction
            scale = 1.0 + (eps_scale - 1.0) * jitter_frac(mstate)
            eps = mstate.step_size * scale.reshape(
                (n_chains,) + (1,) * len(event_shape)
            )

            p0 = momentum(mstate, p_raw).reshape(x.shape)

            def precondition(v):
                return precond(mstate, v)

            # Leapfrog with one gradient per position (mathematically identical
            # to the reference's B-A-B double-B structure; see module docstring).
            g = grad_u(x)

            def body(_, carry):
                xq, pq, gq = carry
                pq = pq - 0.5 * eps * gq
                xq = xq + eps * precondition(pq)
                gq = grad_u(xq)
                pq = pq - 0.5 * eps * gq
                return xq, pq, gq

            x_prime, p_prime, _ = jax.lax.fori_loop(0, n_leapfrog, body, (x, p0, g))

            finite_prop = jnp.all(
                jnp.isfinite(flatten_event(x_prime, event_shape)), axis=-1
            )
            if adjustment:
                h_start = target(x) + kinetic(mstate, p0)
                h_end = target(x_prime) + kinetic(mstate, p_prime)
                log_prob_accept = -h_end + h_start
                mask = (log_u < log_prob_accept) & finite_prop & jnp.isfinite(h_end)
                # Divergence = non-finite trajectory end OR non-finite
                # Hamiltonian there (Stan convention; superset of the
                # reference's except-ValueError at ``hmc.py:117-120``).
                finite_prop = finite_prop & jnp.isfinite(h_end)
            else:
                mask = finite_prop
            diverged = (~jnp.all(finite_prop)).astype(jnp.int32)
            return x_prime, mask, diverged

        return propose

    def calls_per_iter(self, n_chains: int) -> int:
        n = 2 * self.kernel.n_leapfrog_steps * n_chains
        if self.params.adjustment:
            n += 2 * n_chains
        return n

    def grads_per_iter(self, n_chains: int) -> int:
        return 2 * self.kernel.n_leapfrog_steps * n_chains


class UHMC(HMC):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.params.adjustment = False

    @property
    def name(self):
        return "UHMC"
