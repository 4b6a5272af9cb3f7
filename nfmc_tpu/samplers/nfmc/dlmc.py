"""DLMC: deterministic Langevin Monte Carlo with a flow density estimator.

Parity with reference ``nfmc/algorithms/sampling/nfmc/dlmc.py``:

* init: one gradient step on the negative log likelihood
  (``dlmc.py:58-61``);
* per iteration: (1) fit the flow (MLE) to the current particles
  (``dlmc.py:73-79``), (2) deterministic drift
  ``x <- x - tau * grad(U + log q_flow)`` or the ``latent_updates`` variant
  ``z <- z - tau (grad U - z)`` through the bijection (``dlmc.py:81-88``),
  (3) IMH-style accept against fresh flow samples (``dlmc.py:94-103``);
* counters per SURVEY.md section 2.8: B (init) + B (drift) + 2B (accept);
* warmup is a no-op returning x0 (``dlmc.py:36-42``).

The flow refits every iteration, so the outer loop is host-side; the drift
and accept steps are jitted with flow params threaded as arguments (no
recompilation across refits).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.output import MCMCOutput
from ...core.sampler import NFMCKernel, NFMCParameters, Sampler
from ...utils import batched_grad, metropolis_acceptance_log_ratio

from ...utils import tqdm  # shared fallback shim


@dataclass
class DLMCKernel(NFMCKernel):
    step_size: float = 0.05


@dataclass
class DLMCParameters(NFMCParameters):
    latent_updates: bool = False


class DLMC(Sampler):
    def __init__(self, event_shape, target, negative_log_likelihood,
                 kernel: Optional[DLMCKernel] = None,
                 params: Optional[DLMCParameters] = None):
        if kernel is None:
            kernel = DLMCKernel(event_shape)
        if params is None:
            params = DLMCParameters()
        super().__init__(event_shape, target, kernel, params)
        self.negative_log_likelihood = negative_log_likelihood

    @property
    def name(self):
        return "DLMC"

    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples)
        out.running_samples.add(jnp.asarray(x0))
        return out

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples)
        flow = self.kernel.flow
        tau = self.kernel.step_size
        target = self.target
        latent_updates = self.params.latent_updates

        # Jits are cached per (flow object incl. base-log-prob override,
        # target, nll, latent_updates, step size, n_chains): repeated
        # sample() calls must not retrace (params are threaded as arguments,
        # so the per-iteration refits never do either).
        token = (id(flow), id(flow.bijection), id(flow._base_log_prob_override),
                 id(target), id(self.negative_log_likelihood),
                 latent_updates, n_chains, float(tau))

        def build_jits():
            grad_nll = jax.jit(batched_grad(self.negative_log_likelihood))

            @jax.jit
            def drift_step(params, x):
                if latent_updates:
                    z, _ = flow.bijection.forward_fn(params, x)
                    g = batched_grad(target)(x)
                    z = z - tau * (g - z)
                    x_new, _ = flow.bijection.inverse_fn(params, z)
                else:
                    g = batched_grad(lambda v: target(v) + flow.log_prob_fn(params, v))(x)
                    x_new = x - tau * g
                return x_new

            @jax.jit
            def accept_step(params, x, key):
                k_prop, k_acc = jax.random.split(key)
                x_tilde = flow.sample_fn(params, k_prop, n_chains)
                log_alpha = metropolis_acceptance_log_ratio(
                    log_prob_target_curr=-target(x),
                    log_prob_target_prime=-target(x_tilde),
                    log_prob_proposal_curr=flow.log_prob_fn(params, x),
                    log_prob_proposal_prime=flow.log_prob_fn(params, x_tilde),
                )
                finite = (
                    jnp.all(jnp.isfinite(x_tilde.reshape(n_chains, -1)), axis=-1)
                    & jnp.isfinite(log_alpha)
                )
                log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
                mask = (log_u < log_alpha) & finite
                bmask = mask.reshape(mask.shape + (1,) * len(self.event_shape))
                return jnp.where(bmask, x_tilde, x), mask

            return grad_nll, drift_step, accept_step

        grad_nll, drift_step, accept_step = self._memo(
            "dlmc_jits", token, build_jits,
            keepalive=(flow, flow.bijection, flow._base_log_prob_override,
                       target, self.negative_log_likelihood),
        )

        # Initial update (``dlmc.py:58-61``)
        t0 = time.time()
        x = x0 - tau * grad_nll(x0)
        out.statistics.update_counters(n_target_calls=n_chains, n_target_gradient_calls=n_chains)
        out.statistics.update_elapsed_time(time.time() - t0)

        # split FIRST: consuming `key` for the numpy seed and then splitting
        # the same key would correlate the shuffle stream with k_fit/k_acc
        key, k_perm = jax.random.split(key)
        rng = np.random.default_rng(int(jax.random.randint(k_perm, (), 0, 2**31 - 1)))
        pbar = tqdm(range(self.params.n_iterations), desc="DLMC sampling", disable=not show_progress)
        for _ in pbar:
            if (
                time_limit_seconds is not None
                and out.statistics.elapsed_time_seconds >= time_limit_seconds
            ):
                break
            t0 = time.time()
            key, k_fit, k_acc = jax.random.split(key, 3)

            # (1) fit flow to current particles (shared split helper; the
            # [None] lifts (C, *event) to the helper's (K, C, *event) layout)
            from ...core.tuning import train_val_split

            x_train, x_val = train_val_split(
                np.asarray(x)[None],
                train_pct=self.params.train_pct,
                max_train_size=self.params.max_train_size,
                max_val_size=self.params.max_val_size,
                seed=int(rng.integers(0, 2**31 - 1)),
            )
            try:
                flow.fit(x_train, x_val=x_val, **self.params.flow_fit_kwargs, key=k_fit)
            except ValueError:
                pass

            # (2) deterministic drift
            x = drift_step(flow.params, x)
            out.statistics.update_counters(n_target_calls=n_chains, n_target_gradient_calls=n_chains)

            # (3) IMH-style accept against fresh flow samples
            x, mask = accept_step(flow.params, x, k_acc)

            out.running_samples.add(x)
            out.statistics.expectations.update(x)
            out.statistics.update_counters(
                n_target_calls=2 * n_chains,
                n_accepted_trajectories=int(jnp.sum(mask)),
                n_attempted_trajectories=n_chains,
            )
            out.statistics.update_elapsed_time(time.time() - t0)
            if show_progress:
                pbar.set_postfix_str(f"{out.statistics}")

        out.kernel = self.kernel
        return out
