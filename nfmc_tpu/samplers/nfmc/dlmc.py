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

The flow refits every iteration. When the refit is *fixed effort* (no early
stopping / time limit — e.g. ``flow_fit_kwargs=dict(n_epochs=10)``), the whole
iteration — refit epochs, drift, accept — compiles into one pure scan step and
runs through the shared :class:`ChunkedScanDriver`, so the host issues one
dispatch per chunk of iterations instead of ~10+ per iteration (fit-block
dispatches plus a D2H fetch of all particles; through the tunneled device each
sync costs ~25-30 ms, which dominated DLMC's 1024-chain wall-clock). Flow
params ride in the scan carry; a fresh Adam state is initialized inside each
iteration, matching the host path's fresh-optimizer-per-``fit`` semantics.
Configs with early stopping fall back to the host-side loop below.
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
from ...utils import (batched_grad, metropolis_acceptance_log_ratio,
                      unevaluable_current_mask)

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
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                         on_device=getattr(self.params, 'store_samples_on_device', False))
        out.running_samples.add(jnp.asarray(x0))
        return out

    def _fused_fit_config(self):
        """Static fixed-effort fit config for the fused in-scan refit, or
        ``None`` when ``flow_fit_kwargs`` needs host control (early stopping /
        time limits / unknown kwargs)."""
        from ...flows.train import fixed_effort_fit_config

        return fixed_effort_fit_config(self.params.flow_fit_kwargs)

    def _make_drift_accept(self, n_chains: int):
        """The single drift + accept implementation shared by the fused scan
        step and the host path's jits — one copy so a fix cannot silently
        diverge between the two (round-3 review; the parity tests compare
        the paths statistically, this removes the hazard at the source)."""
        flow = self.kernel.flow
        tau = float(self.kernel.step_size)
        target = self.target
        latent_updates = self.params.latent_updates
        event_ndim = len(self.event_shape)

        def drift(params, x):
            if latent_updates:
                z, _ = flow.bijection.forward_fn(params, x)
                g = batched_grad(target)(x)
                z = z - tau * (g - z)
                x_new, _ = flow.bijection.inverse_fn(params, z)
            else:
                g = batched_grad(lambda v: target(v) + flow.log_prob_fn(params, v))(x)
                x_new = x - tau * g
            return x_new

        def accept(params, x, key):
            k_prop, k_acc = jax.random.split(key)
            x_tilde, flp_tilde = flow.sample_fn(params, k_prop, n_chains,
                                                return_log_prob=True)
            u_tilde = target(x_tilde)
            u_curr = target(x)
            flp_curr = flow.log_prob_fn(params, x)
            log_alpha = metropolis_acceptance_log_ratio(
                log_prob_target_curr=-u_curr,
                log_prob_target_prime=-u_tilde,
                log_prob_proposal_curr=flp_curr,
                log_prob_proposal_prime=flp_tilde,
            )
            # Proposal-side finiteness only: a bad CURRENT state makes
            # log_alpha=+inf = certain accept (the escape route from
            # out-of-support inits); guarding on isfinite(log_alpha) froze
            # such chains (round-3 review fix, cf. AbstractIMH). NaN /
            # flow-zero-density current sides force-move instead of freezing.
            finite = (
                jnp.all(jnp.isfinite(x_tilde.reshape(n_chains, -1)), axis=-1)
                & jnp.isfinite(u_tilde)
                & jnp.isfinite(flp_tilde)
            )
            curr_bad = unevaluable_current_mask(u_curr, flp_curr)
            log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
            mask = ((log_u < log_alpha) | curr_bad) & finite
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            return jnp.where(bmask, x_tilde, x), mask, (~jnp.all(finite)).astype(jnp.int32)

        return drift, accept

    def _make_fused_step(self, n_chains: int, fit_cfg):
        """One DLMC iteration (refit + drift + accept) as a pure scan step
        ``(x, flow_params, key) -> (x', flow_params', StepInfo)``.

        The refit is the shared :func:`nfmc_tpu.flows.train.make_scan_fit`
        (train/val split per reference ``tuning.py:44-65``, best-weight
        tracking on val, finite-guard rollback in place of the host path's
        ValueError contract, reference ``dlmc.py:73-79``)."""
        from ...core.driver import StepInfo
        from ...flows.train import make_scan_fit

        n_epochs, lr, batch_size, keep_best_weights, shuffle = fit_cfg
        flow = self.kernel.flow
        tau = float(self.kernel.step_size)
        target = self.target
        latent_updates = self.params.latent_updates
        event_shape = self.event_shape

        fit = make_scan_fit(
            flow, n_chains, n_epochs=n_epochs, lr=lr, batch_size=batch_size,
            shuffle=shuffle, keep_best_weights=keep_best_weights,
            train_pct=self.params.train_pct,
            max_train_size=self.params.max_train_size,
            max_val_size=self.params.max_val_size,
        )

        drift, accept = self._make_drift_accept(n_chains)

        def step(x, params, key):
            k_fit, k_acc = jax.random.split(key)
            params = fit(params, x, k_fit)
            x = drift(params, x)
            x, mask, diverged = accept(params, x, k_acc)
            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32), diverged=diverged
            )
            return x, params, info

        return step

    def sample_continue(self, x0, **kwargs) -> MCMCOutput:
        """Continuation entry (checkpointed segments): skip the one-off init
        gradient step (reference ``dlmc.py:73-78``) — repeating an
        uncorrected drift at every segment boundary would perturb the
        chain."""
        self._skip_init_step = True
        try:
            return self.sample(x0, **kwargs)
        finally:
            self._skip_init_step = False

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        n_chains = x0.shape[0]
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                         on_device=getattr(self.params, 'store_samples_on_device', False))
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
            drift, accept = self._make_drift_accept(n_chains)
            return grad_nll, jax.jit(drift), jax.jit(accept)

        grad_nll, drift_step, accept_step = self._memo(
            "dlmc_jits", token, build_jits,
            keepalive=(flow, flow.bijection, flow._base_log_prob_override,
                       target, self.negative_log_likelihood),
        )

        # Initial update (``dlmc.py:58-61``)
        t0 = time.time()
        if getattr(self, "_skip_init_step", False):
            # continuation (sample_continue): the one-off init gradient step
            # already happened at the original run entry
            x = x0
        else:
            x = x0 - tau * grad_nll(x0)
            out.statistics.update_counters(n_target_calls=n_chains, n_target_gradient_calls=n_chains)
        out.statistics.update_elapsed_time(time.time() - t0)

        # Fused path: fixed-effort refits compile into the iteration scan
        # (module docstring); counters per SURVEY.md section 2.8 — B (drift)
        # + 2B (accept) calls and B grads per iteration on top of the init.
        fit_cfg = self._fused_fit_config()
        if fit_cfg is not None:
            from ...core.driver import ChunkedScanDriver

            fused_token = token + (
                fit_cfg, self.params.train_pct,
                self.params.max_train_size, self.params.max_val_size,
            )
            driver = self._memo(
                "dlmc_fused_driver", fused_token,
                lambda: ChunkedScanDriver(
                    self.event_shape,
                    make_step=lambda tuning: self._make_fused_step(n_chains, fit_cfg),
                ),
                keepalive=(flow, flow.bijection, flow._base_log_prob_override,
                           target, self.negative_log_likelihood),
            )
            x, flow_params = driver.run(
                x, flow.params, key, self.params.n_iterations,
                stats=out.statistics, samples=out.running_samples,
                calls_per_iter=3 * n_chains, grads_per_iter=n_chains,
                tuning=False, collect=self.params.store_samples,
                time_limit_seconds=time_limit_seconds,
                show_progress=show_progress, desc="DLMC sampling",
            )
            flow.params = flow_params
            out.kernel = self.kernel
            return out

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
            x, mask, diverged = accept_step(flow.params, x, k_acc)

            out.running_samples.add(x)
            out.statistics.expectations.update(x)
            out.statistics.update_counters(
                n_target_calls=2 * n_chains,
                n_accepted_trajectories=int(jnp.sum(mask)),
                n_attempted_trajectories=n_chains,
                n_divergences=int(diverged),
            )
            out.statistics.update_elapsed_time(time.time() - t0)
            if show_progress:
                pbar.set_postfix_str(f"{out.statistics}")

        out.kernel = self.kernel
        return out
