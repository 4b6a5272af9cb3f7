"""CRAFT: Continual Repeated Annealed Flow Transport (Matthews et al. 2022),
corrected.

The reference version crashes (calls ``smc_flow_step`` with a nonexistent
signature; ``annealed_flow_transport.py:355-363``). Here: one bijection per
annealing level, trained continually over ``n_training_steps`` SMC passes with
the per-level loss ``sum_i W_i [ -u_{k-1}(x_i) + u_k(T_k(x_i)) - log|det| ]``
(reference ``:321-329`` modulo its log-det sign), then a final sampling pass.
The transport map is the bijection's ``inverse`` (latent->data orientation,
matching flow sampling).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import as_numpy
from .common import log_ess, make_mala_sweep, systematic_resample, tempered

from ..utils import tqdm  # shared fallback shim


class CRAFT:
    def __init__(
        self,
        prior_potential: Callable,
        target_potential: Callable,
        bijections: List,
        sampling_threshold: float = 0.3,
        n_mcmc_steps: int = 5,
        mcmc_step_size: float = 0.05,
        lr: float = 1e-3,
    ):
        self.prior_potential = prior_potential
        self.target_potential = target_potential
        self.bijections = list(bijections)
        self.n_levels = len(bijections)
        self.sampling_threshold = float(sampling_threshold)
        self.u = tempered(prior_potential, target_potential)
        self.mala_sweep = jax.jit(
            make_mala_sweep(self.u, n_steps=n_mcmc_steps, step_size=mcmc_step_size)
        )
        self.opt = optax.adamw(lr)
        # all levels share one bijection architecture -> one compiled step
        self._train_transport = jax.jit(self._make_train_transport())
        self._transport_only = jax.jit(self._make_transport_only())

    def _loss(self, bij, params, x, w, lam_prev, lam_next):
        x_next, log_det = bij.inverse_fn(params, x)
        d = -self.u(x, lam_prev) + self.u(x_next, lam_next) - log_det
        return jnp.sum(w * d)

    def _make_train_transport(self):
        bij = self.bijections[0]

        def step(params, opt_state, x, log_W, lam_prev, lam_next):
            w = jnp.exp(log_W - jax.scipy.special.logsumexp(log_W))
            loss, grads = jax.value_and_grad(
                lambda p: self._loss(bij, p, x, w, lam_prev, lam_next)
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            x_next, log_det = bij.inverse_fn(params, x)
            log_G = self.u(x, lam_prev) - self.u(x_next, lam_next) + log_det
            log_w = log_W + log_G
            delta_log_Z = jax.scipy.special.logsumexp(log_w)
            log_W_new = log_w - jax.scipy.special.logsumexp(log_w)
            return params, opt_state, x_next, log_W_new, delta_log_Z, log_ess(log_w), loss

        return step

    def _make_transport_only(self):
        bij = self.bijections[0]

        def step(params, x, log_W, lam_prev, lam_next):
            x_next, log_det = bij.inverse_fn(params, x)
            log_G = self.u(x, lam_prev) - self.u(x_next, lam_next) + log_det
            log_w = log_W + log_G
            delta_log_Z = jax.scipy.special.logsumexp(log_w)
            log_W_new = log_w - jax.scipy.special.logsumexp(log_w)
            return x_next, log_W_new, delta_log_Z, log_ess(log_w)

        return step

    def _maybe_resample_correct(self, key, x, log_W, ess_log, lam, n):
        if float(ess_log) - math.log(n) <= math.log(self.sampling_threshold):
            key, kr = jax.random.split(key)
            x = x[systematic_resample(kr, log_W, n)]
            log_W = jnp.full((n,), -math.log(n))
        key, km = jax.random.split(key)
        x = self.mala_sweep(x, lam, km)
        return key, x, log_W

    def train(self, prior_sample, n_particles: int = 100, n_training_steps: int = 100,
              show_progress: bool = False, key=None, seed=None):
        key = resolve_key(key, seed)
        params_per_level = [b.params for b in self.bijections]
        opt_states = [self.opt.init(p) for p in params_per_level]

        iterator = tqdm(range(n_training_steps), desc="CRAFT", disable=not show_progress)
        for _ in iterator:
            key, k0 = jax.random.split(key)
            x = jnp.asarray(prior_sample((n_particles,), key=k0), dtype=jnp.float32)
            log_W = jnp.full((n_particles,), -math.log(n_particles))
            log_Z = 0.0
            for k in range(1, self.n_levels + 1):
                lam_prev = (k - 1) / self.n_levels
                lam_next = k / self.n_levels
                (params_per_level[k - 1], opt_states[k - 1], x, log_W,
                 dlZ, ess_log, _loss) = self._train_transport(
                    params_per_level[k - 1], opt_states[k - 1], x, log_W, lam_prev, lam_next
                )
                log_Z += float(dlZ)
                key, x, log_W = self._maybe_resample_correct(
                    key, x, log_W, ess_log, lam_next, n_particles
                )
            if show_progress:
                iterator.set_postfix_str(f"log Z: {log_Z:.3f}")

        for b, p in zip(self.bijections, params_per_level):
            b.params = p

    def sample(self, prior_sample, n_particles: int = 100, key=None, seed=None):
        key = resolve_key(key, seed)
        key, k0 = jax.random.split(key)
        x = jnp.asarray(prior_sample((n_particles,), key=k0), dtype=jnp.float32)
        log_W = jnp.full((n_particles,), -math.log(n_particles))
        log_Z = 0.0
        history = [as_numpy(x)]
        for k in range(1, self.n_levels + 1):
            lam_prev = (k - 1) / self.n_levels
            lam_next = k / self.n_levels
            x, log_W, dlZ, ess_log = self._transport_only(
                self.bijections[k - 1].params, x, log_W, lam_prev, lam_next
            )
            log_Z += float(dlZ)
            key, x, log_W = self._maybe_resample_correct(key, x, log_W, ess_log, lam_next, n_particles)
            history.append(as_numpy(x))
        return {
            "particles": as_numpy(x),
            "log_weights": as_numpy(log_W),
            "log_Z": log_Z,
            "history": np.stack(history),
        }


def craft(prior, target, flow, n_particles: int = 100, n_iterations: int = 100,
          n_annealing_steps: int = 20, show_progress: bool = False, seed: int = 0, **kwargs):
    """Wrapper with the reference signature (``transport/wrappers.py:29-49``)."""
    from ..api.registry import create_flow_object

    bijections = []
    for i in range(n_annealing_steps):
        f = create_flow_object(flow, prior.event_shape, seed=seed + i)
        bijections.append(f.bijection)
    algorithm = CRAFT(prior, target, bijections, **kwargs)
    sample_fn = lambda batch_shape, key=None: prior.sample(batch_shape, key=key)
    algorithm.train(sample_fn, n_particles=n_particles, n_training_steps=n_iterations,
                    show_progress=show_progress, seed=seed)
    return algorithm.sample(sample_fn, n_particles=n_particles, seed=seed + 1)
