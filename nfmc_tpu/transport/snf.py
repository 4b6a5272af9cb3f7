"""Stochastic Normalizing Flows (Wu, Koehler & Noe 2020), corrected.

The reference's layered design (``transport/stochastic_normalizing_flows.py``)
crashes in its MCMC layers (calls the modules ``hmc``/``mh`` as functions,
``:72-87``). Here: alternating stochastic (MALA / HMC) and deterministic
(flow) layers over a linear annealing schedule; ``inverse`` (latent -> data)
accumulates per-layer log-weight increments ``delta_s`` and returns
``log_w = -u_target(x) + u_prior(z) + sum delta_s``; training maximizes
``E[log_w]`` by Adam on the flow-layer parameters.

Layer weight increments:
* MALA layer (unadjusted Langevin): the exact path-ratio term
  ``delta_s = -0.5 (|eta~|^2 - |eta|^2)`` with
  ``eta~ = sqrt(eps/2)(grad U(x) + grad U(x')) - eta`` (reference ``:25-51``);
* Metropolis-corrected layers at the level potential: detailed balance gives
  ``delta_s = u(x') - u(x)``.
"""
from __future__ import annotations

import math
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import as_numpy, batched_grad, sum_except_batch, value_and_batched_grad
from .common import tempered

from ..utils import tqdm  # shared fallback shim


class SNFLayer:
    has_params = False

    def init(self, key):
        return ()

    def apply(self, params, x, potential: Callable, key):
        """Returns (x', delta_s)."""
        raise NotImplementedError


class MALALayer(SNFLayer):
    def __init__(self, event_shape, time_step: float = 1.0, friction: float = 1.0,
                 mass: float = 1.0, beta: float = 1.0):
        self.event_shape = tuple(event_shape)
        self.beta = float(beta)
        self.eps = float(time_step / (friction * mass))

    def apply(self, params, x, potential, key):
        grad_u = batched_grad(potential)
        g_x = grad_u(x)
        eta = jax.random.normal(key, x.shape)
        x_prime = x - self.eps * g_x + math.sqrt(2.0 * self.eps / self.beta) * eta
        g_xp = grad_u(x_prime)
        # backward noise solves x = x' - eps*g_xp + sqrt(2 eps/beta) eta~:
        # eta~ = sqrt(eps*beta/2) (g_x + g_xp) - eta  (beta enters the sqrt)
        eta_tilde = math.sqrt(self.eps * self.beta / 2.0) * (g_x + g_xp) - eta
        delta_s = -0.5 * (
            sum_except_batch(eta_tilde**2, self.event_shape)
            - sum_except_batch(eta**2, self.event_shape)
        )
        return x_prime, delta_s


class HMCLayer(SNFLayer):
    """A few Metropolis-adjusted HMC steps at the level potential."""

    def __init__(self, event_shape, n_steps: int = 3, n_leapfrog: int = 10,
                 step_size: float = 0.1):
        self.event_shape = tuple(event_shape)
        self.n_steps = int(n_steps)
        self.n_leapfrog = int(n_leapfrog)
        self.step_size = float(step_size)

    def apply(self, params, x, potential, key):
        grad_u = batched_grad(potential)
        x0 = x

        def hmc_step(x, key):
            k_mom, k_acc = jax.random.split(key)
            p = jax.random.normal(k_mom, x.shape)
            g = grad_u(x)

            def leap(_, carry):
                xq, pq, gq = carry
                pq = pq - 0.5 * self.step_size * gq
                xq = xq + self.step_size * pq
                gq = grad_u(xq)
                pq = pq - 0.5 * self.step_size * gq
                return xq, pq, gq

            xp, pp, _ = jax.lax.fori_loop(0, self.n_leapfrog, leap, (x, p, g))
            h0 = potential(x) + 0.5 * sum_except_batch(p**2, self.event_shape)
            h1 = potential(xp) + 0.5 * sum_except_batch(pp**2, self.event_shape)
            log_alpha = h0 - h1
            accept = jnp.log(jax.random.uniform(k_acc, log_alpha.shape)) < log_alpha
            mask = accept.reshape(accept.shape + (1,) * (x.ndim - 1))
            return jnp.where(mask, xp, x)

        def body(x, k):
            return hmc_step(x, k), None

        x, _ = jax.lax.scan(body, x, jax.random.split(key, self.n_steps))
        # Metropolis-corrected kernel at this level: delta_s = u(x') - u(x)
        delta_s = potential(x) - potential(x0)
        return x, delta_s


class MHLayer(SNFLayer):
    def __init__(self, event_shape, n_steps: int = 5, step_size: float = 0.2):
        self.event_shape = tuple(event_shape)
        self.n_steps = int(n_steps)
        self.step_size = float(step_size)

    def apply(self, params, x, potential, key):
        x0 = x

        def mh_step(x, key):
            k_p, k_a = jax.random.split(key)
            x_prime = x + self.step_size * jax.random.normal(k_p, x.shape)
            log_alpha = potential(x) - potential(x_prime)
            accept = jnp.log(jax.random.uniform(k_a, log_alpha.shape)) < log_alpha
            mask = accept.reshape(accept.shape + (1,) * (x.ndim - 1))
            return jnp.where(mask, x_prime, x)

        def body(x, k):
            return mh_step(x, k), None

        x, _ = jax.lax.scan(body, x, jax.random.split(key, self.n_steps))
        return x, potential(x) - potential(x0)


class FlowLayer(SNFLayer):
    has_params = True

    def __init__(self, bijection):
        self.bijection = bijection
        self.event_shape = bijection.event_shape

    def init(self, key):
        return self.bijection.init(key)

    def apply(self, params, x, potential, key):
        # latent -> data direction; delta_s = log|det d x'/d x|
        x_prime, log_det = self.bijection.inverse_fn(params, x)
        return x_prime, log_det


class SNF:
    def __init__(self, layers: Sequence[SNFLayer], target_potential: Callable,
                 prior_potential: Callable, key=None, seed=None):
        assert len(layers) >= 1
        self.layers = list(layers)
        self.target_potential = target_potential
        self.prior_potential = prior_potential
        key = resolve_key(key, seed)
        keys = jax.random.split(key, len(self.layers))
        self.params = [l.init(k) for l, k in zip(self.layers, keys)]
        self.opt = optax.adamw(1e-3)
        self._loss_and_grad = jax.jit(jax.value_and_grad(self._loss))
        self._inverse = jax.jit(self._inverse_impl)

    def _inverse_impl(self, params, z, key):
        n_layers = len(self.layers)
        lambdas = jnp.linspace(1.0 / n_layers, 1.0, n_layers)
        log_det = jnp.zeros(z.shape[0])
        x = z
        keys = jax.random.split(key, n_layers)
        history = [x]
        # endpoint-safe tempered potential (common.tempered): the LAST layer
        # sits at lam = 1.0 exactly (linspace endpoint is exact in f32), so
        # the inline (1-lam)*prior form would give 0 * inf = NaN there for
        # hard-support priors
        u = tempered(self.prior_potential, self.target_potential)
        for i, layer in enumerate(self.layers):
            lam = lambdas[i]
            pot = lambda v, _lam=lam: u(v, _lam)
            x, delta_s = layer.apply(params[i], x, pot, keys[i])
            log_det = log_det + delta_s
            history.append(x)
        log_weights = -self.target_potential(x) + self.prior_potential(z) + log_det
        return jnp.stack(history), x, log_weights

    def inverse(self, z, key=None, seed=None):
        return self._inverse(self.params, jnp.asarray(z, dtype=jnp.float32),
                             resolve_key(key, seed))

    def _loss(self, params, z, key):
        _, _, log_w = self._inverse_impl(params, z, key)
        return -jnp.mean(log_w)

    def fit(self, z, n_epochs: int = 10, show_progress: bool = False, key=None, seed=None):
        from ..flows.train import _finite_update

        key = resolve_key(key, seed)
        z = jnp.asarray(z, dtype=jnp.float32)
        opt_state = self.opt.init(self.params)
        params = self.params
        for _ in tqdm(range(n_epochs), desc="SNF", disable=not show_progress):
            key, k = jax.random.split(key)
            loss, grads = self._loss_and_grad(params, z, k)
            # skip non-finite epochs (a divergent HMC leapfrog / barrier
            # overflow would otherwise NaN params AND Adam moments forever)
            if not bool(_finite_update(loss, grads)):
                continue
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        self.params = params


def snf(prior, target, flow: str = "realnvp", n_particles: int = 100,
        n_epochs: int = 10, show_progress: bool = False, seed: int = 0, **kwargs):
    """Wrapper with the reference signature (``transport/wrappers.py:61-69``):
    HMC + RealNVP alternating stack."""
    from ..flows import RealNVP

    event_shape = prior.event_shape
    model = SNF(
        layers=[
            HMCLayer(event_shape),
            FlowLayer(RealNVP(event_shape, n_layers=2)),
            HMCLayer(event_shape),
            FlowLayer(RealNVP(event_shape, n_layers=2)),
            HMCLayer(event_shape),
        ],
        target_potential=target,
        prior_potential=prior,
        seed=seed,
    )
    z = prior.sample((n_particles,), key=jax.random.key(seed + 1))
    model.fit(z, n_epochs=n_epochs, show_progress=show_progress, seed=seed + 2)
    # evaluate on FRESH prior draws: the training batch's weights are
    # optimistically biased (the loss maximized E[log w] on exactly that z)
    z_eval = prior.sample((n_particles,), key=jax.random.key(seed + 4))
    history, x, log_w = model.inverse(z_eval, seed=seed + 3)
    return {
        "history": as_numpy(history),
        "particles": as_numpy(x),
        "log_weights": as_numpy(log_w),
        "model": model,
    }
