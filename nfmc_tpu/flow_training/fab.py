"""FAB: Flow Annealed importance sampling Bootstrap (Midgley et al. 2023),
corrected.

The reference version cannot run (imports the nonexistent ``nfmc.mcmc.ais``,
``flow_annealed_bootstrap.py:4``; its wrapper also calls ``create_flow_object``
without an event shape). Working scheme:

per iteration: (1) draw from the flow and run AIS from ``q`` toward the
alpha=2 optimal target ``p^2 / q`` (potential ``2 U(x) + log q(x)``), (2) push
particles + weights into a prioritized replay buffer, (3) take gradient steps
on ``-E_w[ log q(x) ]`` over buffer draws with importance correction
``w_corr = q_old(x) / q_new(x)``, updating the buffered weights/densities.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..transport.ais import anneal_chain
from ..transport.common import make_mala_sweep, tempered
from ..utils import as_numpy

from ..utils import tqdm  # shared fallback shim


class _RingBuffer:
    """Fixed-size ring buffer (reference ``flow_annealed_bootstrap.py:9-26``)."""

    def __init__(self, shape, size: int):
        self.data = np.zeros((size, *shape), dtype=np.float32)
        self.index = 0
        self.filled = 0

    def add(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float32)
        n, size = len(x), len(self.data)
        assert n < size
        if self.index + n <= size:
            self.data[self.index : self.index + n] = x
            self.index = (self.index + n) % size
        else:
            head = size - self.index
            self.data[self.index :] = x[:head]
            self.data[: n - head] = x[head:]
            self.index = n - head
        self.filled = min(size, self.filled + n)


class FAB:
    def __init__(self, target_potential, flow, buffer_size: int = 10_000,
                 n_ais_steps: int = 8, ais_step_size: float = 0.05, lr: float = 3e-3,
                 n_mcmc_steps: int = 3):
        self.target_potential = target_potential
        self.flow = flow
        self.event_shape = flow.event_shape
        self.buf_x = _RingBuffer(self.event_shape, buffer_size)
        self.buf_log_w = _RingBuffer((), buffer_size)
        self.buf_log_q = _RingBuffer((), buffer_size)
        self.opt = optax.adamw(lr)
        self.n_ais_steps = n_ais_steps
        self.ais_step_size = ais_step_size
        self.n_mcmc_steps = int(n_mcmc_steps)
        self._train_step = jax.jit(self._make_train_step())
        self._ais_round = jax.jit(self._make_ais_round(), static_argnums=(2,))

    def _make_ais_round(self):
        flow = self.flow
        target = self.target_potential

        def ais_round(params, key, n_particles):
            k_draw, k_ais = jax.random.split(key)
            x, log_q = flow.sample_fn(params, k_draw, n_particles, return_log_prob=True)
            # AIS from q toward p^2/q (alpha=2 optimal proposal); the shared
            # annealing loop from transport/ais.py with params-dependent ends
            prior_pot = lambda v: -flow.log_prob_fn(params, v)
            target_pot = lambda v: 2.0 * target(v) + flow.log_prob_fn(params, v)
            u = tempered(prior_pot, target_pot)
            sweep = make_mala_sweep(u, n_steps=self.n_mcmc_steps, step_size=self.ais_step_size)
            x, log_w = anneal_chain(u, sweep, self.n_ais_steps)(x, k_ais)
            return x, log_w, flow.log_prob_fn(params, x)

        return ais_round

    def _make_train_step(self):
        flow = self.flow

        def train_step(params, opt_state, x, log_q_old):
            def loss_fn(p):
                log_q_new = flow.log_prob_fn(p, x)
                w_corr = jnp.exp(
                    jnp.clip(log_q_old - jax.lax.stop_gradient(log_q_new), -10.0, 10.0)
                )
                return -jnp.mean(w_corr * log_q_new), log_q_new

            (loss, log_q_new), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, log_q_new

        return train_step

    def run(self, n_iterations: int = 50, n_flow_training_steps: int = 20,
            n_ais_particles: int = 100, n_training_particles: int = 50,
            show_progress: bool = False, key=None, seed=None):
        key = resolve_key(key, seed)
        params = self.flow.params
        opt_state = self.opt.init(params)
        rng = np.random.default_rng(0)

        for _ in tqdm(range(n_iterations), desc="FAB", disable=not show_progress):
            key, k_ais = jax.random.split(key)
            x, log_w, log_q = self._ais_round(params, k_ais, n_ais_particles)
            self.buf_x.add(as_numpy(x))
            self.buf_log_w.add(as_numpy(log_w))
            self.buf_log_q.add(as_numpy(log_q))

            filled = self.buf_x.filled
            for _ in range(n_flow_training_steps):
                logits = self.buf_log_w.data[:filled]
                logits = logits - logits.max()
                p = np.exp(logits)
                p /= p.sum()
                idx = rng.choice(filled, size=min(n_training_particles, filled), p=p)
                xb = jnp.asarray(self.buf_x.data[idx])
                log_q_old = jnp.asarray(self.buf_log_q.data[idx])
                params, opt_state, loss, log_q_new = self._train_step(
                    params, opt_state, xb, log_q_old
                )
                # importance-correct buffered weights/densities
                log_q_new = as_numpy(log_q_new)
                self.buf_log_w.data[idx] += self.buf_log_q.data[idx] - log_q_new
                self.buf_log_q.data[idx] = log_q_new

        self.flow.params = params
        return self.flow


def flow_annealed_importance_sampling_bootstrap_base(target_potential, flow, **kwargs):
    return FAB(target_potential, flow).run(**kwargs)


def fab(target, flow: str = "realnvp", show_progress: bool = False, seed: int = 0, **kwargs):
    """Wrapper (reference ``flow_training/wrappers.py:6-15``); the flow itself
    is the importance-sampling prior."""
    from ..api.registry import create_flow_object

    flow_object = create_flow_object(flow, target.event_shape, seed=seed)
    algorithm = FAB(target, flow_object)
    return algorithm.run(show_progress=show_progress, seed=seed, **kwargs)
