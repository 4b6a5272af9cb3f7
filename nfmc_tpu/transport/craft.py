"""CRAFT: Continual Repeated Annealed Flow Transport (Matthews et al. 2022),
corrected.

The reference version crashes (calls ``smc_flow_step`` with a nonexistent
signature; ``annealed_flow_transport.py:355-363``). Here: one bijection per
annealing level, trained continually over ``n_training_steps`` SMC passes with
the per-level loss ``sum_i W_i [ -u_{k-1}(x_i) + u_k(T_k(x_i)) - log|det| ]``
(reference ``:321-329`` modulo its log-det sign), then a final sampling pass.
The transport map is the bijection's ``inverse`` (latent->data orientation,
matching flow sampling).

TPU-native execution: all levels share one bijection architecture (asserted),
so the per-level params stack into one pytree and the ENTIRE SMC pass —
train step + transport + ESS-gated resample + MALA correction sweep at every
level — compiles into a single ``lax.scan`` over levels: one device dispatch
per training pass. The host-loop formulation this replaced issued ~2 blocking
syncs per level per training step (``float(delta_log_Z)``, the resample
decision) — with default 20 levels x 100 steps that is ~4000 tunnel round
trips of pure latency (CLAUDE.md: accumulate on device, fetch once).
"""
from __future__ import annotations

import math
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import as_numpy
from .common import log_ess, make_mala_sweep, systematic_resample, tempered

from ..utils import tqdm  # shared fallback shim


def _tree_select(flag, a, b):
    return jax.tree_util.tree_map(lambda u, v: jnp.where(flag, u, v), a, b)


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
        self.mala_sweep = make_mala_sweep(
            self.u, n_steps=n_mcmc_steps, step_size=mcmc_step_size
        )
        self.opt = optax.adamw(lr)
        # the fused level scan feeds level k's params to ONE compiled
        # bijection (bijections[0]); a heterogeneous list would silently run
        # every level through level 0's architecture (or crash with an
        # opaque tree-structure error inside jit) — reject it up front
        td0 = jax.tree_util.tree_structure(self.bijections[0].params)
        shapes0 = [l.shape for l in jax.tree_util.tree_leaves(self.bijections[0].params)]
        for i, b in enumerate(self.bijections[1:], start=1):
            td = jax.tree_util.tree_structure(b.params)
            shapes = [l.shape for l in jax.tree_util.tree_leaves(b.params)]
            if td != td0 or shapes != shapes0:
                raise ValueError(
                    f"CRAFT requires all levels to share one bijection "
                    f"architecture; level {i} differs from level 0"
                )
        self._train_pass = jax.jit(self._make_pass(train=True))
        self._sample_pass = jax.jit(self._make_pass(train=False))

    def _loss(self, bij, params, x, w, lam_prev, lam_next):
        x_next, log_det = bij.inverse_fn(params, x)
        d = -self.u(x, lam_prev) + self.u(x_next, lam_next) - log_det
        # a zero-weight particle (w=0) at an unevaluable transported point
        # (d = +-inf) contributes 0 * inf = NaN; its true contribution is 0
        return jnp.sum(jnp.where(w > 0.0, w * d, 0.0))

    def _make_pass(self, train: bool):
        """One full SMC pass (all levels) as a single scanned computation.

        Carry: (x, log_W, log_Z); scan inputs: per-level (params[, opt_state],
        lam_prev, lam_next, keys). Returns updated stacked params/opt states
        when training.
        """
        bij = self.bijections[0]
        n_levels = self.n_levels

        def level(carry, inputs):
            x, log_W, log_Z = carry
            if train:
                params, opt_state, lam_prev, lam_next, k_level = inputs
            else:
                params, lam_prev, lam_next, k_level = inputs
                opt_state = None

            if train:
                from ..flows.train import _finite_update

                w = jnp.exp(log_W - jax.scipy.special.logsumexp(log_W))
                loss, grads = jax.value_and_grad(
                    lambda p: self._loss(bij, p, x, w, lam_prev, lam_next)
                )(params)
                # skip non-finite updates (params AND opt state): one bad
                # level otherwise NaNs this level's params permanently and
                # every later pass emits NaN particles with no error
                finite = _finite_update(loss, grads)
                updates, os_new = self.opt.update(grads, opt_state, params)
                params = _tree_select(
                    finite, optax.apply_updates(params, updates), params)
                opt_state = _tree_select(finite, os_new, opt_state)

            x_next, log_det = bij.inverse_fn(params, x)
            log_G = self.u(x, lam_prev) - self.u(x_next, lam_next) + log_det
            # inf - inf at consecutive unevaluable levels: the particle's
            # incremental weight is genuinely zero, not NaN
            log_G = jnp.where(jnp.isnan(log_G), -jnp.inf, log_G)
            log_w = log_W + log_G
            dlZ = jax.scipy.special.logsumexp(log_w)
            log_W_new = log_w - dlZ
            # degenerate level (every particle unevaluable): uniform reset
            # instead of NaN weights (mirrors aft.py's val-weight guard)
            n = log_w.shape[0]
            log_W_new = jnp.where(
                jnp.isfinite(dlZ),
                jnp.where(jnp.isfinite(log_W_new), log_W_new, -jnp.inf),
                jnp.full_like(log_w, -math.log(n)),
            )
            log_Z = log_Z + dlZ

            # ESS-gated resample, fused on device (the host-side float()
            # decision this replaces cost one blocking sync per level)
            k_res, k_mala = jax.random.split(k_level)
            do = (log_ess(log_w) - math.log(n)
                  <= math.log(self.sampling_threshold))
            idx = systematic_resample(k_res, log_W_new, n)
            idx = jnp.where(do, idx, jnp.arange(n))
            x_next = x_next[idx]
            log_W_new = jnp.where(do, jnp.full_like(log_W_new, -math.log(n)),
                                  log_W_new)
            x_next = self.mala_sweep(x_next, lam_next, k_mala)

            out = (params, opt_state) if train else x_next
            return (x_next, log_W_new, log_Z), out

        lams = jnp.arange(1, n_levels + 1, dtype=jnp.float32) / n_levels
        lams_prev = jnp.arange(0, n_levels, dtype=jnp.float32) / n_levels

        if train:
            def run(params_stacked, opt_stacked, x, log_W, key):
                keys = jax.random.split(key, n_levels)
                (x, log_W, log_Z), (params_stacked, opt_stacked) = jax.lax.scan(
                    level, (x, log_W, jnp.float32(0.0)),
                    (params_stacked, opt_stacked, lams_prev, lams, keys),
                )
                return params_stacked, opt_stacked, x, log_W, log_Z
        else:
            def run(params_stacked, x, log_W, key):
                keys = jax.random.split(key, n_levels)
                (x, log_W, log_Z), xs = jax.lax.scan(
                    level, (x, log_W, jnp.float32(0.0)),
                    (params_stacked, lams_prev, lams, keys),
                )
                return x, log_W, log_Z, xs

        return run

    # ---- params stacking helpers -------------------------------------------
    def _stack(self, trees):
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)

    def _unstack(self, stacked):
        return [jax.tree_util.tree_map(lambda l: l[i], stacked)
                for i in range(self.n_levels)]

    def train(self, prior_sample, n_particles: int = 100, n_training_steps: int = 100,
              show_progress: bool = False, key=None, seed=None):
        key = resolve_key(key, seed)
        params_stacked = self._stack([b.params for b in self.bijections])
        opt_stacked = self._stack(
            [self.opt.init(b.params) for b in self.bijections])

        iterator = tqdm(range(n_training_steps), desc="CRAFT", disable=not show_progress)
        for _ in iterator:
            key, k0, kp = jax.random.split(key, 3)
            x = jnp.asarray(prior_sample((n_particles,), key=k0), dtype=jnp.float32)
            log_W = jnp.full((n_particles,), -math.log(n_particles))
            params_stacked, opt_stacked, x, log_W, log_Z = self._train_pass(
                params_stacked, opt_stacked, x, log_W, kp
            )
            if show_progress:  # the only per-pass device sync, opt-in
                iterator.set_postfix_str(f"log Z: {float(log_Z):.3f}")

        for b, p in zip(self.bijections, self._unstack(params_stacked)):
            b.params = p

    def sample(self, prior_sample, n_particles: int = 100, key=None, seed=None):
        key = resolve_key(key, seed)
        key, k0, kp = jax.random.split(key, 3)
        x = jnp.asarray(prior_sample((n_particles,), key=k0), dtype=jnp.float32)
        log_W = jnp.full((n_particles,), -math.log(n_particles))
        params_stacked = self._stack([b.params for b in self.bijections])
        x0 = x
        x, log_W, log_Z, xs = self._sample_pass(params_stacked, x, log_W, kp)
        history = np.concatenate([as_numpy(x0)[None], as_numpy(xs)], axis=0)
        return {
            "particles": as_numpy(x),
            "log_weights": as_numpy(log_W),
            "log_Z": float(log_Z),
            "history": history,
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
