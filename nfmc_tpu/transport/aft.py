"""Annealed Flow Transport (Arbel, Matthews & Doucet 2021), corrected.

Reference sketch at ``nfmc/algorithms/transport/annealed_flow_transport.py:
152-293`` is non-functional (it passes the module ``mh`` as a callable,
``:120-128``) and its SMC arithmetic is wrong: ``log_w = logaddexp(log_W,
log_G)`` should be ``log_W + log_G`` and ``delta_log_Z = sum(log_w)`` should
be ``logsumexp`` (``:21-27,104``); its ``log_G`` also carries the potentials
with flipped signs. This implementation follows the published algorithm:

per level k (linear schedule lam_k = k/(K-1)):
  1. train the flow T_k on the current (train) particles to push
     eta_{k-1} toward pi_k: minimize  sum_i W_i [u_k(T(x_i)) - log|det T'|];
  2. transport & reweight: log_G = u_{k-1}(x) - u_k(T(x)) + log|det T'|,
     delta log_Z = logsumexp(log_W + log_G), then normalize log_W;
  3. resample (multinomial) when ESS/n < threshold; 4. MALA correction at pi_k.

Three particle groups (base / train / val) as in the reference design:
log_Z from base, flow fitting from train with val early stopping.
"""
from __future__ import annotations

import math
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import as_numpy
from .common import log_ess, make_mala_sweep, systematic_resample, tempered

from ..utils import tqdm  # shared fallback shim


class AnnealedFlowTransport:
    def __init__(
        self,
        prior_potential: Callable,
        target_potential: Callable,
        flow,
        n_steps: int = 20,
        sampling_threshold: Optional[float] = None,
        n_mcmc_steps: int = 5,
        mcmc_step_size: float = 0.05,
        n_train_epochs: int = 50,
        train_lr: float = 1e-2,
    ):
        self.prior_potential = prior_potential
        self.target_potential = target_potential
        self.flow = flow
        self.n_steps = int(n_steps)
        self.sampling_threshold = sampling_threshold
        self.n_train_epochs = int(n_train_epochs)
        self.u = tempered(prior_potential, target_potential)
        self.mala_sweep = jax.jit(
            make_mala_sweep(self.u, n_steps=n_mcmc_steps, step_size=mcmc_step_size)
        )
        self.opt = optax.adam(train_lr)
        self._train_step = jax.jit(self._make_train_step())
        self._fit_level = jax.jit(self._make_fit_level())
        self._transport = jax.jit(self._make_transport())
        self._select_transport = jax.jit(self._make_select_transport())

    def _loss_fn(self, params, x, w, lam):
        x_t, log_det = self.flow.bijection.forward_fn(params, x)
        return jnp.sum(w * (self.u(x_t, lam) - log_det))

    def _make_train_step(self):
        def train_step(params, opt_state, x, w, lam):
            loss, grads = jax.value_and_grad(self._loss_fn)(params, x, w, lam)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return train_step

    def _make_fit_level(self):
        """One level's full training loop (n_train_epochs steps with
        forward-only val loss and best-weights tracking) as a single compiled
        scan: one device dispatch per level instead of 2*n_epochs dispatches
        plus n_epochs host syncs (each sync costs a full tunnel round trip)."""
        train_step = self._make_train_step()

        def fit_level(params, opt_state, x_train, w_train, x_val, w_val, lam):
            def body(carry, _):
                params, opt_state, best_params, best_val = carry
                params, opt_state, _ = train_step(params, opt_state, x_train, w_train, lam)
                val = self._loss_fn(params, x_val, w_val, lam)
                better = jnp.isfinite(val) & (val < best_val)
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(better, p, b), best_params, params
                )
                best_val = jnp.where(better, val, best_val)
                return (params, opt_state, best_params, best_val), None

            # seed best with the warm-start params' own val loss so a fit
            # that never improves on the carry-in cannot replace it
            init_val = self._loss_fn(params, x_val, w_val, lam)
            init = (params, opt_state, params,
                    jnp.where(jnp.isfinite(init_val), init_val, jnp.inf))
            (_, _, best_params, best_val), _ = jax.lax.scan(
                body, init, None, length=self.n_train_epochs
            )
            return best_params, best_val

        return fit_level

    def _make_transport(self):
        flow = self.flow

        def transport(params, x, log_W, lam_prev, lam_next, use_flow):
            x_f, log_det = flow.bijection.forward_fn(params, x)
            x_t = jnp.where(use_flow, x_f, x)
            log_det = jnp.where(use_flow, log_det, 0.0)
            log_G = self.u(x, lam_prev) - self.u(x_t, lam_next) + log_det
            log_w = log_W + log_G
            delta_log_Z = jax.scipy.special.logsumexp(log_w)
            log_W_new = log_w - jax.scipy.special.logsumexp(log_w)
            return x_t, log_W_new, delta_log_Z, log_ess(log_w)

        return transport

    def _make_select_transport(self):
        """Per-level safeguard fused with the val-group transport: accept the
        fitted map only if it does not hurt the incremental-weight ESS,
        measured on the VAL group (so the selection is independent of the
        base particles whose weights enter log_Z — any FIXED map keeps the
        SMC estimator valid, including the identity, which is plain tempered
        SMC for that level). Returns ``(use_flow, transported val group)`` in
        ONE device dispatch — the val forward pass / potential evals are
        shared between the selection and the transport (each extra dispatch
        costs a full tunnel round trip, see CLAUDE.md)."""
        flow = self.flow

        def select_and_transport_val(params, x_val, lw_val, lam_prev, lam_next):
            x_f, log_det = flow.bijection.forward_fn(params, x_val)
            u_prev = self.u(x_val, lam_prev)
            log_G_flow = u_prev - self.u(x_f, lam_next) + log_det
            log_G_id = u_prev - self.u(x_val, lam_next)
            ess_flow = log_ess(lw_val + log_G_flow)
            ess_id = log_ess(lw_val + log_G_id)
            # a non-finite ess_id (e.g. every val particle at U=+inf under a
            # hard-support target, log_G_id all -inf) must NOT veto a finite
            # fitted transport — identity would be the catastrophic choice
            use_flow = jnp.isfinite(ess_flow) & (
                (ess_flow >= ess_id) | ~jnp.isfinite(ess_id)
            )
            x_t = jnp.where(use_flow, x_f, x_val)
            log_G = jnp.where(use_flow, log_G_flow, log_G_id)
            log_w = lw_val + log_G
            norm = jax.scipy.special.logsumexp(log_w)
            lw_new = log_w - norm
            # degenerate level (BOTH maps unevaluable on every val particle,
            # norm = -inf/NaN): reset to uniform rather than write NaN
            # weights — a NaN val-weight vector makes every later level's
            # ess_flow NaN (selection locked to identity with no recovery)
            # and feeds garbage cdf values to the val resample. Per-row NaNs
            # under a finite norm degrade to -inf (never resampled).
            uniform = jnp.full_like(log_w, -jnp.log(log_w.shape[0]))
            lw_new = jnp.where(
                jnp.isfinite(norm),
                jnp.where(jnp.isfinite(lw_new), lw_new, -jnp.inf),
                uniform,
            )
            return use_flow, x_t, lw_new

        return select_and_transport_val

    def run(
        self,
        prior_sample: Callable,
        n_particles: int = 100,
        n_train_particles: int = 100,
        n_val_particles: int = 100,
        show_progress: bool = False,
        full_output: bool = False,
        key=None,
        seed=None,
    ):
        key = resolve_key(key, seed)
        threshold = self.sampling_threshold
        if threshold is None:
            threshold = 0.3 if 1.0 / n_particles <= 0.3 else 1.0 / n_particles

        key, k1, k2, k3 = jax.random.split(key, 4)
        x_base = jnp.asarray(prior_sample((n_particles,), key=k1), dtype=jnp.float32)
        x_train = jnp.asarray(prior_sample((n_train_particles,), key=k2), dtype=jnp.float32)
        x_val = jnp.asarray(prior_sample((n_val_particles,), key=k3), dtype=jnp.float32)
        lw_base = jnp.full((n_particles,), -math.log(n_particles))
        lw_train = jnp.full((n_train_particles,), -math.log(n_train_particles))
        lw_val = jnp.full((n_val_particles,), -math.log(n_val_particles))
        log_Z = 0.0
        history = [as_numpy(x_base)] if full_output else None
        ess_trace = []

        params = self.flow.params
        iterator = tqdm(range(1, self.n_steps), desc="AFT", disable=not show_progress)
        for k in iterator:
            lam_prev = (k - 1) / (self.n_steps - 1)
            lam_next = k / (self.n_steps - 1)

            # 1. fit flow on weighted train particles (val best-weights),
            # fully on device — no per-epoch host syncs
            opt_state = self.opt.init(params)
            w_train = jnp.exp(lw_train - jax.scipy.special.logsumexp(lw_train))
            w_val = jnp.exp(lw_val - jax.scipy.special.logsumexp(lw_val))
            params, _best_val = self._fit_level(
                params, opt_state, x_train, w_train, x_val, w_val, lam_next
            )

            # 2. transport & reweight (fitted map, or identity when the fit
            # would hurt val-group ESS — plain tempered SMC for that level);
            # the val group's own transport is fused into the selection call
            use_flow, x_val, lw_val = self._select_transport(
                params, x_val, lw_val, lam_prev, lam_next
            )
            x_base, lw_base, dlZ, ess_b = self._transport(params, x_base, lw_base, lam_prev, lam_next, use_flow)
            x_train, lw_train, _, ess_t = self._transport(params, x_train, lw_train, lam_prev, lam_next, use_flow)
            log_Z += float(dlZ)
            # log_ess returns log of the ABSOLUTE ESS (in [0, log n])
            ess_trace.append(float(jnp.exp(ess_t)))

            # 3. resample on train-ESS criterion (reference design)
            if float(ess_t) - math.log(n_train_particles) <= math.log(threshold):
                key, ka, kb, kc = jax.random.split(key, 4)
                x_base = x_base[systematic_resample(ka, lw_base, n_particles)]
                x_train = x_train[systematic_resample(kb, lw_train, n_train_particles)]
                x_val = x_val[systematic_resample(kc, lw_val, n_val_particles)]
                lw_base = jnp.full((n_particles,), -math.log(n_particles))
                lw_train = jnp.full((n_train_particles,), -math.log(n_train_particles))
                lw_val = jnp.full((n_val_particles,), -math.log(n_val_particles))

            # 4. MCMC correction at the new level
            key, km = jax.random.split(key)
            ka, kb, kc = jax.random.split(km, 3)
            x_base = self.mala_sweep(x_base, lam_next, ka)
            x_train = self.mala_sweep(x_train, lam_next, kb)
            x_val = self.mala_sweep(x_val, lam_next, kc)

            if full_output:
                history.append(as_numpy(x_base))
            if show_progress:
                iterator.set_postfix_str(f"log Z: {log_Z:.3f}")

        self.flow.params = params
        result = {
            "particles": as_numpy(x_base),
            "log_weights": as_numpy(lw_base),
            "log_Z": log_Z,
            "ess_trace": ess_trace,
        }
        if full_output:
            result["history"] = np.stack(history)
        return result


def aft(prior, target, flow, n_particles: int = 100, n_iterations: int = 20,
        show_progress: bool = False, seed: int = 0,
        n_train_particles: Optional[int] = None,
        n_val_particles: Optional[int] = None, **kwargs):
    """Wrapper with the reference signature (``transport/wrappers.py:9-26``):
    ``prior``/``target`` are Potentials, ``flow`` a registry name or Flow.

    ``n_train_particles``/``n_val_particles`` size the flow-fitting groups
    (reference design: three separate groups, default 100 each). The per-level
    fit quality is bounded by the train group size — with the 100-particle
    default the per-level flows underfit and each level's importance
    correction adds weight variance, which biases the log-Z estimate low
    (Jensen); production log-Z runs should scale these with ``n_particles``.
    """
    from ..api.registry import create_flow_object
    from ..flows import Flow as _Flow

    flow_object = flow if isinstance(flow, _Flow) else create_flow_object(flow, prior.event_shape)
    algorithm = AnnealedFlowTransport(prior, target, flow_object, n_steps=n_iterations, **kwargs)
    return algorithm.run(
        lambda batch_shape, key=None: prior.sample(batch_shape, key=key),
        n_particles=n_particles, show_progress=show_progress,
        n_train_particles=n_train_particles or 100,
        n_val_particles=n_val_particles or 100,
        full_output=True, seed=seed,
    )
