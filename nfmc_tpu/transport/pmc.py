"""Preconditioned Monte Carlo (Karamanis, Beutler, Peacock & Seljak 2022 —
the pocoMC algorithm).

The reference lists PMC first among the algorithms "yet to be added"
(``README.md:12-14``) and ships no code for it; this is a from-scratch
TPU-native implementation completing that wishlist.

PMC is adaptive-temperature SMC with a normalizing-flow *preconditioner*:

per level (inverse temperature ``beta``, path ``u(x, b) = (1-b) u_prior +
b u_target``):
  1. choose ``delta`` by bisection so the effective sample size of the
     incremental weights ``exp(-delta * (u_target - u_prior))`` stays at
     ``ess_target * n`` (the temperature ladder adapts to the problem
     instead of being fixed like AFT/CRAFT's linear schedule);
  2. reweight (``log_Z += logsumexp(log_W + log_g)``) and resample;
  3. fit the flow to the current particles (jitted full-batch MLE steps);
  4. run a preconditioned Crank-Nicolson (pCN) Metropolis sweep in the
     flow's *latent* space targeting ``pi_beta``: proposals
     ``z' = sqrt(1-rho^2) z + rho xi`` are reversible w.r.t. the flow's
     N(0, I) base, so the accept ratio only sees the *residual*
     ``Phi(z) = u_lat(z) - ||z||^2/2`` — when the flow fits well the
     residual is nearly constant, acceptance approaches 1 and the chain
     decorrelates in O(1) steps independent of dimension (an isotropic
     random walk at the same acceptance needs O(d) steps; measured on the
     16-d bench target the RW sweep left a -0.3 to -0.5 nat under-mixing
     bias in log Z that pCN removes at identical cost). ``rho`` adapts
     toward ``target_acceptance`` by on-device Robbins-Monro inside the
     sweep's ``lax.scan``.

Everything per level is three device calls (delta-u fetch, train scan,
sweep); ``beta``/``rho_logit`` are traced scalars so all levels share one
compile.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.rng import resolve_key
from ..utils import as_numpy
from .common import systematic_resample, tempered


def _ess_np(log_w: np.ndarray) -> float:
    """ESS (in particle counts) of unnormalized log-weights, host-side."""
    lw = log_w - np.logaddexp.reduce(log_w)
    return float(np.exp(-np.logaddexp.reduce(2.0 * lw)))

from ..utils import tqdm  # shared fallback shim


class PreconditionedMonteCarlo:
    def __init__(
        self,
        prior_potential: Callable,
        target_potential: Callable,
        flow,
        ess_target: float = 0.9,
        n_mcmc_steps: int = 10,
        target_acceptance: float = 0.65,
        adapt_rate: float = 0.5,
        n_train_epochs: int = 30,
        train_lr: float = 1e-2,
        max_levels: int = 200,
        initial_rho: float = 0.5,
    ):
        self.prior_potential = prior_potential
        self.target_potential = target_potential
        self.flow = flow
        self.ess_target = float(ess_target)
        self.max_levels = int(max_levels)
        self.n_train_epochs = int(n_train_epochs)
        self.initial_rho = min(max(float(initial_rho), 1e-4), 1.0 - 1e-4)
        self.u = tempered(prior_potential, target_potential)
        self.opt = optax.adam(train_lr)

        flow_ = flow

        def _delta_u(x):
            return target_potential(x) - prior_potential(x)

        self._delta_u = jax.jit(_delta_u)

        def weighted_loss(params, x, log_w):
            """Self-normalized weighted negative log-likelihood: an estimate
            of ``-E_{pi_beta_new}[log q]`` from the PRE-resample weighted
            cloud. Training on the weighted cloud instead of resampled
            particles keeps every point unique, so the val split below is a
            real holdout (resampled duplicates straddle any split and let a
            memorizing fit ace its own val loss)."""
            w = jax.nn.softmax(log_w)
            return -jnp.sum(w * flow_.log_prob_fn(params, x))

        def train_scan(params, x, log_w, key):
            """Per-level preconditioner fit: full-batch Adam epochs inside one
            scan, VAL-SELECTED best weights (cf. ``aft``'s per-level fit) and
            finite-guarded updates. Val selection is load-bearing, not a
            nicety: the warm-started fixed-epoch fit OVERFITS small particle
            sets (measured: 512 particles x 16-d, 20 epochs/level -> the
            distorted preconditioner corrupts the latent sweep and biases
            log Z by -10 to -35 nats; val-best holds it within +-0.3). The
            tracker seeds with the warm-start params' own val loss, so a
            non-improving fit keeps the previous level's preconditioner."""
            from ..flows.train import _finite_update

            n = x.shape[0]
            n_val = max(n // 5, 1)
            perm = jax.random.permutation(key, n)
            x, log_w = x[perm], log_w[perm]
            x_val, x_train = x[:n_val], x[n_val:]
            lw_val, lw_train = log_w[:n_val], log_w[n_val:]

            def tree_select(flag, a, b):
                return jax.tree_util.tree_map(
                    lambda u, v: jnp.where(flag, u, v), a, b)

            init_val = weighted_loss(params, x_val, lw_val)
            init_val = jnp.where(jnp.isfinite(init_val), init_val, jnp.inf)
            opt_state = self.opt.init(params)

            def body(carry, _):
                params, opt_state, best_params, best_val = carry
                loss, grads = jax.value_and_grad(weighted_loss)(
                    params, x_train, lw_train)
                finite = _finite_update(loss, grads)
                updates, opt_state_new = self.opt.update(grads, opt_state, params)
                params = tree_select(finite, optax.apply_updates(params, updates), params)
                opt_state = tree_select(finite, opt_state_new, opt_state)
                val = weighted_loss(params, x_val, lw_val)
                better = jnp.isfinite(val) & (val < best_val)
                best_params = tree_select(better, params, best_params)
                best_val = jnp.where(better, val, best_val)
                return (params, opt_state, best_params, best_val), loss

            (_, _, best_params, _), losses = jax.lax.scan(
                body, (params, opt_state, params, init_val), None,
                length=self.n_train_epochs,
            )
            return best_params, losses

        self._train = jax.jit(train_scan)

        def u_lat(params, z, beta):
            x, log_det_inv = flow_.bijection.inverse_fn(params, z)
            return self.u(x, beta) - log_det_inv

        def _half_sumsq(z):
            return 0.5 * jnp.sum(z.reshape(z.shape[0], -1) ** 2, axis=-1)

        def sweep(params, x, beta, rho_logit, key):
            z, _ = flow_.bijection.forward_fn(params, x)
            uz = u_lat(params, z, beta)

            def body(carry, k):
                z, uz, rho_logit = carry
                rho = jax.nn.sigmoid(rho_logit)
                k_prop, k_acc = jax.random.split(k)
                xi = jax.random.normal(k_prop, z.shape)
                z_prime = jnp.sqrt(1.0 - rho ** 2) * z + rho * xi
                uzp = u_lat(params, z_prime, beta)
                # pCN accept: proposal reversible wrt N(0,I), so only the
                # residual Phi(z) = u_lat(z) - ||z||^2/2 enters the ratio
                log_alpha = (uz - _half_sumsq(z)) - (uzp - _half_sumsq(z_prime))
                # accept-guard semantics per utils.unevaluable_current_mask:
                # a NaN current potential would freeze the particle forever
                # (log_u < NaN is False) — force-move it to any evaluable
                # proposal; a +inf current already auto-accepts through
                # log_alpha = +inf. Non-finite PROPOSALS always reject.
                log_alpha = jnp.where(jnp.isnan(uz), jnp.inf, log_alpha)
                log_alpha = jnp.where(jnp.isfinite(uzp), log_alpha, -jnp.inf)
                accept = (
                    jnp.log(jax.random.uniform(k_acc, log_alpha.shape)) < log_alpha
                )
                mask = accept.reshape(accept.shape + (1,) * (z.ndim - 1))
                z = jnp.where(mask, z_prime, z)
                uz = jnp.where(accept, uzp, uz)
                acc = jnp.mean(accept)
                rho_logit = rho_logit + adapt_rate * (acc - target_acceptance)
                return (z, uz, rho_logit), acc

            (z, uz, rho_logit), accs = jax.lax.scan(
                body, (z, uz, rho_logit), jax.random.split(key, n_mcmc_steps)
            )
            x, _ = flow_.bijection.inverse_fn(params, z)
            return x, rho_logit, jnp.mean(accs)

        self._sweep = jax.jit(sweep)

    # ---- adaptive temperature: largest delta keeping ESS at the target ------
    def _choose_delta(self, delta_u: np.ndarray, log_W: np.ndarray, beta: float) -> float:
        n = delta_u.shape[0]
        target = self.ess_target * n

        def ess(delta: float) -> float:
            return _ess_np(log_W - delta * delta_u)

        hi = 1.0 - beta
        if ess(hi) >= target:
            return hi
        lo = 0.0
        for _ in range(40):
            mid = 0.5 * (lo + hi)
            if ess(mid) >= target:
                lo = mid
            else:
                hi = mid
        # lo can only be 0.0 if even infinitesimal steps break the ESS target
        # (pathological weights); force minimal progress so the loop terminates.
        return max(lo, (1.0 - beta) / self.max_levels, 1e-6)

    def run(
        self,
        prior_sample: Callable,
        n_particles: int = 100,
        show_progress: bool = False,
        full_output: bool = False,
        key=None,
        seed=None,
    ):
        key = resolve_key(key, seed)
        key, k_init = jax.random.split(key)
        x = jnp.asarray(prior_sample((n_particles,), key=k_init), dtype=jnp.float32)
        log_W = np.full((n_particles,), -math.log(n_particles))
        log_Z = 0.0
        rho_logit = jnp.float32(
            math.log(self.initial_rho) - math.log1p(-self.initial_rho))
        beta = 0.0
        params = self.flow.params
        beta_trace, ess_trace, acc_trace = [0.0], [], []
        history = [as_numpy(x)] if full_output else None

        bar = tqdm(total=1.0, desc="PMC", disable=not show_progress)
        for _level in range(self.max_levels):
            if beta >= 1.0:
                break
            # 1. adaptive temperature increment
            delta_u = as_numpy(self._delta_u(x))
            delta = self._choose_delta(delta_u, log_W, beta)
            beta_new = min(1.0, beta + delta)

            # 2. reweight + log-Z increment + resample
            log_w = log_W + (-(beta_new - beta) * delta_u)
            log_Z += float(np.logaddexp.reduce(log_w))
            ess_trace.append(_ess_np(log_w))
            log_w -= np.logaddexp.reduce(log_w)
            key, k_res = jax.random.split(key)
            x_prev, lw_prev = x, jnp.asarray(log_w, dtype=jnp.float32)
            idx = systematic_resample(k_res, jnp.asarray(log_w), n_particles)
            x = x[idx]
            log_W = np.full((n_particles,), -math.log(n_particles))

            # 3. fit the preconditioner on the PRE-resample weighted cloud
            # (unique points -> the fit's val holdout is a real holdout;
            # resampled duplicates would straddle the split)
            key, k_fit = jax.random.split(key)
            params, _losses = self._train(params, x_prev, lw_prev, k_fit)

            # 4. latent-space pCN Metropolis sweep at beta_new
            key, k_sweep = jax.random.split(key)
            x, rho_logit, acc = self._sweep(params, x, jnp.float32(beta_new), rho_logit, k_sweep)
            acc_trace.append(float(acc))

            beta = beta_new
            beta_trace.append(beta)
            if full_output:
                history.append(as_numpy(x))
            if show_progress:
                bar.n = beta
                bar.set_postfix_str(f"log Z: {log_Z:.3f}, acc: {acc_trace[-1]:.2f}")
                bar.refresh()
        bar.close()

        self.flow.params = params
        converged = beta >= 1.0
        if not converged:
            print(
                f"PMC warning: hit max_levels={self.max_levels} at beta={beta:.4f} < 1; "
                "log_Z and particles target the tempered (not final) density"
            )
        result = {
            "particles": as_numpy(x),
            "log_weights": log_W,
            "log_Z": log_Z,
            "beta_trace": np.asarray(beta_trace),
            "ess_trace": np.asarray(ess_trace),
            "acceptance_trace": np.asarray(acc_trace),
            "converged": converged,
        }
        if full_output:
            result["history"] = np.stack(history)
        return result


def pmc(prior, target, flow, n_particles: int = 100, show_progress: bool = False,
        seed: int = 0, **kwargs):
    """Wrapper in the house transport signature (cf. ``aft``/``craft``):
    ``prior``/``target`` are Potentials, ``flow`` a registry name or Flow."""
    from ..api.registry import create_flow_object
    from ..flows import Flow as _Flow

    flow_object = flow if isinstance(flow, _Flow) else create_flow_object(flow, prior.event_shape)
    algorithm = PreconditionedMonteCarlo(prior, target, flow_object, **kwargs)
    return algorithm.run(
        lambda batch_shape, key=None: prior.sample(batch_shape, key=key),
        n_particles=n_particles, show_progress=show_progress,
        full_output=True, seed=seed,
    )
