"""TESS: transport elliptical slice sampling.

Parity with reference ``nfmc/algorithms/sampling/nfmc/tess.py``:

* state lives in latent ``u``; per step draw ellipse ``v ~ N(0, cov)``,
  threshold ``log s = log pi^(u) + log phi(v) + log w`` where ``log pi^(u)``
  is the pullback log-density and ``log phi`` is the flow base log-prob
  (``tess.py:26-42``); rotate ``(u, v)`` through a <=5-round bracket shrink
  with first-accept-wins masks; return data-space ``x = f^{-1}(u)``
  (``tess.py:53-75``). DEVIATION: the reference's ``log pi^`` subtracts the
  inverse log-det (``tess.py:29-32``), which targets ``pi(x)/|J|^2`` in data
  space; here the pullback sign is corrected (see ``log_pi_hat`` below);
* warmup (default 20 iterations, ``tess.py:85-86``): alternate TESS step +
  flow MLE fit on the produced ``x``; stores *latent* draws (``tess.py:116-144``);
* ``sample`` treats ``x0`` as latent ``u0`` (``tess.py:158-161``);
* counters: ``(max_iterations + 1) * B`` target calls per iteration.

TPU-native: with the flow frozen, ``sample`` is one chunked scan; the flow
inverse runs inside the bracket ``fori_loop`` on device (the reference ships
u to the flow device and x back to CPU per round, ``tess.py:27-35``).
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import RNG_HOIST_ELEMENT_LIMIT, ChunkedScanDriver, StepInfo
from ...core.output import MCMCOutput
from ...core.sampler import NFMCKernel, NFMCParameters, Sampler
from ...utils import get_batch_shape

from ...utils import tqdm  # shared fallback shim


@dataclass
class TESSKernel(NFMCKernel):
    cov: Optional[np.ndarray] = None

    def chol(self):
        if self.cov is None:
            return None
        return jnp.linalg.cholesky(jnp.asarray(self.cov, dtype=jnp.float32))


@dataclass
class TESSParameters(NFMCParameters):
    n_warmup_iterations: int = 20
    max_ess_step_iterations: int = 5


def make_tess_step(flow, potential, event_shape: Tuple[int, ...],
                   max_iterations: int = 5, chol=None):
    """Returns (init, step): ``init(params, u) -> (lp_u, x_u)`` and
    ``step(params, u, lp_u, x_u, key) -> (x', u', lp', accepted_mask)``.

    The current state's ``log pi^(u)`` and data-space ``x = f^{-1}(u)`` are
    carried between iterations (they were computed when the state was
    accepted), eliminating the reference's leading per-iteration flow inverse
    + target call (``tess.py:38-42``). Reported counters keep the reference
    contract ((max_iter + 1) * B calls per iteration)."""
    event_ndim = len(event_shape)

    if chol is None:
        def log_phi(params, inputs):
            return flow.base_log_prob_fn(inputs)
    else:
        # v is DRAWN as chol @ z ~ N(0, cov); the slice threshold and the
        # acceptance must evaluate that same N(0, cov) density. Evaluating
        # the flow base N(0, I) here instead would make the augmentation
        # inconsistent with the Gibbs redraw and bias the u-marginal for any
        # non-identity cov. Whitened quadratic form (solve_triangular + sum
        # of squares): exact under TPU matmul precision, no dense x@P@x
        # cancellation (docs/design.md "User-potential numerics").
        _D = chol.shape[0]
        _logdet_chol = jnp.sum(jnp.log(jnp.diagonal(chol)))
        _log2pi = math.log(2.0 * math.pi)

        def log_phi(params, inputs):
            batch_shape = inputs.shape[: inputs.ndim - event_ndim]
            flat = inputs.reshape(-1, _D)
            zw = jax.scipy.linalg.solve_triangular(chol, flat.T, lower=True).T
            lp = (-0.5 * jnp.sum(zw * zw, axis=-1)
                  - _logdet_chol - 0.5 * _D * _log2pi)
            return lp.reshape(batch_shape)

    def log_pi_hat(params, inputs):
        # Pullback log-density of the latent state: log pi^(u) =
        # log pi(f^{-1}(u)) + log|det d f^{-1}(u)/du| (TESS, Cabezas & Nemeth
        # 2023). DOCUMENTED DEVIATION from reference ``tess.py:29-32``, which
        # uses -log_det: that chain's data-space draws follow
        # pi(x)/|J|^2 instead of pi(x) — measurably biased whenever the
        # transport's Jacobian is non-constant (verified empirically: with a
        # frozen nonlinear flow on N(0, I), the reference sign gives
        # per-dim variance ~0.4-0.6; this sign gives 1.00).
        x, log_det = flow.bijection.inverse_fn(params, inputs)
        return -potential(x) + log_det, x

    def tess_init(params, u):
        lp_u, x_u = log_pi_hat(params, u)
        return lp_u, x_u

    def tess_draws(key, batch_shape):
        """The step's randomness, hoistable per chunk (exact in-step key
        derivation: raw ellipse normal, threshold uniform, raw theta normal,
        shrink uniforms)."""
        expand = (*batch_shape, *([1] * event_ndim))
        k_v, k_w, k_theta, k_shrink = jax.random.split(key, 4)
        if chol is None:
            z = jax.random.normal(k_v, (*batch_shape, *event_shape))
        else:
            z = jax.random.normal(k_v, (*batch_shape, chol.shape[0]))
        w = jax.random.uniform(k_w, batch_shape)
        theta0 = jax.random.normal(k_theta, expand)
        shrink = jax.vmap(lambda k: jax.random.uniform(k, expand))(
            jax.random.split(k_shrink, max_iterations)
        )
        return z, w, theta0, shrink

    def tess_step(params, u, lp_u, x0, key, draws=None):
        batch_shape = get_batch_shape(u, event_shape)
        if draws is None:
            draws = tess_draws(key, batch_shape)
        z, w, theta0, shrink = draws

        if chol is None:
            v = z.reshape(u.shape)
        else:
            # highest precision: the threshold uses the exact N(0, cov) density
            v = jnp.matmul(z, chol.T, precision="highest").reshape(u.shape)

        log_s = lp_u + log_phi(params, v) + jnp.log(w)

        expand = (*batch_shape, *([1] * event_ndim))
        # Reference quirk (``tess.py:44``): theta ~ Normal * 2*pi, not Uniform.
        theta = theta0 * (2.0 * math.pi)
        theta_min = theta - 2.0 * math.pi
        theta_max = theta

        accepted = jnp.zeros(batch_shape, dtype=bool)
        u_prop = u
        x_prop = x0
        lp_prop = lp_u

        def body(i, carry):
            u_prop, x_prop, lp_prop, accepted, theta, theta_min, theta_max = carry
            u_prime = u * jnp.cos(theta) + v * jnp.sin(theta)
            v_prime = v * jnp.cos(theta) - u * jnp.sin(theta)
            lp, x_prime = log_pi_hat(params, u_prime)
            newly = ((lp + log_phi(params, v_prime)) > log_s) & (~accepted)
            bmask = newly.reshape(expand)
            u_prop = jnp.where(bmask, u_prime, u_prop)
            x_prop = jnp.where(bmask, x_prime, x_prop)
            lp_prop = jnp.where(newly, lp, lp_prop)

            theta_neg = theta < 0
            theta_min = jnp.where(theta_neg, theta, theta_min)
            theta_max = jnp.where(~theta_neg, theta, theta_max)
            theta = shrink[i] * (theta_max - theta_min) + theta_min
            accepted = accepted | newly
            return u_prop, x_prop, lp_prop, accepted, theta, theta_min, theta_max

        u_prop, x_prop, lp_prop, accepted, *_ = jax.lax.fori_loop(
            0, max_iterations, body,
            (u_prop, x_prop, lp_prop, accepted, theta, theta_min, theta_max),
        )
        return x_prop, u_prop, lp_prop, accepted

    return tess_init, tess_step, tess_draws


class TESS(Sampler):
    # footprint cap for the chunk-hoisted step randomness (see
    # core/driver.py RNG_HOIST_ELEMENT_LIMIT); set to 0 to force the
    # in-scan fallback
    rng_hoist_element_limit: int = RNG_HOIST_ELEMENT_LIMIT

    def __init__(self, event_shape, target, negative_log_likelihood,
                 kernel: Optional[TESSKernel] = None,
                 params: Optional[TESSParameters] = None):
        if kernel is None:
            kernel = TESSKernel(event_shape)
        if params is None:
            params = TESSParameters()
        super().__init__(event_shape, target, kernel, params)
        self.negative_log_likelihood = negative_log_likelihood

    @property
    def name(self):
        return "TESS"

    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        """Alternate TESS step + flow MLE fit (reference ``tess.py:116-144``).

        Fixed-effort ``flow_fit_kwargs`` (no early stopping / time limit)
        fuse the whole warmup iteration — step + train/val-split refit — into
        the chunked scan with flow params in the carry (cf. the fused DLMC /
        AdaptiveIMH refits); other configs run the host loop below."""
        from ...flows.train import fixed_effort_fit_config

        key = self._key(key, seed)
        fit_cfg = fixed_effort_fit_config(self.params.flow_fit_kwargs)
        if fit_cfg is not None:
            return self._warmup_fused(x0, key, fit_cfg, show_progress,
                                      time_limit_seconds)
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples)
        flow = self.kernel.flow
        n_chains = x0.shape[0]
        max_iter = self.params.max_ess_step_iterations
        tess_init, tess_step, _tess_draws = make_tess_step(
            flow, self.negative_log_likelihood, self.event_shape,
            max_iterations=max_iter, chol=self.kernel.chol(),
        )
        tess_init = jax.jit(tess_init)
        tess_step = jax.jit(tess_step)

        t0 = time.time()
        key, k0 = jax.random.split(key)
        u = jax.random.normal(k0, (n_chains, *self.event_shape))
        out.statistics.update_elapsed_time(time.time() - t0)

        pbar = tqdm(range(self.params.n_warmup_iterations), desc="[Warmup] TESS",
                    disable=not show_progress)
        for _ in pbar:
            if (
                time_limit_seconds is not None
                and out.statistics.elapsed_time_seconds >= time_limit_seconds
            ):
                break
            t0 = time.time()
            # k_perm and k_fit are distinct: the numpy split permutation and
            # the fit's internal randomness must not consume the same key
            key, k_step, k_perm, k_fit = jax.random.split(key, 4)
            # the flow refits every iteration, so lp/x re-derive per step
            lp_u, x_u = tess_init(flow.params, u)
            x, u, _lp, accepted = tess_step(flow.params, u, lp_u, x_u, k_step)
            # Reference stores *latent* draws during warmup (``tess.py:131-132``).
            out.running_samples.add(u)
            out.statistics.expectations.update(u)
            out.statistics.update_counters(
                n_target_calls=(max_iter + 1) * n_chains,
                n_accepted_trajectories=int(jnp.sum(accepted)),
                n_attempted_trajectories=n_chains,
                # same divergence accounting as the fused path
                n_divergences=int(not bool(jnp.all(jnp.isfinite(u)))),
            )
            # shared split helper keeps the host path's fit data in sync with
            # the fused path's make_scan_fit (train_pct + max_train/val caps);
            # the [None] lifts (C, *event) to the helper's (K, C, *event)
            from ...core.tuning import train_val_split

            x_train, x_val = train_val_split(
                np.asarray(x)[None],
                train_pct=self.params.train_pct,
                max_train_size=self.params.max_train_size,
                max_val_size=self.params.max_val_size,
                seed=int(jax.random.randint(k_perm, (), 0, 2**31 - 1)),
            )
            try:
                flow.fit(x_train, x_val=x_val,
                         **self.params.flow_fit_kwargs, key=k_fit)
            except ValueError:
                pass
            out.statistics.update_elapsed_time(time.time() - t0)

        out.kernel = self.kernel
        return out

    def _warmup_fused(self, x0, key, fit_cfg, show_progress,
                      time_limit_seconds) -> MCMCOutput:
        """Warmup iteration (TESS step + refit) as one compiled scan step.

        The scan position is the latent ``u`` (the reference stores latent
        draws during warmup, ``tess.py:131-132``); flow params ride in the
        kernel state; the refit is the shared
        :func:`nfmc_tpu.flows.train.make_scan_fit` on the produced data-space
        draws with the reference's train/val split."""
        from ...flows.train import make_scan_fit

        flow = self.kernel.flow
        n_chains = x0.shape[0]
        max_iter = self.params.max_ess_step_iterations
        n_epochs, lr, batch_size, keep_best_weights, shuffle = fit_cfg
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                         on_device=getattr(self.params, 'store_samples_on_device', False))

        def build():
            tess_init, tess_step, _draws = make_tess_step(
                flow, self.negative_log_likelihood, self.event_shape,
                max_iterations=max_iter, chol=self.kernel.chol(),
            )
            scan_fit = make_scan_fit(
                flow, n_chains, n_epochs=n_epochs, lr=lr, batch_size=batch_size,
                shuffle=shuffle, keep_best_weights=keep_best_weights,
                train_pct=self.params.train_pct,
                max_train_size=self.params.max_train_size,
                max_val_size=self.params.max_val_size,
            )

            def make_step(tuning):
                def step(u, params, key):
                    k_step, k_fit = jax.random.split(key)
                    # the flow refit each iteration, so lp/x re-derive per step
                    lp_u, x_u = tess_init(params, u)
                    x, u_new, _lp, accepted = tess_step(params, u, lp_u, x_u, k_step)
                    params = scan_fit(params, x, k_fit)
                    info = StepInfo(
                        n_accepted=jnp.sum(accepted).astype(jnp.int32),
                        diverged=(~jnp.all(jnp.isfinite(u_new))).astype(jnp.int32),
                    )
                    return u_new, params, info

                return step

            return ChunkedScanDriver(self.event_shape, make_step)

        cov = self.kernel.cov
        cov_token = None if cov is None else hash(np.asarray(cov).tobytes())
        driver = self._memo(
            "tess_fused_warmup",
            (max_iter, id(flow.bijection), id(flow._base_log_prob_override),
             cov_token, id(self.negative_log_likelihood), fit_cfg, n_chains,
             self.params.train_pct, self.params.max_train_size,
             self.params.max_val_size),
            build,
            keepalive=(flow.bijection, flow._base_log_prob_override,
                       self.negative_log_likelihood),
        )

        t0 = time.time()
        key, k0 = jax.random.split(key)
        u0 = jax.random.normal(k0, (n_chains, *self.event_shape))
        out.statistics.update_elapsed_time(time.time() - t0)
        _u, params = driver.run(
            u0, flow.params, key, self.params.n_warmup_iterations,
            stats=out.statistics, samples=out.running_samples,
            calls_per_iter=(max_iter + 1) * n_chains, grads_per_iter=0,
            collect=self.params.store_samples,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress, desc="[Warmup] TESS",
        )
        flow.params = params
        out.kernel = self.kernel
        return out

    def sample_continue(self, x, **kwargs) -> MCMCOutput:
        """Continuation entry (checkpointed segments): ``x`` is the previous
        segment's DATA-space last draw (TESS emits x = f^{-1}(u) while
        carrying latent u — ``sample`` treats its input as latent), so map
        it back through the flow forward before re-entering."""
        flow = self.kernel.flow
        fwd = self._memo(
            "continue_fwd", (id(flow.bijection),),
            lambda: jax.jit(flow.bijection.forward_fn),
            keepalive=(flow.bijection,),
        )
        u, _ = fwd(flow.params, jnp.asarray(x, dtype=jnp.float32))
        return self.sample(u, **kwargs)

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        u0 = jnp.asarray(x0, dtype=jnp.float32)  # x0 is latent (``tess.py:158-161``)
        n_chains = u0.shape[0]
        out = MCMCOutput(self.event_shape, store_samples=self.params.store_samples,
                         on_device=getattr(self.params, 'store_samples_on_device', False))
        flow = self.kernel.flow
        max_iter = self.params.max_ess_step_iterations
        tess_init, tess_step, tess_draws = make_tess_step(
            flow, self.negative_log_likelihood, self.event_shape,
            max_iterations=max_iter, chol=self.kernel.chol(),
        )

        # The scan *position* is data-space x (so stored samples and moment
        # accumulators need no per-iteration flow inverse); the latent u and
        # its cached log pi^ ride in the kernel state.
        def make_step(tuning):
            def step(x, kstate, key):
                params, u, lp_u = kstate
                x_new, u_new, lp_new, accepted = tess_step(params, u, lp_u, x, key)
                info = StepInfo(
                    n_accepted=jnp.sum(accepted).astype(jnp.int32),
                    diverged=(~jnp.all(jnp.isfinite(u_new))).astype(jnp.int32),
                )
                return x_new, (params, u_new, lp_new), info

            return step

        def make_step_aux(tuning):
            def step(x, kstate, key, aux):
                params, u, lp_u = kstate
                x_new, u_new, lp_new, accepted = tess_step(
                    params, u, lp_u, x, key, draws=aux
                )
                info = StepInfo(
                    n_accepted=jnp.sum(accepted).astype(jnp.int32),
                    diverged=(~jnp.all(jnp.isfinite(u_new))).astype(jnp.int32),
                )
                return x_new, (params, u_new, lp_new), info

            return step

        hoist_limit = self.rng_hoist_element_limit

        def make_precompute(tuning):
            # chunk-hoisted step randomness (exact in-step derivation);
            # declines above the footprint cap. Footprint mirrors tess_draws:
            # z (B*d) + w (B) + theta0 (B) + shrink (max_iter*B) — for small
            # d the shrink uniforms dominate, so a bare x.size estimate would
            # undercount by up to ~(max_iter + 2)/d (cf. ESS's
            # hoisted_elements_per_iter override).
            def precompute(x, kstate, keys):
                n_chains_ = int(x.shape[0])
                d = int(x.size) // max(n_chains_, 1)
                per_iter = n_chains_ * (d + 2 + max_iter)
                if keys.shape[0] * per_iter > hoist_limit:
                    return None
                return jax.vmap(lambda k: tess_draws(k, (x.shape[0],)))(keys)

            return precompute

        # chol is a closure constant, tokenized by value (a small host array
        # callers may mutate in place); the base-log-prob override is baked
        # into log_phi. Params are threaded through the carry.
        cov = self.kernel.cov
        cov_token = None if cov is None else hash(np.asarray(cov).tobytes())
        driver = self._cached_driver(
            (max_iter, id(flow.bijection), id(flow._base_log_prob_override),
             cov_token, id(self.negative_log_likelihood),
             self.rng_hoist_element_limit,
             getattr(self.params, "scan_unroll", 1)),
            lambda: ChunkedScanDriver(
                self.event_shape, make_step,
                make_precompute=make_precompute, make_step_aux=make_step_aux,
                unroll=getattr(self.params, "scan_unroll", 1),
                # mirrors the precompute's decline footprint (z + w + theta0
                # + the max_iter shrink uniforms per chain)
                hoist_per_iter=lambda x: x.shape[0]
                * ((int(x.size) // max(int(x.shape[0]), 1)) + 2 + max_iter),
            ),
            keepalive=(flow.bijection, flow._base_log_prob_override,
                       self.negative_log_likelihood),
        )
        # memoized: a fresh jax.jit per sample() call re-traces the flow
        # inverse every segment of a checkpointed run (CLAUDE.md convention)
        init_jit = self._memo(
            "tess_init",
            (max_iter, id(flow.bijection), id(flow._base_log_prob_override),
             cov_token, id(self.negative_log_likelihood)),
            lambda: jax.jit(tess_init),
            keepalive=(flow.bijection, flow._base_log_prob_override,
                       self.negative_log_likelihood),
        )
        t0 = time.time()
        lp0, x0_data = init_jit(flow.params, u0)
        out.statistics.update_elapsed_time(time.time() - t0)
        driver.run(
            x0_data,
            (flow.params, u0, lp0),
            key,
            self.params.n_iterations,
            stats=out.statistics,
            samples=out.running_samples,
            calls_per_iter=(max_iter + 1) * n_chains,
            grads_per_iter=0,
            collect=self.params.store_samples,
            time_limit_seconds=time_limit_seconds,
            show_progress=show_progress,
            desc="TESS sampling",
        )
        out.kernel = self.kernel
        return out
