"""Nested sampling with flow-guided live-point replacement, corrected.

The reference sketch (``transport/nested.py:8-35``) references an undefined
``rejection_sampling`` helper and tracks no evidence. This implementation is a
working nested sampler (Skilling 2006): live points from the prior, iterative
worst-point replacement under the hard likelihood constraint
``L(x) > L_worst``, standard evidence accumulation with the
``X_i = exp(-i / n_live)`` prior-volume shrinkage.

Replacement draws must be *prior-distributed* on ``{L > L_worst}`` or the
shrinkage law (and hence log_Z) is biased. Early iterations use constrained
prior rejection; once enough structure exists the flow (refit to the live set
every ``n_live`` iterations, as in the reference sketch) serves as an
importance proposal: draw a population from the flow, weight each candidate
by ``prior(x)/q_flow(x)`` (zero off the prior's support), restrict to the
likelihood constraint, and resample one candidate by those weights (SIR, as
in nessai/pocoMC-style flow-based nested samplers). The proposal pass (flow
sample + likelihood + both densities) is one jitted call with the flow params
threaded as arguments (the flow is refit mid-run — no closure baking)."""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rng import resolve_key
from ..utils import as_numpy

from ..utils import tqdm  # shared fallback shim


class NestedSampling:
    def __init__(self, prior, log_likelihood: Callable, flow,
                 n_live_points: int = 100, latent_scale: float = 1.0,
                 n_population_draws: int = 50, flow_fit_kwargs: Optional[dict] = None):
        self.prior = prior
        self.log_likelihood = log_likelihood
        self.flow = flow
        self.n_live = int(n_live_points)
        self.latent_scale = float(latent_scale)  # kept for API compat (unused)
        self.n_pop = int(n_population_draws)
        self.flow_fit_kwargs = flow_fit_kwargs or {"n_epochs": 30, "lr": 0.01}

        flow_ = flow
        prior_ = prior
        log_likelihood_ = log_likelihood

        def _flow_propose(params, key):
            """Population draw from the flow + everything the SIR pick needs:
            likelihoods and log prior/flow-density importance weights."""
            xp, logq = flow_.sample_fn(params, key, self.n_pop, return_log_prob=True)
            lls = log_likelihood_(xp)
            log_w = -prior_(xp) - logq  # log[prior(x)/q(x)] up to a constant
            return xp, lls, log_w

        def _prior_draw(key):
            cand = prior_.sample((self.n_pop,), key=key)
            return cand, log_likelihood_(cand)

        self._flow_propose = jax.jit(_flow_propose)
        self._prior_draw = jax.jit(_prior_draw)

    def run(self, n_iterations: int = 1000, show_progress: bool = False,
            key=None, seed=None):
        key = resolve_key(key, seed)
        key, k0 = jax.random.split(key)
        x = np.array(self.prior.sample((self.n_live,), key=k0), dtype=np.float32, copy=True)
        ll = np.array(self.log_likelihood(jnp.asarray(x)), copy=True)

        n_rs_iterations = 2 * self.n_live
        log_Z = -np.inf
        log_X_prev = 0.0
        dead_points, dead_ll = [], []
        # dedicated key for the host rng seed: the loop below keeps splitting
        # `key`, which must stay single-use relative to this consumption
        key, k_rng = jax.random.split(key)
        rng = np.random.default_rng(int(jax.random.randint(k_rng, (), 0, 2**31 - 1)))

        iterator = tqdm(range(n_iterations), desc="NS", disable=not show_progress)
        for i in iterator:
            worst = int(np.argmin(ll))
            l_worst = float(ll[worst])

            replacement = None
            if i >= n_rs_iterations:
                # flow population + SIR to the constrained prior: restrict to
                # L > L_worst, then resample ONE candidate by prior/q weights
                # (a candidate outside the prior support has weight exp(-inf)=0)
                key, k1 = jax.random.split(key)
                x_prop, lls, lw = jax.device_get(
                    self._flow_propose(self.flow.params, k1)
                )
                ok = np.where(np.isfinite(lls) & (lls > l_worst) & np.isfinite(lw))[0]
                if len(ok) > 0:
                    w = np.exp(lw[ok] - lw[ok].max())
                    w_sum = w.sum()
                    if np.isfinite(w_sum) and w_sum > 0:
                        pick = ok[rng.choice(len(ok), p=w / w_sum)]
                        replacement = (np.asarray(x_prop)[pick], float(lls[pick]))

            if replacement is None:
                # constrained rejection sampling from the prior (batched,
                # exactly prior-distributed on {L > L_worst})
                for _ in range(200):
                    key, kr = jax.random.split(key)
                    cand, lls = jax.device_get(self._prior_draw(kr))
                    ok = np.where(lls > l_worst)[0]
                    if len(ok) > 0:
                        replacement = (
                            np.asarray(cand, dtype=np.float32)[ok[0]],
                            float(lls[ok[0]]),
                        )
                        break
            if replacement is None:
                # cannot improve the worst point; terminate WITHOUT counting
                # it dead — its shell increment must not be added (it stays
                # live for the final X/n_live contribution below; counting
                # it in both places double-counted one shell weight and
                # shrank the volume despite no replacement happening)
                break

            # evidence increment: w_i = (X_{i-1} - X_i) L_worst — recorded
            # only once the point actually leaves the live set
            log_X = -(i + 1) / self.n_live
            log_w = np.log(math.exp(log_X_prev) - math.exp(log_X) + 1e-300) + l_worst
            log_Z = np.logaddexp(log_Z, log_w)
            log_X_prev = log_X
            dead_points.append(x[worst].copy())
            dead_ll.append(l_worst)

            x[worst], ll[worst] = replacement

            if i % self.n_live == 0 and i > 0:
                try:
                    self.flow.fit(x, **self.flow_fit_kwargs)
                except ValueError:
                    pass
            if show_progress:
                iterator.set_postfix_str(f"log Z: {log_Z:.3f}, L*: {l_worst:.3f}")

        # final live-point contribution
        for j in range(self.n_live):
            log_w = log_X_prev - math.log(self.n_live) + float(ll[j])
            log_Z = np.logaddexp(log_Z, log_w)

        return {
            "log_Z": float(log_Z),
            "live_points": x,
            "live_log_likelihoods": ll,
            "dead_points": np.stack(dead_points) if dead_points else np.empty((0,)),
            "dead_log_likelihoods": np.asarray(dead_ll),
        }


def ns(prior, target, flow: str = "realnvp", n_particles: int = 100,
       n_iterations: int = 1000, show_progress: bool = False, seed: int = 0):
    """Wrapper with the reference signature (``transport/wrappers.py:52-59``):
    ``log_likelihood = -target``."""
    from ..api.registry import create_flow_object

    flow_object = create_flow_object(flow, prior.event_shape)
    algorithm = NestedSampling(
        prior=prior,
        log_likelihood=lambda x: -target(x),
        flow=flow_object,
        n_live_points=n_particles,
    )
    return algorithm.run(n_iterations=n_iterations, show_progress=show_progress, seed=seed)
