"""NeuTra: neural-transport reparameterized MCMC.

Parity with reference ``nfmc/algorithms/sampling/nfmc/neutra.py``:

* the inner Metropolis sampler runs in latent space on the adjusted target
  ``U~(z) = U(f^{-1}(z)) - log|det df^{-1}/dz|`` (``neutra.py:58-68``);
* statistics map back to data space via ``data_transform = z -> f^{-1}(z)``
  (``neutra.py:122``) while stored samples remain latent;
* warmup = reverse-KL ``variational_fit`` on 30% of the time budget
  (``neutra.py:84-91``) then inner tuning warmup (``neutra.py:100-107``).

TPU-native: the adjusted target is a pure JAX composition, so HMC leapfrog
gradients differentiate *through the flow inverse* in the same fused
reverse-mode pass — the reference's hottest path (2LB flow inverses per
iteration through torch autograd + host<->device copies at every boundary,
``neutra.py:60-62``) becomes part of one compiled scan.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Type

import jax
import jax.numpy as jnp

from ...core.output import MCMCOutput
from ...utils import event_size_of
from ...core.sampler import NFMCKernel, NFMCParameters, Sampler
from ..mcmc.base import MetropolisKernel, MetropolisParameters, MetropolisSampler
from ..mcmc.chees import CheesHMC, CheesHMCKernel, CheesHMCParameters
from ..mcmc.hmc import HMC, HMCKernel, HMCParameters
from ..mcmc.mh import MH, MHKernel, MHParameters


@dataclass
class NeuTraKernel(NFMCKernel):
    pass


@dataclass
class NeuTraParameters(NFMCParameters):
    batch_inverse_size: int = 128  # parity field (unused; reference ``neutra.py:21``)
    warmup_fit_kwargs: Optional[dict] = None
    # Superset option addressing the reference's z0 = x0 quirk
    # (``neutra.py:121-127``): when True, the data-space start transports to
    # latent space through the fitted flow's FORWARD map, z0 = f(x0) — the
    # principled initialization (a data-space start reused as a latent point
    # lands in an arbitrary region of the pullback). Note it cannot rescue a
    # poorly fitted flow: NeuTra's mixing is dominated by reverse-KL fit
    # quality (e.g. extreme funnels). Default False for reference parity.
    transport_x0: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.warmup_fit_kwargs is None:
            # Reference defaults (``neutra.py:24-33``) with a batched reverse-KL
            # estimator (n_samples=128 instead of 1).
            self.warmup_fit_kwargs = {
                "early_stopping": True,
                "early_stopping_threshold": 5000,
                "keep_best_weights": True,
                "n_samples": 128,
                "n_epochs": 50000,
                "lr": 0.005,  # reference 0.05 (``neutra.py:24-33``) diverges; see flows/train.py
            }


class NeuTra(Sampler):
    def __init__(self, event_shape, target,
                 inner_sampler_class: Type[MetropolisSampler],
                 inner_kernel: MetropolisKernel,
                 inner_params: MetropolisParameters,
                 kernel: Optional[NeuTraKernel] = None,
                 params: Optional[NeuTraParameters] = None):
        if kernel is None:
            kernel = NeuTraKernel(event_shape)
        if params is None:
            params = NeuTraParameters()
        super().__init__(event_shape, target, kernel, params)
        inner_params.n_iterations = self.params.n_iterations
        self.inner_sampler = inner_sampler_class(
            event_shape, self.adjusted_target, inner_kernel, inner_params
        )
        self.inner_sampler.data_transform = self._latent_to_data

    def adjusted_target(self, z):
        """U~(z) = U(f^{-1}(z)) - log_det_inverse; reference ``neutra.py:58-68``."""
        flow = self.kernel.flow
        x, log_det_inverse = flow.bijection.inverse_fn(flow.params, z)
        log_prob = -self.target(x)
        return -(log_prob + log_det_inverse)

    def _initial_latent(self, x0):
        """z0 for the inner latent-space run: reference parity reuses the
        data-space x0 verbatim; ``params.transport_x0`` forward-maps it."""
        if not getattr(self.params, "transport_x0", False):
            return x0
        flow = self.kernel.flow
        return flow.bijection.forward_fn(flow.params, jnp.asarray(x0, jnp.float32))[0]

    #: NeuTra's warmup output stores LATENT draws (the inner run's space);
    #: consumers that wire warmup draws into sample()'s x0 (the front door's
    #: reshuffle) must account for it when ``transport_x0`` is on.
    warmup_draws_are_latent = True

    def _latent_to_data(self, z):
        flow = self.kernel.flow
        return flow.bijection.inverse_fn(flow.params, jnp.asarray(z, jnp.float32))[0]

    @property
    def name(self):
        return "NeuTra"

    def _refresh_inner_if_stale(self):
        """Invalidate the inner sampler's compiled scans only when the flow
        params (or target) actually changed. Re-tracing the 20-leapfrog
        grad-through-inverse scan costs seconds; doing it unconditionally per
        sample() call dominated NeuTra wall-clock. The token covers every
        param *leaf* id (catches in-place list/dict surgery on the pytree,
        not just wholesale replacement) plus the target; references are held
        so the identity tokens stay valid."""
        params = self.kernel.flow.params
        token = (id(self.target),) + tuple(
            id(leaf) for leaf in jax.tree_util.tree_leaves(params)
        )
        if getattr(self, "_built_params_token", None) != token:
            self.inner_sampler._driver = None
            self.inner_sampler._driver_config = None
            self._built_params_token = token
            self._built_params_ref = (params, self.target)

    def warmup(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        k_fit, k_inner = jax.random.split(key)
        fit_limit = 0.3 * time_limit_seconds if time_limit_seconds is not None else None

        t0 = time.time()
        # merge (user kwargs win) rather than passing show_progress/key twice:
        # a user-supplied 'show_progress' in warmup_fit_kwargs must not raise
        fit_kwargs = {
            "time_limit_seconds": fit_limit,
            "show_progress": show_progress,
            "key": k_fit,
            **self.params.warmup_fit_kwargs,
        }
        self.kernel.flow.variational_fit(lambda v: -self.target(v), **fit_kwargs)
        elapsed = time.time() - t0
        inner_limit = (time_limit_seconds - elapsed) if time_limit_seconds is not None else None

        # record the post-fit param token while invalidating: leaving the
        # token at None made the first sample() after warmup re-trace the
        # whole grad-through-inverse scan a second time for identical params
        self._refresh_inner_if_stale()
        self.inner_sampler.params.tuning_mode()
        self.inner_sampler.params.store_samples = self.params.store_samples
        self.inner_sampler.params.n_warmup_iterations = self.params.n_warmup_iterations
        return self.inner_sampler.warmup(
            self._initial_latent(x0), show_progress=show_progress,
            time_limit_seconds=inner_limit, key=k_inner,
        )

    def sample_continue(self, z0, **kwargs) -> MCMCOutput:
        """Continuation entry (checkpointed segments): NeuTra's stored draws
        (and hence ``last_sample``) are LATENT, so the carried state re-enters
        as-is; bypass ``params.transport_x0`` (which would wrongly
        forward-map a latent point as if it were data-space)."""
        old = getattr(self.params, "transport_x0", False)
        self.params.transport_x0 = False
        try:
            return self.sample(z0, **kwargs)
        finally:
            self.params.transport_x0 = old

    def sample(self, x0, show_progress: bool = True, time_limit_seconds=None,
               key=None, seed=None) -> MCMCOutput:
        key = self._key(key, seed)
        self.inner_sampler.params.n_iterations = self.params.n_iterations
        self.inner_sampler.params.sampling_mode()
        self.inner_sampler.params.store_samples = self.params.store_samples
        self._refresh_inner_if_stale()
        z0 = self._initial_latent(x0)
        out = self.inner_sampler.sample(
            z0,  # z0 = x0 by default, reference ``neutra.py:121-127``
            show_progress=show_progress,
            time_limit_seconds=time_limit_seconds,
            key=key,
        )
        out.kernel.flow = self.kernel.flow
        return out


class NeuTraHMC(NeuTra):
    def __init__(self, event_shape, target, inner_kernel: Optional[HMCKernel] = None,
                 inner_params: Optional[HMCParameters] = None,
                 kernel=None, params=None):
        if inner_kernel is None:
            inner_kernel = HMCKernel(event_size=event_size_of(event_shape))
        if inner_params is None:
            inner_params = HMCParameters()
        super().__init__(event_shape, target, HMC, inner_kernel, inner_params, kernel, params)

    @property
    def name(self):
        return "NeuTra-HMC"


class NeuTraMH(NeuTra):
    def __init__(self, event_shape, target, inner_kernel: Optional[MHKernel] = None,
                 inner_params: Optional[MHParameters] = None,
                 kernel=None, params=None):
        if inner_kernel is None:
            inner_kernel = MHKernel(event_size=event_size_of(event_shape))
        if inner_params is None:
            inner_params = MHParameters()
        super().__init__(event_shape, target, MH, inner_kernel, inner_params, kernel, params)

    @property
    def name(self):
        return "NeuTra-MH"


class NeuTraChEES(NeuTra):
    """NeuTra with a ChEES-HMC inner sampler (superset: the reference has
    neither trajectory adaptation nor this combination). The adaptive
    trajectory runs in the REPARAMETERIZED latent space — exactly where the
    NeuTra construction makes long trajectories pay off — with every leapfrog
    gradient flowing through the flow inverse."""

    def __init__(self, event_shape, target, inner_kernel: Optional[CheesHMCKernel] = None,
                 inner_params: Optional[CheesHMCParameters] = None,
                 kernel=None, params=None):
        if inner_kernel is None:
            inner_kernel = CheesHMCKernel(event_size=event_size_of(event_shape))
        if inner_params is None:
            inner_params = CheesHMCParameters()
        super().__init__(event_shape, target, CheesHMC, inner_kernel, inner_params,
                         kernel, params)

    @property
    def name(self):
        return "NeuTra-ChEES"
