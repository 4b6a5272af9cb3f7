"""Masked autoregressive flows: MAF / IAF and their spline (ma-/ia-rqnsf,
ma-/ia-lrsnsf) variants.

MAF's density-evaluation direction (data -> latent) is one parallel MADE
pass; sampling inverts dimension-by-dimension as a ``lax.fori_loop`` of d
masked passes (the inherent autoregressive cost). IAF is the ``Inverse`` of
the same core, making sampling the parallel direction — which is why the
reference notes masked flows are unsuitable for adjusted jump proposals
(``nfmc/jump.py:86-90``); both directions still work here, just with the d-pass
cost on the slow side.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Bijection, Inverse
from .conditioners import made_apply, made_init, made_masks
from .transforms import AffineTransform, LRSplineTransform, RQSplineTransform


class MaskedAutoregressive(Bijection):
    """Stack of MADE-conditioned autoregressive layers with order reversal.

    forward (parallel): z_i = T(x_i ; theta_i(x_<i)).
    inverse (sequential): d masked passes via ``lax.fori_loop``.
    """

    def __init__(
        self,
        event_shape: Sequence[int],
        transform,
        n_layers: int = 2,
        hidden_size: int = 128,
        n_hidden_layers: int = 2,
        conditioner_kwargs=None,
        **_,
    ):
        super().__init__(event_shape)
        self.transform = transform
        self.n_layers = int(n_layers)
        if conditioner_kwargs:
            n_hidden_layers = conditioner_kwargs.get("n_layers", n_hidden_layers)
            hidden_size = conditioner_kwargs.get("n_hidden", hidden_size)
        self.hidden = [int(hidden_size)] * int(n_hidden_layers)
        # Host (numpy) masks: they fold into trace-time constants, avoiding
        # device allocations at construction.
        self.masks = [
            np.asarray(m)
            for m in made_masks(
                self.event_size, self.hidden, transform.n_params_per_dim,
            )
        ]

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        keys = jax.random.split(key, self.n_layers)
        return [
            made_init(k, self.event_size, self.hidden, self.transform.n_params_per_dim)
            for k in keys
        ]

    def _raw(self, p, v):
        out = made_apply(p, self.masks, v)
        return out.reshape(*v.shape, self.transform.n_params_per_dim)

    def _layer_forward(self, p, v):
        raw = self._raw(p, v)
        z, ld_elem = self.transform.forward(v, raw)
        return z, jnp.sum(ld_elem, axis=-1)

    def _layer_inverse(self, p, z):
        d = self.event_size

        def body(i, x):
            raw = self._raw(p, x)
            x_new, _ = self.transform.inverse(z, raw)
            return x.at[..., i].set(x_new[..., i])

        x = jax.lax.fori_loop(0, d, body, jnp.zeros_like(z))
        raw = self._raw(p, x)
        _, ld_elem = self.transform.inverse(z, raw)
        return x, jnp.sum(ld_elem, axis=-1)

    def _flatten(self, v):
        batch = v.shape[: v.ndim - len(self.event_shape)]
        return v.reshape(*batch, self.event_size), batch

    def forward_fn(self, params, x):
        v, batch = self._flatten(x)
        log_det = jnp.zeros(batch)
        for l, p in enumerate(params):
            v, ld = self._layer_forward(p, v)
            log_det = log_det + ld
            if l != self.n_layers - 1:
                v = v[..., ::-1]
        return v.reshape(x.shape), log_det

    def inverse_fn(self, params, z):
        v, batch = self._flatten(z)
        log_det = jnp.zeros(batch)
        for l, p in enumerate(reversed(params)):
            v, ld = self._layer_inverse(p, v)
            log_det = log_det + ld
            if l != self.n_layers - 1:
                v = v[..., ::-1]
        return v.reshape(z.shape), log_det


class MAF(MaskedAutoregressive):
    """Masked affine autoregressive flow (Papamakarios et al. 2017)."""

    def __init__(self, event_shape, n_layers: int = 2, clamp: float = 3.0, **kwargs):
        super().__init__(event_shape, AffineTransform(clamp=clamp), n_layers=n_layers, **kwargs)


class MaskedAutoregressiveRQNSF(MaskedAutoregressive):
    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, **kwargs):
        super().__init__(
            event_shape, RQSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )


class MaskedAutoregressiveLRS(MaskedAutoregressive):
    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, **kwargs):
        super().__init__(
            event_shape, LRSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )


def IAF(event_shape, **kwargs) -> Inverse:
    """Inverse autoregressive flow: parallel sampling, sequential density."""
    return Inverse(MAF(event_shape, **kwargs))


def InverseAutoregressiveRQNSF(event_shape, **kwargs) -> Inverse:
    return Inverse(MaskedAutoregressiveRQNSF(event_shape, **kwargs))


def InverseAutoregressiveLRS(event_shape, **kwargs) -> Inverse:
    return Inverse(MaskedAutoregressiveLRS(event_shape, **kwargs))
