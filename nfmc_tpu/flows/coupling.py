"""Coupling flows: RealNVP, NICE, coupling rational-quadratic / linear-rational
spline flows and coupling deep-sigmoid (NAF) variants.

The reference's default flow is torchflows RealNVP (``nfmc/algorithms/
sampling/base.py:26``, ``sample.py:22``). Coupling layers here operate on the
flattened event with alternating static half-masks; each layer's conditioner
is a dense MLP sized to MXU-friendly widths, and both directions cost one
conditioner pass, so flow sampling inside scan loops is as cheap as density
evaluation.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Bijection
from .conditioners import mlp_apply, mlp_init
from .transforms import AffineTransform, LRSplineTransform, RQSplineTransform, ShiftTransform


class Coupling(Bijection):
    """Stack of coupling layers with a shared elementwise transform type."""

    def __init__(
        self,
        event_shape: Sequence[int],
        transform,
        n_layers: int = 2,
        hidden_size: Optional[int] = None,
        n_hidden_layers: int = 2,
        conditioner_kwargs: Optional[dict] = None,
        **_ignored,
    ):
        super().__init__(event_shape)
        d = self.event_size
        if d < 2:
            raise ValueError("Coupling flows need event_size >= 2")
        self.transform = transform
        self.n_layers = int(n_layers)
        # torchflows-style conditioner kwargs ({'n_layers', 'n_hidden'}) are
        # accepted for DSL parity (reference ``test/test_flow_kwargs.py:49``).
        if conditioner_kwargs:
            n_hidden_layers = conditioner_kwargs.get("n_layers", n_hidden_layers)
            hidden_size = conditioner_kwargs.get("n_hidden", hidden_size)
        if hidden_size is None:
            hidden_size = int(min(max(32, 2 ** int(np.ceil(np.log2(max(4 * d, 32))))), 128))
        self.hidden = [int(hidden_size)] * int(n_hidden_layers)

        # Static index sets: layer l conditions on indices with (i + l) % 2 == 0.
        self.layer_idx = []
        for l in range(self.n_layers):
            ids = np.arange(d)
            a = ids[(ids + l) % 2 == 0]  # conditioning (identity) part
            b = ids[(ids + l) % 2 == 1]  # transformed part
            inv_perm = np.argsort(np.concatenate([a, b]))
            self.layer_idx.append((jnp.asarray(a), jnp.asarray(b), jnp.asarray(inv_perm)))

    @property
    def layers(self):
        """Per-layer descriptors (torchflows ``bijection.layers`` parity)."""
        return self.layer_idx

    def init(self, key):
        keys = jax.random.split(key, self.n_layers)
        params = []
        for (a, b, _), k in zip(self.layer_idx, keys):
            out_dim = int(b.shape[0]) * self.transform.n_params_per_dim
            params.append(mlp_init(k, int(a.shape[0]), self.hidden, out_dim))
        return params

    def _layer(self, p, idx, v, inverse: bool):
        a, b, inv_perm = idx
        va = jnp.take(v, a, axis=-1)
        vb = jnp.take(v, b, axis=-1)
        raw = mlp_apply(p, va).reshape(*vb.shape, self.transform.n_params_per_dim)
        if inverse:
            vb_new, ld_elem = self.transform.inverse(vb, raw)
        else:
            vb_new, ld_elem = self.transform.forward(vb, raw)
        v_new = jnp.take(jnp.concatenate([va, vb_new], axis=-1), inv_perm, axis=-1)
        return v_new, jnp.sum(ld_elem, axis=-1)

    def forward_fn(self, params, x):
        batch_shape = x.shape[: x.ndim - len(self.event_shape)]
        v = x.reshape(*batch_shape, self.event_size)
        log_det = jnp.zeros(batch_shape)
        for p, idx in zip(params, self.layer_idx):
            v, ld = self._layer(p, idx, v, inverse=False)
            log_det = log_det + ld
        return v.reshape(x.shape), log_det

    def inverse_fn(self, params, z):
        batch_shape = z.shape[: z.ndim - len(self.event_shape)]
        v = z.reshape(*batch_shape, self.event_size)
        log_det = jnp.zeros(batch_shape)
        for p, idx in zip(reversed(params), reversed(self.layer_idx)):
            v, ld = self._layer(p, idx, v, inverse=True)
            log_det = log_det + ld
        return v.reshape(z.shape), log_det


class RealNVP(Coupling):
    """Affine coupling flow (Dinh et al. 2017); reference default
    (``base.py:26``)."""

    def __init__(self, event_shape, n_layers: int = 2, clamp: float = 3.0, **kwargs):
        super().__init__(event_shape, AffineTransform(clamp=clamp), n_layers=n_layers, **kwargs)


class NICE(Coupling):
    """Additive coupling flow (Dinh et al. 2015); volume-preserving."""

    def __init__(self, event_shape, n_layers: int = 2, **kwargs):
        super().__init__(event_shape, ShiftTransform(), n_layers=n_layers, **kwargs)


class CouplingRQNSF(Coupling):
    """Coupling rational-quadratic neural spline flow (c-rqnsf)."""

    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, **kwargs):
        super().__init__(
            event_shape, RQSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )


class CouplingLRS(Coupling):
    """Coupling linear-rational spline flow (c-lrsnsf)."""

    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, **kwargs):
        super().__init__(
            event_shape, LRSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )
