"""Flow subsystem core: Bijection protocol + Flow wrapper.

TPU-native equivalent of the ``torchflows`` surface the reference consumes
(SURVEY.md section 2.9): ``Flow(bijection)``, ``flow.event_shape``,
``bijection.forward/inverse`` returning ``(y, log_det)``, ``flow.sample(n,
return_log_prob=...)``, ``flow.log_prob(x)``, overridable
``flow.base_log_prob``, ``fit``/``variational_fit``, and
``state_dict``/``load_state_dict`` (a pytree copy here).

Design: bijections are *static config objects*; numeric parameters live in an
explicit pytree so samplers can carry flow parameters through ``lax.scan`` and
training is a pure jitted step. The stateful convenience API (``forward(x)``
without params) reads ``self.params`` for reference-parity call sites.

Convention (matches torchflows): ``forward`` maps data -> latent and its
log-det is d log z / d x; ``sample`` draws from the base and applies
``inverse``; ``log_prob(x) = base_log_prob(forward(x)) + log_det_forward``.
"""
from __future__ import annotations

import copy
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.rng import resolve_key
from ..utils import event_size_of, std_normal_log_prob


def hutchinson_probes(v: jax.Array, n_probes: int, base_key: Optional[jax.Array] = None,
                      dtype=None) -> jax.Array:
    """Rademacher probes for stochastic trace/log-det estimators, derived per
    call AND per sample.

    A probe set drawn once from a fixed key gives every call the same
    systematically biased estimate, which training can imprint instead of
    averaging out. Folding the (gradient-stopped) bit pattern of the input
    ``v`` into the key decorrelates that bias across samples and training
    steps while staying deterministic and jit-compatible — no key threading
    through the ``(params, x)`` Bijection API is needed. An explicit
    ``base_key`` (e.g. ``Bijection.probe_key``) additionally decorrelates
    probes across callers: distinct keys give distinct probe streams.
    """
    if base_key is None:
        base_key = jax.random.key(0)
    flat = jax.lax.stop_gradient(v).astype(jnp.float32).reshape(-1)
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    # position-weighted mix (odd weights) so permuted inputs hash differently;
    # uint32 sum wraps mod 2^32
    weights = jnp.arange(bits.size, dtype=jnp.uint32) * jnp.uint32(2) + jnp.uint32(1)
    mix = jnp.sum(bits * weights, dtype=jnp.uint32)
    key = jax.random.fold_in(base_key, mix)
    return jax.random.rademacher(key, (int(n_probes), flat.size),
                                 dtype=dtype if dtype is not None else v.dtype)


class Bijection:
    """Invertible map with static config; params are an explicit pytree."""

    #: weight of ``regularization`` added to training losses (RNODE et al.)
    regularization_weight: float = 0.0

    def __init__(self, event_shape: Sequence[int]):
        self.event_shape: Tuple[int, ...] = tuple(int(s) for s in event_shape)
        self.params: Any = None  # set by Flow / init()
        #: optional explicit base key for stochastic log-det probe streams
        self.probe_key: Optional[jax.Array] = None

    @property
    def event_size(self) -> int:
        return event_size_of(self.event_shape)

    # ---- pure functional API (used inside scans / training) ---------------
    def init(self, key: jax.Array):
        raise NotImplementedError

    def forward_fn(self, params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """data -> latent; returns (z, log_det) with log_det shaped (batch,)."""
        raise NotImplementedError

    def inverse_fn(self, params, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """latent -> data; returns (x, log_det)."""
        raise NotImplementedError

    def regularization(self, params, x: jax.Array) -> jax.Array:
        """Training regularizer, weighted by ``regularization_weight`` in
        ``fit``/``variational_fit`` losses (RNODE's kinetic energy; 0 by
        default). Implementations should return PER-SAMPLE values shaped
        ``(batch,)`` so the MLE loss can apply its padding weights; a scalar
        return is also accepted (applied unweighted)."""
        return jnp.asarray(0.0, dtype=jnp.float32)

    # ---- stateful convenience (reference-parity call sites) ---------------
    def forward(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.forward_fn(self.params, x)

    def inverse(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.inverse_fn(self.params, z)

    def n_parameters(self) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(self.params))


class Inverse(Bijection):
    """Swap forward/inverse of a bijection."""

    def __init__(self, inner: Bijection):
        super().__init__(inner.event_shape)
        self.inner = inner

    def init(self, key):
        return self.inner.init(key)

    def forward_fn(self, params, x):
        return self.inner.inverse_fn(params, x)

    def inverse_fn(self, params, z):
        return self.inner.forward_fn(params, z)

    @property
    def regularization_weight(self) -> float:  # type: ignore[override]
        # forward the wrapped bijection's training regularizer (RNODE's
        # kinetic term would otherwise silently vanish under Inverse)
        return float(getattr(self.inner, "regularization_weight", 0.0))

    def regularization(self, params, x):
        return self.inner.regularization(params, x)

    @property
    def layers(self):
        return getattr(self.inner, "layers", [])


class Chain(Bijection):
    """Composition: forward applies bijections in order (data -> latent)."""

    def __init__(self, bijections: Sequence[Bijection]):
        assert len(bijections) > 0
        super().__init__(bijections[0].event_shape)
        self.bijections = list(bijections)

    def init(self, key):
        keys = jax.random.split(key, len(self.bijections))
        return [b.init(k) for b, k in zip(self.bijections, keys)]

    def forward_fn(self, params, x):
        log_det = jnp.zeros(x.shape[: x.ndim - len(self.event_shape)])
        for b, p in zip(self.bijections, params):
            x, ld = b.forward_fn(p, x)
            log_det = log_det + ld
        return x, log_det

    def inverse_fn(self, params, z):
        log_det = jnp.zeros(z.shape[: z.ndim - len(self.event_shape)])
        for b, p in zip(reversed(self.bijections), reversed(params)):
            z, ld = b.inverse_fn(p, z)
            log_det = log_det + ld
        return z, log_det

    @property
    def regularization_weight(self) -> float:  # type: ignore[override]
        # children's regularizers (RNODE kinetic energy etc.) must survive
        # composition; per-child weights are applied inside regularization(),
        # so the chain-level weight is just an on/off gate
        return 1.0 if any(
            getattr(b, "regularization_weight", 0.0) for b in self.bijections
        ) else 0.0

    def regularization(self, params, x):
        """Weighted sum of the children's regularizers, each evaluated at its
        own input in the forward (data -> latent) pass. Re-runs the forward
        transforms up to the last regularized child; XLA prunes the rest."""
        batch_shape = x.shape[: x.ndim - len(self.event_shape)]
        total = jnp.zeros(batch_shape)
        weights = [float(getattr(b, "regularization_weight", 0.0))
                   for b in self.bijections]
        last = max((i for i, w in enumerate(weights) if w), default=-1)
        for i, (b, p) in enumerate(zip(self.bijections, params)):
            if i > last:
                break
            if weights[i]:
                r = b.regularization(p, x)
                total = total + weights[i] * (
                    r if getattr(r, "ndim", 0) else jnp.broadcast_to(r, batch_shape)
                )
            if i < last:
                x, _ = b.forward_fn(p, x)
        return total


class Flow:
    """Normalizing flow = bijection + base distribution (standard normal).

    Parity with the ``torchflows.flows.Flow`` surface consumed by the
    reference (SURVEY.md section 2.9). ``base_log_prob`` is an overridable
    attribute (AFT swaps it for an annealed potential; reference
    ``annealed_flow_transport.py:238``).
    """

    def __init__(self, bijection: Bijection, key: Optional[jax.Array] = None, seed: Optional[int] = None):
        self.bijection = bijection
        if bijection.params is None:
            bijection.params = bijection.init(resolve_key(key, seed))
        self._base_log_prob_override: Optional[Callable] = None
        self._base_sample_override: Optional[Callable] = None

    # ---- params plumbing ----------------------------------------------------
    @property
    def params(self):
        return self.bijection.params

    @params.setter
    def params(self, value):
        self.bijection.params = value

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return self.bijection.event_shape

    def state_dict(self):
        """Snapshot of the parameter pytree (reference uses torch state_dict
        for weight rollback, ``jump.py:130,151``)."""
        return jax.tree_util.tree_map(lambda p: p, self.params)

    def load_state_dict(self, state) -> None:
        self.params = state

    def to(self, device=None):  # device placement is a no-op on a TPU mesh
        return self

    def get_device(self):
        return None

    # ---- pure functional API -------------------------------------------------
    def base_log_prob_fn(self, z: jax.Array) -> jax.Array:
        if self._base_log_prob_override is not None:
            return self._base_log_prob_override(z)
        return std_normal_log_prob(z, self.event_shape)

    def set_base_log_prob(self, fn: Optional[Callable],
                          sample_fn: Optional[Callable] = None) -> None:
        """Override the base density (AFT-style annealed base). ``sample_fn``
        is the paired base sampler ``(key, n) -> z``; it MUST draw from the
        distribution whose density ``fn`` evaluates. Omitting it keeps
        ``log_prob`` usable (training, pullback densities) but makes
        ``sample``/``sample_fn`` raise — otherwise draws would come from
        N(0, I) while the returned log q described ``fn``'s distribution,
        silently biasing any accept ratio or importance weight built on it."""
        self._base_log_prob_override = fn
        self._base_sample_override = sample_fn if fn is not None else None

    def log_prob_fn(self, params, x: jax.Array) -> jax.Array:
        z, log_det = self.bijection.forward_fn(params, x)
        return self.base_log_prob_fn(z) + log_det

    def sample_base_fn(self, key: jax.Array, n: int) -> jax.Array:
        if self._base_log_prob_override is not None:
            if self._base_sample_override is None:
                raise ValueError(
                    "base_log_prob is overridden but no paired base sampler was "
                    "provided: sampling would draw z ~ N(0, I) while reporting "
                    "the override's density. Pass sample_fn to set_base_log_prob."
                )
            return self._base_sample_override(key, n)
        return jax.random.normal(key, (n, *self.event_shape))

    def sample_fn(self, params, key: jax.Array, n: int, return_log_prob: bool = False):
        z = self.sample_base_fn(key, n)
        x, log_det_inv = self.bijection.inverse_fn(params, z)
        if return_log_prob:
            # log q(x) = base_log_prob(z) - log|det d x / d z|
            return x, self.base_log_prob_fn(z) - log_det_inv
        return x

    # ---- stateful reference-parity API ----------------------------------------
    def base_log_prob(self, z: jax.Array) -> jax.Array:
        return self.base_log_prob_fn(z)

    def log_prob(self, x: jax.Array) -> jax.Array:
        return self.log_prob_fn(self.params, x)

    def sample(self, n: int, no_grad: bool = True, return_log_prob: bool = False,
               key: Optional[jax.Array] = None, seed: Optional[int] = None):
        return self.sample_fn(self.params, resolve_key(key, seed), int(n), return_log_prob)

    # ---- training --------------------------------------------------------------
    def fit(self, x_train, **kwargs):
        from .train import fit as _fit

        return _fit(self, x_train, **kwargs)

    def variational_fit(self, target_log_prob, **kwargs):
        from .train import variational_fit as _vfit

        return _vfit(self, target_log_prob, **kwargs)
