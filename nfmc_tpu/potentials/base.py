"""Potential base class (parity with the external ``potentials.base.Potential``)."""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class Potential:
    """Negative unnormalized log-density ``U(x)``, batched over leading dims.

    Subclasses implement :meth:`compute` as a pure JAX function so that
    gradients come from one fused reverse-mode pass on device.
    """

    def __init__(self, event_shape: Sequence[int]):
        self.event_shape: Tuple[int, ...] = tuple(int(s) for s in event_shape)

    @property
    def event_size(self) -> int:
        size = 1
        for s in self.event_shape:
            size *= s
        return size

    def compute(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.compute(jnp.asarray(x))

    def sample(self, batch_shape: Sequence[int], key: Optional[jax.Array] = None) -> jax.Array:
        """Exact draws when available (used for ground-truth tests)."""
        raise NotImplementedError(f"{type(self).__name__} has no exact sampler")

    # Ground truth (when analytically available) for moment-accuracy tests.
    @property
    def mean(self) -> Optional[jax.Array]:
        return None

    @property
    def second_moment(self) -> Optional[jax.Array]:
        return None


class CallablePotential(Potential):
    """Wrap a plain batched callable ``U: (B,*event)->(B,)`` as a Potential."""

    def __init__(self, fn: Callable[[jax.Array], jax.Array], event_shape: Sequence[int]):
        super().__init__(event_shape)
        self._fn = fn

    def compute(self, x: jax.Array) -> jax.Array:
        return self._fn(x)


def as_potential(target, event_shape=None) -> Potential:
    if isinstance(target, Potential):
        return target
    if event_shape is None:
        raise ValueError("event_shape must be provided for a plain callable target")
    return CallablePotential(target, event_shape)
