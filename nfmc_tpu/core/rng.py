"""Explicit-key RNG discipline with a torch-like global convenience seed.

The reference relies on ``torch.manual_seed`` (global state). JAX requires
explicit key threading inside jitted code; this module provides the bridge:
samplers draw fresh keys from a process-global stream that tests can pin with
:func:`set_seed`, while all in-jit code receives keys explicitly.
"""
from __future__ import annotations

from typing import Optional

import jax


class _GlobalKeyStream:
    """Lazy: the key materializes on FIRST use, not at import — a module-level
    ``jax.random.key`` would initialize the JAX backend (and lock the
    platform) the moment ``import nfmc_tpu`` runs, before user code can apply
    the ``jax.config.update("jax_platforms", ...)`` override (CLAUDE.md)."""

    def __init__(self, seed: int = 0):
        self._seed = seed
        self._key = None

    def set_seed(self, seed: int) -> None:
        self._seed = seed
        self._key = None

    def next_key(self) -> jax.Array:
        if self._key is None:
            self._key = jax.random.key(self._seed)
        self._key, sub = jax.random.split(self._key)
        return sub


_STREAM = _GlobalKeyStream()


def set_seed(seed: int) -> None:
    """Pin the global RNG stream (analogue of ``torch.manual_seed``)."""
    _STREAM.set_seed(seed)


def next_key() -> jax.Array:
    return _STREAM.next_key()


def resolve_key(key: Optional[jax.Array] = None, seed: Optional[int] = None) -> jax.Array:
    if key is not None:
        return key
    if seed is not None:
        return jax.random.key(seed)
    return next_key()
