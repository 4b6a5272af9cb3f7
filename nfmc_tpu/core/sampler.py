"""Sampler base classes and kernel/parameter config dataclasses.

Parity with reference ``nfmc/algorithms/sampling/base.py:9-61,317-348``.
Kernels here are *user-facing config* objects; the scan-carried numeric state
is a separate registered pytree owned by each sampler (the reference mutates
the kernel dataclass in place instead — that pattern can't cross jit).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np

from ..utils import event_size_of
from .output import MCMCOutput
from .rng import resolve_key


@dataclass
class MCMCKernel:
    """Base tunable-state config; reference ``base.py:9-15``."""

    def __post_init__(self):
        pass


@dataclass
class MCMCParameters:
    """Run configuration; reference ``base.py:29-43``."""

    n_iterations: int = 100
    n_warmup_iterations: int = 100
    tuning: bool = False
    store_samples: bool = True
    # TPU-native extension: keep stored samples as device arrays instead of
    # streaming to host per chunk (critical when the host link is slow; see
    # core/samples.py). Reference-parity default is host storage.
    store_samples_on_device: bool = False
    # TPU-native extension: lax.scan unroll factor for the chunked hot loop.
    # Small-chain workloads are scan-overhead-bound (a (100,100) MALA step's
    # arithmetic is ~us; the TPU scan loop adds tens of us per iteration) —
    # unrolling emits N step bodies per loop iteration so XLA fuses across
    # them. Pure scheduling hint: results are bit-identical. Costs linearly
    # larger programs (compile time), so default off.
    scan_unroll: int = 1

    def __post_init__(self):
        pass

    def tuning_mode(self):
        self.tuning = True

    def sampling_mode(self):
        self.tuning = False


def _default_flow(event_shape):
    # Imported lazily to avoid a cycle (flows import core utils).
    from ..flows import Flow, RealNVP

    return Flow(RealNVP(event_shape))


@dataclass
class NFMCKernel(MCMCKernel):
    """Kernel holding a normalizing flow; reference ``base.py:18-26``."""

    event_shape: Tuple[int, ...] = ()
    flow: Any = None

    def __post_init__(self):
        super().__post_init__()
        self.event_shape = tuple(self.event_shape)
        if self.flow is None:
            self.flow = _default_flow(self.event_shape)


@dataclass
class NFMCParameters(MCMCParameters):
    """Reference ``base.py:46-61``."""

    train_pct: float = 0.7
    max_train_size: int = 4096
    max_val_size: int = 4096
    flow_fit_kwargs: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        super().__post_init__()
        if self.flow_fit_kwargs is None:
            self.flow_fit_kwargs = {
                "early_stopping": True,
                "early_stopping_threshold": 50,
                "batch_size": "adaptive",
                "show_progress": False,
            }


class Sampler:
    """Abstract sampler; reference ``base.py:317-348``.

    ``warmup``/``sample`` additionally accept an optional explicit PRNG
    ``key``/``seed`` (JAX RNG discipline); when omitted, keys come from the
    global stream pinned by :func:`nfmc_tpu.set_seed`.
    """

    def __init__(
        self,
        event_shape: Union[Tuple[int, ...], list],
        target,
        kernel: MCMCKernel,
        params: MCMCParameters,
    ):
        self.event_shape = tuple(event_shape)
        self.target = target
        self.kernel = kernel
        self.params = params
        self.event_size = event_size_of(self.event_shape)

    @property
    def name(self) -> str:
        return "Generic sampler"

    def _key(self, key=None, seed=None) -> jax.Array:
        return resolve_key(key, seed)

    def _memo(self, slot: str, config, factory, keepalive=()):
        """Memoize an expensive build (jitted closures, drivers) across
        ``sample()`` calls. ``config`` (a tuple of plain comparable tokens)
        must capture everything the built object bakes in as closure
        constants — anything threaded as an argument, e.g. flow params, need
        not appear. Pass the objects behind any ``id(...)`` tokens in
        ``keepalive`` so the ids cannot be recycled while the entry lives."""
        cfg_attr = f"_{slot}_cfg"
        if getattr(self, cfg_attr, None) != config:
            setattr(self, f"_{slot}_val", factory())
            setattr(self, cfg_attr, config)
            setattr(self, f"_{slot}_refs", keepalive)
        return getattr(self, f"_{slot}_val")

    def _cached_driver(self, config, factory, keepalive=()):
        """Memoize a ChunkedScanDriver across ``sample()`` calls — a fresh
        driver per call means fresh ``jax.jit`` closures, so every chunk
        length re-traces mid-run (a multi-second tax)."""
        return self._memo("driver_cache", config, factory, keepalive)

    def warmup(
        self,
        x0,
        show_progress: bool = True,
        time_limit_seconds: Optional[float] = None,
        key: Optional[jax.Array] = None,
        seed: Optional[int] = None,
    ) -> MCMCOutput:
        raise NotImplementedError

    def sample(
        self,
        x0,
        show_progress: bool = True,
        time_limit_seconds: Optional[float] = None,
        key: Optional[jax.Array] = None,
        seed: Optional[int] = None,
    ) -> MCMCOutput:
        raise NotImplementedError

    def sample_continue(self, x0, **kwargs) -> MCMCOutput:
        """Continue an existing chain from ``x0`` = a previous run's
        ``running_samples.last_sample``.

        For most samplers this is exactly :meth:`sample`; samplers whose
        ``sample`` applies entry semantics to ``x0`` that must NOT repeat on
        a continuation override it (ESS redraws x0 from the prior, TESS
        treats x0 as latent while emitting data-space draws, DLMC applies a
        one-off init gradient step, NeuTra may transport a data-space x0).
        Used by :func:`nfmc_tpu.checkpoint.sample_resumable` for every
        segment after the first, so segmented/checkpointed runs follow the
        same chain law as uninterrupted ones."""
        return self.sample(x0, **kwargs)
