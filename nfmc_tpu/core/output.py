"""MCMCOutput: bundles samples, statistics and the (tuned) kernel.

Parity with reference ``nfmc/algorithms/sampling/base.py:274-314`` and
``JumpNFMCOutput`` at ``nfmc/jump.py:76-82``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .samples import MCMCSamples
from .statistics import JumpNFMCStatistics, MCMCStatistics


class MCMCOutput:
    def __init__(
        self,
        event_shape: Sequence[int],
        running_samples: Optional[MCMCSamples] = None,
        statistics: Optional[MCMCStatistics] = None,
        kernel=None,
        store_samples: bool = True,
        max_samples: Optional[int] = None,
        on_device: bool = False,
    ):
        self.event_shape = tuple(event_shape)
        self.store_samples = store_samples
        self.max_samples = max_samples
        self.running_samples = running_samples or MCMCSamples(
            self.event_shape, store_samples=store_samples, max_samples=max_samples,
            on_device=on_device,
        )
        self.statistics = statistics or MCMCStatistics(self.event_shape)
        self.kernel = kernel

    @property
    def samples(self) -> Optional[np.ndarray]:
        """(n_stored, n_chains, *event); None when not storing (reference ``base.py:293-297``)."""
        if not self.store_samples:
            return None
        return self.running_samples.as_tensor()

    def resample(self, n: int, seed: int = 0) -> np.ndarray:
        flat = self.samples.reshape(-1, *self.event_shape)
        rng = np.random.default_rng(seed)
        idx = rng.integers(low=0, high=len(flat), size=(n,))
        return flat[idx]

    def _stored_chains(self):
        if not self.store_samples or self.running_samples.n_samples == 0:
            raise ValueError(
                "no stored samples (store_samples=False or empty run) — "
                "diagnostics need the chain history"
            )
        import jax.numpy as jnp

        s = self.running_samples.as_tensor()
        return jnp.asarray(s).reshape(s.shape[0], s.shape[1], -1)

    def effective_sample_size(self):
        """Per-dimension ESS (summed over chains) of the stored draws, shape
        ``(event_size,)``; computed on device (``nfmc_tpu.diagnostics``).
        Requires stored samples. A capability the reference lacks."""
        from ..diagnostics import effective_sample_size

        return effective_sample_size(self._stored_chains())

    def potential_scale_reduction(self):
        """Per-dimension split-R-hat of the stored draws, shape ``(event_size,)``."""
        from ..diagnostics import potential_scale_reduction

        return potential_scale_reduction(self._stored_chains())

    @property
    def mean(self):
        return self.statistics.running_first_moment

    @property
    def variance(self):
        return self.statistics.running_second_moment - self.statistics.running_first_moment**2

    @property
    def second_moment(self):
        return self.statistics.running_second_moment


class JumpNFMCOutput(MCMCOutput):
    def __init__(self, event_shape, **kwargs):
        kwargs["statistics"] = kwargs.get("statistics") or JumpNFMCStatistics(tuple(event_shape))
        super().__init__(event_shape, **kwargs)
