"""Host-side sample store with thinning / max_samples / last-sample semantics.

Parity with reference ``nfmc/algorithms/sampling/base.py:215-271``. Samples are
streamed off-device once per scan chunk (a `(k, n_chains, *event)` block) and
kept as numpy on host RAM, so HBM holds only the live chain state.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils import as_numpy


class MCMCSamples:
    def __init__(
        self,
        event_shape: Sequence[int],
        store_samples: bool = True,
        thinning: int = 1,
        max_samples: Optional[int] = None,
    ):
        self.event_shape: Tuple[int, ...] = tuple(event_shape)
        self.store_samples = store_samples
        self.thinning = int(thinning)
        self.max_samples = max_samples
        self.last_sample: Optional[np.ndarray] = None  # (n_chains, *event)
        self.seen_samples = 0
        self._running: List[np.ndarray] = []
        self.n_samples = 0

    def __getitem__(self, index):
        if index == -1 or index == self.n_samples - 1:
            return self.last_sample
        return self._running[index]

    def add(self, x) -> None:
        """Add a `(n_chains, *event)` state or a `(k, n_chains, *event)` block."""
        x = as_numpy(x)
        ne = len(self.event_shape)
        if x.ndim == ne + 1 and x.shape[1:] == self.event_shape:
            x = x[None]
        elif x.ndim == ne + 2 and x.shape[2:] == self.event_shape:
            pass
        else:
            raise ValueError(
                f"Expected trailing dims {self.event_shape}, got shape {x.shape}"
            )

        self.last_sample = np.array(x[-1], copy=True)

        if not self.store_samples:
            return

        idx = np.arange(self.seen_samples, self.seen_samples + len(x))
        thinning_mask = (idx % self.thinning) == 0
        self.seen_samples += len(x)

        kept = x[thinning_mask]
        self._running.extend(list(kept))
        self.n_samples += len(kept)

        if self.max_samples is not None and self.n_samples > self.max_samples:
            self._running = self._running[-self.max_samples:]
            self.n_samples = self.max_samples

    def as_tensor(self) -> np.ndarray:
        return np.stack(self._running, axis=0)

    def reset(self) -> None:
        self._running = []
        self.n_samples = 0
