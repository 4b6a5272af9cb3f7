"""Sample store with thinning / max_samples / last-sample semantics.

Parity with reference ``nfmc/algorithms/sampling/base.py:215-271``. Two
storage modes:

* host (default, reference parity): blocks are copied to numpy once per scan
  chunk — chain state in HBM stays minimal;
* on-device (``on_device=True``): blocks stay as device arrays. Essential
  when the host link is thin (e.g. a tunneled TPU) or when downstream
  consumers (flow training, diagnostics like ESS) run on device anyway —
  fetching only scalars instead of the full chain history.
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
        on_device: bool = False,
    ):
        self.event_shape: Tuple[int, ...] = tuple(event_shape)
        self.store_samples = store_samples
        self.thinning = int(thinning)
        self.max_samples = max_samples
        self.on_device = on_device
        self.last_sample = None  # (n_chains, *event)
        self.seen_samples = 0
        self._running: List = []  # host mode: per-iteration arrays; device mode: blocks
        self.n_samples = 0

    def __getitem__(self, index):
        # The last-ADDED state equals the last STORED sample only without
        # thinning (with thinning the final state of a block may be dropped,
        # and last_sample would disagree with as_tensor()[-1]).
        # ``last_sample is not None`` guard: on an empty store (zero
        # iterations ran) -1 must raise IndexError, not return None.
        if (
            self.thinning == 1
            and self.last_sample is not None
            and (index == -1 or (self.n_samples > 0 and index == self.n_samples - 1))
        ):
            return self.last_sample
        if not self.on_device:
            return self._running[index]
        # device mode: walk blocks
        if index < 0:
            index += self.n_samples
        for blk in self._running:
            if index < len(blk):
                return blk[index]
            index -= len(blk)
        raise IndexError(index)

    def add(self, x) -> None:
        """Add a `(n_chains, *event)` state or a `(k, n_chains, *event)` block."""
        ne = len(self.event_shape)
        if self.on_device:
            import jax.numpy as jnp

            x = jnp.asarray(x)
        else:
            x = as_numpy(x)
        if x.ndim == ne + 1 and tuple(x.shape[1:]) == self.event_shape:
            x = x[None]
        elif x.ndim == ne + 2 and tuple(x.shape[2:]) == self.event_shape:
            pass
        else:
            raise ValueError(
                f"Expected trailing dims {self.event_shape}, got shape {x.shape}"
            )

        if self.on_device:
            self.last_sample = x[-1]
        else:
            self.last_sample = np.array(x[-1], copy=True)

        if not self.store_samples:
            return  # seen_samples untouched, reference parity (``base.py:251-252``)

        idx = np.arange(self.seen_samples, self.seen_samples + len(x))
        kept_idx = np.nonzero(idx % self.thinning == 0)[0]
        self.seen_samples += len(x)
        if len(kept_idx) == 0:
            return

        if self.on_device:
            # With thinning=1 every row is kept — appending the block directly
            # avoids a full-chunk device gather (transient 2x HBM + one extra
            # host-issued op per chunk through the tunnel).
            self._running.append(x if len(kept_idx) == len(x) else x[kept_idx])
            self.n_samples += len(kept_idx)
            if self.max_samples is not None:
                while self.n_samples > self.max_samples:
                    excess = self.n_samples - self.max_samples
                    head = self._running[0]
                    if len(head) <= excess:
                        self._running.pop(0)
                        self.n_samples -= len(head)
                    else:
                        self._running[0] = head[excess:]
                        self.n_samples -= excess
        else:
            kept = x[kept_idx]
            self._running.extend(list(kept))
            self.n_samples += len(kept)
            if self.max_samples is not None and self.n_samples > self.max_samples:
                self._running = self._running[-self.max_samples :]
                self.n_samples = self.max_samples

    def as_tensor(self):
        if self.on_device:
            import jax.numpy as jnp

            return jnp.concatenate(self._running, axis=0)
        return np.stack(self._running, axis=0)

    def reset(self) -> None:
        self._running = []
        self.n_samples = 0
        # clear ALL store state: a stale last_sample would make store[-1]
        # return a pre-reset draw on an empty store, and a stale seen_samples
        # would continue the thinning phase instead of restarting it
        self.last_sample = None
        self.seen_samples = 0
