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
        """(n_stored, n_chains, *event); None when not storing (reference ``base.py:293-297``)
        or when zero draws were stored (e.g. a time limit expired before the
        first chunk) — callers uniformly guard with ``is not None``."""
        if not self.store_samples or self.running_samples.n_samples == 0:
            return None
        return self.running_samples.as_tensor()

    def resample(self, n: int, seed: int = 0) -> np.ndarray:
        samples = self.samples
        if samples is None:
            raise ValueError(
                "no stored samples (store_samples=False or empty run) — "
                "resample needs the chain history"
            )
        flat = samples.reshape(-1, *self.event_shape)
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

    def effective_sample_size(self, max_window: int = 8192, dim_slab: int = 25,
                              return_extrapolation: bool = False):
        """Per-dimension ESS (summed over chains) of the stored draws, shape
        ``(event_size,)``; computed on device (``nfmc_tpu.diagnostics``).
        Requires stored samples. A capability the reference lacks.

        Long histories are estimated on a trailing ``max_window`` of draws and
        extrapolated linearly in the draw count (TPU FFT compile time blows up
        at nfft >= 64k, and for any chain whose autocorrelation time is well
        under the window ESS is linear in n); the event dimension is processed
        in ``dim_slab`` slabs to bound the FFT pad-buffer footprint.

        The linear-in-n assumption overestimates ESS for chains whose
        autocorrelation time is comparable to the window. Pass
        ``return_extrapolation=True`` to get ``(ess, factor)`` where
        ``factor = n_total / n_window`` (1.0 means no extrapolation was
        applied); the un-extrapolated window ESS is ``ess / factor``."""
        from ..diagnostics import effective_sample_size

        # delegate windowing/slabbing entirely: wrapping another window around
        # the diagnostics call would silently re-cap at ITS default and apply
        # a hidden second extrapolation (round-3 review fix)
        chains = self._stored_chains()
        ess = effective_sample_size(chains, max_window=max_window,
                                    dim_slab=dim_slab)
        if return_extrapolation:
            n = chains.shape[0]
            factor = 1.0 if max_window is None else n / min(max_window, n)
            return ess, factor
        return ess

    def potential_scale_reduction(self):
        """Per-dimension split-R-hat of the stored draws, shape ``(event_size,)``."""
        from ..diagnostics import potential_scale_reduction

        return potential_scale_reduction(self._stored_chains())

    def summary(self, max_dims: int = 10) -> str:
        """Stan/ArviZ-style posterior summary table (superset; the reference
        exposes only raw counters): per-dimension mean, sd, central 90%
        interval, ESS and split-R-hat of the stored draws, plus the run's
        throughput counters. Returns the formatted string (print it)."""
        import numpy as np

        from ..diagnostics import (effective_sample_size,
                                   potential_scale_reduction)

        # materialize the chain history ONCE: going through the self.*
        # convenience methods would re-concatenate (and, with on_device
        # stores, re-fetch through the slow tunnel) the same history three
        # times (round-3 review fix)
        chains_dev = self._stored_chains()  # (K, C, d), device
        ess = np.asarray(effective_sample_size(chains_dev))
        try:
            rhat = np.asarray(potential_scale_reduction(chains_dev))
        except ValueError:
            rhat = None  # short run (< 4 stored draws): degrade, don't crash
        chains = np.asarray(chains_dev)
        d = chains.shape[-1]
        flat = chains.reshape(-1, d)
        mean = flat.mean(axis=0)
        sd = flat.std(axis=0)
        q5, q95 = np.percentile(flat, [5.0, 95.0], axis=0)

        shown = min(d, max_dims)
        lines = [
            f"{'dim':>4}  {'mean':>9}  {'sd':>9}  {'5%':>9}  {'95%':>9}"
            f"  {'ess':>9}  {'r_hat':>6}"
        ]
        for i in range(shown):
            rh = f"{rhat[i]:>6.3f}" if rhat is not None else f"{'n/a':>6}"
            lines.append(
                f"{i:>4}  {mean[i]:>9.3f}  {sd[i]:>9.3f}  {q5[i]:>9.3f}"
                f"  {q95[i]:>9.3f}  {ess[i]:>9.0f}  {rh}"
            )
        if d > shown:
            lines.append(f"... ({d - shown} more dimensions)")
        st = self.statistics
        rhat_txt = f"{rhat.max():.3f}" if rhat is not None else "n/a"
        lines.append(
            f"draws: {chains.shape[0]} x {chains.shape[1]} chains | "
            f"accept {float(st.acceptance_rate):.3f} | "
            f"divergences {int(st.n_divergences)} | "
            f"max r_hat {rhat_txt} | min ess {ess.min():.0f}"
        )
        return "\n".join(lines)

    @property
    def mean(self):
        return self.statistics.running_first_moment

    @property
    def variance(self):
        return self.statistics.running_variance

    @property
    def second_moment(self):
        return self.statistics.running_second_moment


class JumpNFMCOutput(MCMCOutput):
    def __init__(self, event_shape, **kwargs):
        kwargs["statistics"] = kwargs.get("statistics") or JumpNFMCStatistics(tuple(event_shape))
        super().__init__(event_shape, **kwargs)
