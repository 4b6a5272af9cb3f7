"""Host-side statistics: counters + streaming moments.

Field-for-field parity with reference ``nfmc/algorithms/sampling/base.py:64-212``
(``MCMCExpectation``, ``MCMCExpectationDict``, ``MCMCStatistics``), with one
TPU-native difference: per-iteration values are accumulated *inside* the jitted
scan as Neumaier-compensated f32 sums carried on device (so precision stays
O(eps) even when a pipelined run flushes only once at the end) and folded into
these host objects in float64 at each flush — per chunk under a live progress
bar, once per run otherwise — instead of a Python-level update per iteration.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from ..utils import as_numpy


@dataclass
class MCMCExpectation:
    """Streaming E[f(x)] over (iterations x chains); reference ``base.py:64-102``."""

    event_shape: Tuple[int, ...]
    f: Callable = lambda v: v
    n_seen: int = 0
    running_value: np.ndarray | float = 0.0

    def update(self, x) -> None:
        x = as_numpy(x)
        if x.ndim == len(self.event_shape) + 1:
            x = x[None]
        elif x.ndim != len(self.event_shape) + 2:
            raise ValueError(f"bad shape {x.shape} for event {self.event_shape}")
        n_new = x.shape[0] * x.shape[1]
        mean_new = np.mean(self.f(x.astype(np.float64)), axis=(0, 1))
        total = self.n_seen + n_new
        self.running_value = (
            self.n_seen / total * self.running_value + n_new / total * mean_new
        )
        self.n_seen = total

    def update_from_sums(self, value_sum: np.ndarray, n_new: int) -> None:
        """Fold in a pre-reduced sum of f(x) over (iterations x chains).

        This is the fast path fed by in-scan accumulators: the device only
        ships one event-shaped array per chunk instead of every sample.
        """
        if n_new == 0:
            return
        total = self.n_seen + n_new
        mean_new = np.asarray(value_sum, dtype=np.float64) / n_new
        self.running_value = (
            self.n_seen / total * self.running_value + n_new / total * mean_new
        )
        self.n_seen = total

    def reset(self) -> None:
        self.n_seen = 0
        self.running_value = 0.0

    def as_tensor(self):
        return np.asarray(self.running_value, dtype=np.float64)


class MCMCExpectationDict:
    """Dict of expectations with a shared data transform; reference ``base.py:105-123``."""

    def __init__(self, expectations: Dict[str, MCMCExpectation], data_transform: Callable = lambda v: v):
        self.expectations = expectations
        self.data_transform = data_transform

    def update(self, x) -> None:
        x_t = self.data_transform(x)
        for exp in self.expectations.values():
            exp.update(x_t)

    def reset(self) -> None:
        for exp in self.expectations.values():
            exp.reset()

    def as_tensor(self):
        return {k: v.as_tensor() for k, v in self.expectations.items()}

    def __getitem__(self, key):
        return self.expectations[key]


@dataclass
class MCMCStatistics:
    """Counters + built-in first/second moment expectations.

    Parity with reference ``base.py:126-212`` including the counter-increment
    contract (SURVEY.md section 2.8) and derived rates.
    """

    event_shape: Tuple[int, ...]
    n_accepted_trajectories: int = 0
    n_attempted_trajectories: int = 0
    n_divergences: int = 0
    n_target_gradient_calls: int = 0
    n_target_calls: int = 0
    elapsed_time_seconds: float = 0.0
    data_transform: Callable = field(default=lambda v: v)
    expectations: Optional[MCMCExpectationDict] = None

    def __post_init__(self):
        self.event_shape = tuple(self.event_shape)
        if self.expectations is None:
            self.expectations = MCMCExpectationDict(
                {
                    "first_moment": MCMCExpectation(self.event_shape, f=lambda v: v),
                    "second_moment": MCMCExpectation(self.event_shape, f=lambda v: v**2),
                },
                data_transform=self.data_transform,
            )

    def update_counters(
        self,
        n_accepted_trajectories: int = 0,
        n_attempted_trajectories: int = 0,
        n_divergences: int = 0,
        n_target_gradient_calls: int = 0,
        n_target_calls: int = 0,
    ) -> None:
        self.n_accepted_trajectories += int(n_accepted_trajectories)
        self.n_attempted_trajectories += int(n_attempted_trajectories)
        self.n_divergences += int(n_divergences)
        self.n_target_gradient_calls += int(n_target_gradient_calls)
        self.n_target_calls += int(n_target_calls)

    def update_moments_from_sums(self, sum_x, sum_x2, n_seen: int) -> None:
        """Fast path for in-scan accumulated moment sums."""
        self.expectations["first_moment"].update_from_sums(as_numpy(sum_x), n_seen)
        self.expectations["second_moment"].update_from_sums(as_numpy(sum_x2), n_seen)

    def update_elapsed_time(self, delta_time_seconds: float) -> None:
        self.elapsed_time_seconds += float(delta_time_seconds)

    @property
    def running_first_moment(self):
        return self.expectations["first_moment"].as_tensor()

    @property
    def running_second_moment(self):
        return self.expectations["second_moment"].as_tensor()

    @property
    def running_variance(self):
        # clamp: E[x^2] - E[x]^2 under f32 accumulation can cancel to a small
        # negative for near-constant dims at large magnitude; downstream
        # consumers feed this into sqrt (ESS proposal Cholesky)
        var = self.running_second_moment - self.running_first_moment**2
        return np.maximum(var, 0.0)

    @property
    def acceptance_rate(self) -> float:
        if self.n_attempted_trajectories == 0:
            return math.nan
        return self.n_accepted_trajectories / self.n_attempted_trajectories

    @property
    def calls_per_second(self) -> float:
        if self.elapsed_time_seconds > 0:
            return self.n_target_calls / self.elapsed_time_seconds
        return math.nan

    @property
    def grads_per_second(self) -> float:
        if self.elapsed_time_seconds > 0:
            return self.n_target_gradient_calls / self.elapsed_time_seconds
        return math.nan

    def __repr__(self) -> str:
        return (
            f"acc-rate: {self.acceptance_rate:.2f}, "
            f"kcalls/s: {self.calls_per_second / 1000:.2f}, "
            f"kgrads/s: {self.grads_per_second / 1000:.2f}, "
            f"divergences: {self.n_divergences}"
        )

    def as_dict(self) -> dict:
        return {
            "n_accepted_trajectories": self.n_accepted_trajectories,
            "n_attempted_trajectories": self.n_attempted_trajectories,
            "n_divergences": self.n_divergences,
            "n_target_gradient_calls": self.n_target_gradient_calls,
            "n_target_calls": self.n_target_calls,
            "elapsed_time_seconds": self.elapsed_time_seconds,
            "grads_per_second": self.grads_per_second,
            "acceptance_rate": self.acceptance_rate,
            "calls_per_second": self.calls_per_second,
        }


@dataclass
class JumpNFMCStatistics(MCMCStatistics):
    """Adds jump counters; reference ``nfmc/jump.py:41-73``."""

    n_accepted_jumps: int = 0
    n_attempted_jumps: int = 0

    @property
    def jump_acceptance_rate(self) -> float:
        if self.n_attempted_jumps == 0:
            return math.nan
        return self.n_accepted_jumps / self.n_attempted_jumps

    def update_counters(self, *, n_accepted_jumps: int = 0, n_attempted_jumps: int = 0, **kwargs) -> None:
        # keyword-only: positionally these slots are trajectory counters on the
        # base class; silently repurposing them would corrupt acceptance_rate
        super().update_counters(**kwargs)
        self.n_accepted_jumps += int(n_accepted_jumps)
        self.n_attempted_jumps += int(n_attempted_jumps)

    def __repr__(self) -> str:
        return (
            f"MCMC acc-rate: {self.acceptance_rate:.2f}, "
            f"Jump acc-rate: {self.jump_acceptance_rate:.2f}, "
            f"kcalls/s: {self.calls_per_second / 1000:.2f}, "
            f"kgrads/s: {self.grads_per_second / 1000:.2f}, "
            f"divergences: {self.n_divergences}"
        )

    def as_dict(self) -> dict:
        return {**super().as_dict(), "jump_acceptance_rate": self.jump_acceptance_rate}


@dataclass
class PTStatistics(MCMCStatistics):
    """Adds replica-exchange swap counters (superset — the reference has no
    tempering; see ``nfmc_tpu/samplers/mcmc/pt.py``). The trajectory counters
    cover the cold rung (what the user consumes); swap counters aggregate all
    ladder edges."""

    n_accepted_swaps: int = 0
    n_attempted_swaps: int = 0

    @property
    def swap_acceptance_rate(self) -> float:
        if self.n_attempted_swaps == 0:
            return math.nan
        return self.n_accepted_swaps / self.n_attempted_swaps

    def update_counters(self, *, n_accepted_swaps: int = 0, n_attempted_swaps: int = 0, **kwargs) -> None:
        # keyword-only (see JumpNFMCStatistics.update_counters)
        super().update_counters(**kwargs)
        self.n_accepted_swaps += int(n_accepted_swaps)
        self.n_attempted_swaps += int(n_attempted_swaps)

    def __repr__(self) -> str:
        return (
            f"cold acc-rate: {self.acceptance_rate:.2f}, "
            f"swap acc-rate: {self.swap_acceptance_rate:.2f}, "
            f"kcalls/s: {self.calls_per_second / 1000:.2f}, "
            f"kgrads/s: {self.grads_per_second / 1000:.2f}, "
            f"divergences: {self.n_divergences}"
        )

    def as_dict(self) -> dict:
        return {**super().as_dict(), "swap_acceptance_rate": self.swap_acceptance_rate}
