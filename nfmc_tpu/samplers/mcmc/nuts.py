"""No-U-Turn Sampler (native, multi-chain).

The reference delegates NUTS to Pyro and supports a single chain only
(``nfmc/algorithms/sampling/mcmc/nuts.py:38-51``; excluded from its tests at
``test/test_samplers.py:24``). This implementation is TPU-native and
multi-chain: an iterative tree doubling with a checkpoint stack for U-turn
detection (O(max_depth) memory), vectorized across chains, compiled into the
same chunked-scan driver as the other kernels.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ...utils import event_size_of
from .base import MetropolisKernel, MetropolisParameters, MetropolisSampler


@dataclass
class NUTSKernel(MetropolisKernel):
    max_tree_depth: int = 10
    step_size: float = 0.1

    def __repr__(self):
        return (
            f"log step: {math.log(self.step_size):.2f}, "
            f"max depth: {self.max_tree_depth}"
        )


@dataclass
class NUTSParameters(MetropolisParameters):
    max_delta_energy: float = 1000.0


class NUTS(MetropolisSampler):
    """Multi-chain NUTS; see :mod:`nfmc_tpu.samplers.mcmc.nuts_impl` for the tree builder."""

    def __init__(self, event_shape, target, kernel: Optional[NUTSKernel] = None,
                 params: Optional[NUTSParameters] = None):
        if kernel is None:
            kernel = NUTSKernel(event_size=event_size_of(event_shape))
        if params is None:
            params = NUTSParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "NUTS"

    def _static_config(self):
        return super()._static_config() + (
            self.kernel.max_tree_depth,
            self.params.max_delta_energy,
        )

    def _make_step(self, tuning: bool):
        """Custom step: the NUTS proposal is always the new state; dual
        averaging adapts on the trajectory-average accept statistic
        ``mean_leaves min(1, exp(-delta E))`` (the standard NUTS target), not
        on a move indicator; leapfrog counts are reported dynamically."""
        from ...core.driver import StepInfo
        from .nuts_impl import make_nuts_step

        nuts_step = make_nuts_step(
            self.target,
            self.event_shape,
            max_tree_depth=self.kernel.max_tree_depth,
            max_delta_energy=self.params.max_delta_energy,
        )
        update_kernel = self.make_update_kernel()

        def step(x, mstate, key):
            x_new, moved, diverged_any, accept_stat, n_leapfrog = nuts_step(
                x, mstate.step_size, mstate.inv_mass_diag, key
            )
            if tuning:
                mstate = update_kernel(mstate, x_new, accept_stat)
            info = StepInfo(
                n_accepted=jnp.sum(moved).astype(jnp.int32),
                diverged=diverged_any,
                n_calls=n_leapfrog,
                n_grads=n_leapfrog,
            )
            return x_new, mstate, info

        return step

    def calls_per_iter(self, n_chains: int) -> int:
        return 0  # dynamic: reported per trajectory via StepInfo.n_calls

    def grads_per_iter(self, n_chains: int) -> int:
        return 0
