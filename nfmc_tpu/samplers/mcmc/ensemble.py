"""Affine-invariant ensemble sampler (AIES, Goodman & Weare 2010 stretch
move) — a TPU-native superset sampler.

The reference has no ensemble sampler (its registry is Metropolis/HMC/slice
families only, ``nfmc/util.py:421-444``), but the stretch move is the one
classical gradient-free sampler whose *algorithm* is ensemble-vectorized by
construction: every walker proposes along the line through another walker,
``y = x_j + z (x_k - x_j)`` with ``z ~ g(z) \\propto 1/sqrt(z)`` on
``[1/a, a]``, accepted with probability ``min(1, z^{d-1} pi(y)/pi(x))``.
Affine invariance means no step size, no mass matrix, no gradients — the
sampler performs identically on any affine re-stretching of the target, which
is exactly the regime (badly scaled, correlated, gradient-free posteriors)
where the reference's MH with a diagonal preconditioner struggles.

TPU-native design: the classical serial walker loop is replaced by the
parallel two-half scheme (Foreman-Mackey et al. 2013, emcee): the ensemble
splits into complementary halves; each half moves *simultaneously* with
partners drawn from the frozen other half (detailed balance holds per
half-update). One iteration is therefore two fused ``(C/2)``-batch target
evaluations inside the jitted chunked scan — no per-walker loop exists at
any level. Per-iteration randomness (z-uniforms, partner indices, accept
uniforms) is state-independent and chunk-hoistable like every Metropolis
kernel here. The current-state potential ``U(x)`` rides in the scan carry, so
only proposals are evaluated (reported counters keep the eager 2B contract,
cf. reference ``mh.py:68-72``).

Warmup superset: the reference tunes nothing for gradient-free kernels
beyond ``inv_mass_diag`` (useless under affine invariance); AIES warmup
instead dual-averages ``log(a - 1)`` toward a 30% target acceptance (the
literature's healthy range for the stretch move), using the same Nesterov
machinery as the Metropolis family (reference ``tuning.py:7-41``).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.driver import StepInfo
from ...core.sampler import MCMCKernel, MCMCParameters
from ...core.tuning import DualAveragingParams, DualAveragingState, da_step
from ...utils import as_numpy
from .base import MCMCSampler


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AIESState:
    """Scan-carried numeric state: the stretch scale and its tuner."""

    a: jax.Array  # f32 scalar, > 1
    da: DualAveragingState  # dual averaging over log(a - 1)


@dataclass
class AIESKernel(MCMCKernel):
    """Tunable state: the stretch-scale ``a`` (Goodman & Weare's default 2)."""

    event_size: int = 0
    a: float = 2.0
    da_params: Optional[DualAveragingParams] = None

    def __post_init__(self):
        super().__post_init__()
        if not self.a > 1.0:
            raise ValueError(f"stretch scale a must be > 1, got {self.a}")
        if self.da_params is None:
            # 0.3 target: the stretch move's healthy acceptance band is
            # 0.2-0.5; the Metropolis default 0.651 over-shrinks a.
            self.da_params = DualAveragingParams(target_acceptance_rate=0.3)

    def make_state(self) -> AIESState:
        log_am1 = float(np.log(self.a - 1.0))
        return AIESState(
            a=jnp.asarray(self.a, dtype=jnp.float32),
            da=DualAveragingState(
                t=jnp.asarray(float(self.da_params.t0), dtype=jnp.float32),
                error_sum=jnp.asarray(0.0, dtype=jnp.float32),
                log_step_averaged=jnp.asarray(log_am1, dtype=jnp.float32),
                mu=jnp.asarray(log_am1 + np.log(10.0), dtype=jnp.float32),
            ),
        )

    def sync_from_state(self, state: AIESState) -> None:
        self.a = float(as_numpy(state.a))

    def __repr__(self):
        return f"a: {self.a:.2f}"


@dataclass
class AIESParameters(MCMCParameters):
    tune_stretch: bool = True


class AIES(MCMCSampler):
    """Affine-invariant ensemble sampler with the parallel stretch move.

    Requires ``n_chains >= 4`` (two non-degenerate halves) and works best with
    ``n_chains >= 2 * event_size`` (walkers must span the space — with fewer,
    proposals live in the ensemble's affine hull and mixing stalls; this is a
    property of the algorithm, not the implementation).
    """

    def __init__(self, event_shape, target, kernel: Optional[AIESKernel] = None,
                 params: Optional[AIESParameters] = None):
        if kernel is None:
            kernel = AIESKernel(event_size=int(np.prod(event_shape)))
        if params is None:
            params = AIESParameters()
        super().__init__(event_shape, target, kernel, params)

    @property
    def name(self):
        return "AIES"

    def _static_config(self):
        return (self.params.tune_stretch, self.rng_hoist_element_limit)

    # ---- RNG (chunk-hoistable; state-independent raw draws) ----------------
    def make_draws(self):
        def draws(key, n_chains):
            c0 = n_chains // 2
            c1 = n_chains - c0
            k_z, k_p0, k_p1, k_acc = jax.random.split(key, 4)
            z_u = jax.random.uniform(k_z, (n_chains,))
            idx0 = jax.random.randint(k_p0, (c0,), 0, c1)  # partners in half 1
            idx1 = jax.random.randint(k_p1, (c1,), 0, c0)  # partners in half 0
            log_u = jnp.log(jax.random.uniform(k_acc, (n_chains,)))
            return z_u, idx0, idx1, log_u

        return draws

    def _augment_state(self, astate: AIESState, x0):
        if x0.shape[0] < 4:
            raise ValueError(
                f"AIES needs n_chains >= 4 (two non-degenerate ensemble "
                f"halves); got {x0.shape[0]}"
            )
        return (astate, self.target(x0))

    def _make_step(self, tuning: bool):
        step_aux = self._make_step_aux(tuning)
        draws = self.make_draws()

        def step(x, state, key):
            return step_aux(x, state, key, draws(key, x.shape[0]))

        return step

    def _make_step_aux(self, tuning: bool):
        target = self.target
        event_shape = self.event_shape
        event_ndim = len(event_shape)
        d = self.event_size
        tune = tuning and self.params.tune_stretch
        da_params = self.kernel.da_params

        def half_move(xs_move, u_move, partners, z_u, log_u, a):
            """Stretch-move one half against a frozen partner pool."""
            # z ~ g(z) \propto 1/sqrt(z) on [1/a, a] via inverse CDF:
            # z = ((a-1) u + 1)^2 / a
            z = ((a - 1.0) * z_u + 1.0) ** 2 / a  # (h,)
            zb = z.reshape(z.shape + (1,) * event_ndim)
            y = partners + zb * (xs_move - partners)
            finite = jnp.all(jnp.isfinite(y.reshape(y.shape[0], -1)), axis=-1)
            u_y = target(y)
            # log alpha = (d-1) log z + log pi(y) - log pi(x); log pi = -U
            log_ratio = (d - 1.0) * jnp.log(z) + (u_move - u_y)
            mask = (log_u < log_ratio) & finite & jnp.isfinite(u_y)
            bmask = mask.reshape(mask.shape + (1,) * event_ndim)
            x_new = jnp.where(bmask, y, xs_move)
            u_new = jnp.where(mask, u_y, u_move)
            diverged = ~jnp.all(finite & jnp.isfinite(u_y))
            return x_new, u_new, mask, diverged

        def step(x, state, key, aux):
            astate, u = state
            z_u, idx0, idx1, log_u = aux
            c0 = idx0.shape[0]
            a = astate.a

            x0h, x1h = x[:c0], x[c0:]
            u0h, u1h = u[:c0], u[c0:]

            # half 0 moves against frozen half 1, then half 1 against the
            # UPDATED half 0 (the two-half scheme's sequential dependency is
            # what preserves detailed balance).
            x0h, u0h, m0, d0 = half_move(
                x0h, u0h, x1h[idx0], z_u[:c0], log_u[:c0], a
            )
            x1h, u1h, m1, d1 = half_move(
                x1h, u1h, x0h[idx1], z_u[c0:], log_u[c0:], a
            )

            x_new = jnp.concatenate([x0h, x1h], axis=0)
            u_new = jnp.concatenate([u0h, u1h], axis=0)
            mask = jnp.concatenate([m0, m1], axis=0)

            if tune:
                acc_rate = jnp.mean(mask.astype(jnp.float32))
                da = da_step(
                    astate.da, da_params.target_acceptance_rate - acc_rate, da_params
                )
                astate = AIESState(a=1.0 + jnp.exp(da.log_step_averaged), da=da)

            info = StepInfo(
                n_accepted=jnp.sum(mask).astype(jnp.int32),
                diverged=(d0 | d1).astype(jnp.int32),
            )
            return x_new, (astate, u_new), info

        return step

    # Counter contract: eager evaluates current + proposal per walker per
    # iteration (the current-state potential is carried here, but counters
    # report the eager contract like MH, reference ``mh.py:68-72``).
    def calls_per_iter(self, n_chains: int) -> int:
        return 2 * n_chains

    def grads_per_iter(self, n_chains: int) -> int:
        return 0
