"""Step-size dual averaging + train/val splitting.

Dual averaging follows the reference constants (``nfmc/algorithms/sampling/
tuning.py:7-41``): target acceptance 0.651, kappa 0.75, gamma 0.05, t0 10 —
but the state lives in a pytree updated *inside* the jitted scan rather than a
Python object mutated per iteration.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DualAveragingParams:
    target_acceptance_rate: float = 0.651
    kappa: float = 0.75
    gamma: float = 0.05
    t0: int = 10


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DualAveragingState:
    """Scan-carried dual-averaging state (all f32 scalars)."""

    t: jax.Array
    error_sum: jax.Array
    log_step_averaged: jax.Array
    mu: jax.Array


def da_init(initial_step_size: float, params: DualAveragingParams) -> DualAveragingState:
    return DualAveragingState(
        t=jnp.asarray(float(params.t0), dtype=jnp.float32),
        error_sum=jnp.asarray(0.0, dtype=jnp.float32),
        log_step_averaged=jnp.asarray(math.log(initial_step_size), dtype=jnp.float32),
        mu=jnp.asarray(math.log(10.0 * initial_step_size), dtype=jnp.float32),
    )


def da_step(state: DualAveragingState, acceptance_rate_error: jax.Array, params: DualAveragingParams) -> DualAveragingState:
    error_sum = state.error_sum + acceptance_rate_error
    log_step = state.mu - error_sum / (jnp.sqrt(state.t) * params.gamma)
    eta = state.t ** (-params.kappa)
    log_step_averaged = eta * log_step + (1.0 - eta) * state.log_step_averaged
    return DualAveragingState(
        t=state.t + 1.0,
        error_sum=error_sum,
        log_step_averaged=log_step_averaged,
        mu=state.mu,
    )


def da_update_step_size(da: DualAveragingState, acceptance_rate: jax.Array,
                        params: DualAveragingParams):
    """One dual-averaging update from an observed acceptance rate; returns
    (new_da, new_step_size). Shared by the Metropolis family and ChEES."""
    da = da_step(da, params.target_acceptance_rate - acceptance_rate, params)
    return da, jnp.exp(da.log_step_averaged)


def ema_inv_mass_diag(inv_mass_diag: jax.Array, x_flat: jax.Array,
                      adjustment: float) -> jax.Array:
    """EMA of per-dimension chain variance into the inverse mass diagonal
    (reference ``mcmc/base.py:150-155``). ``x_flat``: (chains, event_size)."""
    var = jnp.var(x_flat, axis=0)
    return adjustment * var + (1.0 - adjustment) * inv_mass_diag


def da_value(state: DualAveragingState) -> jax.Array:
    return jnp.exp(state.log_step_averaged)


def train_val_split(
    x: np.ndarray,
    train_pct: float,
    max_train_size: int,
    max_val_size: int,
    shuffle: bool = True,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten `(K, C, *event) -> (K*C, *event)`, shuffle, split, cap.

    Host-side (numpy) — parity with reference ``tuning.py:44-65``; feeds flow
    training which re-device-puts the result.
    """
    x = np.asarray(x)
    flat = x.reshape(-1, *x.shape[2:]) if x.ndim > 2 else x
    if shuffle:
        rng = np.random.default_rng(seed)
        flat = flat[rng.permutation(len(flat))]
    n_train = int(train_pct * len(flat))
    x_train, x_val = flat[:n_train], flat[n_train:]
    return x_train[:max_train_size], x_val[:max_val_size]
