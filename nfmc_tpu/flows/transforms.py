"""Elementwise invertible transforms shared by coupling and masked flows.

Each transform maps a tensor of values elementwise given ``n_params_per_dim``
raw conditioner outputs per value, returning per-element log-dets. Transforms
are pure and direction-symmetric in cost, so coupling layers are equally fast
in density evaluation and sampling.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .spline import rational_quadratic_spline


class AffineTransform:
    """z = (x - shift) * exp(-log_scale); soft-clamped log-scale.

    The soft clamp ``c * tanh(raw / c)`` bounds |log_scale| <= c smoothly,
    which keeps reverse-KL warmups and MLE on outlier-heavy chain history
    stable (the reference relies on torch ValueError + rollback instead).
    """

    n_params_per_dim = 2

    def __init__(self, clamp: float = 3.0):
        self.clamp = float(clamp)

    def _split(self, raw):
        shift = raw[..., 0]
        log_scale = self.clamp * jnp.tanh(raw[..., 1] / self.clamp)
        return shift, log_scale

    def forward(self, x, raw) -> Tuple[jax.Array, jax.Array]:
        shift, log_scale = self._split(raw)
        return (x - shift) * jnp.exp(-log_scale), -log_scale

    def inverse(self, z, raw) -> Tuple[jax.Array, jax.Array]:
        shift, log_scale = self._split(raw)
        return z * jnp.exp(log_scale) + shift, log_scale


class ShiftTransform:
    """Additive-only coupling (NICE): z = x - shift, log-det 0."""

    n_params_per_dim = 1

    def forward(self, x, raw):
        return x - raw[..., 0], jnp.zeros_like(x)

    def inverse(self, z, raw):
        return z + raw[..., 0], jnp.zeros_like(z)


class RQSplineTransform:
    """Monotone rational-quadratic spline (Durkan et al. 2019) with linear tails."""

    def __init__(self, n_bins: int = 8, tail_bound: float = 5.0):
        self.n_bins = int(n_bins)
        self.tail_bound = float(tail_bound)

    @property
    def n_params_per_dim(self) -> int:
        return 3 * self.n_bins - 1

    def forward(self, x, raw):
        return rational_quadratic_spline(
            x, raw, inverse=False, n_bins=self.n_bins, tail_bound=self.tail_bound
        )

    def inverse(self, z, raw):
        return rational_quadratic_spline(
            z, raw, inverse=True, n_bins=self.n_bins, tail_bound=self.tail_bound
        )


class LRSplineTransform:
    """Monotone linear-rational spline (Dolatabadi et al. 2020) with linear tails."""

    def __init__(self, n_bins: int = 8, tail_bound: float = 5.0):
        self.n_bins = int(n_bins)
        self.tail_bound = float(tail_bound)

    @property
    def n_params_per_dim(self) -> int:
        # widths, heights, derivatives (K-1 interior), lambdas (K)
        return 4 * self.n_bins - 1

    def forward(self, x, raw):
        from .spline import linear_rational_spline

        return linear_rational_spline(
            x, raw, inverse=False, n_bins=self.n_bins, tail_bound=self.tail_bound
        )

    def inverse(self, z, raw):
        from .spline import linear_rational_spline

        return linear_rational_spline(
            z, raw, inverse=True, n_bins=self.n_bins, tail_bound=self.tail_bound
        )
