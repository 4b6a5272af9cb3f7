"""Synthetic benchmark targets (Gaussians, funnel, Rosenbrock, mixtures).

Equivalents of the external ``potentials.synthetic`` targets the reference
tests and the BASELINE workloads use (100-d Gaussian / funnel;
``test/test_moment_estimation.py:10`` uses ``DiagonalGaussian1``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOG_2PI, sum_except_batch
from .base import Potential


class StandardGaussian(Potential):
    """U(x) = 0.5 * ||x||^2 (unnormalized standard normal)."""

    def compute(self, x: jax.Array) -> jax.Array:
        return 0.5 * sum_except_batch(x * x, self.event_shape)

    def sample(self, batch_shape, key=None):
        key = key if key is not None else jax.random.key(0)
        return jax.random.normal(key, (*tuple(batch_shape), *self.event_shape))

    @property
    def mean(self):
        return jnp.zeros(self.event_shape)

    @property
    def second_moment(self):
        return jnp.ones(self.event_shape)


class DiagonalGaussian(Potential):
    """Gaussian with diagonal covariance: U(x) = 0.5 * sum((x-mu)^2 / sigma^2)."""

    def __init__(self, mu: jax.Array, sigma: jax.Array):
        # Parameters live as host (numpy) arrays; they fold into trace-time
        # constants when the potential is captured by a jitted sampler step.
        mu = np.asarray(mu, dtype=np.float32)
        super().__init__(mu.shape)
        self.mu = mu
        self.sigma = np.broadcast_to(np.asarray(sigma, dtype=np.float32), mu.shape)

    def compute(self, x: jax.Array) -> jax.Array:
        z = (x - self.mu) / self.sigma
        return 0.5 * sum_except_batch(z * z, self.event_shape)

    def sample(self, batch_shape, key=None):
        key = key if key is not None else jax.random.key(0)
        eps = jax.random.normal(key, (*tuple(batch_shape), *self.event_shape))
        return self.mu + self.sigma * eps

    @property
    def mean(self):
        return self.mu

    @property
    def second_moment(self):
        return self.mu**2 + self.sigma**2


class DiagonalGaussian1(DiagonalGaussian):
    """100-d diagonal Gaussian with sigma = (1, 2, ..., 10 tiled); mirrors the
    external ``potentials.synthetic.gaussian.diagonal.DiagonalGaussian1``
    used at reference ``test/test_moment_estimation.py:10``."""

    def __init__(self, n_dim: int = 100):
        sigma = np.tile(np.arange(1, 11), n_dim // 10 + 1)[:n_dim].astype(np.float32)
        super().__init__(np.zeros(n_dim, dtype=np.float32), sigma)


class FullRankGaussian(Potential):
    """Gaussian with dense covariance (given its Cholesky factor).

    TPU design: the log-density is evaluated in whitened coordinates
    ``y = L^{-1} (x - mu)`` so the quadratic form is a cancellation-free sum
    of squares (a dense ``x @ P @ x`` loses the signal entirely to the bf16
    default matmul precision on ill-conditioned targets — see
    docs/design.md). ``L^{-1}`` is computed once on the host in float64; the
    per-eval whitening is a single MXU matmul at ``precision="highest"``
    rather than a triangular solve, whose sequential substitution is ~40x
    slower on TPU (measured: AIES 1024x100-d went 126 -> ~4,000 iters/s).
    """

    def __init__(self, mu: jax.Array, chol: jax.Array):
        # host (numpy) storage, as in DiagonalGaussian
        mu = np.asarray(mu, dtype=np.float32)
        super().__init__(mu.shape)
        self.mu = mu
        # only the lower triangle defines the factor (solve_triangular
        # semantics): ignore any garbage the caller left above the diagonal,
        # e.g. scipy.linalg.cho_factor output
        chol64 = np.tril(np.asarray(chol, dtype=np.float64))
        self.chol = chol64.astype(np.float32)
        self.chol_inv_t = np.linalg.inv(chol64).T.astype(np.float32)

    def compute(self, x: jax.Array) -> jax.Array:
        diff = x - self.mu
        y = jnp.matmul(diff, self.chol_inv_t, precision="highest")
        return 0.5 * jnp.sum(y * y, axis=-1)

    def sample(self, batch_shape, key=None):
        key = key if key is not None else jax.random.key(0)
        eps = jax.random.normal(key, (*tuple(batch_shape), self.event_size))
        return self.mu + eps @ self.chol.T

    @property
    def mean(self):
        return self.mu

    @property
    def second_moment(self):
        cov = self.chol @ self.chol.T
        return self.mu**2 + jnp.diag(cov)


class Funnel(Potential):
    """Neal's funnel: x0 ~ N(0, 3^2), x_i | x0 ~ N(0, exp(x0)) for i >= 1."""

    def __init__(self, n_dim: int = 100, scale: float = 3.0):
        super().__init__((n_dim,))
        self.scale = float(scale)

    def compute(self, x: jax.Array) -> jax.Array:
        v = x[..., 0]
        rest = x[..., 1:]
        d = self.event_shape[0] - 1
        log_p_v = -0.5 * (v / self.scale) ** 2 - 0.5 * LOG_2PI - jnp.log(self.scale)
        log_p_rest = -0.5 * jnp.sum(rest * rest, axis=-1) * jnp.exp(-v) - 0.5 * d * (LOG_2PI + v)
        return -(log_p_v + log_p_rest)

    def sample(self, batch_shape, key=None):
        key = key if key is not None else jax.random.key(0)
        kv, kr = jax.random.split(key)
        v = self.scale * jax.random.normal(kv, (*tuple(batch_shape), 1))
        rest = jax.random.normal(kr, (*tuple(batch_shape), self.event_shape[0] - 1))
        rest = rest * jnp.exp(0.5 * v)
        return jnp.concatenate([v, rest], axis=-1)

    @property
    def mean(self):
        return jnp.zeros(self.event_shape)

    @property
    def second_moment(self):
        d = self.event_shape[0]
        sm = jnp.full((d,), float(np.exp(self.scale**2 / 2.0)))  # E[exp(v)], v~N(0,scale^2)
        return sm.at[0].set(self.scale**2)


class Rosenbrock(Potential):
    """Banana-shaped Rosenbrock density in n dims (pairwise coupling)."""

    def __init__(self, n_dim: int = 100, scale: float = 10.0):
        super().__init__((n_dim,))
        self.scale = float(scale)

    def compute(self, x: jax.Array) -> jax.Array:
        x0 = x[..., :-1]
        x1 = x[..., 1:]
        return jnp.sum(self.scale * (x1 - x0**2) ** 2 + (1.0 - x0) ** 2, axis=-1)


class GaussianMixture(Potential):
    """Equally weighted Gaussian mixture with shared isotropic scale."""

    def __init__(self, means: jax.Array, sigma: float = 1.0):
        # host (numpy) storage, as in DiagonalGaussian
        means = np.asarray(means, dtype=np.float32)  # (n_components, d)
        super().__init__(means.shape[1:])
        self.means = means
        self.sigma = float(sigma)

    def compute(self, x: jax.Array) -> jax.Array:
        diff = x[..., None, :] - self.means  # (..., K, d)
        log_comp = -0.5 * jnp.sum((diff / self.sigma) ** 2, axis=-1)
        return -jax.scipy.special.logsumexp(log_comp, axis=-1)

    def sample(self, batch_shape, key=None):
        key = key if key is not None else jax.random.key(0)
        kc, ke = jax.random.split(key)
        n_comp = self.means.shape[0]
        idx = jax.random.randint(kc, tuple(batch_shape), 0, n_comp)
        eps = jax.random.normal(ke, (*tuple(batch_shape), *self.event_shape))
        return jnp.asarray(self.means)[idx] + self.sigma * eps


class DoubleWell(Potential):
    """Product of 1-d double wells: U(x) = sum((x^2 - 1)^2 / 4)."""

    def compute(self, x: jax.Array) -> jax.Array:
        return sum_except_batch((x * x - 1.0) ** 2 / 4.0, self.event_shape)
