"""Applied / real-world-style targets (Bayesian GLMs, lattice field theory,
heavy tails).

Equivalents of the external ``potentials`` package's applied families that the
reference's companion paper benchmarks NFMC on (Bayesian logistic regression
on sonar/german-credit-style data, phi^4 lattice field theory, heavy-tailed
targets). Data matrices live as host numpy arrays and fold into trace-time
constants inside jitted sampler steps; all potentials are batched
``(B, *event) -> (B,)`` pure-JAX functions so gradients come from one fused
reverse-mode pass (SURVEY.md section 2.2's potential contract).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import LOG_2PI, sum_except_batch
from .base import Potential


class BayesianLogisticRegression(Potential):
    """Posterior potential of logistic regression with a N(0, prior_scale^2)
    prior on the weights (plus intercept as the last coordinate).

    ``U(beta) = sum_i log(1 + exp(-y_i * (x_i . w + b))) + ||beta||^2 / (2 s^2)``

    with labels ``y in {-1, +1}``. Matches the external ``potentials`` sonar /
    german-credit construction (standardized features, unit-scale prior).
    """

    def __init__(self, X, y, prior_scale: float = 1.0):
        X = np.asarray(X, dtype=np.float32)  # (n, d)
        y = np.asarray(y, dtype=np.float32).reshape(-1)  # (n,) in {-1, +1}
        if set(np.unique(y)) <= {0.0, 1.0}:
            y = 2.0 * y - 1.0
        self.X = X
        self.y = y
        self.prior_scale = float(prior_scale)
        super().__init__((X.shape[1] + 1,))

    def compute(self, beta: jax.Array) -> jax.Array:
        w = beta[..., :-1]  # (B, d)
        b = beta[..., -1]  # (B,)
        # highest precision: default TPU matmul runs bf16 multiplies, whose
        # per-logit truncation error accumulates over n data terms into a
        # systematic log-posterior bias (see docs/design.md, user-potential
        # numerics); the (B,d)x(d,n) dot is tiny, 6-pass f32 costs nothing.
        logits = jnp.matmul(w, self.X.T, precision="highest") + b[..., None]  # (B, n)
        # log(1 + exp(-y * logit)), stable
        nll = jnp.sum(jax.nn.softplus(-self.y * logits), axis=-1)
        prior = 0.5 * jnp.sum(beta * beta, axis=-1) / (self.prior_scale**2)
        return nll + prior

    @classmethod
    def synthetic(cls, n: int = 200, d: int = 24, prior_scale: float = 1.0,
                  seed: int = 0) -> "BayesianLogisticRegression":
        """Sonar-sized synthetic dataset (standardized features, known
        ground-truth weights) for benchmarks without bundled data files."""
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((n, d)).astype(np.float32)
        X = (X - X.mean(0)) / X.std(0)
        w_true = rng.standard_normal(d).astype(np.float32)
        logits = X @ w_true + 0.25
        y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
        return cls(X, y, prior_scale=prior_scale)


class Phi4Lattice(Potential):
    """2-D scalar phi^4 lattice field theory (periodic boundary), the standard
    flow-assisted-sampling physics benchmark.

    ``U(phi) = sum_x [ -2 kappa * phi_x * (phi_{x+e1} + phi_{x+e2})
                       + (1 - 2 lambda) phi_x^2 + lambda phi_x^4 ]``

    Event shape ``(L, L)`` — exercises matrix-shaped events end-to-end.
    """

    def __init__(self, L: int = 8, kappa: float = 0.3, lam: float = 0.022):
        super().__init__((int(L), int(L)))
        self.kappa = float(kappa)
        self.lam = float(lam)

    def compute(self, phi: jax.Array) -> jax.Array:
        batch = phi.shape[: phi.ndim - 2]
        p = phi.reshape(*batch, *self.event_shape)
        neighbors = jnp.roll(p, -1, axis=-1) + jnp.roll(p, -1, axis=-2)
        act = (
            -2.0 * self.kappa * p * neighbors
            + (1.0 - 2.0 * self.lam) * p * p
            + self.lam * p**4
        )
        return jnp.sum(act.reshape(*batch, -1), axis=-1)


class StudentT(Potential):
    """Product of independent Student-t marginals (heavy tails; tests
    robustness of flow proposals to outliers).

    ``U(x) = (nu+1)/2 * sum log(1 + x^2 / nu)``
    """

    def __init__(self, n_dim: int = 10, df: float = 3.0):
        super().__init__((int(n_dim),))
        self.df = float(df)

    def compute(self, x: jax.Array) -> jax.Array:
        return 0.5 * (self.df + 1.0) * jnp.sum(jnp.log1p(x * x / self.df), axis=-1)

    def sample(self, batch_shape: Sequence[int], key: Optional[jax.Array] = None) -> jax.Array:
        key = key if key is not None else jax.random.key(0)
        return jax.random.t(key, self.df, (*tuple(batch_shape), *self.event_shape))

    @property
    def mean(self):
        return jnp.zeros(self.event_shape)

    @property
    def second_moment(self):
        # var of t_nu = nu/(nu-2) for nu > 2
        if self.df <= 2.0:
            return None
        return jnp.full(self.event_shape, self.df / (self.df - 2.0))


class EightSchools(Potential):
    """Non-centered Eight Schools hierarchical posterior (Rubin 1981; the
    canonical funnel-geometry applied benchmark, e.g. the NeuTra paper).

    Parameterization ``x = (mu, log_tau, z_1..z_8)`` (10-d):

    ``theta_j = mu + tau * z_j``, ``tau = exp(log_tau)``;
    ``U = -[ sum_j log N(y_j; theta_j, sigma_j) + sum_j log N(z_j; 0, 1)
    + log N(mu; 0, s^2) + log N(log_tau; 0, s^2) ]`` with s = prior_scale
    (constants kept so
    log-Z comparisons are meaningful; note the LogNormal(0, s^2) tau prior
    favors smaller tau than the HalfCauchy used in some classic analyses).
    Default data are the classic
    treatment-effect estimates and standard errors.
    """

    Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0], dtype=np.float32)
    SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0], dtype=np.float32)

    def __init__(self, y=None, sigma=None, prior_scale: float = 10.0):
        self.y = np.asarray(self.Y if y is None else y, dtype=np.float32)
        self.sigma = np.asarray(self.SIGMA if sigma is None else sigma, dtype=np.float32)
        assert self.y.shape == self.sigma.shape
        self.prior_scale = float(prior_scale)
        super().__init__((2 + self.y.shape[0],))

    def compute(self, x: jax.Array) -> jax.Array:
        mu, log_tau, z = x[..., 0], x[..., 1], x[..., 2:]
        theta = mu[..., None] + jnp.exp(log_tau)[..., None] * z
        log_lik = -0.5 * jnp.sum(
            ((self.y - theta) / self.sigma) ** 2 + 2.0 * jnp.log(self.sigma) + LOG_2PI,
            axis=-1,
        )
        log_prior_z = -0.5 * jnp.sum(z * z + LOG_2PI, axis=-1)
        s2 = self.prior_scale**2
        log_prior_loc = -0.5 * (
            mu * mu / s2 + log_tau * log_tau / s2 + 2.0 * (LOG_2PI + 2.0 * np.log(self.prior_scale))
        )
        return -(log_lik + log_prior_z + log_prior_loc)
