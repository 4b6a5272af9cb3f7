"""Residual flows: planar / radial / Sylvester (matrix-determinant family) and
invertible-ResNet-style contractive blocks (i-ResNet, ResFlow, proximal).

Reference registry names at ``nfmc/util.py:229-278``. Analytic direction is
``forward`` (data -> latent, fast density evaluation / MLE); inversion uses
monotone scalar bisection (planar/radial), a small Newton solve (Sylvester),
or contraction fixed-point iteration (ResNet blocks), each with gradients via
the one-Newton-step-through-stop_gradient implicit trick or direct unrolling.

Log-determinants: matrix-determinant-lemma forms for planar/radial/Sylvester;
for ResNet blocks an exact per-sample Jacobian ``slogdet`` when the event is
small (<= ``exact_logdet_dim``), else a truncated power series
``tr log(I+J) = sum_k (-1)^{k+1} tr(J^k)/k`` with deterministic Hutchinson
probes.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Bijection, hutchinson_probes


def _flatten(v, event_shape):
    """Flatten to ``(B, d)`` with B the product of ALL batch dims: the layer
    math below indexes ``h[:, None]`` etc. assuming one batch axis, so
    multi-dim batches (e.g. chains x walkers) must collapse here to honor the
    Bijection contract of arbitrary batch shapes (round-3 review)."""
    batch = v.shape[: v.ndim - len(event_shape)]
    n = int(np.prod(batch)) if batch else 1
    return v.reshape(n, -1), batch


# ---------------------------------------------------------------------------
# Planar
# ---------------------------------------------------------------------------

class PlanarFlow(Bijection):
    """Stack of planar maps z = x + u_hat * tanh(w.x + b) (Rezende & Mohamed
    2015), with the invertibility constraint w.u_hat > -1."""

    def __init__(self, event_shape: Sequence[int], n_layers: int = 8, **_):
        super().__init__(event_shape)
        self.n_layers = int(n_layers)

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        d = self.event_size
        keys = jax.random.split(key, self.n_layers)
        return [
            {
                "u": 0.01 * jax.random.normal(k, (d,)),
                "w": jax.random.normal(jax.random.fold_in(k, 1), (d,)) / jnp.sqrt(d),
                "b": jnp.zeros(()),
            }
            for k in keys
        ]

    @staticmethod
    def _u_hat(p):
        w, u = p["w"], p["u"]
        wu = jnp.dot(w, u)
        m = -1.0 + jax.nn.softplus(wu)
        return u + (m - wu) * w / jnp.maximum(jnp.dot(w, w), 1e-12)

    def _layer_forward(self, p, x):
        u_hat = self._u_hat(p)
        a = x @ p["w"] + p["b"]  # (B,)
        h = jnp.tanh(a)
        z = x + u_hat[None] * h[:, None]
        wu = jnp.dot(p["w"], u_hat)
        ld = jnp.log(jnp.abs(1.0 + wu * (1.0 - h**2)))
        return z, ld

    def _layer_inverse(self, p, z):
        u_hat = self._u_hat(p)
        wu = jnp.dot(p["w"], u_hat)
        a_z = z @ p["w"] + p["b"]  # = a + wu * tanh(a), monotone in a
        lo = a_z - jnp.abs(wu) - 1e-3
        hi = a_z + jnp.abs(wu) + 1e-3

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            below = (mid + wu * jnp.tanh(mid)) < a_z
            return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        a0 = jax.lax.stop_gradient(0.5 * (lo + hi))
        # Newton polish (exact first-order implicit gradients)
        f0 = a0 + wu * jnp.tanh(a0)
        a = a0 - (f0 - a_z) / (1.0 + wu * (1.0 - jnp.tanh(a0) ** 2))
        h = jnp.tanh(a)
        x = z - u_hat[None] * h[:, None]
        ld = -jnp.log(jnp.abs(1.0 + wu * (1.0 - h**2)))
        return x, ld

    def forward_fn(self, params, x):
        v, batch = _flatten(x, self.event_shape)
        ld = jnp.zeros(v.shape[0])
        for p in params:
            v, l = self._layer_forward(p, v)
            ld = ld + l
        return v.reshape(x.shape), ld.reshape(batch)

    def inverse_fn(self, params, z):
        v, batch = _flatten(z, self.event_shape)
        ld = jnp.zeros(v.shape[0])
        for p in reversed(params):
            v, l = self._layer_inverse(p, v)
            ld = ld + l
        return v.reshape(z.shape), ld.reshape(batch)


# ---------------------------------------------------------------------------
# Radial
# ---------------------------------------------------------------------------

class RadialFlow(Bijection):
    """Stack of radial maps z = x + beta_hat (x - x0) / (alpha + r)."""

    def __init__(self, event_shape: Sequence[int], n_layers: int = 8, **_):
        super().__init__(event_shape)
        self.n_layers = int(n_layers)

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        d = self.event_size
        keys = jax.random.split(key, self.n_layers)
        return [
            {
                "x0": 0.1 * jax.random.normal(k, (d,)),
                "log_alpha": jnp.zeros(()),
                "beta_raw": jnp.asarray(-2.0),
            }
            for k in keys
        ]

    @staticmethod
    def _ab(p):
        alpha = jnp.exp(p["log_alpha"])
        beta = -alpha + jax.nn.softplus(p["beta_raw"])  # beta > -alpha
        return alpha, beta

    def _layer_forward(self, p, x):
        d = x.shape[-1]
        alpha, beta = self._ab(p)
        diff = x - p["x0"][None]
        r = jnp.linalg.norm(diff, axis=-1)
        h = 1.0 / (alpha + r)
        z = x + beta * h[:, None] * diff
        ld = (d - 1) * jnp.log(jnp.abs(1.0 + beta * h)) + jnp.log(
            jnp.abs(1.0 + beta * h - beta * r / (alpha + r) ** 2)
        )
        return z, ld

    def _layer_inverse(self, p, z):
        d = z.shape[-1]
        alpha, beta = self._ab(p)
        diff = z - p["x0"][None]
        rz = jnp.linalg.norm(diff, axis=-1)
        # solve rz = r (1 + beta/(alpha + r)) for r >= 0, monotone
        lo = jnp.zeros_like(rz)
        hi = rz + jnp.abs(beta) + 1.0

        def g(r):
            return r * (1.0 + beta / (alpha + r))

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            below = g(mid) < rz
            return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        r0 = jax.lax.stop_gradient(0.5 * (lo + hi))
        gp = 1.0 + beta * alpha / (alpha + r0) ** 2
        r = r0 - (g(r0) - rz) / gp
        scale = r / jnp.maximum(rz, 1e-12)
        x = p["x0"][None] + diff * scale[:, None]
        h = 1.0 / (alpha + r)
        ld = -((d - 1) * jnp.log(jnp.abs(1.0 + beta * h))
               + jnp.log(jnp.abs(1.0 + beta * h - beta * r / (alpha + r) ** 2)))
        return x, ld

    forward_fn = PlanarFlow.forward_fn
    inverse_fn = PlanarFlow.inverse_fn


# ---------------------------------------------------------------------------
# Sylvester
# ---------------------------------------------------------------------------

class SylvesterFlow(Bijection):
    """Sylvester flows (van den Berg et al. 2018): z = x + Q R tanh(Rt Q^T x + b)
    with Q column-orthonormal (d x m), R / Rt upper-triangular, diagonal
    products constrained into (-0.99, 0.99)."""

    def __init__(self, event_shape: Sequence[int], n_layers: int = 4, m: int = None, **_):
        super().__init__(event_shape)
        self.n_layers = int(n_layers)
        self.m = int(m) if m is not None else min(self.event_size, 8)

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        d, m = self.event_size, self.m
        keys = jax.random.split(key, self.n_layers)
        out = []
        for k in keys:
            k1, k2, k3 = jax.random.split(k, 3)
            out.append(
                {
                    "q_raw": jax.random.normal(k1, (d, m)) / jnp.sqrt(d),
                    "r_up": 0.01 * jax.random.normal(k2, (m, m)),
                    "rt_up": 0.01 * jax.random.normal(k3, (m, m)),
                    "r_diag_raw": jnp.zeros((m,)),
                    "rt_diag_raw": jnp.zeros((m,)),
                    "b": jnp.zeros((m,)),
                }
            )
        return out

    def _mats(self, p):
        m = self.m
        q, _ = jnp.linalg.qr(p["q_raw"])  # (d, m) orthonormal columns
        c = np.sqrt(0.99)
        r_diag = c * jnp.tanh(p["r_diag_raw"])
        rt_diag = c * jnp.tanh(p["rt_diag_raw"])
        upper = jnp.triu(jnp.ones((m, m)), k=1)
        r = p["r_up"] * upper + jnp.diag(r_diag)
        rt = p["rt_up"] * upper + jnp.diag(rt_diag)
        return q, r, rt, r_diag, rt_diag

    def _layer_forward(self, p, x):
        q, r, rt, r_diag, rt_diag = self._mats(p)
        v = x @ q @ rt.T + p["b"][None]  # (B, m)
        h = jnp.tanh(v)
        z = x + h @ r.T @ q.T
        ld = jnp.sum(jnp.log(jnp.abs(1.0 + r_diag * rt_diag * (1.0 - h**2))), axis=-1)
        return z, ld

    def _layer_inverse(self, p, z):
        q, r, rt, r_diag, rt_diag = self._mats(p)
        v_z = z @ q @ rt.T + p["b"][None]  # (B, m)
        A = rt @ r  # (m, m): v + (Rt R) tanh(v) = v_z

        def newton_body(_, v):
            h = jnp.tanh(v)
            g = v + h @ A.T - v_z
            J = jnp.eye(self.m)[None] + A[None] * (1.0 - h**2)[:, None, :]
            dv = jnp.linalg.solve(J, g[..., None])[..., 0]
            return v - dv

        v = jax.lax.fori_loop(0, 25, newton_body, v_z)
        h = jnp.tanh(v)
        x = z - h @ r.T @ q.T
        ld = -jnp.sum(jnp.log(jnp.abs(1.0 + r_diag * rt_diag * (1.0 - h**2))), axis=-1)
        return x, ld

    forward_fn = PlanarFlow.forward_fn
    inverse_fn = PlanarFlow.inverse_fn


# ---------------------------------------------------------------------------
# Contractive residual blocks (i-ResNet / ResFlow / proximal)
# ---------------------------------------------------------------------------

def _safe_norm(v):
    """L2 norm with a finite gradient at v = 0.

    ``jnp.linalg.norm``'s vjp at the zero vector is 0/0 = NaN, and the
    residual blocks zero-initialize their output weights (identity-map
    start) — with a plain norm every training gradient at init is NaN, the
    finite-update guard in ``flows/train.py`` rejects every step, and the
    flow silently never trains (round-3 review finding)."""
    return jnp.sqrt(jnp.sum(v * v) + 1e-24)


def _spectral_normalize(w, lipschitz: float, n_iter: int = 5):
    """Scale w so its spectral norm is <= lipschitz (deterministic power iteration)."""
    u = jnp.ones((w.shape[1],)) / np.sqrt(w.shape[1])

    def body(_, u):
        v = w @ u
        v = v / _safe_norm(v)
        u = w.T @ v
        return u / _safe_norm(u)

    u = jax.lax.fori_loop(0, n_iter, body, u)
    sigma = _safe_norm(w @ u)
    return w * (lipschitz / jnp.maximum(sigma, lipschitz))


class _ContractiveResidual(Bijection):
    """y = x + g(x) with Lip(g) < 1 (spectral-normalized tanh MLP blocks)."""

    lipschitz = 0.9
    series_terms = 8

    def __init__(self, event_shape: Sequence[int], n_layers: int = 4,
                 hidden_size: int = 64, exact_logdet_dim: int = 128, **_):
        super().__init__(event_shape)
        self.n_layers = int(n_layers)
        self.hidden = int(hidden_size)
        self.exact_logdet_dim = int(exact_logdet_dim)

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        d, h = self.event_size, self.hidden
        out = []
        for k in jax.random.split(key, self.n_layers):
            k1, k2 = jax.random.split(k)
            out.append(
                {
                    "w1": jax.random.normal(k1, (h, d)) / jnp.sqrt(d),
                    "b1": jnp.zeros((h,)),
                    "w2": jnp.zeros((d, h)),
                    "b2": jnp.zeros((d,)),
                }
            )
        return out

    def _g(self, p, x):
        c = np.sqrt(self.lipschitz)
        w1 = _spectral_normalize(p["w1"], c)
        w2 = _spectral_normalize(p["w2"], c)
        return jnp.tanh(x @ w1.T + p["b1"]) @ w2.T + p["b2"]

    def _logdet(self, p, x):
        d = x.shape[-1]
        if d <= self.exact_logdet_dim:
            J = jax.vmap(jax.jacfwd(lambda v: self._g(p, v[None])[0]))(x)
            return jnp.linalg.slogdet(jnp.eye(d)[None] + J)[1]
        # truncated power series; Rademacher probes derived per call/sample
        # (see flows/base.py hutchinson_probes)
        n_probes = 4

        def per_sample(xi):
            probes = hutchinson_probes(xi, n_probes, base_key=self.probe_key)

            def g1(v):
                return self._g(p, v[None])[0]

            def probe_trace(e):
                ld = 0.0
                w = e
                for k in range(1, self.series_terms + 1):
                    _, w = jax.jvp(g1, (xi,), (w,))
                    ld = ld + ((-1.0) ** (k + 1)) * jnp.dot(e, w) / k
                return ld

            return jnp.mean(jax.vmap(probe_trace)(probes))

        return jax.vmap(per_sample)(x)

    def forward_fn(self, params, x):
        v, batch = _flatten(x, self.event_shape)
        ld = jnp.zeros(v.shape[0])
        for p in params:
            ld = ld + self._logdet(p, v)
            v = v + self._g(p, v)
        return v.reshape(x.shape), ld.reshape(batch)

    def inverse_fn(self, params, z):
        v, batch = _flatten(z, self.event_shape)
        ld = jnp.zeros(v.shape[0])
        for p in reversed(params):
            def body(_, u):
                return v - self._g(p, u)

            u = jax.lax.fori_loop(0, 40, body, v)
            ld = ld - self._logdet(p, u)
            v = u
        return v.reshape(z.shape), ld.reshape(batch)


class InvertibleResNet(_ContractiveResidual):
    """i-ResNet (Behrmann et al. 2019)."""

    lipschitz = 0.9
    series_terms = 8


class ResFlow(_ContractiveResidual):
    """Residual flow (Chen et al. 2019); longer series for lower bias."""

    lipschitz = 0.9
    series_terms = 16


class ProximalResFlow(_ContractiveResidual):
    """Proximal residual flow (Hertrich 2022); stronger contraction constant
    (simplified: same block family with lipschitz 0.5)."""

    lipschitz = 0.5
    series_terms = 8
