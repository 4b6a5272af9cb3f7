"""Neural autoregressive flow transforms (Huang et al. 2018): deep sigmoid
(DSF), dense sigmoid (DDSF) and deep-dense variants, in coupling / masked /
inverse-masked arrangements (reference registry names ``c-naf-*``,
``ma-naf-*``, ``ia-naf-*``; ``nfmc/util.py:229-278``).

Each elementwise transform is a strictly monotone sigmoid mixture followed by
a logit; the inverse has no closed form and is computed by fixed-count
bisection with exact first-order gradients recovered by a single Newton step
through ``stop_gradient`` (implicit function theorem).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Inverse
from .coupling import Coupling
from .masked import MaskedAutoregressive

_EPS = 1e-6
_BRACKET = 60.0
_BISECT_ITERS = 50
# 16 doublings take the bracket to ~4e6: with slopes clamped at exp(-6) the
# pre-activation needs |x| ~ (logit(1-eps) + |b|) / exp(-6), so any
# realistically-trained preimage is covered (round-3 review: the fixed +-60
# bracket silently clamped inverses for small learned slopes)
_EXPAND_ITERS = 16


def _logit(p):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return jnp.log(p) - jnp.log1p(-p)


class _MonotoneSigmoidTransform:
    """Shared machinery: forward pre-activation mixture -> logit; bisection inverse."""

    def _mixture(self, x, raw):
        """Return (p, dp_dx) with p in (0,1) strictly increasing in x."""
        raise NotImplementedError

    def forward(self, x, raw):
        p, dp = self._mixture(x, raw)
        p = jnp.clip(p, _EPS, 1.0 - _EPS)
        y = _logit(p)
        # dy/dx = dp/dx / (p (1-p))
        ld = jnp.log(jnp.maximum(dp, 1e-30)) - jnp.log(p) - jnp.log1p(-p)
        return y, ld

    def inverse(self, y, raw):
        def f(x):
            return self.forward(x, raw)[0]

        # bracket expansion, then bisection: small learned slopes (a as low
        # as exp(-6)) put true preimages far outside any fixed bracket, and a
        # clamped inverse silently returns the bracket edge — wrong samples
        # with inconsistent log-probs, and in masked-autoregressive variants
        # the bad dim poisons all later dims
        lo = jnp.full_like(y, -_BRACKET)
        hi = jnp.full_like(y, _BRACKET)

        def expand(_, carry):
            lo, hi = carry
            lo = jnp.where(f(lo) >= y, lo * 2.0, lo)
            hi = jnp.where(f(hi) <= y, hi * 2.0, hi)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, _EXPAND_ITERS, expand, (lo, hi))
        # bracket bounds for the final safety clamp: captured BEFORE the
        # bisection narrows [lo, hi] to a ~2^-50-wide cell (clipping into
        # that cell would undo the Newton polish), and as constants so the
        # rare clipped point gets zero grad rather than grads routed through
        # the bisection's where-chain
        b_lo = jax.lax.stop_gradient(lo)
        b_hi = jax.lax.stop_gradient(hi)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            below = f(mid) < y
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
        x0 = jax.lax.stop_gradient(0.5 * (lo + hi))
        # one Newton step from the converged point: value unchanged to solver
        # tolerance, gradients exact to first order (implicit function theorem).
        # The correction is clamped to the bracket: where y falls on a
        # saturated plateau (dy/dx ~ 0) an unclamped step shoots to ~1e30 and
        # poisons downstream autoregressive dims.
        y0, ld0 = self.forward(x0, raw)
        dydx = jnp.exp(ld0)
        x = x0 - jnp.clip((y0 - y) / jnp.maximum(dydx, 1e-30), -1.0, 1.0)
        x = jnp.clip(x, b_lo, b_hi)  # the EXPANDED bracket, not the fixed seed one
        # evaluate at the DIFFERENTIABLE x: the log-det's gradient needs the
        # d(ld)/dx * dx/d(y,raw) chain term (x carries exact first-order
        # implicit gradients from the Newton step); a stop_gradient here
        # truncated reverse-KL training gradients for every NAF flow
        _, ld = self.forward(x, raw)
        return x, -ld


class DeepSigmoidTransform(_MonotoneSigmoidTransform):
    """DSF: y = logit( sum_k w_k sigma(exp(a_k) x + b_k) )."""

    def __init__(self, n_components: int = 8):
        self.K = int(n_components)

    @property
    def n_params_per_dim(self):
        return 3 * self.K

    def _mixture(self, x, raw):
        K = self.K
        a = jnp.exp(jnp.clip(raw[..., :K], -6.0, 6.0))
        b = raw[..., K : 2 * K]
        w = jax.nn.softmax(raw[..., 2 * K :], axis=-1)
        s = jax.nn.sigmoid(a * x[..., None] + b)
        p = jnp.sum(w * s, axis=-1)
        dp = jnp.sum(w * a * s * (1.0 - s), axis=-1)
        return p, dp


def _dense_layer(u, du, W, c):
    """One dense sigmoid layer with an interleaved logit (NAF paper's DDSF
    structure): h = sigma(logit(W u) + c). The logit between layers is what
    keeps the composed transform's range (practically) all of R — without it
    the output saturates to a narrow subinterval (at zero-init roughly
    p in [0.5, 0.73]) and the bisection inverse has no crossing for latent
    values outside it."""
    v = jnp.einsum("...jk,...k->...j", W, u)  # rows softmaxed: v in (0,1)
    dv = jnp.einsum("...jk,...k->...j", W, du)
    v_c = jnp.clip(v, _EPS, 1.0 - _EPS)
    t = _logit(v) + c
    dt = dv / (v_c * (1.0 - v_c))
    h = jax.nn.sigmoid(t)
    dh = h * (1.0 - h) * dt
    return h, dh


class DenseSigmoidTransform(_MonotoneSigmoidTransform):
    """DDSF: y = logit(w . sigma(logit(W u) + c)), u = sigma(exp(a) x + b),
    rows of W softmax-normalized (strictly monotone in x)."""

    def __init__(self, n_components: int = 4):
        self.K = int(n_components)

    @property
    def n_params_per_dim(self):
        K = self.K
        return K * K + 4 * K  # a, b, W, c, w

    def _split(self, raw):
        K = self.K
        i = 0
        a = jnp.exp(jnp.clip(raw[..., i : i + K], -6.0, 6.0)); i += K
        b = raw[..., i : i + K]; i += K
        W = jax.nn.softmax(raw[..., i : i + K * K].reshape(*raw.shape[:-1], K, K), axis=-1); i += K * K
        c = raw[..., i : i + K]; i += K
        w = jax.nn.softmax(raw[..., i : i + K], axis=-1)
        return a, b, W, c, w

    def _mixture(self, x, raw):
        a, b, W, c, w = self._split(raw)
        u = jax.nn.sigmoid(a * x[..., None] + b)  # (..., K)
        du = a * u * (1.0 - u)
        h, dh = _dense_layer(u, du, W, c)
        p = jnp.sum(w * h, axis=-1)
        dp = jnp.sum(w * dh, axis=-1)
        return p, dp


class DeepDenseSigmoidTransform(DenseSigmoidTransform):
    """Deep-dense: an extra positive dense sigmoid layer on top of DDSF."""

    @property
    def n_params_per_dim(self):
        K = self.K
        return 2 * K * K + 5 * K  # a, b (2K) + W1, W2 (2K^2) + c1, c2 (2K) + w (K)

    def _split2(self, raw):
        K = self.K
        i = 0
        a = jnp.exp(jnp.clip(raw[..., i : i + K], -6.0, 6.0)); i += K
        b = raw[..., i : i + K]; i += K
        W1 = jax.nn.softmax(raw[..., i : i + K * K].reshape(*raw.shape[:-1], K, K), axis=-1); i += K * K
        c1 = raw[..., i : i + K]; i += K
        W2 = jax.nn.softmax(raw[..., i : i + K * K].reshape(*raw.shape[:-1], K, K), axis=-1); i += K * K
        c2 = raw[..., i : i + K]; i += K
        w = jax.nn.softmax(raw[..., i : i + K], axis=-1)
        return a, b, W1, c1, W2, c2, w

    def _mixture(self, x, raw):
        a, b, W1, c1, W2, c2, w = self._split2(raw)
        u = jax.nn.sigmoid(a * x[..., None] + b)
        du = a * u * (1.0 - u)
        h1, dh1 = _dense_layer(u, du, W1, c1)
        h2, dh2 = _dense_layer(h1, dh1, W2, c2)
        p = jnp.sum(w * h2, axis=-1)
        dp = jnp.sum(w * dh2, axis=-1)
        return p, dp


class CouplingDeepSF(Coupling):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 8, **kwargs):
        super().__init__(event_shape, DeepSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


class CouplingDenseSF(Coupling):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 4, **kwargs):
        super().__init__(event_shape, DenseSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


class CouplingDeepDenseSF(Coupling):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 4, **kwargs):
        super().__init__(event_shape, DeepDenseSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


class MaskedAutoregressiveDeepSF(MaskedAutoregressive):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 8, **kwargs):
        super().__init__(event_shape, DeepSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


class MaskedAutoregressiveDenseSF(MaskedAutoregressive):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 4, **kwargs):
        super().__init__(event_shape, DenseSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


class MaskedAutoregressiveDeepDenseSF(MaskedAutoregressive):
    def __init__(self, event_shape, n_layers: int = 2, n_components: int = 4, **kwargs):
        super().__init__(event_shape, DeepDenseSigmoidTransform(n_components), n_layers=n_layers, **kwargs)


def InverseAutoregressiveDeepSF(event_shape, **kwargs):
    return Inverse(MaskedAutoregressiveDeepSF(event_shape, **kwargs))


def InverseAutoregressiveDenseSF(event_shape, **kwargs):
    return Inverse(MaskedAutoregressiveDenseSF(event_shape, **kwargs))


def InverseAutoregressiveDeepDenseSF(event_shape, **kwargs):
    return Inverse(MaskedAutoregressiveDeepDenseSF(event_shape, **kwargs))
