"""Multiscale and Glow image flows + convolutional residual/continuous flows.

Reference registry names ``ms-*``, ``glow-*``, ``conv-*``
(``nfmc/util.py:229-278``). Architecture (RealNVP/Glow style): per level,
squeeze (space-to-depth 2x2) -> K flow steps with channel-split couplings and
convolutional conditioners -> split (half the channels factor out to the
latent). Glow steps add ActNorm and an invertible 1x1 convolution.

Events may be ``(H, W)`` (treated as one channel) or ``(C, H, W)``. The
latent is the concatenation of all factored-out parts reshaped back to the
original event shape, so the Flow base distribution is unchanged.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Bijection, hutchinson_probes
from .transforms import AffineTransform, LRSplineTransform, RQSplineTransform, ShiftTransform
from .naf import DeepSigmoidTransform, DenseSigmoidTransform, DeepDenseSigmoidTransform


# ---------------------------------------------------------------------------
# conv conditioner (NCHW)
# ---------------------------------------------------------------------------

def conv_init(key, in_ch, hidden_ch, out_ch, kernel=3):
    k1, k2, k3 = jax.random.split(key, 3)
    scale1 = 1.0 / np.sqrt(in_ch * kernel * kernel)
    # w2 is a 1x1 conv: its fan-in is hidden_ch, not hidden_ch * kernel^2
    # (the old scale started the middle layer's activations 3x too small
    # through the tanh; round-3 review fix)
    scale2 = 1.0 / np.sqrt(hidden_ch)
    return {
        "w1": scale1 * jax.random.normal(k1, (hidden_ch, in_ch, kernel, kernel)),
        "b1": jnp.zeros((hidden_ch,)),
        "w2": scale2 * jax.random.normal(k2, (hidden_ch, hidden_ch, 1, 1)),
        "b2": jnp.zeros((hidden_ch,)),
        "w3": jnp.zeros((out_ch, hidden_ch, kernel, kernel)),
        "b3": jnp.zeros((out_ch,)),
    }


def conv_apply(p, x):
    """x: (B, C, H, W) -> (B, out_ch, H, W); zero-init last layer."""
    def conv(w, v):
        return jax.lax.conv_general_dilated(
            v, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    h = jnp.tanh(conv(p["w1"], x) + p["b1"][None, :, None, None])
    h = jnp.tanh(conv(p["w2"], h) + p["b2"][None, :, None, None])
    return conv(p["w3"], h) + p["b3"][None, :, None, None]


def _squeeze(x):
    """(B, C, H, W) -> (B, 4C, H/2, W/2) space-to-depth."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, 4 * c, h // 2, w // 2)


def _unsqueeze(x):
    b, c4, h, w = x.shape
    c = c4 // 4
    x = x.reshape(b, c, 2, 2, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, c, 2 * h, 2 * w)


class MultiscaleFlow(Bijection):
    """Generic multiscale coupling flow; ``glow=True`` adds ActNorm + 1x1 conv."""

    def __init__(
        self,
        event_shape: Sequence[int],
        transform,
        n_steps_per_level: int = 2,
        n_levels: Optional[int] = None,
        hidden_channels: int = 32,
        glow: bool = False,
        **_,
    ):
        super().__init__(event_shape)
        if len(event_shape) == 2:
            self.chw = (1, int(event_shape[0]), int(event_shape[1]))
        elif len(event_shape) == 3:
            self.chw = tuple(int(s) for s in event_shape)
        else:
            raise ValueError(f"multiscale flows need (H, W) or (C, H, W) events, got {event_shape}")
        c, h, w = self.chw
        if h % 2 or w % 2:
            raise ValueError("spatial dims must be even for squeezing")
        if n_levels is None:
            n_levels = 1
            hh, ww = h // 2, w // 2
            while hh % 2 == 0 and ww % 2 == 0 and min(hh, ww) >= 4 and n_levels < 3:
                n_levels += 1
                hh, ww = hh // 2, ww // 2
        elif h % (2 ** int(n_levels)) or w % (2 ** int(n_levels)):
            # Fail at construction, not with a cryptic reshape error at trace
            # time: every level squeezes 2x in each spatial dim.
            raise ValueError(
                f"n_levels={n_levels} needs spatial dims divisible by "
                f"{2 ** int(n_levels)}, got ({h}, {w})"
            )
        self.n_levels = int(n_levels)
        self.n_steps = int(n_steps_per_level)
        self.hidden_channels = int(hidden_channels)
        self.transform = transform
        self.glow = glow

        # static per-level channel bookkeeping
        self.level_channels: List[int] = []
        ch = c
        for lvl in range(self.n_levels):
            ch *= 4  # squeeze
            self.level_channels.append(ch)
            if lvl != self.n_levels - 1:
                ch -= ch // 2  # split keeps ceil(ch/2)

    @property
    def layers(self):
        return list(range(self.n_levels * self.n_steps))

    def init(self, key):
        params = []
        for lvl in range(self.n_levels):
            ch = self.level_channels[lvl]
            c_a = ch // 2
            c_b = ch - c_a
            level_params = []
            for s in range(self.n_steps):
                key, k_step = jax.random.split(key)
                step = {
                    "conv": conv_init(
                        k_step, c_a, self.hidden_channels,
                        c_b * self.transform.n_params_per_dim,
                    )
                }
                if self.glow:
                    key, k_w = jax.random.split(key)
                    q, _ = jnp.linalg.qr(jax.random.normal(k_w, (ch, ch)))
                    step["actnorm_log_s"] = jnp.zeros((ch,))
                    step["actnorm_b"] = jnp.zeros((ch,))
                    step["conv1x1_w"] = q  # orthogonal init: logdet 0
                level_params.append(step)
            params.append(level_params)
        return params

    # ---- single flow step -------------------------------------------------
    def _step_forward(self, p, v, swap):
        b, ch, h, w = v.shape
        ld = jnp.zeros((b,))
        if self.glow:
            s = p["actnorm_log_s"][None, :, None, None]
            v = v * jnp.exp(s) + p["actnorm_b"][None, :, None, None]
            ld += jnp.sum(p["actnorm_log_s"]) * h * w
            # full-f32 precision: the TPU's default bf16 matmul passes leave
            # ~1e-2 forward/inverse roundtrip error on the 1x1 conv
            v = jnp.einsum("ij,bjhw->bihw", p["conv1x1_w"], v,
                           precision=jax.lax.Precision.HIGHEST)
            ld += jnp.linalg.slogdet(p["conv1x1_w"])[1] * h * w
        c_a = ch // 2
        # swap alternates which half conditions; channel order is preserved
        if swap:
            va, vb = v[:, ch - c_a :], v[:, : ch - c_a]
        else:
            va, vb = v[:, :c_a], v[:, c_a:]
        raw = conv_apply(p["conv"], va)
        n_p = self.transform.n_params_per_dim
        raw = raw.reshape(b, vb.shape[1], n_p, h, w).transpose(0, 1, 3, 4, 2)
        vb_new, ld_elem = self.transform.forward(vb, raw)
        ld += jnp.sum(ld_elem.reshape(b, -1), axis=-1)
        if swap:
            v = jnp.concatenate([vb_new, va], axis=1)
        else:
            v = jnp.concatenate([va, vb_new], axis=1)
        return v, ld

    def _step_inverse(self, p, v, swap):
        b, ch, h, w = v.shape
        ld = jnp.zeros((b,))
        c_a = ch // 2
        if swap:
            vb_new, va = v[:, : ch - c_a], v[:, ch - c_a :]
        else:
            va, vb_new = v[:, :c_a], v[:, c_a:]
        raw = conv_apply(p["conv"], va)
        n_p = self.transform.n_params_per_dim
        raw = raw.reshape(b, vb_new.shape[1], n_p, h, w).transpose(0, 1, 3, 4, 2)
        vb, ld_elem = self.transform.inverse(vb_new, raw)
        ld += jnp.sum(ld_elem.reshape(b, -1), axis=-1)
        if swap:
            v = jnp.concatenate([vb, va], axis=1)
        else:
            v = jnp.concatenate([va, vb], axis=1)
        if self.glow:
            w_inv = jnp.linalg.inv(p["conv1x1_w"])
            v = jnp.einsum("ij,bjhw->bihw", w_inv, v,
                           precision=jax.lax.Precision.HIGHEST)
            ld -= jnp.linalg.slogdet(p["conv1x1_w"])[1] * h * w
            s = p["actnorm_log_s"][None, :, None, None]
            v = (v - p["actnorm_b"][None, :, None, None]) * jnp.exp(-s)
            ld -= jnp.sum(p["actnorm_log_s"]) * h * w
        return v, ld

    # ---- full passes -------------------------------------------------------
    def forward_fn(self, params, x):
        batch = x.shape[: x.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = x.reshape(b, *self.chw)
        ld = jnp.zeros((b,))
        factored = []
        for lvl in range(self.n_levels):
            v = _squeeze(v)
            for s, p in enumerate(params[lvl]):
                v, l = self._step_forward(p, v, swap=bool(s % 2))
                ld += l
            if lvl != self.n_levels - 1:
                ch = v.shape[1]
                keep = ch - ch // 2
                factored.append(v[:, keep:].reshape(b, -1))
                v = v[:, :keep]
        factored.append(v.reshape(b, -1))
        z = jnp.concatenate(factored, axis=-1)
        return z.reshape(*batch, *self.event_shape), ld.reshape(batch)

    def inverse_fn(self, params, z):
        batch = z.shape[: z.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        flat = z.reshape(b, -1)
        ld = jnp.zeros((b,))

        # reconstruct per-level factored sizes/shapes (static)
        shapes = []  # (c, h, w) of factored part per level
        c, h, w = self.chw
        for lvl in range(self.n_levels):
            c, h, w = c * 4, h // 2, w // 2
            if lvl != self.n_levels - 1:
                keep = c - c // 2
                shapes.append((c - keep, h, w))
                c = keep
        shapes.append((c, h, w))

        sizes = [int(np.prod(s)) for s in shapes]
        offsets = np.cumsum([0] + sizes)
        parts = [
            flat[:, offsets[i]: offsets[i + 1]].reshape(b, *shapes[i])
            for i in range(len(shapes))
        ]

        v = parts[-1]
        for lvl in reversed(range(self.n_levels)):
            if lvl != self.n_levels - 1:
                v = jnp.concatenate([v, parts[lvl]], axis=1)
            for s in reversed(range(self.n_steps)):
                v, l = self._step_inverse(params[lvl][s], v, swap=bool(s % 2))
                ld += l
            v = _unsqueeze(v)
        return v.reshape(*batch, *self.event_shape), ld.reshape(batch)


def _ms(transform_factory, glow=False):
    def ctor(event_shape, n_steps_per_level: int = 2, n_levels=None,
             hidden_channels: int = 32, **kwargs):
        return MultiscaleFlow(
            event_shape, transform_factory(**kwargs),
            n_steps_per_level=n_steps_per_level, n_levels=n_levels,
            hidden_channels=hidden_channels, glow=glow,
        )

    return ctor


def _affine(**kw):
    return AffineTransform(clamp=kw.get("clamp", 3.0))


def _shift(**kw):
    return ShiftTransform()


def _rqs(**kw):
    return RQSplineTransform(n_bins=kw.get("n_bins", 4), tail_bound=kw.get("tail_bound", 5.0))


def _lrs(**kw):
    return LRSplineTransform(n_bins=kw.get("n_bins", 4), tail_bound=kw.get("tail_bound", 5.0))


def _naf_deep(**kw):
    return DeepSigmoidTransform(n_components=kw.get("n_components", 4))


def _naf_dense(**kw):
    return DenseSigmoidTransform(n_components=kw.get("n_components", 4))


def _naf_dd(**kw):
    return DeepDenseSigmoidTransform(n_components=kw.get("n_components", 4))


MultiscaleRealNVP = _ms(_affine)
MultiscaleNICE = _ms(_shift)
MultiscaleRQNSF = _ms(_rqs)
MultiscaleLRSNSF = _ms(_lrs)
MultiscaleDeepSigmoid = _ms(_naf_deep)
MultiscaleDenseSigmoid = _ms(_naf_dense)
MultiscaleDeepDenseSigmoid = _ms(_naf_dd)
AffineGlow = _ms(_affine, glow=True)
ShiftGlow = _ms(_shift, glow=True)
RQSGlow = _ms(_rqs, glow=True)
LRSGlow = _ms(_lrs, glow=True)
DeepSigmoidGlow = _ms(_naf_deep, glow=True)
DenseSigmoidGlow = _ms(_naf_dense, glow=True)
DeepDenseSigmoidGlow = _ms(_naf_dd, glow=True)


# ---------------------------------------------------------------------------
# Convolutional residual / continuous flows
# ---------------------------------------------------------------------------

class _ConvResidual(Bijection):
    """y = x + g(x), g a spectral-normalized conv net (Lip < 1); logdet via
    truncated power series with deterministic Hutchinson probes.

    The conv operator norm is bounded by sqrt(kh*kw) times the reshaped-matrix
    spectral norm, so kernels are normalized with that extra factor — the
    block is a guaranteed contraction and the log-det series converges at
    rate lipschitz^k (lipschitz kept small so the truncation bias, which
    scales with the event size, stays negligible)."""

    lipschitz = 0.5
    series_terms = 12

    def __init__(self, event_shape: Sequence[int], n_layers: int = 4,
                 hidden_channels: int = 16, n_probes: int = 4, **_):
        super().__init__(event_shape)
        if len(event_shape) == 2:
            self.chw = (1, int(event_shape[0]), int(event_shape[1]))
        elif len(event_shape) == 3:
            self.chw = tuple(int(s) for s in event_shape)
        else:
            raise ValueError("conv flows need (H, W) or (C, H, W) events")
        self.n_layers = int(n_layers)
        self.hidden_channels = int(hidden_channels)
        self.n_probes = int(n_probes)

    @property
    def layers(self):
        return list(range(self.n_layers))

    def init(self, key):
        c = self.chw[0]
        out = []
        for k in jax.random.split(key, self.n_layers):
            k1, _ = jax.random.split(k)
            out.append({
                "w1": jax.random.normal(k1, (self.hidden_channels, c, 3, 3))
                / np.sqrt(c * 9),
                "b1": jnp.zeros((self.hidden_channels,)),
                "w2": jnp.zeros((c, self.hidden_channels, 3, 3)),
                "b2": jnp.zeros((c,)),
            })
        return out

    @staticmethod
    def _sn(w, c):
        flat = w.reshape(w.shape[0], -1)
        u = jnp.ones((flat.shape[1],)) / np.sqrt(flat.shape[1])

        # grad-safe norms: w2 is zero-initialized, and jnp.linalg.norm's vjp
        # at zero is NaN — see flows/residual.py _safe_norm
        from .residual import _safe_norm

        def body(_, u):
            v = flat @ u
            v = v / _safe_norm(v)
            u = flat.T @ v
            return u / _safe_norm(u)

        u = jax.lax.fori_loop(0, 5, body, u)
        # conv operator norm <= sqrt(kh*kw) * sigma(reshaped matrix)
        kernel_area = float(np.prod(w.shape[2:]))
        sigma = _safe_norm(flat @ u) * np.sqrt(kernel_area)
        return w * (c / jnp.maximum(sigma, c))

    def _g(self, p, x):
        c = np.sqrt(self.lipschitz)

        def conv(w, v):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
            )

        h = jnp.tanh(conv(self._sn(p["w1"], c), x) + p["b1"][None, :, None, None])
        return conv(self._sn(p["w2"], c), h) + p["b2"][None, :, None, None]

    def _logdet(self, p, x):
        def per_sample(xi):
            probes = hutchinson_probes(xi, self.n_probes, base_key=self.probe_key)

            def g1(v):
                return self._g(p, v.reshape(1, *self.chw)).reshape(-1)

            def probe_trace(e):
                ld = 0.0
                w = e
                for k in range(1, self.series_terms + 1):
                    _, w = jax.jvp(g1, (xi,), (w,))
                    ld = ld + ((-1.0) ** (k + 1)) * jnp.dot(e, w) / k
                return ld

            return jnp.mean(jax.vmap(probe_trace)(probes))

        return jax.vmap(per_sample)(x.reshape(x.shape[0], -1))

    def forward_fn(self, params, x):
        batch = x.shape[: x.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = x.reshape(b, *self.chw)
        ld = jnp.zeros((b,))
        for p in params:
            ld = ld + self._logdet(p, v)
            v = v + self._g(p, v)
        return v.reshape(x.shape), ld.reshape(batch)

    def inverse_fn(self, params, z):
        batch = z.shape[: z.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = z.reshape(b, *self.chw)
        ld = jnp.zeros((b,))
        for p in reversed(params):
            def body(_, u):
                return v - self._g(p, u)

            u = jax.lax.fori_loop(0, 40, body, v)
            ld = ld - self._logdet(p, u)
            v = u
        return v.reshape(z.shape), ld.reshape(batch)


class ConvolutionalInvertibleResNet(_ConvResidual):
    lipschitz = 0.5
    series_terms = 12


class ConvolutionalResFlow(_ConvResidual):
    lipschitz = 0.6
    series_terms = 20


class _ConvContinuous(Bijection):
    """CNF with convolutional dynamics; Hutchinson trace, fixed-step integration."""

    method = "rk4"

    def __init__(self, event_shape: Sequence[int], hidden_channels: int = 16,
                 n_steps: int = 6, n_probes: int = 8, exact_trace_dim: int = 64, **_):
        super().__init__(event_shape)
        if len(event_shape) == 2:
            self.chw = (1, int(event_shape[0]), int(event_shape[1]))
        elif len(event_shape) == 3:
            self.chw = tuple(int(s) for s in event_shape)
        else:
            raise ValueError(
                f"conv flows need (H, W) or (C, H, W) events, got {event_shape}"
            )
        self.hidden_channels = int(hidden_channels)
        self.n_steps = int(n_steps)
        self.n_probes = int(n_probes)
        self.exact_trace_dim = int(exact_trace_dim)

    @property
    def layers(self):
        return list(range(self.n_steps))

    def init(self, key):
        c = self.chw[0]
        k1, _ = jax.random.split(key)
        return {
            "w1": jax.random.normal(k1, (self.hidden_channels, c + 1, 3, 3))
            / np.sqrt((c + 1) * 9),
            "b1": jnp.zeros((self.hidden_channels,)),
            "w2": jnp.zeros((c, self.hidden_channels, 3, 3)),
            "b2": jnp.zeros((c,)),
        }

    def _f(self, p, v, t):
        """v: (b, C, H, W); t scalar -> same shape."""
        def conv(w, u):
            return jax.lax.conv_general_dilated(
                u, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
            )

        tmap = jnp.full((v.shape[0], 1, *v.shape[2:]), t, dtype=v.dtype)
        h = jnp.tanh(conv(p["w1"], jnp.concatenate([v, tmap], axis=1)) + p["b1"][None, :, None, None])
        return conv(p["w2"], h) + p["b2"][None, :, None, None]

    def _f_and_trace(self, p, v, t):
        d = int(np.prod(self.chw))
        flat = v.reshape(v.shape[0], -1)

        if d <= self.exact_trace_dim:
            def per_sample(vi):
                f1 = lambda u: self._f(p, u.reshape(1, *self.chw), t).reshape(-1)
                return f1(vi), jnp.trace(jax.jacfwd(f1)(vi))

            ys, trs = jax.vmap(per_sample)(flat)
            return ys.reshape(v.shape), trs

        def per_sample(vi):
            probes = hutchinson_probes(vi, self.n_probes, base_key=self.probe_key)
            f1 = lambda u: self._f(p, u.reshape(1, *self.chw), t).reshape(-1)
            y, pullback = jax.vjp(f1, vi)

            def probe(e):
                return jnp.dot(e, pullback(e)[0])

            return y, jnp.mean(jax.vmap(probe)(probes))

        ys, trs = jax.vmap(per_sample)(flat)
        return ys.reshape(v.shape), trs

    def _integrate(self, params, x, reverse: bool):
        batch = x.shape[: x.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = x.reshape(b, *self.chw)
        h = 1.0 / self.n_steps
        sign = -1.0 if reverse else 1.0

        def step(carry, i):
            v, ld = carry
            t = (1.0 - i * h) if reverse else (i * h)
            f1, tr1 = self._f_and_trace(params, v, t)
            f2, tr2 = self._f_and_trace(params, v + sign * 0.5 * h * f1, t + sign * 0.5 * h)
            f3, tr3 = self._f_and_trace(params, v + sign * 0.5 * h * f2, t + sign * 0.5 * h)
            f4, tr4 = self._f_and_trace(params, v + sign * h * f3, t + sign * h)
            v = v + sign * h / 6.0 * (f1 + 2 * f2 + 2 * f3 + f4)
            # +sign: d/dt log|det dz_t/dx| = +tr(df/dx); see
            # flows/continuous.py _integrate (the exact-slogdet ground truth)
            ld = ld + sign * h / 6.0 * (tr1 + 2 * tr2 + 2 * tr3 + tr4)
            return (v, ld), None

        (v, ld), _ = jax.lax.scan(
            step, (v, jnp.zeros((b,))), jnp.arange(self.n_steps, dtype=jnp.float32)
        )
        return v.reshape(x.shape), ld.reshape(batch)

    def forward_fn(self, params, x):
        return self._integrate(params, x, reverse=False)

    def inverse_fn(self, params, z):
        return self._integrate(params, z, reverse=True)

    def regularization(self, params, x) -> jax.Array:
        """Per-sample kinetic-energy regularizer E_t[|f|^2] over the conv
        dynamics (RNODE, Finlay et al. 2020) — conv analogue of
        ``ContinuousFlow.regularization``; shape ``(batch,)``."""
        batch = x.shape[: x.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = x.reshape(b, *self.chw)
        ts = jnp.linspace(0.0, 1.0, 4)
        f = jax.vmap(lambda t: self._f(params, v, t))(ts)
        return jnp.mean(jnp.sum(f * f, axis=(2, 3, 4)), axis=0).reshape(batch)


class ConvolutionalFFJORD(_ConvContinuous):
    """Conv CNF trained by plain MLE (no kinetic term)."""


class ConvolutionalRNODE(_ConvContinuous):
    """Conv CNF + kinetic regularization during training (Finlay et al.
    2020); distinct from :class:`ConvolutionalFFJORD` via the nonzero
    ``regularization_weight`` consumed by ``fit``/``variational_fit``."""

    regularization_weight = 0.01


class ConvolutionalDDB(_ConvContinuous):
    def _integrate(self, params, x, reverse):
        # Euler discretization with more steps (DDB style)
        self_method_steps = max(self.n_steps, 12)
        batch = x.shape[: x.ndim - len(self.event_shape)]
        b = int(np.prod(batch)) if batch else 1
        v = x.reshape(b, *self.chw)
        h = 1.0 / self_method_steps
        sign = -1.0 if reverse else 1.0

        def step(carry, i):
            v, ld = carry
            t = (1.0 - i * h) if reverse else (i * h)
            f, tr = self._f_and_trace(params, v, t)
            # +sign: see flows/continuous.py _integrate sign note
            return (v + sign * h * f, ld + sign * h * tr), None

        (v, ld), _ = jax.lax.scan(
            step, (v, jnp.zeros((b,))), jnp.arange(self_method_steps, dtype=jnp.float32)
        )
        return v.reshape(x.shape), ld.reshape(batch)
