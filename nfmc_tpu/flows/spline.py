"""Monotone spline transforms: rational-quadratic (RQS) and linear-rational (LRS).

RQS: Durkan, Bekasov, Murray, Papamakarios — "Neural Spline Flows" (2019).
LRS: Dolatabadi, Erfani, Leckie — "Invertible Generative Modeling using
Linear Rational Splines" (2020).

Both act elementwise inside ``[-tail_bound, tail_bound]`` with identity linear
tails, are parameterized by raw conditioner outputs, and return per-element
log-dets. All branching is ``jnp.where`` on clipped values (no NaN leaks into
gradients), so the same code path serves forward and inverse under jit/vmap.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_MIN_BIN = 1e-3
_MIN_DERIV = 1e-3
# Shift so a ZERO-INIT conditioner yields interior derivatives of exactly 1:
# _MIN_DERIV + softplus(0 + _DERIV_SHIFT) == 1. Without it, raw_d = 0 gives
# derivative ~0.694 at interior knots (boundary knots are pinned to 1), so
# "zero-initialized final layer => identity map" (conditioners.py, standard
# NSF practice) would be silently false for spline flows and early training
# would start from a biased warp (round-3 review fix).
_DERIV_SHIFT = math.log(math.expm1(1.0 - _MIN_DERIV))


def _make_knots(raw_w, raw_h, n_bins, tail_bound):
    widths = jax.nn.softmax(raw_w, axis=-1)
    widths = _MIN_BIN + (1.0 - _MIN_BIN * n_bins) * widths
    heights = jax.nn.softmax(raw_h, axis=-1)
    heights = _MIN_BIN + (1.0 - _MIN_BIN * n_bins) * heights

    cumw = jnp.cumsum(widths, axis=-1)
    cumw = jnp.concatenate([jnp.zeros_like(cumw[..., :1]), cumw], axis=-1)
    cumw = cumw * (2.0 * tail_bound) - tail_bound
    cumh = jnp.cumsum(heights, axis=-1)
    cumh = jnp.concatenate([jnp.zeros_like(cumh[..., :1]), cumh], axis=-1)
    cumh = cumh * (2.0 * tail_bound) - tail_bound
    # pin exact endpoints (cumsum rounding)
    cumw = cumw.at[..., -1].set(tail_bound)
    cumh = cumh.at[..., -1].set(tail_bound)
    return cumw, cumh


def _gather_bin(vals, idx):
    """vals (..., K+1 or K), idx (...,) -> vals[..., idx] elementwise."""
    return jnp.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]


def _searchsorted(cum, x):
    """Index k such that cum[k] <= x < cum[k+1]; cum has K+1 knots."""
    n_bins = cum.shape[-1] - 1
    idx = jnp.sum((x[..., None] >= cum[..., 1:]).astype(jnp.int32), axis=-1)
    return jnp.clip(idx, 0, n_bins - 1)


def _use_select_lookup() -> bool:
    """Bin lookup strategy: TPU has no efficient strided gather, so
    ``take_along_axis`` lowers pathologically (measured 21 ms vs 1.7 ms for
    the affine equivalent at (1024, 100) x 4 layers); a one-hot
    select-accumulate over the K bins is pure VPU work. Everywhere else the
    gather is fine and cheaper. Overridable for parity tests."""
    if _FORCE_LOOKUP is not None:
        return _FORCE_LOOKUP == "select"
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_FORCE_LOOKUP = None  # None (auto) | "select" | "gather" — test hook


def _bin_masks(cum, x):
    """One-hot (..., K) float mask of each x's bin (cum has K+1 knots);
    same boundary semantics as ``_searchsorted`` incl. the last-bin clip."""
    K = cum.shape[-1] - 1
    lo = x[..., None] >= cum[..., :K]
    hi = jnp.concatenate(
        [x[..., None] < cum[..., 1:K],
         jnp.ones_like(cum[..., :1], dtype=bool)], axis=-1,
    )
    return jnp.logical_and(lo, hi).astype(x.dtype)


def _masked_pick(masks, vals, shift=0):
    """sum_k masks[..., k] * vals[..., k + shift] — gather-free bin pick."""
    K = masks.shape[-1]
    return jnp.sum(masks * vals[..., shift : shift + K], axis=-1)


def rational_quadratic_spline(
    inputs: jax.Array,
    raw: jax.Array,
    inverse: bool,
    n_bins: int = 8,
    tail_bound: float = 5.0,
) -> Tuple[jax.Array, jax.Array]:
    """RQS transform. ``inputs (...,)``, ``raw (..., 3*n_bins - 1)``.

    Returns (outputs, log_det_elementwise)."""
    raw_w = raw[..., :n_bins]
    raw_h = raw[..., n_bins : 2 * n_bins]
    raw_d = raw[..., 2 * n_bins :]

    cumw, cumh = _make_knots(raw_w, raw_h, n_bins, tail_bound)
    derivs = _MIN_DERIV + jax.nn.softplus(raw_d + _DERIV_SHIFT)
    ones = jnp.ones_like(derivs[..., :1])
    derivs = jnp.concatenate([ones, derivs, ones], axis=-1)  # (..., K+1)

    inside = jnp.abs(inputs) <= tail_bound
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    cum_in = cumh if inverse else cumw
    if _use_select_lookup():
        m = _bin_masks(cum_in, x)
        x_k = _masked_pick(m, cumw)
        w_k = _masked_pick(m, cumw, 1) - x_k
        y_k = _masked_pick(m, cumh)
        h_k = _masked_pick(m, cumh, 1) - y_k
        d_k = _masked_pick(m, derivs)
        d_k1 = _masked_pick(m, derivs, 1)
    else:
        k = _searchsorted(cum_in, x)
        x_k = _gather_bin(cumw, k)
        w_k = _gather_bin(cumw, k + 1) - x_k
        y_k = _gather_bin(cumh, k)
        h_k = _gather_bin(cumh, k + 1) - y_k
        d_k = _gather_bin(derivs, k)
        d_k1 = _gather_bin(derivs, k + 1)
    s_k = h_k / w_k
    corr = d_k1 + d_k - 2.0 * s_k

    if not inverse:
        xi = (x - x_k) / w_k
        xi1m = xi * (1.0 - xi)
        denom = s_k + corr * xi1m
        y = y_k + h_k * (s_k * xi * xi + d_k * xi1m) / denom
        dydx = (
            s_k * s_k * (d_k1 * xi * xi + 2.0 * s_k * xi1m + d_k * (1.0 - xi) ** 2)
        ) / (denom * denom)
        out = jnp.where(inside, y, inputs)
        log_det = jnp.where(inside, jnp.log(dydx), 0.0)
        return out, log_det
    else:
        term = x - y_k
        a = h_k * (s_k - d_k) + term * corr
        b = h_k * d_k - term * corr
        c = -s_k * term
        disc = b * b - 4.0 * a * c
        disc = jnp.maximum(disc, 0.0)
        xi = (2.0 * c) / (-b - jnp.sqrt(disc))
        xi = jnp.clip(xi, 0.0, 1.0)
        xi1m = xi * (1.0 - xi)
        denom = s_k + corr * xi1m
        x_out = x_k + w_k * xi
        dydx = (
            s_k * s_k * (d_k1 * xi * xi + 2.0 * s_k * xi1m + d_k * (1.0 - xi) ** 2)
        ) / (denom * denom)
        out = jnp.where(inside, x_out, inputs)
        log_det = jnp.where(inside, -jnp.log(dydx), 0.0)
        return out, log_det


def linear_rational_spline(
    inputs: jax.Array,
    raw: jax.Array,
    inverse: bool,
    n_bins: int = 8,
    tail_bound: float = 5.0,
) -> Tuple[jax.Array, jax.Array]:
    """LRS transform. ``inputs (...,)``, ``raw (..., 4*n_bins - 1)``.

    Each bin is two monotone linear-rational segments meeting at an interior
    point ``lambda`` (Dolatabadi et al. 2020, eqs. 7-10)."""
    raw_w = raw[..., :n_bins]
    raw_h = raw[..., n_bins : 2 * n_bins]
    raw_d = raw[..., 2 * n_bins : 3 * n_bins - 1]
    raw_l = raw[..., 3 * n_bins - 1 :]

    cumw, cumh = _make_knots(raw_w, raw_h, n_bins, tail_bound)
    derivs = _MIN_DERIV + jax.nn.softplus(raw_d + _DERIV_SHIFT)
    ones = jnp.ones_like(derivs[..., :1])
    derivs = jnp.concatenate([ones, derivs, ones], axis=-1)
    lam_all = 0.025 + 0.95 * jax.nn.sigmoid(raw_l)  # (..., K)

    inside = jnp.abs(inputs) <= tail_bound
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    cum_in = cumh if inverse else cumw
    if _use_select_lookup():
        m = _bin_masks(cum_in, x)
        x0 = _masked_pick(m, cumw)
        w = _masked_pick(m, cumw, 1) - x0
        y0 = _masked_pick(m, cumh)
        h = _masked_pick(m, cumh, 1) - y0
        d0 = _masked_pick(m, derivs)
        d1 = _masked_pick(m, derivs, 1)
        lam = _masked_pick(m, lam_all)
    else:
        k = _searchsorted(cum_in, x)
        x0 = _gather_bin(cumw, k)
        w = _gather_bin(cumw, k + 1) - x0
        y0 = _gather_bin(cumh, k)
        h = _gather_bin(cumh, k + 1) - y0
        d0 = _gather_bin(derivs, k)
        d1 = _gather_bin(derivs, k + 1)
        lam = _gather_bin(lam_all, k)
    s = h / w

    wa = jnp.ones_like(s)
    wb = jnp.sqrt(d0 / d1) * wa
    wc = (lam * wa * d0 + (1.0 - lam) * wb * d1) / s
    ya = y0
    yb = y0 + h
    yc = ((1.0 - lam) * wa * ya + lam * wb * yb) / ((1.0 - lam) * wa + lam * wb)

    if not inverse:
        phi = (x - x0) / w
        seg1 = phi <= lam
        # segment 1: interpolate (0, ya, wa) -> (lam, yc, wc)
        D1 = wa * (lam - phi) + wc * phi
        y1 = (wa * ya * (lam - phi) + wc * yc * phi) / D1
        dydx1 = lam * wa * wc * (yc - ya) / (D1 * D1 * w)
        # segment 2: interpolate (lam, yc, wc) -> (1, yb, wb)
        D2 = wc * (1.0 - phi) + wb * (phi - lam)
        y2 = (wc * yc * (1.0 - phi) + wb * yb * (phi - lam)) / D2
        dydx2 = (1.0 - lam) * wb * wc * (yb - yc) / (D2 * D2 * w)

        y = jnp.where(seg1, y1, y2)
        dydx = jnp.where(seg1, dydx1, dydx2)
        out = jnp.where(inside, y, inputs)
        log_det = jnp.where(inside, jnp.log(dydx), 0.0)
        return out, log_det
    else:
        y = x
        seg1 = y <= yc
        # invert segment 1: phi = wa*lam*(y - ya) / (wa*(y - ya) - wc*(y - yc))
        n1 = wa * lam * (y - ya)
        den1 = wa * (y - ya) - wc * (y - yc)
        phi1 = n1 / jnp.where(jnp.abs(den1) < 1e-12, 1e-12, den1)
        # invert segment 2: phi = [wc(y-yc) + lam*wb(yb-y)] / [wc(y-yc) + wb(yb-y)]
        n2 = wc * (y - yc) + lam * wb * (yb - y)
        den2 = wc * (y - yc) + wb * (yb - y)
        phi2 = n2 / jnp.where(jnp.abs(den2) < 1e-12, 1e-12, den2)

        phi = jnp.clip(jnp.where(seg1, phi1, phi2), 0.0, 1.0)
        D1 = wa * (lam - phi) + wc * phi
        dydx1 = lam * wa * wc * (yc - ya) / (D1 * D1 * w)
        D2 = wc * (1.0 - phi) + wb * (phi - lam)
        dydx2 = (1.0 - lam) * wb * wc * (yb - yc) / (D2 * D2 * w)
        dydx = jnp.where(seg1, dydx1, dydx2)

        x_out = x0 + w * phi
        out = jnp.where(inside, x_out, inputs)
        log_det = jnp.where(inside, -jnp.log(dydx), 0.0)
        return out, log_det
