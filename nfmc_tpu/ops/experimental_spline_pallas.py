"""Fused rational-quadratic-spline coupling stack as a single Pallas TPU kernel.

Same design as :mod:`nfmc_tpu.ops.coupling_pallas` (the RealNVP kernel), for
the coupling RQ-NSF family (``c-rqnsf`` — Durkan et al. 2019): the whole
multi-layer pass (conditioner MLP matmuls on the MXU, spline transform +
log-det accumulation on the VPU) runs in one kernel with the chain state
resident in VMEM.

TPU-native re-design of the spline evaluation itself: the XLA reference path
(``flows/spline.py``) locates each input's bin with ``searchsorted`` + a
``take_along_axis`` gather — Mosaic has no efficient strided gather, so here
the bin lookup is a **static unrolled select-accumulate over the K bins**:
knot positions are built with a running (static) sum over per-bin softmax
blocks, each input's bin membership is a comparison mask, and the six selected
knot quantities are ``sum_k mask_k * q_k``. All operations are elementwise on
contiguous ``(block_b, db)`` column blocks (the conditioner output is
de-interleaved host-side from dim-major to param-major layout), so the whole
transform is VPU-friendly with no dynamic indexing.

Gradients: ``jax.custom_vjp`` backed by a second fused kernel
(``_kernel_bwd``) that recomputes the forward per layer in VMEM and
transposes it layer-by-layer with an in-kernel ``jax.vjp`` — since the
kernel's forward is the gather-free select-accumulate formulation, its
transpose is gather-free too, whereas replaying the XLA reference path
re-traces the pathological searchsorted/gather lowering. Measured on TPU
v5e (batch 1024, 4 layers, hidden 128): training grad step 14.8x XLA at
d=100, 2.6x at d=20; end-to-end ``Flow.fit`` ~2.9x once compiled. A module
flag ``_PALLAS_BWD`` reverts to the XLA-replay backward for validation.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .coupling_pallas import _HAS_PALLAS, _perm, pallas_available

if _HAS_PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_MIN_BIN = 1e-3
_MIN_DERIV = 1e-3
_DERIV_SHIFT = float(np.log(np.expm1(1.0 - _MIN_DERIV)))  # parity: flows/spline.py


def _param_major_perm(db: int, n_params: int) -> np.ndarray:
    """Columns of the conditioner output layer, dim-major -> param-major.

    The XLA path reshapes the MLP output to ``(..., db, n_params)`` (column
    ``i * n_params + p`` parameterizes dim ``i``); the kernel wants parameter
    blocks contiguous: new column ``p * db + i`` = old column ``i * n_params + p``.
    """
    return np.array([i * n_params + p for p in range(n_params) for i in range(db)])


def _flatten_weights(params, n_params: int) -> List[jax.Array]:
    flat = []
    for p in params:
        ws, bs = p["w"], p["b"]
        assert len(ws) == 3, "pallas path expects 2 hidden layers"
        w3, b3 = jnp.asarray(ws[2]), jnp.asarray(bs[2])
        db = w3.shape[1] // n_params
        perm = _param_major_perm(db, n_params)
        flat.extend([ws[0], bs[0], ws[1], bs[1], w3[:, perm], b3[perm]])
    return flat


def _spline_blocks(raw, db: int, n_bins: int, tail_bound: float):
    """From the param-major conditioner output, build the knot arrays.

    Returns (cw, ch, dv): lists of (Bt, db) arrays — cw/ch have K+1 knot
    positions, dv has K+1 knot derivatives — matching ``flows/spline.py``'s
    ``_make_knots`` arithmetic term for term (softmax + min-bin floor, cumsum
    as a static running sum, exact endpoint pinning).
    """
    K = n_bins
    T = tail_bound

    def block(p):
        return raw[:, p * db : (p + 1) * db]

    def knots(offset):
        vals = [block(offset + k) for k in range(K)]
        m = vals[0]
        for v in vals[1:]:
            m = jnp.maximum(m, v)
        es = [jnp.exp(v - m) for v in vals]
        s = es[0]
        for e in es[1:]:
            s = s + e
        sizes = [_MIN_BIN + (1.0 - _MIN_BIN * K) * e / s for e in es]
        cum = [jnp.full_like(sizes[0], -T)]
        acc = jnp.zeros_like(sizes[0])
        for k in range(K):
            acc = acc + sizes[k]
            cum.append(acc * (2.0 * T) - T)
        cum[-1] = jnp.full_like(cum[-1], T)  # pin endpoint (cumsum rounding)
        return cum

    cw = knots(0)
    ch = knots(K)
    one = None
    dv = []
    for k in range(K + 1):
        if k == 0 or k == K:
            if one is None:
                one = jnp.ones_like(raw[:, :db])
            dv.append(one)
        else:
            dv.append(_MIN_DERIV + jax.nn.softplus(block(2 * K + (k - 1)) + _DERIV_SHIFT))
    return cw, ch, dv


def _lrs_blocks(raw, db: int, n_bins: int, tail_bound: float):
    """LRS knot arrays from the param-major conditioner output.

    The first ``3K - 1`` param blocks share the RQS layout (widths, heights,
    interior derivatives -> ``_spline_blocks``); blocks ``3K-1 .. 4K-2`` are
    the per-bin interior-point lambdas (``flows/spline.py:138``)."""
    cw, ch, dv = _spline_blocks(raw, db, n_bins, tail_bound)
    K = n_bins

    def block(p):
        return raw[:, p * db : (p + 1) * db]

    lam = [0.025 + 0.95 * jax.nn.sigmoid(block(3 * K - 1 + k)) for k in range(K)]
    return cw, ch, dv, lam


def _bin_select(x, cum_in, n_bins: int):
    """Select-accumulate bin masks: sels[k] = 1.0 where x lands in bin k
    (matches ``flows/spline.py _searchsorted`` incl. the last-bin clip)."""
    K = n_bins
    sels = []
    for k in range(K):
        lo = x >= cum_in[k]
        hi = x < cum_in[k + 1] if k < K - 1 else jnp.ones_like(x, dtype=bool)
        sels.append(jnp.logical_and(lo, hi).astype(x.dtype))
    return sels


def _pick(sels, vals, shift=0):
    acc = sels[0] * vals[shift]
    for k in range(1, len(sels)):
        acc = acc + sels[k] * vals[k + shift]
    return acc


def _lrs_transform(vb, cw, ch, dv, lam_all, n_bins: int, tail_bound: float,
                   inverse: bool):
    """Elementwise LRS on (Bt, db); mirrors ``flows/spline.py
    linear_rational_spline`` term for term (Dolatabadi et al. 2020)."""
    T = tail_bound
    inside = jnp.abs(vb) <= T
    x = jnp.clip(vb, -T, T)

    sels = _bin_select(x, ch if inverse else cw, n_bins)
    x0 = _pick(sels, cw)
    w = _pick(sels, cw, 1) - x0
    y0 = _pick(sels, ch)
    h = _pick(sels, ch, 1) - y0
    d0 = _pick(sels, dv)
    d1 = _pick(sels, dv, 1)
    lam = _pick(sels, lam_all)
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
        D1 = wa * (lam - phi) + wc * phi
        y1 = (wa * ya * (lam - phi) + wc * yc * phi) / D1
        dydx1 = lam * wa * wc * (yc - ya) / (D1 * D1 * w)
        D2 = wc * (1.0 - phi) + wb * (phi - lam)
        y2 = (wc * yc * (1.0 - phi) + wb * yb * (phi - lam)) / D2
        dydx2 = (1.0 - lam) * wb * wc * (yb - yc) / (D2 * D2 * w)
        y = jnp.where(seg1, y1, y2)
        dydx = jnp.where(seg1, dydx1, dydx2)
        out = jnp.where(inside, y, vb)
        ld_elem = jnp.where(inside, jnp.log(dydx), 0.0)
    else:
        y = x
        seg1 = y <= yc
        n1 = wa * lam * (y - ya)
        den1 = wa * (y - ya) - wc * (y - yc)
        phi1 = n1 / jnp.where(jnp.abs(den1) < 1e-12, 1e-12, den1)
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
        out = jnp.where(inside, x_out, vb)
        ld_elem = jnp.where(inside, -jnp.log(dydx), 0.0)
    return out, jnp.sum(ld_elem, axis=-1)


def _rqs_transform(vb, cw, ch, dv, n_bins: int, tail_bound: float, inverse: bool):
    """Elementwise RQS on (Bt, db); returns (out, per-row log-det sum)."""
    K = n_bins
    T = tail_bound
    inside = jnp.abs(vb) <= T
    x = jnp.clip(vb, -T, T)

    sels = _bin_select(x, ch if inverse else cw, K)
    x_k = _pick(sels, cw)
    w_k = _pick(sels, cw, 1) - x_k
    y_k = _pick(sels, ch)
    h_k = _pick(sels, ch, 1) - y_k
    d_k = _pick(sels, dv)
    d_k1 = _pick(sels, dv, 1)
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
        out = jnp.where(inside, y, vb)
        ld_elem = jnp.where(inside, jnp.log(dydx), 0.0)
    else:
        term = x - y_k
        a = h_k * (s_k - d_k) + term * corr
        b = h_k * d_k - term * corr
        c = -s_k * term
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        xi = (2.0 * c) / (-b - jnp.sqrt(disc))
        xi = jnp.clip(xi, 0.0, 1.0)
        xi1m = xi * (1.0 - xi)
        denom = s_k + corr * xi1m
        x_out = x_k + w_k * xi
        dydx = (
            s_k * s_k * (d_k1 * xi * xi + 2.0 * s_k * xi1m + d_k * (1.0 - xi) ** 2)
        ) / (denom * denom)
        out = jnp.where(inside, x_out, vb)
        ld_elem = jnp.where(inside, -jnp.log(dydx), 0.0)
    return out, jnp.sum(ld_elem, axis=-1)


def _layer_apply(x, w6, l: int, d: int, n_bins: int, tail_bound: float,
                 inverse: bool, kind: str = "rqs"):
    """One coupling layer on a packed ``(Bt, d)`` block -> (x_next, ld_l).

    Pure function of the block and the layer's six weight arrays, so the
    backward kernel can take its ``jax.vjp`` (everything here is gather-free
    and Mosaic-lowerable). ``kind``: 'rqs' (rational-quadratic) or 'lrs'
    (linear-rational) elementwise spline."""
    d_even = (d + 1) // 2
    db = d - d_even if l % 2 == 0 else d_even
    w1, b1, w2, b2, w3, b3 = w6

    if l % 2 == 0:
        va, vb = x[:, :d_even], x[:, d_even:]
    else:
        va, vb = x[:, d_even:], x[:, :d_even]

    h = jnp.tanh(jnp.dot(va, w1, preferred_element_type=jnp.float32) + b1)
    h = jnp.tanh(jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2)
    raw = jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3

    if kind == "rqs":
        cw, ch, dv = _spline_blocks(raw, db, n_bins, tail_bound)
        vb, ld_l = _rqs_transform(vb, cw, ch, dv, n_bins, tail_bound, inverse)
    else:
        cw, ch, dv, lam = _lrs_blocks(raw, db, n_bins, tail_bound)
        vb, ld_l = _lrs_transform(vb, cw, ch, dv, lam, n_bins, tail_bound,
                                  inverse)

    if l % 2 == 0:
        x = jnp.concatenate([va, vb], axis=-1)
    else:
        x = jnp.concatenate([vb, va], axis=-1)
    return x, ld_l


def _stack_apply(x, weights, n_layers: int, d: int, n_bins: int,
                 tail_bound: float, inverse: bool, kind: str = "rqs"):
    """Whole coupling stack on a packed ``(Bt, d)`` block."""
    ld = jnp.zeros((x.shape[0],), dtype=jnp.float32)
    layer_order = range(n_layers) if not inverse else range(n_layers - 1, -1, -1)
    for l in layer_order:
        x, ld_l = _layer_apply(
            x, weights[6 * l : 6 * l + 6], l, d, n_bins, tail_bound, inverse,
            kind,
        )
        ld = ld + ld_l
    return x, ld


def _kernel(n_layers: int, d: int, n_bins: int, tail_bound: float, inverse: bool,
            kind: str = "rqs"):
    def kernel(x_ref, *refs):
        w_refs = refs[: 6 * n_layers]
        y_ref, ld_ref = refs[6 * n_layers :]
        y, ld = _stack_apply(
            x_ref[:], [r[:] for r in w_refs], n_layers, d, n_bins, tail_bound,
            inverse, kind,
        )
        y_ref[:] = y
        ld_ref[:] = ld[:, None]

    return kernel


def _kernel_bwd(n_layers: int, d: int, n_bins: int, tail_bound: float,
                inverse: bool, kind: str = "rqs"):
    """Fused VJP: recompute the forward on the VMEM-resident block, saving
    only each layer's *input* (a (block_b, d) array), then transpose ONE
    LAYER AT A TIME with ``jax.vjp`` — the spline forward here is the
    select-accumulate formulation, so the backward is gather-free too,
    unlike the XLA-replay backward which re-traces the searchsorted/gather
    path (the very thing the forward kernel exists to avoid). A whole-stack
    vjp keeps every layer's spline residuals live simultaneously and blows
    the 16 MB scoped-VMEM limit (measured 34.8 MB at d=100, L=4, h=128);
    per-layer transposition peaks at a single layer's residuals. Weight
    grads accumulate across grid blocks (sequential TPU grid, constant
    index_map), mirroring ``coupling_pallas._kernel_bwd``.

    Log-det cotangent: total ld = sum_l ld_l, so every layer's ld_l receives
    the same incoming cotangent g_ld."""

    def kernel(x_ref, gy_ref, gld_ref, *refs):
        w_refs = refs[: 6 * n_layers]
        out_refs = refs[6 * n_layers :]
        gx_ref = out_refs[0]
        gw_refs = out_refs[1:]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in gw_refs:
                r[:] = jnp.zeros_like(r)

        x = x_ref[:]
        layer_order = (
            list(range(n_layers)) if not inverse else list(range(n_layers - 1, -1, -1))
        )

        xs = []  # per-layer inputs: L x (block_b, d) — cheap vs residuals
        for l in layer_order:
            xs.append(x)
            x, _ = _layer_apply(
                x, [w_refs[6 * l + k][:] for k in range(6)], l, d, n_bins,
                tail_bound, inverse, kind,
            )

        gx = gy_ref[:]
        gld = gld_ref[:][:, 0]
        for l, x_l in zip(reversed(layer_order), reversed(xs)):
            w6 = [w_refs[6 * l + k][:] for k in range(6)]

            def f(x_in, *ws, _l=l):
                return _layer_apply(x_in, list(ws), _l, d, n_bins, tail_bound,
                                    inverse, kind)

            _, vjp = jax.vjp(f, x_l, *w6)
            grads = vjp((gx, gld))
            gx = grads[0]
            for k in range(6):
                gw_refs[6 * l + k][:] += grads[1 + k]

        gx_ref[:] = gx

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "n_bins", "tail_bound", "inverse", "kind", "block_b"),
)
def _fused_bwd_call(x_packed, gy_packed, gld, flat_weights, n_layers: int,
                    n_bins: int, tail_bound: float, inverse: bool,
                    kind: str = "rqs", block_b: int = 128):
    """Returns (gx_packed, [6L weight-grad arrays]). Cotangents of padded
    rows are zero, so padding contributes nothing to the accumulators.
    ``block_b`` defaults to half the forward's: the vjp keeps the forward
    residuals (knot arrays, MLP activations) live per block."""
    B, d = x_packed.shape
    n_pad = (-B) % block_b
    if n_pad:
        zrow = jnp.zeros((n_pad, d), dtype=x_packed.dtype)
        x_packed = jnp.concatenate([x_packed, zrow], axis=0)
        gy_packed = jnp.concatenate([gy_packed, zrow], axis=0)
        gld = jnp.concatenate([gld, jnp.zeros((n_pad,), dtype=gld.dtype)], axis=0)
    Bp = x_packed.shape[0]
    grid = (Bp // block_b,)

    blocked = pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, _n=a.ndim: (0,) * _n, memory_space=pltpu.VMEM
    )
    in_specs = [
        blocked,
        blocked,
        pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights]

    out = pl.pallas_call(
        _kernel_bwd(n_layers, d, n_bins, tail_bound, inverse, kind),
        grid=grid,
        in_specs=in_specs,
        out_specs=(blocked,) + tuple(full(w) for w in flat_weights),
        out_shape=(jax.ShapeDtypeStruct((Bp, d), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_weights),
    )(x_packed, gy_packed, gld[:, None], *flat_weights)
    return out[0][:B], list(out[1:])


def _unflatten_weight_grads(gflat, params, n_params: int):
    """Invert ``_flatten_weights``: re-interleave the output layer's
    param-major column grads back to the dim-major param pytree layout."""
    gparams = []
    for l in range(len(params)):
        gw1, gb1, gw2, gb2, gw3p, gb3p = gflat[6 * l : 6 * l + 6]
        db = gw3p.shape[1] // n_params
        inv = np.argsort(_param_major_perm(db, n_params))
        gparams.append({"w": [gw1, gw2, gw3p[:, inv]], "b": [gb1, gb2, gb3p[inv]]})
    return gparams


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "n_bins", "tail_bound", "inverse", "kind", "block_b"),
)
def _fused_call(x_packed, flat_weights, n_layers: int, n_bins: int,
                tail_bound: float, inverse: bool, kind: str = "rqs",
                block_b: int = 256):
    B, d = x_packed.shape
    n_pad = (-B) % block_b
    if n_pad:
        x_packed = jnp.concatenate(
            [x_packed, jnp.zeros((n_pad, d), dtype=x_packed.dtype)], axis=0
        )
    Bp = x_packed.shape[0]
    grid = (Bp // block_b,)

    in_specs = [
        pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights]

    y, ld = pl.pallas_call(
        _kernel(n_layers, d, n_bins, tail_bound, inverse, kind),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, d), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ),
    )(x_packed, *flat_weights)
    return y[:B], ld[:B, 0]


def fused_rqs_forward(params, x, d: int, n_layers: int, n_bins: int,
                      tail_bound: float, xla_forward=None):
    """x: (..., d) -> (z, log_det). Differentiable via the fused backward
    kernel under ``jax.custom_vjp`` (XLA-replay fallback via ``_PALLAS_BWD``)."""
    return _fused_dir(params, x, d, n_layers, n_bins, tail_bound, False,
                      xla_forward, "rqs")


def fused_rqs_inverse(params, z, d: int, n_layers: int, n_bins: int,
                      tail_bound: float, xla_inverse=None):
    return _fused_dir(params, z, d, n_layers, n_bins, tail_bound, True,
                      xla_inverse, "rqs")


def fused_lrs_forward(params, x, d: int, n_layers: int, n_bins: int,
                      tail_bound: float, xla_forward=None):
    """Linear-rational spline stack (c-lrsnsf); same contract as the RQS
    entry points."""
    return _fused_dir(params, x, d, n_layers, n_bins, tail_bound, False,
                      xla_forward, "lrs")


def fused_lrs_inverse(params, z, d: int, n_layers: int, n_bins: int,
                      tail_bound: float, xla_inverse=None):
    return _fused_dir(params, z, d, n_layers, n_bins, tail_bound, True,
                      xla_inverse, "lrs")


# Backward implementation switch: the fused Pallas VJP kernel by default; set
# False to fall back to re-running the XLA reference path under jax.vjp (used
# to validate the kernel; also taken automatically when no xla_fn is supplied
# AND the flag is off).
_PALLAS_BWD = True


def _fused_dir(params, x, d, n_layers, n_bins, tail_bound, inverse, xla_fn,
               kind="rqs"):
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, d)
    pack, unpack = _perm(d)
    n_params = (3 if kind == "rqs" else 4) * n_bins - 1

    def pallas_impl(params, xf):
        flat = _flatten_weights(params, n_params)
        y, ld = _fused_call(
            jnp.take(xf, pack, axis=-1), flat, n_layers, n_bins, tail_bound,
            inverse, kind,
        )
        return jnp.take(y, unpack, axis=-1), ld

    @jax.custom_vjp
    def op(params, xf):
        return pallas_impl(params, xf)

    def op_fwd(params, xf):
        return pallas_impl(params, xf), (params, xf)

    def op_bwd(res, g):
        params, xf = res
        gy, gld = g
        if _PALLAS_BWD:
            gx_packed, gflat = _fused_bwd_call(
                jnp.take(xf, pack, axis=-1),
                jnp.take(gy, pack, axis=-1),
                gld,
                _flatten_weights(params, n_params),
                n_layers, n_bins, tail_bound, inverse, kind,
            )
            return (
                _unflatten_weight_grads(gflat, params, n_params),
                jnp.take(gx_packed, unpack, axis=-1),
            )
        _, vjp = jax.vjp(xla_fn, params, xf)
        return vjp(g)

    op.defvjp(op_fwd, op_bwd)
    if xla_fn is None and not _PALLAS_BWD:
        y, ld = pallas_impl(params, xf)  # non-differentiable fallback
    else:
        y, ld = op(params, xf)
    return y.reshape(x.shape), ld.reshape(batch_shape)
