"""Fused RealNVP coupling stack as a single Pallas TPU kernel.

The whole multi-layer affine-coupling pass (conditioner MLP matmuls on the
MXU, affine transform + log-det accumulation on the VPU) runs in one kernel
with the chain state resident in VMEM — no HBM round trips between layers.
This is the BASELINE.json north-star kernel ("coupling-flow forward/inverse
passes and Jacobian log-det accumulation ... as fused Pallas kernels").

Layout: the caller pre-permutes the event into [even | odd] halves so every
layer's conditioning/transformed parts are contiguous slices (layer parity
alternates which half conditions). Gradients: ``jax.custom_vjp`` backed by a
second fused Pallas kernel (``_kernel_bwd``) that recomputes the forward
activations in VMEM and runs the analytic backward through every layer —
input and weight gradients in one kernel launch, replacing the ~100 small
ops a traced XLA vjp emits. This is the NeuTra hot path (a gradient through
the flow inverse at every leapfrog step, SURVEY.md section 3.4) and the MLE /
reverse-KL training backward. A module flag ``_PALLAS_BWD`` reverts to the
XLA-replay backward for validation.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _layer_sizes(d: int, n_layers: int) -> List[Tuple[int, int]]:
    """(n_cond, n_trans) per layer for the [even | odd] packed layout."""
    d_even = (d + 1) // 2
    d_odd = d - d_even
    out = []
    for l in range(n_layers):
        if l % 2 == 0:
            out.append((d_even, d_odd))  # evens condition, odds transform
        else:
            out.append((d_odd, d_even))
    return out


def _kernel(n_layers: int, d: int, clamp: float, inverse: bool):
    sizes = _layer_sizes(d, n_layers)
    d_even = (d + 1) // 2

    def kernel(x_ref, *refs):
        # refs: 6 weight refs per layer (w1,b1,w2,b2,w3,b3), then out refs
        w_refs = refs[: 6 * n_layers]
        y_ref, ld_ref = refs[6 * n_layers :]

        x = x_ref[:]  # (Bt, d)
        ld = jnp.zeros((x.shape[0],), dtype=jnp.float32)

        layer_order = range(n_layers) if not inverse else range(n_layers - 1, -1, -1)
        for l in layer_order:
            da, db = sizes[l]
            w1 = w_refs[6 * l + 0][:]
            b1 = w_refs[6 * l + 1][:]
            w2 = w_refs[6 * l + 2][:]
            b2 = w_refs[6 * l + 3][:]
            w3 = w_refs[6 * l + 4][:]
            b3 = w_refs[6 * l + 5][:]

            if l % 2 == 0:
                va = x[:, :d_even]
                vb = x[:, d_even:]
            else:
                va = x[:, d_even:]
                vb = x[:, :d_even]

            h = jnp.tanh(jnp.dot(va, w1, preferred_element_type=jnp.float32) + b1)
            h = jnp.tanh(jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2)
            raw = jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3
            # w3/b3 columns were de-interleaved on host: [shifts | logscales]
            t = raw[:, :db]
            ls = clamp * jnp.tanh(raw[:, db:] / clamp)
            if inverse:
                vb = vb * jnp.exp(ls) + t
                ld = ld + jnp.sum(ls, axis=-1)
            else:
                vb = (vb - t) * jnp.exp(-ls)
                ld = ld - jnp.sum(ls, axis=-1)

            if l % 2 == 0:
                x = jnp.concatenate([va, vb], axis=-1)
            else:
                x = jnp.concatenate([vb, va], axis=-1)

        y_ref[:] = x
        ld_ref[:] = ld[:, None]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_layers", "clamp", "inverse", "block_b"))
def _fused_call(x_packed, flat_weights, n_layers: int, clamp: float,
                inverse: bool, block_b: int = 256):
    """x_packed: (B, d) in [even | odd] layout; flat list of 6L weight arrays."""
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
        _kernel(n_layers, d, clamp, inverse),
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
    y, ld = y[:B], ld[:B, 0]
    return y, ld


# Budget for deriving block sizes at trace time, in MODEL units: the
# analytic estimates below deliberately over-count what Mosaic actually
# keeps resident (they charge weights AND weight-grad accumulators fully,
# while the compiler schedules/reuses some of that), so the budget is
# calibrated empirically rather than set to the raw ~16 MiB scoped-VMEM
# hardware limit. Measured on TPU v5e (2026-08-18, wide training shape
# d=100 / 8 layers / 512 hidden, standalone eager grad at batch 4096):
# block 256 (model est 32.3 MiB) fails the scoped-VMEM check; 128
# (est 26.5 MiB) compiles and runs. 28 MiB splits those with margin on
# both sides (VERDICT r2 item 4: the old fixed block_b=256 made the wide
# backward compile only inside larger jits by accident).
_VMEM_BUDGET_BYTES = 28 * 1024 * 1024


def _bwd_vmem_bytes(block_b: int, d: int, hidden: int, n_layers: int) -> int:
    """Analytic scoped-VMEM estimate for one ``_kernel_bwd`` grid step.

    Fixed (batch-independent): every layer's 6 weight arrays plus the same-
    shape weight-gradient accumulators. Per-row: the stashed forward
    activations (va, vb, h1, h2, s, ls, vb_new per layer), the I/O blocks
    (x, gy, gld, gx) and the live backward temporaries (g_raw, g_a1, g_a2).
    """
    H = hidden
    sizes = _layer_sizes(d, n_layers)
    fixed = 0
    per_row = 0
    for da, db in sizes:
        fixed += 2 * (da * H + H + H * H + H + H * 2 * db + 2 * db)
        per_row += da + 4 * db + 2 * H  # saved activations
    per_row += 4 * d + 1  # x, gy, gx blocks + gld column
    per_row += 2 * d + 2 * H  # live temporaries: g_raw (<=2*d), g_a1, g_a2
    return 4 * (fixed + block_b * per_row)


def derive_bwd_block_b(d: int, hidden: int, n_layers: int,
                       budget_bytes: int = _VMEM_BUDGET_BYTES,
                       max_block: int = 256):
    """Largest power-of-two row block (<= ``max_block``, >= 8) whose analytic
    footprint fits the scoped-VMEM budget, or ``None`` when even the smallest
    block cannot fit (weights alone too large) — callers then fall back to
    the XLA vjp."""
    b = max_block
    while b >= 8:
        if _bwd_vmem_bytes(b, d, hidden, n_layers) <= budget_bytes:
            return b
        b //= 2
    return None


def _fwd_vmem_bytes(block_b: int, d: int, hidden: int, n_layers: int) -> int:
    """Analytic scoped-VMEM estimate for one ``_kernel`` (forward) grid step:
    all weights (fixed) + the I/O blocks and live layer temporaries."""
    H = hidden
    sizes = _layer_sizes(d, n_layers)
    fixed = sum(da * H + H + H * H + H + H * 2 * db + 2 * db for da, db in sizes)
    per_row = 2 * d + 1 + 2 * H + 2 * d  # x/y blocks, ld, h1/h2, raw+parts
    return 4 * (fixed + block_b * per_row)


def derive_fwd_block_b(d: int, hidden: int, n_layers: int,
                       budget_bytes: int = _VMEM_BUDGET_BYTES,
                       max_block: int = 256):
    b = max_block
    while b >= 8:
        if _fwd_vmem_bytes(b, d, hidden, n_layers) <= budget_bytes:
            return b
        b //= 2
    return None


def _kernel_bwd(n_layers: int, d: int, clamp: float, inverse: bool):
    """Fused VJP: recompute the forward pass in VMEM, then run the analytic
    backward through every coupling layer and conditioner MLP — one kernel for
    input *and* weight gradients instead of the ~100 small XLA ops a traced
    vjp emits (the NeuTra leapfrog evaluates this at every step)."""
    sizes = _layer_sizes(d, n_layers)
    d_even = (d + 1) // 2

    def dotT_ab(a, b):  # a: (B, m), b: (B, n) -> (m, n)  [contract batch]
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_bT(a, w):  # a: (B, n), w: (m, n) -> (B, m)  [contract last dims]
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

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

        # ---- forward recompute, stashing per-layer activations in VMEM ------
        saved = []
        weights = []
        for l in layer_order:
            da, db = sizes[l]
            w1, b1, w2, b2, w3, b3 = (w_refs[6 * l + k][:] for k in range(6))
            weights.append((w1, w2, w3))
            if l % 2 == 0:
                va, vb = x[:, :d_even], x[:, d_even:]
            else:
                va, vb = x[:, d_even:], x[:, :d_even]
            h1 = jnp.tanh(jnp.dot(va, w1, preferred_element_type=jnp.float32) + b1)
            h2 = jnp.tanh(jnp.dot(h1, w2, preferred_element_type=jnp.float32) + b2)
            raw = jnp.dot(h2, w3, preferred_element_type=jnp.float32) + b3
            s = jnp.tanh(raw[:, db:] / clamp)
            ls = clamp * s
            if inverse:
                vb_new = vb * jnp.exp(ls) + raw[:, :db]
            else:
                vb_new = (vb - raw[:, :db]) * jnp.exp(-ls)
            saved.append((va, vb, h1, h2, s, ls, vb_new))
            if l % 2 == 0:
                x = jnp.concatenate([va, vb_new], axis=-1)
            else:
                x = jnp.concatenate([vb_new, va], axis=-1)

        # ---- backward --------------------------------------------------------
        gx = gy_ref[:]
        gld = gld_ref[:]  # (Bt, 1)
        for l, (w1, w2, w3), (va, vb, h1, h2, s, ls, vb_new) in zip(
            reversed(layer_order), reversed(weights), reversed(saved)
        ):
            da, db = sizes[l]
            if l % 2 == 0:
                g_va, g_vbn = gx[:, :d_even], gx[:, d_even:]
            else:
                g_va, g_vbn = gx[:, d_even:], gx[:, :d_even]

            if inverse:
                e = jnp.exp(ls)
                g_t = g_vbn
                g_ls = g_vbn * vb * e + gld
                g_vb = g_vbn * e
            else:
                em = jnp.exp(-ls)
                g_vb = g_vbn * em
                g_t = -g_vbn * em
                g_ls = -g_vbn * vb_new - gld
            g_u = g_ls * (1.0 - s * s)  # d(clamp*tanh(u/clamp))/du
            g_raw = jnp.concatenate([g_t, g_u], axis=-1)

            gw_refs[6 * l + 4][:] += dotT_ab(h2, g_raw)
            gw_refs[6 * l + 5][:] += jnp.sum(g_raw, axis=0)
            g_a2 = dot_bT(g_raw, w3) * (1.0 - h2 * h2)
            gw_refs[6 * l + 2][:] += dotT_ab(h1, g_a2)
            gw_refs[6 * l + 3][:] += jnp.sum(g_a2, axis=0)
            g_a1 = dot_bT(g_a2, w2) * (1.0 - h1 * h1)
            gw_refs[6 * l + 0][:] += dotT_ab(va, g_a1)
            gw_refs[6 * l + 1][:] += jnp.sum(g_a1, axis=0)
            g_va_tot = g_va + dot_bT(g_a1, w1)

            if l % 2 == 0:
                gx = jnp.concatenate([g_va_tot, g_vb], axis=-1)
            else:
                gx = jnp.concatenate([g_vb, g_va_tot], axis=-1)

        gx_ref[:] = gx

    return kernel


@functools.partial(jax.jit, static_argnames=("n_layers", "clamp", "inverse", "block_b"))
def _fused_bwd_call(x_packed, gy_packed, gld, flat_weights, n_layers: int,
                    clamp: float, inverse: bool, block_b: int = 256):
    """Returns (gx_packed, [6L weight-grad arrays]); cotangents of padded rows
    are zero, so padding contributes nothing to the weight accumulators."""
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
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    in_specs = [
        blocked,
        blocked,
        pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_weights]

    out = pl.pallas_call(
        _kernel_bwd(n_layers, d, clamp, inverse),
        grid=grid,
        in_specs=in_specs,
        out_specs=(blocked,) + tuple(full(w) for w in flat_weights),
        out_shape=(jax.ShapeDtypeStruct((Bp, d), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_weights),
    )(x_packed, gy_packed, gld[:, None], *flat_weights)
    gx, gws = out[0][:B], list(out[1:])
    return gx, gws


def _flatten_weights(params) -> List[jax.Array]:
    """Flatten per-layer MLP weights; the output layer's dim-major interleaved
    columns (shift_i, logscale_i) are de-interleaved to [shifts | logscales]
    blocks so the kernel uses contiguous slices (Mosaic has no strided gather)."""
    flat = []
    for p in params:
        ws, bs = p["w"], p["b"]
        assert len(ws) == 3, "pallas path expects 2 hidden layers"
        w3, b3 = ws[2], bs[2]
        two_db = w3.shape[1]
        # host-side (numpy) index math: params may be numpy leaves (NeuTra
        # snapshots them for closure capture) and numpy arrays reject traced
        # indices; a static np permutation works for both numpy and traced w3
        perm = np.concatenate([np.arange(0, two_db, 2), np.arange(1, two_db, 2)])
        flat.extend([ws[0], bs[0], ws[1], bs[1], jnp.asarray(w3)[:, perm], jnp.asarray(b3)[perm]])
    return flat


def _unflatten_weight_grads(gflat, params):
    """Invert ``_flatten_weights``: re-interleave the w3/b3 column grads back
    into the dim-major (shift_i, logscale_i) layout of the param pytree."""
    gparams = []
    for l in range(len(params)):
        gw1, gb1, gw2, gb2, gw3d, gb3d = gflat[6 * l : 6 * l + 6]
        two_db = gw3d.shape[1]
        perm = np.concatenate([np.arange(0, two_db, 2), np.arange(1, two_db, 2)])
        inv = np.argsort(perm)
        gparams.append({"w": [gw1, gw2, gw3d[:, inv]], "b": [gb1, gb2, gb3d[inv]]})
    return gparams


def _perm(d: int):
    evens = np.arange(0, d, 2)
    odds = np.arange(1, d, 2)
    pack = np.concatenate([evens, odds])
    unpack = np.argsort(pack)
    return jnp.asarray(pack), jnp.asarray(unpack)


def fused_realnvp_forward(params, x, d: int, n_layers: int, clamp: float,
                          xla_forward=None):
    """x: (..., d) -> (z, log_det). Differentiable via XLA-backed custom VJP."""
    return _fused_dir(params, x, d, n_layers, clamp, False, xla_forward)


def fused_realnvp_inverse(params, z, d: int, n_layers: int, clamp: float,
                          xla_inverse=None):
    return _fused_dir(params, z, d, n_layers, clamp, True, xla_inverse)


# Backward implementation switch: the fused Pallas VJP kernel by default; set
# False to fall back to re-running the XLA reference under jax.vjp (used to
# validate the kernel, and automatically when the VMEM-budget gate rejects
# every backward block size). Callers that supply no xla_fn get the canonical
# Coupling implementation synthesized for them (_xla_replay).
_PALLAS_BWD = True


def _xla_replay(d, n_layers, clamp, inverse):
    """Pure-XLA reference of the fused op for callers that pass no
    ``xla_fn``: the canonical Coupling forward/inverse (lazy import — the
    flows module imports this module lazily, so no cycle). The op's math is
    exactly a default-mask RealNVP stack; ``_forward_flat``/``_inverse_flat``
    read layer widths from the params pytree, so the constructor's
    ``hidden_size`` is irrelevant to the replay."""
    from ..flows.coupling import RealNVP

    bij = RealNVP((d,), n_layers=n_layers, clamp=clamp, use_pallas=False)
    return bij._inverse_flat if inverse else bij._forward_flat


def _fused_dir(params, x, d, n_layers, clamp, inverse, xla_fn):
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, d)
    pack, unpack = _perm(d)
    if xla_fn is None:
        # Guarantees every fallback below (over-budget forward, backward
        # vjp replay, _PALLAS_BWD=False) has a real function to call.
        xla_fn = _xla_replay(d, n_layers, clamp, inverse)

    hidden = int(params[0]["w"][1].shape[0])  # shapes are static under trace
    fwd_block = derive_fwd_block_b(d, hidden, n_layers)
    if fwd_block is None:
        # weights alone exceed the scoped-VMEM budget: pure XLA
        y, ld = xla_fn(params, xf)
        return y.reshape(x.shape), ld.reshape(batch_shape)

    def pallas_impl(params, xf):
        flat = _flatten_weights(params)
        y, ld = _fused_call(
            jnp.take(xf, pack, axis=-1), flat, n_layers, clamp, inverse,
            block_b=fwd_block,
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
        # Block size derived from the scoped-VMEM budget at trace time (the
        # hidden width comes from the params themselves); None = even the
        # smallest block cannot fit -> XLA vjp fallback.
        hidden = int(params[0]["w"][1].shape[0])
        block_b = derive_bwd_block_b(d, hidden, n_layers)
        if _PALLAS_BWD and block_b is not None:
            gx_packed, gflat = _fused_bwd_call(
                jnp.take(xf, pack, axis=-1),
                jnp.take(gy, pack, axis=-1),
                gld,
                _flatten_weights(params),
                n_layers, clamp, inverse, block_b=block_b,
            )
            return _unflatten_weight_grads(gflat, params), jnp.take(gx_packed, unpack, axis=-1)
        _, vjp = jax.vjp(xla_fn, params, xf)
        return vjp(g)

    op.defvjp(op_fwd, op_bwd)
    y, ld = op(params, xf)
    return y.reshape(x.shape), ld.reshape(batch_shape)
