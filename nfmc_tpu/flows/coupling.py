"""Coupling flows: RealNVP, NICE, coupling rational-quadratic / linear-rational
spline flows and coupling deep-sigmoid (NAF) variants.

The reference's default flow is torchflows RealNVP (``nfmc/algorithms/
sampling/base.py:26``, ``sample.py:22``). Coupling layers here operate on the
flattened event with alternating static half-masks; each layer's conditioner
is a dense MLP sized to MXU-friendly widths, and both directions cost one
conditioner pass, so flow sampling inside scan loops is as cheap as density
evaluation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Bijection
from .conditioners import mlp_apply, mlp_init
from .transforms import AffineTransform, LRSplineTransform, RQSplineTransform, ShiftTransform


class Coupling(Bijection):
    """Stack of coupling layers with a shared elementwise transform type."""

    def __init__(
        self,
        event_shape: Sequence[int],
        transform,
        n_layers: int = 2,
        hidden_size: Optional[int] = None,
        n_hidden_layers: int = 2,
        conditioner_kwargs: Optional[dict] = None,
        **_ignored,
    ):
        super().__init__(event_shape)
        d = self.event_size
        if d < 2:
            raise ValueError("Coupling flows need event_size >= 2")
        self.transform = transform
        self.n_layers = int(n_layers)
        # torchflows-style conditioner kwargs ({'n_layers', 'n_hidden'}) are
        # accepted for DSL parity (reference ``test/test_flow_kwargs.py:49``).
        if conditioner_kwargs:
            n_hidden_layers = conditioner_kwargs.get("n_layers", n_hidden_layers)
            hidden_size = conditioner_kwargs.get("n_hidden", hidden_size)
        if hidden_size is None:
            hidden_size = int(min(max(32, 2 ** int(np.ceil(np.log2(max(4 * d, 32))))), 128))
        self.hidden = [int(hidden_size)] * int(n_hidden_layers)

        # Static index sets: layer l conditions on indices with (i + l) % 2 == 0.
        # Host (numpy) arrays: they fold into trace-time constants, avoiding
        # device allocations at construction.
        self.layer_idx = []
        for l in range(self.n_layers):
            ids = np.arange(d)
            a = ids[(ids + l) % 2 == 0]  # conditioning (identity) part
            b = ids[(ids + l) % 2 == 1]  # transformed part
            inv_perm = np.argsort(np.concatenate([a, b]))
            self.layer_idx.append((a, b, inv_perm))

    @property
    def layers(self):
        """Per-layer descriptors (torchflows ``bijection.layers`` parity)."""
        return self.layer_idx

    def init(self, key):
        keys = jax.random.split(key, self.n_layers)
        params = []
        for (a, b, _), k in zip(self.layer_idx, keys):
            out_dim = int(b.shape[0]) * self.transform.n_params_per_dim
            params.append(mlp_init(k, int(a.shape[0]), self.hidden, out_dim))
        return params

    def _layer(self, p, idx, v, inverse: bool):
        a, b, inv_perm = idx
        va = jnp.take(v, a, axis=-1)
        vb = jnp.take(v, b, axis=-1)
        raw = mlp_apply(p, va).reshape(*vb.shape, self.transform.n_params_per_dim)
        if inverse:
            vb_new, ld_elem = self.transform.inverse(vb, raw)
        else:
            vb_new, ld_elem = self.transform.forward(vb, raw)
        v_new = jnp.take(jnp.concatenate([va, vb_new], axis=-1), inv_perm, axis=-1)
        return v_new, jnp.sum(ld_elem, axis=-1)

    def _forward_flat(self, params, v):
        """Forward on an already-flattened ``(*batch, event_size)`` array.

        The Pallas wrappers hand their XLA-replay callbacks flattened inputs;
        routing those through :meth:`forward_fn` would re-slice the batch
        shape with ``len(event_shape)`` and break multi-dimensional events.
        """
        log_det = jnp.zeros(v.shape[:-1])
        for p, idx in zip(params, self.layer_idx):
            v, ld = self._layer(p, idx, v, inverse=False)
            log_det = log_det + ld
        return v, log_det

    def _inverse_flat(self, params, v):
        log_det = jnp.zeros(v.shape[:-1])
        for p, idx in zip(reversed(params), reversed(self.layer_idx)):
            v, ld = self._layer(p, idx, v, inverse=True)
            log_det = log_det + ld
        return v, log_det

    def forward_fn(self, params, x):
        batch_shape = x.shape[: x.ndim - len(self.event_shape)]
        v, log_det = self._forward_flat(params, x.reshape(*batch_shape, self.event_size))
        return v.reshape(x.shape), log_det

    def inverse_fn(self, params, z):
        batch_shape = z.shape[: z.ndim - len(self.event_shape)]
        v, log_det = self._inverse_flat(params, z.reshape(*batch_shape, self.event_size))
        return v.reshape(z.shape), log_det


class RealNVP(Coupling):
    """Affine coupling flow (Dinh et al. 2017); reference default
    (``base.py:26``).

    ``use_pallas``: the default ``'auto'`` takes the plain XLA path.
    Measured on TPU v5e under the axon toolchain (2026-08-18, in-process
    interleaved reps after an honest first transfer): the fused Pallas
    kernels (:mod:`nfmc_tpu.ops.coupling_pallas`) are at or below XLA parity
    at every production shape — forward 0.65-0.95x (1.34x only at the wide
    8x512 stack), backward 0.5-1.0x, wide-flow MLE epoch 43.0 vs 45.3
    TFLOP/s — because this toolchain's `--xla_allow_excess_precision=true`
    pins every matmul to the same ~63 TFLOP/s f32 pipeline (bf16 dots measure
    72) and XLA already fuses the elementwise work; the extra pack/permute
    ops around the kernel then cost more than the fusion saves.
    ``use_pallas=True`` opts in (on TPU; block sizes derive from a VMEM
    budget at trace time, ``derive_bwd_block_b``); the kernels stay
    numerically validated in ``tests/test_pallas.py`` and
    ``bench run_pallas_numerics``.
    """

    def __init__(self, event_shape, n_layers: int = 2, clamp: float = 3.0,
                 use_pallas="auto", **kwargs):
        super().__init__(event_shape, AffineTransform(clamp=clamp), n_layers=n_layers, **kwargs)
        self.clamp = float(clamp)
        self.use_pallas = use_pallas
        self._pallas_state = None  # resolved lazily

    def _pallas_enabled(self) -> bool:
        if self._pallas_state is None:
            if self.use_pallas is not True or len(self.hidden) != 2:
                self._pallas_state = False  # 'auto' = XLA (measured faster)
            else:
                from ..ops.coupling_pallas import pallas_available

                self._pallas_state = bool(pallas_available())
        return self._pallas_state

    def forward_fn(self, params, x):
        if self._pallas_enabled():
            from ..ops.coupling_pallas import fused_realnvp_forward

            batch = x.shape[: x.ndim - len(self.event_shape)]
            xf = x.reshape(*batch, self.event_size)
            y, ld = fused_realnvp_forward(
                params, xf, self.event_size, self.n_layers, self.clamp,
                xla_forward=self._forward_flat,
            )
            return y.reshape(x.shape), ld
        return super().forward_fn(params, x)

    def inverse_fn(self, params, z):
        if self._pallas_enabled():
            from ..ops.coupling_pallas import fused_realnvp_inverse

            batch = z.shape[: z.ndim - len(self.event_shape)]
            zf = z.reshape(*batch, self.event_size)
            y, ld = fused_realnvp_inverse(
                params, zf, self.event_size, self.n_layers, self.clamp,
                xla_inverse=self._inverse_flat,
            )
            return y.reshape(z.shape), ld
        return super().inverse_fn(params, z)


class NICE(Coupling):
    """Additive coupling flow (Dinh et al. 2015); volume-preserving."""

    def __init__(self, event_shape, n_layers: int = 2, **kwargs):
        super().__init__(event_shape, ShiftTransform(), n_layers=n_layers, **kwargs)


class _FusedSplineMixin:
    """Shared Pallas wiring for the coupling spline flows (RQS and LRS).

    Subclasses set ``_spline_kind`` ('rqs' | 'lrs'); the per-dim parameter
    count is ``3K - 1`` for RQS and ``4K - 1`` for LRS.

    ``use_pallas`` semantics (different from RealNVP's): the default
    ``'auto'`` takes the PLAIN XLA path — which on TPU already uses the
    gather-free select-accumulate bin lookup (``flows/spline.py
    _use_select_lookup``) and measures within ~20% of the fused kernels at
    every shape we tested (fwd 0.8-1.2x, grads 0.8-1.0x at d in {20, 100},
    B in {100, 1024, 8192}) with exact autodiff and no VMEM limits.
    ``use_pallas=True`` opts into the fused Pallas kernels
    (:mod:`nfmc_tpu.ops.experimental_spline_pallas`) — the design that motivated the
    select-accumulate formulation — subject to the VMEM guard below."""

    _spline_kind = "rqs"

    def _n_spline_params(self) -> int:
        return (3 if self._spline_kind == "rqs" else 4) * self.n_bins - 1

    def _pallas_enabled(self) -> bool:
        if self._pallas_state is None:
            if self.use_pallas is not True or len(self.hidden) != 2:
                self._pallas_state = False
            else:
                from ..ops.coupling_pallas import pallas_available

                # VMEM guard: the forward kernel holds the conditioner-output
                # activation block (block_b, db * n_params) with the ~2x
                # temporaries of the select-accumulate AND the full weight
                # stack (experimental_spline_pallas.py uses unblocked BlockSpecs for the
                # weights) inside scoped VMEM. The fused BACKWARD additionally
                # holds the weight stack TWICE (inputs + grad accumulators)
                # plus one layer's vjp residuals at block 128 (~5x the raw
                # conditioner block — calibrated: measured 16.7 MB peak at
                # RQS d=200/L=4/h=128 = 2x5.2 MB weights + ~2565 B per output
                # column; LRS d=100/L=4/h=128 measurably fits and must stay
                # enabled). Guard both against the 16 MB scoped-VMEM limit
                # with headroom; wide stacks (e.g. 8 layers x 512 hidden at
                # d=100, or 2 x 896 at d=10) fall back to the XLA path
                # instead of failing Mosaic compile on the first jax.grad.
                db = (self.event_size + 1) // 2
                h = self.hidden[0]
                out = db * self._n_spline_params()
                act = 256 * out * 4 * 3
                weights = self.n_layers * (db * h + h * h + h * out + out + 2 * h) * 4
                bwd_peak = 2 * weights + 128 * out * 4 * 5
                self._pallas_state = (
                    bool(pallas_available())
                    and act + weights < 8 * 2**20
                    and bwd_peak < 14 * 2**20
                )
        return self._pallas_state

    def forward_fn(self, params, x):
        if self._pallas_enabled():
            from ..ops.experimental_spline_pallas import fused_lrs_forward, fused_rqs_forward

            fused = fused_rqs_forward if self._spline_kind == "rqs" else fused_lrs_forward
            batch = x.shape[: x.ndim - len(self.event_shape)]
            xf = x.reshape(*batch, self.event_size)
            y, ld = fused(
                params, xf, self.event_size, self.n_layers, self.n_bins,
                self.tail_bound, xla_forward=self._forward_flat,
            )
            return y.reshape(x.shape), ld
        return super().forward_fn(params, x)

    def inverse_fn(self, params, z):
        if self._pallas_enabled():
            from ..ops.experimental_spline_pallas import fused_lrs_inverse, fused_rqs_inverse

            fused = fused_rqs_inverse if self._spline_kind == "rqs" else fused_lrs_inverse
            batch = z.shape[: z.ndim - len(self.event_shape)]
            zf = z.reshape(*batch, self.event_size)
            y, ld = fused(
                params, zf, self.event_size, self.n_layers, self.n_bins,
                self.tail_bound, xla_inverse=self._inverse_flat,
            )
            return y.reshape(z.shape), ld
        return super().inverse_fn(params, z)


class CouplingRQNSF(_FusedSplineMixin, Coupling):
    """Coupling rational-quadratic neural spline flow (c-rqnsf).

    On TPU the default path is already gather-free (select-accumulate bin
    lookup in ``flows/spline.py``, ~10-15x the old searchsorted/gather
    lowering); ``use_pallas=True`` opts into the fused Pallas kernels — see
    :class:`_FusedSplineMixin` for when that matters.
    """

    _spline_kind = "rqs"

    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, use_pallas="auto", **kwargs):
        super().__init__(
            event_shape, RQSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )
        self.n_bins = int(n_bins)
        self.tail_bound = float(tail_bound)
        self.use_pallas = use_pallas
        self._pallas_state = None  # resolved lazily


class CouplingLRS(_FusedSplineMixin, Coupling):
    """Coupling linear-rational spline flow (c-lrsnsf).

    Same TPU path selection as :class:`CouplingRQNSF` (gather-free XLA by
    default; ``use_pallas=True`` for the fused kernels, ``kind='lrs'``)."""

    _spline_kind = "lrs"

    def __init__(self, event_shape, n_layers: int = 2, n_bins: int = 8,
                 tail_bound: float = 5.0, use_pallas="auto", **kwargs):
        super().__init__(
            event_shape, LRSplineTransform(n_bins=n_bins, tail_bound=tail_bound),
            n_layers=n_layers, **kwargs,
        )
        self.n_bins = int(n_bins)
        self.tail_bound = float(tail_bound)
        self.use_pallas = use_pallas
        self._pallas_state = None  # resolved lazily
