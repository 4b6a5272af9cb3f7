"""Architecture registry for the reference-execution shim.

Exports every class name the reference's ``util.py:228-278`` imports. The
coupling family (RealNVP / NICE) is functional — an alternating-mask affine
coupling stack with identity init — because the A/B harness actually samples
through it. Every other family is a placeholder that raises on construction;
the A/B never builds them, but the import must succeed for
``nfmc.util.create_flow_object`` to load.
"""
from typing import Tuple

import torch
import torch.nn as nn

from .bijections.base import Bijection


class _AffineCoupling(nn.Module):
    """One alternating-mask affine coupling layer on the flattened event.

    Identity-initialized (zero final linear) so a fresh flow is the identity
    map — matching how the A/B harness initializes both sides so they run the
    same algorithm from the same proposal.
    """

    def __init__(self, d: int, parity: int, hidden: int, scale: bool):
        super().__init__()
        idx = torch.arange(d)
        self.register_buffer("idx_a", idx[(idx + parity) % 2 == 0])
        self.register_buffer("idx_b", idx[(idx + parity) % 2 == 1])
        self.scale = scale
        out_mult = 2 if scale else 1
        self.net = nn.Sequential(
            nn.Linear(len(self.idx_a), hidden), nn.Tanh(),
            nn.Linear(hidden, hidden), nn.Tanh(),
            nn.Linear(hidden, out_mult * len(self.idx_b)),
        )
        nn.init.zeros_(self.net[-1].weight)
        nn.init.zeros_(self.net[-1].bias)

    def _t_ls(self, xa):
        raw = self.net(xa)
        if self.scale:
            raw = raw.view(*raw.shape[:-1], len(self.idx_b), 2)
            t, ls = raw[..., 0], 3.0 * torch.tanh(raw[..., 1] / 3.0)
        else:
            t, ls = raw, torch.zeros_like(raw)
        return t, ls

    def forward(self, x):  # data -> latent
        xa, xb = x[..., self.idx_a], x[..., self.idx_b]
        t, ls = self._t_ls(xa)
        zb = (xb - t) * torch.exp(-ls)
        out = torch.empty_like(x)
        out[..., self.idx_a], out[..., self.idx_b] = xa, zb
        return out, -ls.sum(-1)

    def inverse(self, z):  # latent -> data
        za, zb = z[..., self.idx_a], z[..., self.idx_b]
        t, ls = self._t_ls(za)
        xb = zb * torch.exp(ls) + t
        out = torch.empty_like(z)
        out[..., self.idx_a], out[..., self.idx_b] = za, xb
        return out, ls.sum(-1)


class _CouplingStack(Bijection):
    _scale = True

    def __init__(self, event_shape, n_layers: int = 3, hidden_size: int = None,
                 **kwargs):
        if isinstance(event_shape, int):
            event_shape = (event_shape,)
        super().__init__(event_shape)
        d = self.event_size
        hidden = hidden_size or max(16, min(128, 2 * d))
        self.layers = nn.ModuleList(
            [_AffineCoupling(d, i % 2, hidden, self._scale) for i in range(n_layers)]
        )

    def forward(self, x, context=None) -> Tuple[torch.Tensor, torch.Tensor]:
        flat = x.reshape(*x.shape[: x.dim() - len(self.event_shape)], -1)
        log_det = torch.zeros(flat.shape[:-1], device=flat.device)
        for layer in self.layers:
            flat, ld = layer.forward(flat)
            log_det = log_det + ld
        return flat.reshape(x.shape), log_det

    def inverse(self, z, context=None) -> Tuple[torch.Tensor, torch.Tensor]:
        flat = z.reshape(*z.shape[: z.dim() - len(self.event_shape)], -1)
        log_det = torch.zeros(flat.shape[:-1], device=flat.device)
        for layer in reversed(self.layers):
            flat, ld = layer.inverse(flat)
            log_det = log_det + ld
        return flat.reshape(z.shape), log_det


class RealNVP(_CouplingStack):
    _scale = True


class NICE(_CouplingStack):
    _scale = False  # additive couplings only


def _placeholder(name: str):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"reference-shim: architecture {name!r} is import-only (the A/B "
            "harness exercises the coupling family; see tools/reference_shim/"
            "README.md)"
        )

    return type(name, (Bijection,), {"__init__": __init__})


_PLACEHOLDERS = [
    "MAF", "IAF", "CouplingRQNSF", "MaskedAutoregressiveRQNSF",
    "InverseAutoregressiveRQNSF", "CouplingLRS", "MaskedAutoregressiveLRS",
    "InverseAutoregressiveLRS", "CouplingDeepSF", "InverseAutoregressiveDeepSF",
    "MaskedAutoregressiveDeepSF", "CouplingDenseSF",
    "InverseAutoregressiveDenseSF", "MaskedAutoregressiveDenseSF",
    "CouplingDeepDenseSF", "InverseAutoregressiveDeepDenseSF",
    "MaskedAutoregressiveDeepDenseSF", "OTFlow", "FFJORD", "ResFlow",
    "InvertibleResNet", "DeepDiffeomorphicBijection", "ProximalResFlow",
    "RNODE", "PlanarFlow", "RadialFlow", "SylvesterFlow", "MultiscaleLRSNSF",
    "MultiscaleRQNSF", "MultiscaleNICE", "MultiscaleRealNVP",
    "MultiscaleDeepSigmoid", "MultiscaleDenseSigmoid",
    "MultiscaleDeepDenseSigmoid", "AffineGlow", "ShiftGlow", "RQSGlow",
    "LRSGlow", "DeepSigmoidGlow", "DeepDenseSigmoidGlow", "DenseSigmoidGlow",
    "ConvolutionalRNODE", "ConvolutionalFFJORD",
    "ConvolutionalDeepDiffeomorphicBijection", "ConvolutionalResFlow",
    "ConvolutionalInvertibleResNet",
]
for _name in _PLACEHOLDERS:
    globals()[_name] = _placeholder(_name)
del _name
