"""Bijection base for the reference-execution shim.

The reference's transport modules subclass/annotate against
``torchflows.bijections.base.Bijection`` (SURVEY.md §2.7); the contract is
``forward(x) -> (z, log_det)`` / ``inverse(z) -> (x, log_det)`` with
``log_det`` summed over event dims per batch element.
"""
from typing import Tuple

import torch
import torch.nn as nn


class Bijection(nn.Module):
    def __init__(self, event_shape):
        super().__init__()
        self.event_shape = torch.Size(tuple(int(s) for s in event_shape))

    @property
    def event_size(self) -> int:
        n = 1
        for s in self.event_shape:
            n *= int(s)
        return n

    def forward(self, x: torch.Tensor, context=None) -> Tuple[torch.Tensor, torch.Tensor]:
        raise NotImplementedError

    def inverse(self, z: torch.Tensor, context=None) -> Tuple[torch.Tensor, torch.Tensor]:
        raise NotImplementedError
