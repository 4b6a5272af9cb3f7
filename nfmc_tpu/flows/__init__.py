"""TPU-native normalizing-flow subsystem (torchflows-equivalent surface).

See SURVEY.md section 2.9 for the exact API the samplers consume.
"""
from .base import Bijection, Chain, Flow, Inverse
from .coupling import NICE, Coupling, CouplingLRS, CouplingRQNSF, RealNVP
from .masked import (
    IAF,
    MAF,
    InverseAutoregressiveLRS,
    InverseAutoregressiveRQNSF,
    MaskedAutoregressive,
    MaskedAutoregressiveLRS,
    MaskedAutoregressiveRQNSF,
)
from .train import fit, variational_fit

__all__ = [
    "Bijection", "Chain", "Flow", "Inverse",
    "Coupling", "RealNVP", "NICE", "CouplingRQNSF", "CouplingLRS",
    "MaskedAutoregressive", "MAF", "IAF",
    "MaskedAutoregressiveRQNSF", "InverseAutoregressiveRQNSF",
    "MaskedAutoregressiveLRS", "InverseAutoregressiveLRS",
    "fit", "variational_fit",
]
