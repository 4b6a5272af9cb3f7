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
from .naf import (
    CouplingDeepDenseSF,
    CouplingDeepSF,
    CouplingDenseSF,
    InverseAutoregressiveDeepDenseSF,
    InverseAutoregressiveDeepSF,
    InverseAutoregressiveDenseSF,
    MaskedAutoregressiveDeepDenseSF,
    MaskedAutoregressiveDeepSF,
    MaskedAutoregressiveDenseSF,
)
from .residual import (
    InvertibleResNet,
    PlanarFlow,
    ProximalResFlow,
    RadialFlow,
    ResFlow,
    SylvesterFlow,
)
from .continuous import FFJORD, OTFlow, RNODE, DeepDiffeomorphicBijection
from .multiscale import (
    AffineGlow,
    ConvolutionalFFJORD,
    ConvolutionalInvertibleResNet,
    ConvolutionalResFlow,
    MultiscaleFlow,
    MultiscaleNICE,
    MultiscaleRealNVP,
    MultiscaleRQNSF,
    RQSGlow,
    ShiftGlow,
)

__all__ = [
    "Bijection", "Chain", "Flow", "Inverse",
    "Coupling", "RealNVP", "NICE", "CouplingRQNSF", "CouplingLRS",
    "MaskedAutoregressive", "MAF", "IAF",
    "MaskedAutoregressiveRQNSF", "InverseAutoregressiveRQNSF",
    "MaskedAutoregressiveLRS", "InverseAutoregressiveLRS",
    "CouplingDeepSF", "CouplingDenseSF", "CouplingDeepDenseSF",
    "MaskedAutoregressiveDeepSF", "MaskedAutoregressiveDenseSF",
    "MaskedAutoregressiveDeepDenseSF",
    "InverseAutoregressiveDeepSF", "InverseAutoregressiveDenseSF",
    "InverseAutoregressiveDeepDenseSF",
    "PlanarFlow", "RadialFlow", "SylvesterFlow",
    "InvertibleResNet", "ResFlow", "ProximalResFlow",
    "FFJORD", "RNODE", "OTFlow", "DeepDiffeomorphicBijection",
    "MultiscaleFlow", "MultiscaleRealNVP", "MultiscaleNICE", "MultiscaleRQNSF",
    "AffineGlow", "ShiftGlow", "RQSGlow",
    "ConvolutionalFFJORD", "ConvolutionalInvertibleResNet", "ConvolutionalResFlow",
    "fit", "variational_fit",
]
