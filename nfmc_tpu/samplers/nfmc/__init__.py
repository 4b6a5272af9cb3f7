from .imh import AbstractIMH, AdaptiveIMH, FixedIMH, IMHKernel, IMHParameters
from .jump import (
    JumpAIES,
    JumpChEES,
    JumpESS,
    JumpHMC,
    JumpMALA,
    JumpMH,
    JumpNFMC,
    JumpNFMCParameters,
    JumpNUTS,
    JumpUHMC,
    JumpULA,
)
from .neutra import NeuTra, NeuTraChEES, NeuTraHMC, NeuTraKernel, NeuTraMH, NeuTraParameters
from .tess import TESS, TESSKernel, TESSParameters
from .dlmc import DLMC, DLMCKernel, DLMCParameters

__all__ = [
    "AbstractIMH", "AdaptiveIMH", "FixedIMH", "IMHKernel", "IMHParameters",
    "JumpNFMC", "JumpNFMCParameters", "JumpHMC", "JumpUHMC", "JumpMALA",
    "JumpULA", "JumpMH", "JumpESS", "JumpNUTS", "JumpAIES", "JumpChEES",
    "NeuTra", "NeuTraHMC", "NeuTraMH", "NeuTraChEES", "NeuTraKernel", "NeuTraParameters",
    "TESS", "TESSKernel", "TESSParameters",
    "DLMC", "DLMCKernel", "DLMCParameters",
]
